package graft.sources

import graft.model.ChangeEvent
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** S1/S2 as a NATIVE DataSource-V2 micro-batch source — the "go
  * further" path SURVEY §2.1 row S1 reserves for a custom
  * `MicroBatchStream`. The reference's PG replication loop
  * (source/postgres/postgres.go:242-296) is: track a durable WAL
  * position, fetch everything past it, hand batches downstream, and
  * persist the position only after sinks ACK (mux/mux.go:193-198,
  * persistWAL postgres.go:358-377). This source maps that protocol
  * onto DSv2 directly, with a directory of immutable, monotonically
  * named JSON segment files standing in for the WAL (no PG wire exists
  * in this sandbox):
  *
  *   - offset       = count of segment files consumed, ≡ WAL position,
  *                    plus the boundary segment NAME so replays detect a
  *                    mutated listing instead of silently remapping
  *   - latestOffset = directory listing past the last offset, capped by
  *                    `maxFilesPerTrigger` via [[SupportsAdmissionControl]]
  *                    — the mux batchSize count-trigger (mux/mux.go:57)
  *   - commit(end)  = the post-ACK WAL persist hook: Spark calls it
  *                    only after the epoch's sinks committed; we mirror
  *                    the reference by recording it (observable in
  *                    tests; the checkpoint is the real durable store)
  *
  * Scale shape: one [[InputPartition]] per segment file, so a
  * 1000-executor cluster fans one micro-batch out to 1000 parallel
  * readers; the driver only lists names. Rows are parsed straight to
  * [[InternalRow]] (no Row→InternalRow re-encode on the hot path).
  *
  * Usage: `spark.readStream.format(CdcFileSource.Name).option("path", dir)`.
  */
class CdcFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEvent.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CdcFileTable(new CaseInsensitiveStringMap(properties))
}

object CdcFileSource {
  /** Fully-qualified provider name for `.format(...)` (no
    * DataSourceRegister service file needed). */
  val Name: String = classOf[CdcFileSource].getName

  /** Last offset Spark committed per source directory — the test's
    * window into the commit-after-sink ordering (≡ walPositionPersisted,
    * postgres.go:372-376). */
  val committed = new ConcurrentHashMap[String, Long]()
}

private[sources] final class CdcFileTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val dir = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("CdcFileSource: 'path' option is required"))
  override def name(): String = s"cdc-file:$dir"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ChangeEvent.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CdcFileMicroBatchStream(dir,
          Option(opts.get("maxFilesPerTrigger")).map(_.toInt))
    }
}

/** Offset = number of segment files consumed (sorted by name), PLUS the
  * name of the last consumed segment. The count alone is positional: if
  * retention deletes a segment, or a late writer drops a name that sorts
  * before already-consumed ones, a checkpoint replay would silently remap
  * offset ranges onto the wrong files (rows skipped or duplicated).
  * Recording the boundary name makes that corruption DETECTABLE — every
  * planning call re-checks that the sorted listing still has `lastName`
  * at position `segments - 1` and fails fast otherwise, the same reason
  * Spark's own FileStreamSource logs actual file names. */
private[sources] final case class SegmentOffset(segments: Long, lastName: String)
    extends Offset {
  override def json(): String =
    if (lastName == null) s"""{"segments":$segments}"""
    else s"""{"segments":$segments,"last":"${lastName.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
}

private[sources] final class CdcFileMicroBatchStream(dir: String,
    maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Stable WAL ordering: segment files sorted by name. Writers must
    * name segments monotonically (like WAL segment numbers) and write
    * them atomically (tmp+rename) — same contract as Spark's own file
    * source. */
  private def segmentNames(): Array[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Array.empty
    else Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .toArray.sorted
  }

  /** The listing prefix up to `off` must still end at the recorded
    * boundary name; otherwise the positional mapping is corrupt (a
    * consumed segment vanished or a new name sorted into the consumed
    * range) and continuing would read the wrong files. */
  private def verifyPrefix(names: Array[String], off: SegmentOffset): Unit = {
    if (off.segments > 0 && off.lastName != null) {
      val i = off.segments.toInt - 1
      if (names.length <= i || names(i) != off.lastName)
        throw new IllegalStateException(
          s"CdcFileSource[$dir]: checkpoint says segment #${off.segments} is " +
          s"'${off.lastName}' but the directory now lists " +
          s"${if (names.length <= i) "fewer segments" else s"'${names(i)}'"} there. " +
          "A consumed segment was deleted or a name sorted into the consumed " +
          "range — refusing to remap offsets onto different files.")
    }
  }

  override def initialOffset(): Offset = SegmentOffset(0L, null)
  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
      SegmentOffset(n.get("segments").asLong(),
        if (n.has("last")) n.get("last").asText() else null)
    } else SegmentOffset(t.toLong, null) // pre-name checkpoint format
  }

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val so = start.asInstanceOf[SegmentOffset]
    val names = segmentNames()
    verifyPrefix(names, so)
    val from = so.segments
    val total = names.length.toLong
    val capped = limit match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(total, from + rl.maxFiles())
      case _ => total
    }
    val to = math.max(from, capped)
    SegmentOffset(to, if (to > 0 && to <= names.length) names(to.toInt - 1) else so.lastName)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[SegmentOffset]
    val eo = end.asInstanceOf[SegmentOffset]
    val names = segmentNames()
    verifyPrefix(names, so)
    verifyPrefix(names, eo)
    names.slice(so.segments.toInt, eo.segments.toInt)
      .map(n => SegmentPartition(s"$dir/$n"): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new SegmentReader(partition.asInstanceOf[SegmentPartition].path)

  /** Called only after the epoch's sinks committed — the DSv2 analog of
    * persistWAL-after-ACK. */
  override def commit(end: Offset): Unit =
    CdcFileSource.committed.put(dir, end.asInstanceOf[SegmentOffset].segments)

  override def stop(): Unit = ()
}

private[sources] final case class SegmentPartition(path: String) extends InputPartition

/** Parses one WAL segment (JSON lines in the envelope wire shape,
  * README.md:12-25) directly into [[InternalRow]]s. Jackson ships with
  * Spark; per-partition reader init amortizes the mapper — the same
  * shape a real pgoutput decoder would take. */
private[sources] final class SegmentReader(path: String)
    extends PartitionReader[InternalRow] {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
    .asScala.iterator.filter(_.nonEmpty)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else { current = parse(lines.next()); true }

  override def get(): InternalRow = current
  override def close(): Unit = ()

  private def parse(line: String): InternalRow = {
    val n = mapper.readTree(line)
    def s(f: String): UTF8String = {
      val v = n.get(f)
      if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
    }
    val tsMicros = {
      val v = n.get("timestamp")
      if (v == null || v.isNull) 0L
      else {
        val t = java.time.OffsetDateTime.parse(v.asText()).toInstant
        t.getEpochSecond * 1000000L + t.getNano / 1000L
      }
    }
    val cols = n.get("columns")
    val map = if (cols == null || cols.isNull) null else {
      val keys = new scala.collection.mutable.ArrayBuffer[UTF8String]
      val vals = new scala.collection.mutable.ArrayBuffer[UTF8String]
      cols.properties().asScala.foreach { e =>
        keys += UTF8String.fromString(e.getKey)
        vals += (if (e.getValue.isNull) null else UTF8String.fromString(e.getValue.asText()))
      }
      ArrayBasedMapData(keys.toArray, vals.toArray)
    }
    InternalRow(s("host"), s("database"), s("table"), s("action"),
      if (n.get("walPosition") == null) 0L else n.get("walPosition").asLong(),
      tsMicros, s("uuid"), map)
  }
}

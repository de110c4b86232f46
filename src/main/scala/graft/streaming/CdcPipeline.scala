package graft.streaming

import graft.model.ChangeEvent
import graft.operators.CdcOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

/** The reference's streaming topology on Structured Streaming.
  *
  * Reference shape (source → mux → sinks → commit):
  *   - a source emits change events (source/postgres/postgres.go:242-296,
  *     source/kafka/kafka.go:145-197),
  *   - the mux buffers them and flushes on count OR time
  *     (mux/mux.go:96-153),
  *   - each flush fans the batch out to every subscribed sink with retry
  *     (mux/mux.go:169-189),
  *   - only after ALL sinks ACK does the progress marker advance
  *     (mux/mux.go:193-198) — at-least-once with replay.
  *
  * Spark mapping: micro-batch execution IS the mux. `Trigger.ProcessingTime`
  * is the time trigger, `maxFilesPerTrigger`/`maxOffsetsPerTrigger` the count
  * trigger, and the checkpoint's offset→commit log IS the WAL-position store:
  * offsets are committed only after the batch's sinks complete, so a crash
  * mid-batch replays it — the same at-least-once contract, for free.
  * `foreachBatch` + persist gives the reference's single-read multi-sink
  * fan-out; `dropDuplicates` within a watermark upgrades replayed duplicates
  * to effectively-once, which the reference cannot do.
  *
  * At scale: every transform here is narrow (no shuffle) except the
  * windowed aggregations, which shuffle once on the window key with
  * map-side partial aggregation — the minimum possible.
  */
object CdcPipeline {

  /** File-based change-event source: the sandbox stand-in for the PG
    * replication / Kafka source (S1/S2). Each dropped file is a WAL
    * segment; `maxFilesPerTrigger` is the count-trigger analog of the
    * mux batchSize (mux/mux.go:57). */
  def fileSource(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(ChangeEvent.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Envelope validation (F1+F2) on a streaming frame — same column
    * algebra as batch; Catalyst doesn't care that the source streams. */
  def validated(envelopes: DataFrame): DataFrame =
    envelopes
      .filter(col("action").isin(ChangeEvent.ValidActions: _*))
      .filter(col("uuid").isNotNull && (col("uuid") =!= ""))

  /** Per-batch data-quality counters via `Dataset.observe` — the M2
    * counters (reference: per-event atomic increments,
    * postgres.go:431-447) computed INSIDE the batch plan at zero extra
    * passes: `events` (rows seen), `invalid_action`, `missing_uuid`.
    * They surface on every `QueryProgressEvent.observedMetrics` under
    * `name`, where [[Monitoring]] records them — apply BEFORE
    * `validated` so the drop counts are visible, not silently filtered. */
  def observed(envelopes: DataFrame, name: String = "cdc"): DataFrame =
    envelopes.observe(name,
      count(lit(1)).as("events"),
      // NULL actions must be counted explicitly: `!isin(...)` is NULL
      // (not true) for a null action, so without the isNull arm the
      // counter would claim fewer drops than validated() performs
      sum(when(col("action").isNull ||
          !col("action").isin(ChangeEvent.ValidActions: _*), 1L)
        .otherwise(0L)).as("invalid_action"),
      sum(when(col("uuid").isNull || col("uuid") === "", 1L)
        .otherwise(0L)).as("missing_uuid"))

  /** Watermarked dedup by uuid: collapses at-least-once replays inside
    * the watermark horizon. `dropDuplicatesWithinWatermark` ties state
    * eviction to the watermark even though the dedup key itself carries
    * no event time — plain `dropDuplicates("uuid")` would keep every
    * uuid forever (the watermark only evicts state for keys that
    * INCLUDE the event-time column). Bounded state is the whole point:
    * an unbounded dedup set OOMs at 100 TB. */
  def deduped(envelopes: DataFrame, watermark: String = "10 minutes"): DataFrame =
    envelopes
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("uuid")

  /** Tumbling (or, with `slide` < `window`, SLIDING) event-time counts
    * per (window, table, action) — the streaming form of the mux flush
    * statistics (M2 counters), with late data bounded by the watermark.
    * A sliding window assigns each event to window/slide overlapping
    * windows (a smoothed rate view); state stays bounded by the
    * watermark either way. */
  def windowedCounts(envelopes: DataFrame, window: String = "5 minutes",
                     watermark: String = "10 minutes",
                     slide: Option[String] = None): DataFrame =
    envelopes
      .withWatermark("timestamp", watermark)
      .groupBy(
        slide.fold(org.apache.spark.sql.functions.window(col("timestamp"), window)) {
          s => org.apache.spark.sql.functions.window(col("timestamp"), window, s)
        }.as("w"),
        col("table"), col("action"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("table"), col("action"), col("n"))

  /** Route + key + serialize: the full sink-side handler chain
    * (R1→R2→H1) as one streaming transform, producing the
    * (topic, key, value) triple Spark's Kafka sink consumes natively. */
  def toWire(envelopes: DataFrame, mapping: Map[String, String],
             fallback: Option[String]): DataFrame = {
    val routed = CdcOps.route(envelopes, col("table"), mapping, fallback)
    routed
      .withColumn("key",
        concat_ws(":", col("host"), col("database"), col("table"), col("action")))
      .withColumn("value", to_json(struct(
        col("host"), col("database"), col("table"), col("action"),
        col("walPosition"), col("timestamp"), col("uuid"), col("columns"))))
      .select("topic", "key", "value")
  }

  /** Multi-sink fan-out with the reference's commit ordering
    * (mux/mux.go:169-198): one micro-batch is read once, persisted, and
    * written to every sink; the checkpoint (≡ WAL position / consumer
    * offsets) advances only when this function returns, i.e. after ALL
    * sinks ACK. A sink failure fails the batch → replay → at-least-once.
    * `sinks` are (name, batchWriter) pairs, the Spark analog of the
    * reference's sink.Subscribe list (config.go:98-110). */
  def muxFanout(wire: DataFrame, sinks: Seq[(String, DataFrame => Unit)],
                checkpoint: String,
                trigger: Trigger = Trigger.ProcessingTime("1 second")): DataStreamWriter[org.apache.spark.sql.Row] =
    wire.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist(StorageLevel.MEMORY_AND_DISK)
        try sinks.foreach { case (_, write) => write(batch) }
        finally batch.unpersist()
        (): Unit
      }

  /** [[muxFanout]] variant whose sinks also receive the epoch id —
    * for idempotent writers ([[Sinks.idempotentParquet]]) that key
    * output by epoch so replays overwrite instead of duplicate. */
  def muxFanoutIdempotent(wire: DataFrame,
      sinks: Seq[(String, (DataFrame, Long) => Unit)],
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): DataStreamWriter[org.apache.spark.sql.Row] =
    wire.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist(StorageLevel.MEMORY_AND_DISK)
        try sinks.foreach { case (_, write) => write(batch, batchId) }
        finally batch.unpersist()
        (): Unit
      }

  /** Per-topic partitioned parquet sink: the file-sink stand-in for the
    * Kafka sink's per-topic batches (sink/kafka/kafka.go:257-287).
    * `partitionBy(topic)` is the per-topic grouping — one directory per
    * topic, written in a single pass with no extra shuffle. */
  def parquetTopicSink(outDir: String)(batch: DataFrame): Unit =
    batch.write.mode("append").partitionBy("topic").parquet(outDir)

  // ---- streaming snapshot maintenance (the "apply the CDC stream" op) ----

  /** Schema of the maintained snapshot state: latest envelope per key,
    * INCLUDING delete tombstones (see [[mergeSnapshot]]). */
  val snapshotSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("walPosition",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("action",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("columns",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))))

  /** Shared cur/.prev generation read: the current state relation
    * (empty before the first batch), falling back to the `.prev`
    * generation if a crash landed between the two renames of
    * [[swapGenerations]] — ONE implementation for every maintained
    * state (snapshot, SCD2) so the recovery contract cannot diverge. */
  private def stateRelation(spark: SparkSession, stateDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cur = new java.io.File(stateDir)
    val prev = new java.io.File(stateDir + ".prev")
    val dir = if (cur.exists) cur else prev
    if (dir.exists) spark.read.schema(schema).parquet(dir.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Current snapshot state — see [[stateRelation]]. */
  def snapshotState(spark: SparkSession, stateDir: String): DataFrame =
    stateRelation(spark, stateDir, snapshotSchema)

  /** Merge one micro-batch of envelopes into the snapshot state: per
    * key, keep the change with the highest WAL position. Delete
    * tombstones are RETAINED in the state (filtered only in
    * [[snapshotView]]): dropping them at merge time would let a
    * replayed older update resurrect a deleted key — with tombstones,
    * the merge is a pure per-key max, so replaying any batch (the
    * at-least-once contract) is a no-op. */
  def mergeSnapshot(state: DataFrame, batch: DataFrame, keyField: String): DataFrame = {
    val changes = batch.select(
      element_at(col("columns"), keyField).as("key"),
      col("walPosition"), col("action"), col("columns"))
    state.unionByName(changes)
      .groupBy(col("key"))
      .agg(
        max(col("walPosition")).as("walPosition"),
        max_by(col("action"), col("walPosition")).as("action"),
        max_by(col("columns"), col("walPosition")).as("columns"))
  }

  /** foreachBatch sink maintaining a parquet-backed snapshot of the
    * replicated table — the streaming counterpart of the batch
    * `cdc_snapshot` query: read current state, merge the batch, write
    * the next generation, swap directories. The swap (cur→prev,
    * tmp→cur) is two renames; [[snapshotState]] recovers from `.prev`
    * if a crash lands between them. On a real deployment this swap is
    * what a transactional table format (Delta/Iceberg/Hudi) provides;
    * the merge plan itself — one shuffle on the key, state size
    * O(live keys + tombstones) — is unchanged there. At 100 TB,
    * partition the state by key-hash bucket and rewrite only buckets
    * the batch touches (bounded write amplification). */
  def snapshotSink(stateDir: String, keyField: String)(batch: DataFrame, batchId: Long): Unit =
    swapGenerations(stateDir,
      mergeSnapshot(snapshotState(batch.sparkSession, stateDir), batch, keyField))

  /** The queryable snapshot: live rows only (tombstones hidden). */
  def snapshotView(spark: SparkSession, stateDir: String): DataFrame =
    snapshotState(spark, stateDir)
      .filter(col("action") =!= ChangeEvent.Delete)

  /** Files of change events → validate → maintained snapshot. */
  def snapshotPipeline(spark: SparkSession, inDir: String, stateDir: String,
                       checkpoint: String, keyField: String): StreamingQuery =
    validated(fileSource(spark, inDir)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) => snapshotSink(stateDir, keyField)(b, id) }
      .start()

  /** Top-k rows per window from a windowed-counts relation — the
    * "trending tables" view. Ranking ACROSS keys is not expressible in
    * append-mode streaming (a row's rank can change until its window
    * closes), so this runs inside foreachBatch on the epoch's counts —
    * the epoch batch is exactly where cross-key ranking belongs. The
    * input is already the AGGREGATED windowed relation (tiny: windows ×
    * tables × actions), so a deterministic window rank is right-sized
    * here; `q_topk_per_group_agg`'s bounded-heap aggregator is the
    * shape to switch to if the per-window key space ever rivals the
    * event volume. */
  def topPerWindow(counts: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("table"), col("action"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("window_start"), col("rank"), col("table"), col("action"), col("n"))
      .orderBy(col("window_start"), col("rank"))
  }

  // ---- streaming SCD2 maintenance (append-version history) ----

  /** Schema of the maintained SCD2 state: the ACCEPTED CHANGE SET —
    * one row per (key, walPosition), never collapsed to current-only.
    * Version numbers and validity windows are DERIVED in
    * [[scd2History]], not stored: the history is a deterministic pure
    * function of this set, which is what makes replays free (merging
    * a batch twice adds no rows → derived history unchanged). */
  val scd2StateSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("walPosition",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("action",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("columns",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("tus",
        org.apache.spark.sql.types.LongType)))

  /** Current SCD2 change set — see [[stateRelation]]. */
  def scd2State(spark: SparkSession, stateDir: String): DataFrame =
    stateRelation(spark, stateDir, scd2StateSchema)

  /** Merge one micro-batch into the SCD2 change set: union + dedup on
    * (key, walPosition). A replayed batch contributes only rows that
    * already exist — the at-least-once contract costs nothing, exactly
    * like [[mergeSnapshot]]'s tombstone-retaining max. Duplicate rows
    * are bit-identical (same source change), so the dedup pick is
    * immaterial. */
  def mergeScd2(state: DataFrame, batch: DataFrame, keyField: String): DataFrame =
    state.unionByName(
        batch.select(
          element_at(col("columns"), keyField).as("key"),
          col("walPosition"), col("action"), col("columns"),
          unix_micros(col("timestamp")).as("tus")))
      .dropDuplicates("key", "walPosition")

  /** Atomic two-rename generation swap shared by the snapshot and SCD2
    * sinks (recovery contract documented at [[snapshotSink]]). */
  private def swapGenerations(stateDir: String, merged: DataFrame): Unit = {
    val tmp = stateDir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    import java.nio.file.{Files, Paths}
    val curP = Paths.get(stateDir)
    val prevP = Paths.get(stateDir + ".prev")
    if (Files.exists(prevP))
      org.apache.commons.io.FileUtils.deleteDirectory(prevP.toFile)
    if (Files.exists(curP)) Files.move(curP, prevP)
    Files.move(Paths.get(tmp), curP)
  }

  /** foreachBatch sink maintaining the SCD2 change set — the
    * APPEND-VERSION output mode of the snapshot pipeline: instead of
    * overwriting each key with its latest image, every accepted change
    * persists and [[scd2History]] serves the full version history.
    * Same swap/recovery mechanics as [[snapshotSink]]; same 100 TB
    * note (a transactional table format makes the swap a MERGE, and
    * key-hash bucketing bounds the rewrite to touched buckets — the
    * derived-history design additionally means a replay rewrites
    * nothing at all). */
  def scd2Sink(stateDir: String, keyField: String)(batch: DataFrame, batchId: Long): Unit =
    swapGenerations(stateDir,
      mergeScd2(scd2State(batch.sparkSession, stateDir), batch, keyField))

  /** The queryable SCD2 dimension: per-key version chain with validity
    * windows — the streaming counterpart of the batch `cdc_scd2` query
    * (CdcOps.qScd2), column-for-column: versions numbered in WAL order,
    * `valid_to_s` = next version's start, deletes close their
    * predecessor's window but emit no row themselves. */
  def scd2History(spark: SparkSession, stateDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("walPosition"))
    scd2State(spark, stateDir)
      .withColumn("version", row_number().over(w))
      .withColumn("next_tus", lead(col("tus"), 1).over(w))
      .filter(col("action") =!= ChangeEvent.Delete)
      .select(col("key"), col("version"), col("action"), col("walPosition"),
        expr("tus DIV 1000000").as("valid_from_s"),
        expr("next_tus DIV 1000000").as("valid_to_s"),
        col("next_tus").isNull.cast("int").as("is_current"),
        col("columns"))
  }

  /** Files of change events → validate → maintained SCD2 history. */
  def scd2Pipeline(spark: SparkSession, inDir: String, stateDir: String,
                   checkpoint: String, keyField: String): StreamingQuery =
    validated(fileSource(spark, inDir)).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) => scd2Sink(stateDir, keyField)(b, id) }
      .start()

  /** End-to-end flagship stream: files of change events → validate →
    * dedup → route/serialize → fan-out to N sinks, checkpointed.
    * Start + awaitTermination is the caller's choice. */
  def pipeline(spark: SparkSession, inDir: String, outDir: String,
               checkpoint: String,
               mapping: Map[String, String],
               fallback: Option[String] = Some("topic.default")): StreamingQuery = {
    val env = deduped(validated(fileSource(spark, inDir)))
    val wire = toWire(env, mapping, fallback)
    muxFanout(wire, Seq("parquet" -> parquetTopicSink(outDir) _), checkpoint)
      .start()
  }
}

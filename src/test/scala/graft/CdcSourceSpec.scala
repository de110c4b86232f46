package graft

import graft.model.ChangeEvent
import graft.sources.CdcFileSource
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Specs for the native DSv2 micro-batch CDC source: offset tracking,
  * admission control (count trigger), commit-after-sink, restart. */
class CdcSourceSpec extends SparkSpec {

  private def writeSegment(dir: String, name: String, events: Seq[ChangeEvent]): Unit = {
    val lines = events.map { e =>
      val cols = e.columns.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
      s"""{"host":"${e.host}","database":"${e.database}","table":"${e.table}",""" +
        s""""action":"${e.action}","walPosition":${e.walPosition},""" +
        s""""timestamp":"${java.time.Instant.ofEpochMilli(e.timestamp.getTime)}",""" +
        s""""uuid":"${e.uuid}","columns":$cols}"""
    }
    Files.write(Paths.get(s"$dir/$name"), lines.mkString("\n").getBytes("UTF-8"))
  }

  private def ev(wal: Long, table: String = "users"): ChangeEvent =
    ChangeEvent("h", "db", table, "insert", wal,
      new java.sql.Timestamp(1700000000000L + wal * 1000), s"u-$wal", Map("id" -> wal.toString))

  test("DSv2 source: parses segments, caps files per trigger, commits after sink") {
    val root = Files.createTempDirectory("graft-dsv2").toString
    val in = s"$root/wal"; Files.createDirectories(Paths.get(in))
    writeSegment(in, "seg-000.json", Seq(ev(1), ev(2)))
    writeSegment(in, "seg-001.json", Seq(ev(3)))
    writeSegment(in, "seg-002.json", Seq(ev(4, table = "orders")))

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format(CdcFileSource.Name)
      .option("path", in)
      .option("maxFilesPerTrigger", 1)
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.persist(); batchSizes.add(b.count())
        b.write.mode("append").parquet(s"$root/out"); b.unpersist()
        (): Unit
      }.start()
    try q.processAllAvailable() finally q.stop()

    // admission control: one segment per micro-batch (mux batchSize)
    assert(batchSizes.size() === 3)
    assert(batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq === Seq(2L, 1L, 1L))
    // rows parsed to the envelope schema with values intact
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() === 4)
    val r3 = out.filter(col("walPosition") === 3).head()
    assert(r3.getAs[String]("uuid") === "u-3")
    assert(r3.getAs[String]("table") === "users")
    assert(r3.getAs[Map[String, String]]("columns") === Map("id" -> "3"))
    assert(r3.getAs[java.sql.Timestamp]("timestamp").getTime === 1700000003000L)
    // commit-after-sink: only fully-sunk epochs are confirmed. Spark
    // fires source.commit for epoch N while constructing epoch N+1, so
    // the tail epoch stays unconfirmed until the stream advances — the
    // same replayable-tail contract as the reference's delayed WAL
    // confirmation (walPos − walRetain, postgres.go:451-466).
    assert(CdcFileSource.committed.get(in) === 2L)

    // restart from the checkpoint: nothing is reprocessed, new
    // segments flow (C1/C3 offset semantics on a native source)
    writeSegment(in, "seg-003.json", Seq(ev(5)))
    val q2 = spark.readStream.format(CdcFileSource.Name)
      .option("path", in).option("maxFilesPerTrigger", 1).load()
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$root/out"); (): Unit
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    val out2 = spark.read.parquet(s"$root/out")
    assert(out2.count() === 5) // only seg-003 was new
    assert(CdcFileSource.committed.get(in) >= 3L) // restart confirmed the recovered epochs
  }

  test("DSv2 source: fails fast when the consumed listing prefix mutates") {
    val root = Files.createTempDirectory("graft-dsv2-mut").toString
    val in = s"$root/wal"; Files.createDirectories(Paths.get(in))
    writeSegment(in, "seg-100.json", Seq(ev(1)))
    writeSegment(in, "seg-101.json", Seq(ev(2)))
    val run = () => {
      val q = spark.readStream.format(CdcFileSource.Name)
        .option("path", in).load()
        .writeStream.option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$root/out"); (): Unit
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // consume both segments, checkpoint records boundary name
    // a late writer drops a name that sorts BEFORE the consumed range —
    // positional offsets would silently remap; we must refuse instead
    writeSegment(in, "seg-000.json", Seq(ev(9)))
    writeSegment(in, "seg-102.json", Seq(ev(3)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](run())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("refusing to remap")))
    // nothing was duplicated or skipped before the failure
    assert(spark.read.parquet(s"$root/out").count() === 2)
  }

  test("DSv2 source: composes with the envelope pipeline transforms") {
    val root = Files.createTempDirectory("graft-dsv2-pipe").toString
    val in = s"$root/wal"; Files.createDirectories(Paths.get(in))
    writeSegment(in, "seg-000.json",
      Seq(ev(1), ev(2, table = "orders"), ev(3, table = "misc")))
    val q = graft.streaming.CdcPipeline.toWire(
        graft.streaming.CdcPipeline.validated(
          spark.readStream.format(CdcFileSource.Name).option("path", in).load()),
        Map("users" -> "t.users", "orders" -> "t.orders"), Some("t.fallback"))
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").partitionBy("topic").parquet(s"$root/out"); (): Unit
      }.start()
    try q.processAllAvailable() finally q.stop()
    val topics = spark.read.parquet(s"$root/out")
      .select("topic").distinct().collect().map(_.getString(0)).toSet
    assert(topics === Set("t.users", "t.orders", "t.fallback"))
  }
}

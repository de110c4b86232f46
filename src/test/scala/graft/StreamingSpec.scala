package graft

import graft.model.ChangeEvent
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.nio.file.Files

/** Streaming-semantics specs mirroring the reference's mux tests
  * (mux/mux_test.go:71-196): batch flush, dedup of replayed events,
  * multi-sink fan-out with commit-after-sink ordering, and replay
  * from checkpoint — the at-least-once contract. */
class StreamingSpec extends SparkSpec {

  private def ev(wal: Long, action: String = "insert", uuid: String = null,
                 table: String = "events", tsMs: Long = 1700000000000L): ChangeEvent =
    ChangeEvent("db1", "graft", table, action, wal,
      new Timestamp(tsMs + wal * 1000), if (uuid == null) s"u-$wal" else uuid,
      Map("k" -> wal.toString))

  test("validated stream drops invalid actions and missing uuids") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = CdcPipeline.validated(in.toDF())
      .writeStream.format("memory").queryName("validated_out")
      .outputMode("append").start()
    try {
      in.addData(ev(1), ev(2, action = "begin"), ev(3, uuid = ""), ev(4, action = "delete"))
      q.processAllAvailable()
      val got = spark.table("validated_out").select("walPosition")
        .collect().map(_.getLong(0)).sorted
      assert(got.sameElements(Array(1L, 4L)))
    } finally q.stop()
  }

  test("observe() counters report events/invalid/missing per batch (M2)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mon = graft.streaming.Monitoring.attach(spark)
    val in = MemoryStream[ChangeEvent]
    val q = CdcPipeline.validated(CdcPipeline.observed(in.toDF()))
      .writeStream.format("noop").queryName("observed_q")
      .outputMode("append").start()
    try {
      in.addData(ev(1), ev(2, action = "begin"), ev(3, uuid = ""),
        ev(4, action = "delete"), ev(5, action = null))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 15000
      while (mon.observedMetrics("observed_q").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = mon.observedMetrics("observed_q")("cdc")
      assert(m("events") === "5")         // all rows seen pre-filter
      assert(m("invalid_action") === "2") // 'begin' marker + NULL action
      assert(m("missing_uuid") === "1")   // the empty-uuid row
    } finally {
      q.stop()
      spark.streams.removeListener(mon)
    }
  }

  test("watermarked dedup collapses an at-least-once replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = CdcPipeline.deduped(in.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(ev(1), ev(2))
      q.processAllAvailable()
      in.addData(ev(1), ev(2), ev(3)) // replayed batch + one new event
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("uuid").collect().map(_.getString(0))
      assert(got.length === 3 && got.toSet === Set("u-1", "u-2", "u-3"))
    } finally q.stop()
  }

  test("windowed counts aggregate per (window, table, action)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = CdcPipeline.windowedCounts(in.toDF(), window = "1 minute")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      in.addData(ev(1), ev(2), ev(61), ev(62, action = "delete"))
      q.processAllAvailable()
      val got = spark.table("win_out").collect()
      // events 1,2 land in one minute-window; 61,62 in a later one,
      // split by action → 3 groups
      assert(got.length === 3)
      assert(got.map(_.getAs[Long]("n")).sum === 4)
    } finally q.stop()
  }

  test("muxFanout writes every sink before the epoch commits; replay dedups") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-stream").toString
    val in = MemoryStream[ChangeEvent]
    val wire = CdcPipeline.toWire(CdcPipeline.validated(in.toDF()),
      Map("events" -> "topic.events"), fallback = Some("topic.default"))
    var sinkACalls = 0
    // data must exist BEFORE start: AvailableNow snapshots offsets at
    // query start, so later addData would be invisible to this run
    in.addData(ev(1), ev(2, table = "other"))
    val q = CdcPipeline.muxFanout(wire, Seq(
        "a" -> { b => sinkACalls += 1; b.write.mode("append").parquet(s"$tmp/a") },
        "b" -> { b => b.write.mode("append").parquet(s"$tmp/b") }),
      checkpoint = s"$tmp/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(60000), "stream did not finish in time")
      val a = spark.read.parquet(s"$tmp/a")
      val b = spark.read.parquet(s"$tmp/b")
      // both sinks saw the same single batch (fan-out reads source once)
      assert(a.count() === 2 && b.count() === 2)
      assert(sinkACalls >= 1)
      // routing: known table → mapped topic, unknown → fallback
      val topics = a.select("topic").collect().map(_.getString(0)).toSet
      assert(topics === Set("topic.events", "topic.default"))
      // wire value is the full JSON envelope
      val v = a.filter(col("topic") === "topic.events")
        .select(get_json_object(col("value"), "$.uuid")).head().getString(0)
      assert(v === "u-1")
    } finally q.stop()
  }

  test("snapshot maintenance applies insert/update/delete; replay is a no-op") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-snap").toString
    val state = s"$tmp/state"
    def evk(wal: Long, action: String, key: String, v: String): ChangeEvent =
      ChangeEvent("db1", "graft", "users", action, wal,
        new Timestamp(1700000000000L + wal * 1000), s"u-$wal",
        Map("user_id" -> key, "v" -> v))
    val in = MemoryStream[ChangeEvent]
    in.addData(
      evk(1, "insert", "a", "a1"), evk(2, "insert", "b", "b1"),
      evk(3, "update", "a", "a2"), evk(4, "delete", "b", "-"),
      evk(5, "insert", "c", "c1"))
    val q = CdcPipeline.validated(in.toDF()).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        CdcPipeline.snapshotSink(state, "user_id")(b, id) }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(60000)) finally q.stop()
    val view = CdcPipeline.snapshotView(spark, state)
      .select(col("key"), col("walPosition"), element_at(col("columns"), "v").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // 'a' at its update, 'b' deleted (tombstone hidden), 'c' present
    assert(view.toSeq === Seq(("a", 3L, "a2"), ("c", 5L, "c1")))
    // tombstone retained in state (idempotence under replayed updates)
    assert(CdcPipeline.snapshotState(spark, state)
      .filter(col("action") === "delete").count() === 1)

    // at-least-once replay: re-apply the whole stream as one batch —
    // the per-key max-WAL merge must leave the state unchanged
    val replay = Seq(
      evk(1, "insert", "a", "a1"), evk(2, "insert", "b", "b1"),
      evk(3, "update", "a", "a2"), evk(4, "delete", "b", "-"),
      evk(5, "insert", "c", "c1")).toDF()
    CdcPipeline.snapshotSink(state, "user_id")(replay, 99L)
    val after = CdcPipeline.snapshotView(spark, state)
      .select("key", "walPosition").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(after.toSeq === Seq(("a", 3L), ("c", 5L)))

    // crash window: cur moved to .prev, tmp move lost → state recovers
    import java.nio.file.{Files => JF, Paths}
    JF.move(Paths.get(state), Paths.get(state + ".prev-tmp"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(state + ".prev"))
    JF.move(Paths.get(state + ".prev-tmp"), Paths.get(state + ".prev"))
    assert(CdcPipeline.snapshotView(spark, state).count() === 2)
  }

  test("trending view: per-window top-k over streaming windowed counts via foreachBatch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val latest = new java.util.concurrent.atomic.AtomicReference[Array[org.apache.spark.sql.Row]](Array.empty)
    val q = CdcPipeline.windowedCounts(in.toDF(), window = "1 minute")
      .writeStream
      .outputMode("complete")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        latest.set(CdcPipeline.topPerWindow(b, k = 2).collect())
        (): Unit
      }.start()
    try {
      // window 1: events×3 inserts, orders×2 inserts, audit×1 delete →
      // top-2 = events, orders (audit cut); window 2: one orders insert
      in.addData(ev(1), ev(2), ev(3),
        ev(4, table = "orders"), ev(5, table = "orders"),
        ev(6, table = "audit", action = "delete"),
        ev(61, table = "orders"))
      q.processAllAvailable()
      val got = latest.get()
      val w1 = got
        .sortBy(r => (r.getAs[java.sql.Timestamp]("window_start").getTime, r.getAs[Int]("rank")))
      assert(w1.length === 3, s"expected 2 ranked rows in w1 + 1 in w2, got ${w1.toSeq}")
      assert(w1(0).getAs[String]("table") === "events")
      assert(w1(0).getAs[Long]("n") === 3L)
      assert(w1(1).getAs[Long]("n") === 2L && w1(1).getAs[String]("table") === "orders")
      assert(w1(2).getAs[Long]("n") === 1L && w1(2).getAs[String]("table") === "orders")
    } finally q.stop()
  }

  test("scd2Pipeline end-to-end: JSON segment files -> validated -> versioned history") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-scd2e2e").toString
    val inDir = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    def evj(wal: Long, action: String, key: String, v: String): ChangeEvent =
      ChangeEvent("h", "db", "users", action, wal,
        new Timestamp(1700000000000L + wal * 1000), s"u-$wal",
        Map("user_id" -> key, "v" -> v))
    // includes a transaction marker the validation stage must drop
    Seq(evj(1, "insert", "a", "a1"), evj(2, "update", "a", "a2"),
      evj(3, "begin", "x", "-"))
      .toDF().coalesce(1).write.mode("overwrite").json(inDir)
    val q = CdcPipeline.scd2Pipeline(spark, inDir,
      s"$root/state", s"$root/ckpt", "user_id")
    try q.processAllAvailable() finally q.stop()
    val hist = CdcPipeline.scd2History(spark, s"$root/state")
      .select(col("key"), col("version"), col("action"), col("walPosition"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(hist.toSeq === Seq(("a", 1, "insert", 1L), ("a", 2, "update", 2L)))
  }

  test("flagship pipeline end-to-end: segments -> validate -> dedup -> route -> topic parquet") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-flagship").toString
    val inDir = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    // a valid event, a replayed duplicate (same uuid), an invalid
    // marker, and an unmapped table for the fallback topic
    Seq(ev(1), ev(1), ev(2, action = "begin"), ev(3, table = "misc"))
      .toDF().coalesce(1).write.mode("overwrite").json(inDir)
    val q = CdcPipeline.pipeline(spark, inDir, s"$root/out", s"$root/ckpt",
      mapping = Map("events" -> "topic.events"))
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$root/out")
    val byTopic = out.collect()
      .groupBy(_.getAs[String]("topic")).view.mapValues(_.length).toMap
    // duplicate collapsed, marker dropped, fallback routed
    assert(byTopic === Map("topic.events" -> 1, "topic.default" -> 1))
  }

  test("snapshotPipeline end-to-end: JSON segment files -> validated -> live snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-snape2e").toString
    val inDir = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    def evj(wal: Long, action: String, key: String, v: String): ChangeEvent =
      ChangeEvent("h", "db", "users", action, wal,
        new Timestamp(1700000000000L + wal * 1000), s"u-$wal",
        Map("user_id" -> key, "v" -> v))
    Seq(evj(1, "insert", "a", "a1"), evj(2, "insert", "b", "b1"),
      evj(3, "update", "a", "a2"), evj(4, "delete", "b", "-"))
      .toDF().coalesce(1).write.mode("overwrite").json(inDir)
    val q = CdcPipeline.snapshotPipeline(spark, inDir,
      s"$root/state", s"$root/ckpt", "user_id")
    try q.processAllAvailable() finally q.stop()
    val view = CdcPipeline.snapshotView(spark, s"$root/state")
      .select(col("key"), element_at(col("columns"), "v").as("v"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(view.toSeq === Seq(("a", "a2"))) // b deleted, a at latest image
  }

  test("streaming SCD2: version history accrues across restart; replay is a no-op") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-scd2").toString
    val state = s"$tmp/state"
    def evk(wal: Long, action: String, key: String, v: String): ChangeEvent =
      ChangeEvent("db1", "graft", "users", action, wal,
        new Timestamp(1700000000000L + wal * 1000), s"u-$wal",
        Map("user_id" -> key, "v" -> v))
    val in = MemoryStream[ChangeEvent]
    def start() = CdcPipeline.validated(in.toDF()).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        CdcPipeline.scd2Sink(state, "user_id")(b, id) }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    // run 1: a's first two versions + b's insert
    in.addData(evk(1, "insert", "a", "a1"), evk(2, "insert", "b", "b1"),
      evk(3, "update", "a", "a2"))
    val q1 = start()
    try assert(q1.awaitTermination(60000)) finally q1.stop()
    // restart from the same checkpoint: only the NEW changes apply, and
    // they EXTEND the version chains instead of overwriting current
    in.addData(evk(4, "delete", "b", "-"), evk(5, "update", "a", "a3"))
    val q2 = start()
    try assert(q2.awaitTermination(60000)) finally q2.stop()
    def history() = CdcPipeline.scd2History(spark, state)
      .select(col("key"), col("version"), col("action"), col("walPosition"),
        col("valid_from_s"), col("valid_to_s"), col("is_current"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5), r.getInt(6)))
      .sortBy(t => (t._1, t._2)).toSeq
    val expected = Seq(
      // a: insert → update → update; each version's window closed by the next
      ("a", 1, "insert", 1L, 1700000001L, 1700000003L, 0),
      ("a", 2, "update", 3L, 1700000003L, 1700000005L, 0),
      ("a", 3, "update", 5L, 1700000005L, -1L, 1),
      // b: insert closed by its delete (the delete emits no row but
      // closes the window → b has no current version)
      ("b", 1, "insert", 2L, 1700000002L, 1700000004L, 0))
    assert(history() === expected)
    // at-least-once replay of the WHOLE stream as one batch: the
    // (key, walPosition) dedup makes the merge a set-union no-op
    val replay = Seq(
      evk(1, "insert", "a", "a1"), evk(2, "insert", "b", "b1"),
      evk(3, "update", "a", "a2"), evk(4, "delete", "b", "-"),
      evk(5, "update", "a", "a3")).toDF()
    CdcPipeline.scd2Sink(state, "user_id")(replay, 99L)
    assert(history() === expected)
    // crash window between the two generation renames → `.prev` serves
    import java.nio.file.{Files => JF, Paths}
    JF.move(Paths.get(state), Paths.get(state + ".prev-tmp"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(state + ".prev"))
    JF.move(Paths.get(state + ".prev-tmp"), Paths.get(state + ".prev"))
    assert(history() === expected)
  }

  test("checkpoint restart does not reprocess committed batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    val in = MemoryStream[ChangeEvent]
    def start(s: MemoryStream[ChangeEvent]) =
      CdcPipeline.muxFanout(
        CdcPipeline.toWire(s.toDF(), Map("events" -> "t.e"), Some("t.d")),
        Seq("p" -> { b => b.write.mode("append").parquet(s"$tmp/out") }),
        checkpoint = s"$tmp/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    // data before start: AvailableNow snapshots offsets at query start
    in.addData(ev(10), ev(11))
    val q1 = start(in)
    assert(q1.awaitTermination(60000), "first run did not finish"); q1.stop()
    assert(spark.read.parquet(s"$tmp/out").count() === 2)
    // restart from the same checkpoint with the same source content:
    // committed offsets are not re-emitted (C1 commit-point semantics)
    val q2 = start(in)
    assert(q2.awaitTermination(60000), "restart did not finish"); q2.stop()
    assert(spark.read.parquet(s"$tmp/out").count() === 2)
  }

  test("sliding windows count each event into window/slide overlapping windows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    // 10-minute window sliding every 5 → every event lands in exactly 2
    val q = CdcPipeline.windowedCounts(in.toDF(), window = "10 minutes",
        slide = Some("5 minutes"))
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try {
      in.addData(ev(1), ev(2), ev(3))
      q.processAllAvailable()
      val got = spark.table("sliding_out").collect()
      assert(got.map(_.getAs[Long]("n")).sum === 6) // 3 events × 2 windows
      assert(got.length === 2) // two overlapping windows, same (table, action)
    } finally q.stop()
  }

  test("idempotent sink: checkpoint rewind replays WITHOUT duplicates") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-idem").toString
    val in = MemoryStream[ChangeEvent]
    def start() =
      CdcPipeline.muxFanoutIdempotent(
        CdcPipeline.toWire(in.toDF(), Map("events" -> "t.e"), Some("t.d")),
        Seq("p" -> graft.streaming.Sinks.idempotentParquet(s"$tmp/out") _),
        checkpoint = s"$tmp/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    in.addData(ev(30), ev(31))
    val q1 = start()
    assert(q1.awaitTermination(60000)); q1.stop()
    assert(spark.read.parquet(s"$tmp/out/batch=0").count() === 2)
    // rewind: wipe the progress store → the same data replays under the
    // SAME epoch ids and overwrites its own directories — exactly-once
    // OUTPUT with zero dedup state (contrast the append-sink rewind
    // test above, where duplicates appear and uuid-dedup must repair)
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$tmp/ckpt")).deleteRecursively()
    val q2 = start()
    assert(q2.awaitTermination(60000)); q2.stop()
    val dirs = new java.io.File(s"$tmp/out").listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs === Set("batch=0"))
    assert(spark.read.parquet(s"$tmp/out/batch=0").count() === 2) // no duplicates
  }

  test("deleting the checkpoint rewinds and replays (C3 walPositionOverride)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-rewind").toString
    val in = MemoryStream[ChangeEvent]
    def start() =
      CdcPipeline.muxFanout(
        CdcPipeline.toWire(in.toDF(), Map("events" -> "t.e"), Some("t.d")),
        Seq("p" -> { b => b.write.mode("append").parquet(s"$tmp/out") }),
        checkpoint = s"$tmp/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    in.addData(ev(20), ev(21))
    val q1 = start()
    assert(q1.awaitTermination(60000)); q1.stop()
    assert(spark.read.parquet(s"$tmp/out").count() === 2)
    // rewind: wipe the progress store (≡ walPositionOverride to 0,
    // postgres.go:131-140) → the source replays from the beginning,
    // at-least-once duplicates appear, and uuid-dedup repairs them
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$tmp/ckpt")).deleteRecursively()
    val q2 = start()
    assert(q2.awaitTermination(60000)); q2.stop()
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() === 4) // replayed: duplicates visible (at-least-once)
    val deduped = out.withColumn("uuid",
      org.apache.spark.sql.functions.get_json_object(
        org.apache.spark.sql.functions.col("value"), "$.uuid"))
      .dropDuplicates("uuid")
    assert(deduped.count() === 2) // idempotent downstream repair
  }
}

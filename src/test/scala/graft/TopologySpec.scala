package graft

import graft.model.ChangeEvent
import graft.streaming.{Monitoring, Retry, Sinks, Topology}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Specs for retry classing (E1), monitoring (M2/M3), and the
  * config-driven topology (M4) — reference behaviors from
  * common/retry_test.go, http.go, config.go. */
class TopologySpec extends SparkSpec {

  test("retry: succeeds after transient failures, counts attempts") {
    var calls = 0
    val (result, attempts) = Retry.retryForever(intervalMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(result === "ok" && attempts === 3)
  }

  test("retry: permanent errors abort immediately") {
    var calls = 0
    val e = intercept[Retry.PermanentException] {
      Retry.retryForever(intervalMs = 1) {
        calls += 1
        throw Retry.permanent("schema mismatch")
      }
    }
    assert(calls === 1 && e.getMessage === "schema mismatch")
  }

  test("retry: bounded attempts rethrow the transient error") {
    var calls = 0
    intercept[RuntimeException] {
      Retry.retryForever(intervalMs = 1, maxAttempts = Some(4)) {
        calls += 1; throw new RuntimeException("still down")
      }
    }
    assert(calls === 4)
  }

  test("config validation rejects unknown source subscriptions") {
    val bad = Topology.Config(
      sources = Seq(Topology.SourceConf("a", "/tmp/x")),
      sinks = Seq(Topology.SinkConf("s", Seq("nope"), Map(), None, Sinks.noop)),
      checkpointRoot = "/tmp/ckpt")
    val err = intercept[IllegalArgumentException](bad.validated)
    assert(err.getMessage.contains("unknown source"))
  }

  test("topology: file source → two subscribed sinks, monitored") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-topo").toString
    val inDir = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    // write one "WAL segment" file of envelope JSON
    val events = Seq(
      ChangeEvent("h", "db", "users", "insert", 1L, new Timestamp(1700000001000L), "u-1", Map("id" -> "1")),
      ChangeEvent("h", "db", "orders", "update", 2L, new Timestamp(1700000002000L), "u-2", Map("id" -> "2")),
      ChangeEvent("h", "db", "misc", "delete", 3L, new Timestamp(1700000003000L), "u-3", Map("id" -> "3")))
    events.toDF().coalesce(1).write.mode("overwrite").json(inDir)

    val mon = Monitoring.attach(spark)
    val cfg = Topology.Config(
      sources = Seq(Topology.SourceConf("src1", inDir, dedupWatermark = None)),
      sinks = Seq(
        Topology.SinkConf("users-topic", Seq("src1"),
          Map("users" -> "t.users", "orders" -> "t.orders"), Some("t.fallback"),
          Sinks.withRetry(Sinks.parquet(s"$root/out1"))),
        Topology.SinkConf("audit", Seq("src1"), Map(), Some("t.audit"),
          Sinks.parquet(s"$root/out2"))),
      checkpointRoot = s"$root/ckpt")
    val queries = Topology.start(spark, cfg)
    try {
      assert(queries.size === 1) // one source → one query, two writers
      queries.foreach(_.processAllAvailable())
      val out1 = spark.read.parquet(s"$root/out1")
      val out2 = spark.read.parquet(s"$root/out2")
      assert(out1.count() === 3 && out2.count() === 3)
      val topics1 = out1.select("topic").distinct().collect().map(_.getString(0)).toSet
      assert(topics1 === Set("t.users", "t.orders", "t.fallback"))
      assert(out2.select("topic").distinct().count() === 1) // all to audit
      // M2: listener saw the rows; M3: healthy status
      val deadline = System.currentTimeMillis() + 15000
      while (mon.rowsProcessed("graft-src1") < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(mon.rowsProcessed("graft-src1") >= 3)
      assert(mon.healthy)
    } finally {
      Topology.stopAll(queries) // graceful: drain final batch, then stop
      assert(queries.forall(!_.isActive))
      spark.streams.removeListener(mon)
    }
  }
}

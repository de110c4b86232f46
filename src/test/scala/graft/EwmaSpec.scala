package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** EWMA gap-fill verification: driver-side fixed-point
  * reimplementation equality, spine density (no missing days), and
  * the one-shuffle plan on event_type. */
class EwmaSpec extends SparkSpec {

  private lazy val daily: Map[(String, Long), Long] =
    Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000L))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("ewma equals a driver-side fixed-point reimplementation with a dense spine") {
    val got = EventOps.qEwmaDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val days = daily.keys.map(_._2)
    val (mind, maxd) = (days.min, days.max)
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    // dense spine: every (type, day) in the global range, exactly once
    assert(got.length === types.length * (maxd - mind + 1).toInt)
    assert(got.map(t => (t._1, t._2)).distinct.length === got.length)
    val byKey = got.map(t => (t._1, t._2) -> t).toMap
    for (t <- types; d <- mind to maxd) {
      val cnt = daily.getOrElse((t, d), 0L)
      val scaled = (0 until 20).map { i =>
        val lagDay = d - i
        val c = if (lagDay < mind) 0L else daily.getOrElse((t, lagDay), 0L)
        c * (1L << (19 - i))
      }.sum
      val (_, _, gc, gs, gr) = byKey((t, d))
      assert(gc === cnt, s"count mismatch at ($t,$d)")
      assert(gs === scaled, s"ewma mismatch at ($t,$d)")
      assert(math.abs(gr - scaled / 1048575.0) < 1e-6)
    }
    // gap-fill accounting: exactly one zero row per (type, day) the
    // raw stream is missing inside the global range
    val spineSize = types.length * (maxd - mind + 1).toInt
    assert(got.count(_._3 == 0L) === spineSize - daily.size)
  }

  test("ewma plan: one data shuffle, on event_type") {
    val p = EventOps.qEwmaDaily(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val parts = p.linesIterator
      .filter(_.startsWith("Arguments: "))
      .filter(_.contains("hashpartitioning(")).toSeq
    // (type,day) count agg + the event_type window + the spine's
    // distinct-types agg — every hash shuffle must key on event_type
    assert(parts.nonEmpty && parts.forall(_.contains("event_type")),
      s"every shuffle must be on event_type, got: $parts")
  }
}

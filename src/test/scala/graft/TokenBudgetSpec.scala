package graft

import graft.operators.SamplingOps
import org.apache.spark.sql.functions._

/** Token-budget selection verification: the histogram/threshold plan
  * must equal the NAIVE definition (global running sum over the
  * quality-sorted corpus), reimplemented driver-side; the fixture must
  * actually exercise the boundary level (a partially-selected level);
  * and only the boundary level may pay a per-document window. */
class TokenBudgetSpec extends SparkSpec {

  private lazy val docs: Array[(Long, Int, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect()
      .map { r =>
        val ts = r.getString(1).split(" ", -1)
        val stop = Set("the", "a", "of", "and", "to")
        val q = math.floor(
          (ts.distinct.length.toDouble / ts.length) *
            (1.0 - ts.count(stop).toDouble / ts.length) * 100).toInt
        (r.getLong(0), q, ts.length.toLong)
      }

  test("token-budget selection equals the naive global-sort definition") {
    val budget = docs.map(_._3).sum / 2
    var cum = 0L
    val want = docs.sortBy { case (id, q, _) => (-q, id) }.map {
      case (id, q, tok) =>
        cum += tok
        (id, q, tok, cum <= budget)
    }.sortBy(_._1)
    val got = SamplingOps.qTokenBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    // the boundary level is PARTIALLY selected — the case the
    // three-way decomposition exists for
    val byLevel = got.groupBy(_._2).view.mapValues(_.map(_._4))
    assert(byLevel.exists { case (_, sel) =>
      sel.contains(true) && sel.contains(false) },
      "fixture must exercise a partially-selected boundary level")
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("token-budget plan: two windows only (level cumulative + boundary), no cartesian") {
    val p = SamplingOps.qTokenBudget(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(400))
    // one ≤101-row level cumulative + one within-boundary-level
    // running sum; a naive plan would sort the whole corpus instead
    assert(p.linesIterator.count(_.trim.startsWith("Window")) <= 2,
      "only the level cumulative and the boundary window may run")
    // the boundary window's input is pre-filtered to the single
    // boundary level (the filter rides below the window)
    assert(p.contains("cum_before"), "boundary classification must be in-plan")
  }
}

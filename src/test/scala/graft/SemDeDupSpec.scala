package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** SemDeDup (cell-partitioned semantic dedup) verification: full
  * driver-side reimplementation — seed-cell assignment by cosine
  * argmax (sequential-fold doubles, the repo-wide dot contract),
  * within-cell pair threshold, greedy keep-lowest-id — plus the plan
  * discipline that makes the operator scale (the pair join must be an
  * EQUI-join on the cell id, never a corpus cross join). */
class SemDeDupSpec extends SparkSpec {

  private val Theta = 0.4
  private val K = 8

  private lazy val raw: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Left-to-right sequential fold — same accumulation order as
    * graft.functions.DotProduct and DuckDB's list_dot_product. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("semdedup equals a driver-side reimplementation on every vector") {
    val cents = raw.filter(_._1 < K).sortBy(_._1)
    val cell: Map[Long, Int] = raw.map { case (id, v) =>
      // argmax cosine, tie-break lowest cid (row_number order)
      id -> cents.map { case (cid, cv) => (cid.toInt, cos(v, cv)) }
        .minBy { case (cid, c) => (-c, cid) }._1
    }.toMap
    val byId = raw.toMap
    val want = raw.map { case (id, v) =>
      val nCloseEarlier = raw.count { case (a, av) =>
        a < id && cell(a) == cell(id) && cos(av, v) >= Theta }
      (id, cell(id), nCloseEarlier == 0, nCloseEarlier.toLong)
    }.sortBy(_._1)
    val got = DedupOps.qSemDeDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getLong(3)))
    assert(got.length === raw.length, "one verdict per vector")
    assert(got.toSeq === want.toSeq)
    assert(byId.nonEmpty)
    // the fixture exercises both verdicts
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("semdedup plan: cell-equi pair join, no corpus cartesian") {
    val p = DedupOps.qSemDeDup(spark, sf).queryExecution.executedPlan.toString
    // the only nested-loop allowed is the deliberate K-row centroid
    // broadcast (the IVF quantizer shape); the PAIR join must be a
    // hash or merge EQUI-join keyed on the cell id
    assert(!p.contains("CartesianProduct"), p.take(400))
    // the assignment relation is referenced three times (pair left,
    // pair right, verdict left), so the deliberate K-row centroid
    // broadcast appears up to three times — but nothing else may
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 3,
      "only the centroid broadcast may be nested-loop")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "pair join must be an equi-join")
  }
}

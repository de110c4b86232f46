package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Random-projection and truncation-recall specs: both verified
  * against full driver-side reimplementations from the raw parquet
  * (MD5-derived sign matrix, exact integer signed sums; sequential-
  * fold cosines with the id tie-break), plus the plan shapes that make
  * them scale (RP map-only, recall's verdict join equi). */
class ProjectionSpec extends SparkSpec {

  private lazy val raw: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("random projection equals a driver-side MD5-sign reimplementation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(k: Int, j: Int): Long = {
      val h = md.digest(s"rp_${k}_$j".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) <= 7) 1L else -1L
    }
    val want = raw.flatMap { case (id, v) =>
      val qv = v.map(x => math.floor(x * 1000000).toLong)
      (0 until 8).map { k =>
        (id, k, (0 until 64).map(j => sign(k, j) * qv(j)).sum)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SimilarityOps.qSimRandomProjection(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.length === raw.length * 8, "8 projected dims per vector")
    assert(got.toSeq === want.toSeq)
  }

  test("random projection plan: literals only — no join, no data shuffle") {
    val df = SimilarityOps.qSimRandomProjection(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"),
      s"the sign matrix must ride as literals, never a join:\n$p")
    val parts = p.linesIterator
      .filter(_.startsWith("Arguments: "))
      .filter(l => l.contains("partitioning(") || l.contains("SinglePartition"))
      .filter(_.contains("partitioning(")).toSeq
    // r16: the presentational output sort is gone — ZERO shuffles
    assert(parts.isEmpty,
      s"projection must not shuffle data, got: $parts")
  }

  test("truncation recall equals a driver-side reimplementation") {
    def top5(vecs: Array[(Long, Array[Double])]): Map[Long, Set[Long]] = {
      val qs = vecs.filter(_._1 < 10)
      qs.map { case (qid, qv) =>
        qid -> vecs.filter(_._1 != qid)
          .map { case (nid, nv) => (nid, cos(qv, nv)) }
          .sortBy { case (nid, c) => (-c, nid) }
          .take(5).map(_._1).toSet
      }.toMap
    }
    val full = top5(raw)
    val trunc = top5(raw.map { case (id, v) => (id, v.take(32)) })
    val want = full.keys.toSeq.sorted.map { q =>
      val ov = (trunc(q) intersect full(q)).size.toLong
      (q, ov, math.rint(ov / 5.0 * 1e6) / 1e6)
    }
    val got = SimilarityOps.qSimTruncationRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want)
    // the fixture is discriminative: some neighbors survive truncation,
    // some don't
    assert(got.exists(_._2 > 0) && got.exists(_._2 < 5))
  }

  test("truncation recall plan: the verdict join is (q_id, n_id) equi") {
    val p = SimilarityOps.qSimTruncationRecall(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(400))
    // only the deliberate query-broadcast brute-force pairings may be
    // nested-loop (the full-width relation is referenced twice: semi
    // right + verdict left); the overlap verdict must be an equi
    // semi-join
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 3,
      "only the query-broadcast pairings may be nested-loop")
    assert(p.contains("LeftSemi"), "overlap must be a semi-join")
  }

  test("embedding drift equals a driver-side recompute; one agg pass, join-free") {
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val dims = raw.head._2.length
    val want = (0 until dims).map { d =>
      val (as, bs) = raw.partition(_._1 % 2 == 0)
      val ma = floorDiv(as.map(_._2(d)).sum, as.length)
      val mb = floorDiv(bs.map(_._2(d)).sum, bs.length)
      (d, ma, mb, math.abs(ma - mb), math.abs(ma - mb) > 10000L)
    }.toSet
    val df = SimilarityOps.qSimEmbeddingDrift(spark, sf)
    val got = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got === want)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), "drift is a single aggregation, no joins")
    // post-execution the adaptive explain appends the pre-AQE "Initial
    // Plan" with its own numbering — audit the FINAL plan only
    val finalPlan = p.split("Initial Plan").head
    val exchanges = finalPlan.linesIterator
      .flatMap("""\((\d+)\) Exchange""".r.findFirstMatchIn(_))
      .map(_.group(1)).toSet
    assert(exchanges.size <= 2, s"one dim shuffle + output sort, got $exchanges")
  }
}

package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Product-quantization specs: the encode and the IVF-ADC search are
  * verified against a full driver-side reimplementation from the raw
  * parquet (codebook construction, integer distances, first-min
  * tie-break, ADC lookup-table sums) — every number is exact Long
  * arithmetic, so equality is bit-for-bit, no tolerance anywhere. */
class PqSpec extends SparkSpec {

  private val M = 8
  private val Sub = 8
  private val K = 8

  /** Quantized vectors straight from parquet, bypassing the operators. */
  private lazy val vecs: Map[Long, Array[Long]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 1000000).cast("long")).as("qv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  /** Codebook rebuilt independently: slice m of vectors 0..K-1. */
  private lazy val cb: Array[Array[Array[Long]]] =
    Array.tabulate(M, K)((m, j) => vecs(j.toLong).slice(m * Sub, (m + 1) * Sub))

  private def subDist(qv: Array[Long], m: Int, c: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < Sub) { val t = qv(m * Sub + i) - c(i); d += t * t; i += 1 }
    d
  }

  private def encode(qv: Array[Long]): (Array[Int], Long) = {
    var err = 0L
    val codes = Array.tabulate(M) { m =>
      var bestJ = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < K) {
        val d = subDist(qv, m, cb(m)(j))
        if (d < bestD) { bestD = d; bestJ = j } // strict < = first-min tie-break
        j += 1
      }
      err += bestD
      bestJ
    }
    (codes, err)
  }

  test("pq encode equals the driver-side reimplementation on every vector") {
    val got = SimilarityOps.qSimPqEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length === vecs.size)
    got.foreach { case (id, csv, sqerr) =>
      val (codes, err) = encode(vecs(id))
      assert(csv === codes.mkString(","), s"codes mismatch for vec $id")
      assert(sqerr === err, s"sqerr mismatch for vec $id")
    }
  }

  test("pq codebook vectors self-encode with zero reconstruction error") {
    val own = SimilarityOps.qSimPqEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._1 < K)
    assert(own.length === K)
    own.foreach { case (id, _, sqerr) =>
      assert(sqerr === 0L, s"codebook vector $id must reconstruct exactly")
    }
  }

  test("pq codes are total, 8 per vector, all in [0, K)") {
    val r = SimilarityOps.qSimPqEncode(spark, sf)
      .withColumn("codes", transform(split(col("codes_csv"), ","), _.cast("int")))
    assert(r.count() === vecs.size)
    assert(r.filter(size(col("codes")) =!= M).count() === 0)
    assert(r.filter(exists(col("codes"), c => c < 0 || c >= K)).count() === 0)
    assert(r.filter(col("sqerr") < 0).count() === 0)
  }

  test("pq codebook is memoized per dataset and deterministic") {
    val a = SimilarityOps.pqCodebook(spark, sf)
    val b = SimilarityOps.pqCodebook(spark, sf)
    assert(a eq b) // same cached instance — one driver fetch per JVM
    assert(a.length === M && a.forall(t => t.length === K &&
      t.forall(_.length === Sub)))
  }

  test("kmeans full iteration equals a driver-side Lloyd reimplementation") {
    // doubles for the cosine seed assignment (same sequential fold
    // order as the engine), exact Longs for everything after
    val dv: Map[Long, Array[Double]] =
      spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val seeds = (0L until K.toLong).map(j => j -> dv(j)).toMap
    val seedOf: Map[Long, Int] = dv.map { case (id, v) =>
      id -> seeds.map { case (j, c) =>
        (j.toInt, dot(v, c) / (nrm(v) * nrm(c))) }
        .minBy { case (j, cos) => (-cos, j) }._1
    }
    // integer M-step means per seed cell, then the exact-L2 E-step
    val byCell = vecs.toSeq.groupBy { case (id, _) => seedOf(id) }
    val cents2: Map[Int, Array[Long]] = byCell.map { case (c, rows) =>
      c -> Array.tabulate(64)(d =>
        math.floor(rows.map(_._2(d)).sum.toDouble / rows.length).toLong)
    }
    def dL(a: Array[Long], c: Array[Long]): Long = {
      var s = 0L
      var i = 0
      while (i < a.length) { val t = a(i) - c(i); s += t * t; i += 1 }
      s
    }
    val reassigned = vecs.toSeq.map { case (id, qv) =>
      val (c, d) = cents2.map { case (cl, cv) => (cl, dL(qv, cv)) }
        .minBy { case (cl, d) => (d, cl) }
      (id, seedOf(id), c, d)
    }
    val want = reassigned.groupBy(_._3).map { case (c, rows) =>
      c -> ((rows.length.toLong,
        rows.count { case (_, s, nc, _) => s != nc }.toLong,
        rows.map(_._4).sum))
    }
    val got = SimilarityOps.qKmeansIter(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    // partition totality + the fixture actually moves some vectors
    assert(got.values.map(_._1).sum === vecs.size.toLong)
    assert(got.values.map(_._2).sum > 0L, "fixture must exercise reassignment")
    // E-step optimality: new inertia never exceeds inertia at the old
    // assignment measured against the same new centroids
    val oldInertia = vecs.toSeq.map { case (id, qv) =>
      dL(qv, cents2(seedOf(id))) }.sum
    assert(got.values.map(_._3).sum <= oldInertia)
  }

  test("ivfpq: reported ADC distances equal the lookup-table math; ranks contiguous") {
    val out = SimilarityOps.qSimIvfPqTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (qid, _, nid, adc) =>
      val (codes, _) = encode(vecs(nid))
      val qv = vecs(qid)
      var want = 0L
      for (m <- 0 until M) want += subDist(qv, m, cb(m)(codes(m)))
      assert(adc === want, s"adc mismatch for ($qid,$nid)")
      assert(adc >= 0L)
    }
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length),
        s"ranks not contiguous for query $qid")
      assert(rows.length <= 3)
    }
  }

  // ---- raw-double side (coarse assignment + exact cosine) for the
  // multiprobe and re-rank twins: sequential left-to-right folds, the
  // same accumulation order as the codegen'd DotProduct kernel ----

  private lazy val raw: Map[Long, Array[Double]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private lazy val norm: Map[Long, Double] =
    raw.map { case (i, v) => i -> math.sqrt(dotD(v, v)) }
  private def cosine(a: Long, b: Long): Double =
    dotD(raw(a), raw(b)) / (norm(a) * norm(b))

  /** Top-`nprobe` coarse cells: cosine DESC, cid tie-break. */
  private def cellsOf(id: Long, nprobe: Int): Seq[Long] =
    (0L until 8L).sortBy(c => (-cosine(id, c), c)).take(nprobe)

  /** ADC distance: M lookups of the query's table at the candidate's
    * codes. */
  private def adcOf(qid: Long, nid: Long): Long = {
    val codes = encode(vecs(nid))._1
    var d = 0L
    for (m <- 0 until M) d += subDist(vecs(qid), m, cb(m)(codes(m)))
    d
  }

  test("ivfpq multiprobe equals the driver recompute; rank-r ADC never worse than single-probe") {
    val got = SimilarityOps.qSimIvfPqMultiprobe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val want = (0L until 10L).flatMap { q =>
      val probed = cellsOf(q, 2).toSet
      val cands = raw.keys.toSeq
        .filter(n => n != q && probed.contains(cellsOf(n, 1).head))
        .map(n => (adcOf(q, n), n)).sorted.take(3)
      cands.zipWithIndex.map { case ((d, n), i) => (q, i + 1, n, d) }
    }
    assert(got.sorted.toSeq === want.sorted, "multiprobe ADC top-k mismatch")
    // widening the probe set can only improve (never worsen) the
    // rank-r ADC distance vs the single-probe search
    val single = SimilarityOps.qSimIvfPqTopkStored(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(3))).toMap
    got.foreach { case (q, rank, _, d) =>
      single.get((q, rank)).foreach(sd =>
        assert(d <= sd, s"multiprobe rank-$rank worse than single-probe for q=$q"))
    }
  }

  test("ivfpq rerank equals the driver recompute: exact cosine over the ADC shortlist") {
    val got = SimilarityOps.qSimIvfPqRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val want = (0L until 10L).flatMap { q =>
      val cell = cellsOf(q, 1).head
      val shortlist = raw.keys.toSeq
        .filter(n => n != q && cellsOf(n, 1).head == cell)
        .map(n => (adcOf(q, n), n)).sorted
        .take(SimilarityOps.RerankShortlist)
      shortlist.map { case (d, n) => (n, d, cosine(q, n)) }
        .sortBy { case (n, _, c) => (-c, n) }.take(3)
        .zipWithIndex.map { case ((n, d, c), i) =>
          (q, i + 1, n, d,
            BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }
    assert(got.sorted.toSeq === want.sorted, "rerank mismatch")
    // re-rank law: the final top-3 is a subset of the ADC shortlist,
    // ordered by exact cosine — so each query's rank-1 cosine is the
    // max over its shortlist
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length))
    }
  }
}

package graft

import graft.operators.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Label-aware curation specs: the noise detector and the hard-negative
  * miner are verified against full driver-side reimplementations from
  * the raw parquet (centroid quantization, exact Long distances, argmin
  * tie-breaks, best-crossing-candidate selection). */
class LabelOpsSpec extends SparkSpec {

  private lazy val raw: Array[(Long, Int, Array[Long])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), transform(col("embedding"),
        x => floor(x.cast("double") * 1000000).cast("long")).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))

  /** Centroids rebuilt independently: floor(Σq/n) per (label, dim). */
  private lazy val cents: Map[Int, Array[Long]] =
    raw.groupBy(_._2).map { case (l, rows) =>
      val n = rows.length
      l -> Array.tabulate(64)(d =>
        math.floor(rows.map(_._3(d)).sum.toDouble / n).toLong)
    }

  private def d2(a: Array[Long], c: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { val t = a(i) - c(i); s += t * t; i += 1 }
    s
  }

  test("label outliers equal a driver-side reimplementation on every vector") {
    val got = SimilarityOps.qSimLabelOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.size === raw.length) // total: one verdict per vector
    raw.foreach { case (id, l, qv) =>
      val dOwn = d2(qv, cents(l))
      val (otherL, dOther) = cents.view.filterKeys(_ != l)
        .map { case (cl, cv) => (cl, d2(qv, cv)) }
        .minBy { case (cl, d) => (d, cl) } // lowest label on distance ties
      assert(got(id) === ((l, dOwn, otherL, dOther, dOwn > dOther)),
        s"mismatch for vec $id")
    }
    // the fixture exercises both verdicts
    assert(got.values.exists(_._5) && got.values.exists(!_._5))
  }

  test("hard negatives: every pair crosses labels and is the best crossing candidate") {
    val labels = raw.map(r => r._1 -> r._2).toMap
    // recompute the mined candidate edge set from the SHARED miner and
    // pick each vector's best different-label neighbor driver-side
    val e = DedupOps.normedVectors(Tables.embeddings(spark, sf))
    val n = DedupOps.annSizingCount(sf, e.count())
    val scored = DedupOps.annScoredPairs(e, knownN = n).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cosine")))
    val best = scored
      .flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .filter { case (a, b, _) => labels(a) != labels(b) }
      .groupBy(_._1)
      .map { case (v, rows) =>
        v -> rows.minBy { case (_, nId, c) => (-c, nId) } }
    val got = SimilarityOps.qSimHardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (v, l, negId, negL, cosR) =>
      assert(l != negL, s"same-label pair emitted for $v")
      assert(labels(v) === l && labels(negId) === negL)
      val (_, wantN, wantC) = best(v)
      assert(negId === wantN, s"not the best crossing candidate for $v")
      assert(math.abs(cosR - wantC) < 2e-6)
    }
    assert(got.map(_._1).toSet === best.keySet,
      "exactly one row per vector that has a crossing candidate")
  }

  test("k-center coreset equals the driver-side greedy maximin recursion") {
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val byId = raw.map(r => r._1 -> r._3).toMap
    var centers = Vector((0L, 0L))
    while (centers.length < 8) {
      val chosen = centers.map(_._1).toSet
      val (id, dm) = byId.toSeq.filterNot(t => chosen(t._1))
        .map { case (v, qv) =>
          (v, centers.map(c => d2(qv, byId(c._1))).min) }
        .maxBy { case (v, d) => (d, -v) }
      centers = centers :+ ((id, dm))
    }
    val got = SimilarityOps.qSimKcenterCoreset(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._2, t._3)).toSeq === centers)
    // the maximin radius is non-increasing after round 1 (adding a
    // center can only shrink every point's nearest-center distance)
    val radii = got.drop(1).map(_._3)
    radii.zip(radii.drop(1)).foreach { case (a, b) => assert(a >= b) }
    assert(got.map(_._2).distinct.length === 8, "centers are distinct")
  }

  test("svm step equals a driver-side exact-integer hinge-subgradient pass") {
    val w = Array.tabulate(64)(d => (d * 2654435761L) % 2001L - 1000L)
    val viol = raw.map { case (_, l, qv) =>
      val y = if (l < 5) 1L else -1L
      val z = qv.zip(w).map { case (a, b) => a * b }.sum
      (y, z, qv)
    }.filter { case (y, z, _) => y * z < 1000000000L }
    val wantGrad = Array.tabulate(64)(d =>
      viol.map { case (y, _, qv) => -y * qv(d) }.sum)
    val wantLoss = viol.map { case (y, z, _) => 1000000000L - y * z }.sum
    val got = SimilarityOps.qSimSvmStep(spark, sf).collect()
    assert(got.length === 64)
    got.foreach { r =>
      val d = r.getAs[Int]("dim")
      assert(r.getAs[Long]("w_d") === w(d))
      assert(r.getAs[Long]("grad_d") === wantGrad(d))
      assert(r.getAs[Long]("n_violators") === viol.length.toLong)
      assert(r.getAs[Long]("hinge_loss_sum") === wantLoss)
    }
    // the margin separates: the fixture must exercise BOTH arms, or
    // the violator filter proves nothing
    assert(viol.length > 0 && viol.length < raw.length)
  }
}

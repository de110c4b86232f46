package graft

import graft.operators.{DedupOps, EventOps, Relational, SimilarityOps}
import org.apache.spark.sql.functions._

/** Semantic invariants for the behavioral-analytics operators and the
  * round-4 dedup/similarity additions. The DuckDB gate checks value
  * equality; these pin the properties that make the answers MEAN the
  * right thing (funnel monotonicity, retention totality, attribution
  * ordering, substring-overlap symmetry bounds, quantization error
  * bounds). */
class EventOpsSpec extends SparkSpec {

  test("funnel stages are monotonically non-increasing") {
    val r = EventOps.qFunnel(spark, sf).collect().head
    val (u1, u2, u3) = (r.getAs[Long]("u_view"),
      r.getAs[Long]("u_click_after_view"),
      r.getAs[Long]("u_purchase_after_click"))
    assert(u1 >= u2 && u2 >= u3)
    assert(u1 > 0) // fixture has views
    val conv = r.getAs[Double]("conv_click")
    assert(conv >= 0.0 && conv <= 1.0)
  }

  test("retention: week 0 covers every user of the cohort's later weeks") {
    val r = EventOps.qRetention(spark, sf)
    // offset-0 row exists for every cohort (a user is active in their
    // own first week by construction)
    val cohorts = r.select("cohort_day").distinct().count()
    val zero = r.filter(col("week_offset") === 0).count()
    assert(zero === cohorts)
    // no cohort week retains more users than its size
    val bad = r.as("a").join(
        r.filter(col("week_offset") === 0)
          .select(col("cohort_day"), col("n_users").as("c0")),
        Seq("cohort_day"))
      .filter(col("n_users") > col("c0"))
    assert(bad.count() === 0)
  }

  test("attribution: touch precedes purchase within the window") {
    val r = EventOps.qAttribution(spark, sf).collect()
    r.foreach { row =>
      val lat = row.getAs[Long]("latency_us")
      assert(lat > 0 && lat <= 3600L * 1000000L)
      // ids are distinct events
      assert(row.getAs[Long]("purchase_id") != row.getAs[Long]("touch_id"))
    }
  }

  test("substring overlap: every pair shares at least one 8-token window") {
    val r = DedupOps.qDedupSubstring(spark, sf).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("a_id") < row.getAs[Long]("b_id"))
      assert(row.getAs[Long]("shared_windows") >= 1)
    }
  }

  test("approx quantiles land within rank tolerance of the exact twin") {
    // quantity is integral 1..50; accuracy 10000 on sf0.001 groups
    // means the sketch answer is an actual element within a hair of
    // the exact rank. The query now emits the per-quantile gate
    // booleans itself (|approx−exact| ≤ 1 + 0.05·exact, hash-matched
    // by the DuckDB oracle); the spec asserts every gate holds.
    val approx = Relational.qApproxQuantiles(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      for (c <- Seq("within_p25", "within_p50", "within_p75", "within_p90"))
        assert(r.getAs[Boolean](c), s"${r.getString(0)}.$c: gate failed")
    }
  }

  test("per-row simhashExpr is bit-identical to the aggregated simhashes()") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val perRow = docs.select(col("doc_id"),
      graft.operators.DedupOps.simhashExpr(col("text")).as("sh_row"))
    val agg = graft.operators.DedupOps.simhashes(docs)
      .withColumnRenamed("simhash", "sh_agg")
    val joined = perRow.join(agg, "doc_id")
    assert(joined.count() === docs.count())
    assert(joined.filter(col("sh_row") =!= col("sh_agg")).count() === 0,
      "HOF-fold and explode-aggregate simhash must agree bit-for-bit")
  }

  test("streaming near-dup filter collapses replays and permutations") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000L
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.StatefulOps.nearDupFiltered(
        in.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "the quick brown fox", new java.sql.Timestamp(t0)),
        (2L, "the quick brown fox", new java.sql.Timestamp(t0 + 1000)), // replay
        (3L, "fox brown quick the", new java.sql.Timestamp(t0 + 2000)), // permuted
        (4L, "completely different text here", new java.sql.Timestamp(t0 + 3000)))
      q.processAllAvailable()
      val got = spark.table("neardup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(got.toSeq === Seq(1L, 4L),
        "first doc per fingerprint survives; replay + permutation collapse")
    } finally q.stop()
  }

  test("rolling active users: DAU <= WAU <= total distinct users, full day coverage") {
    import graft.operators.EventOps
    val wau = EventOps.qRollingActiveUsers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wau.nonEmpty)
    val activity = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dau = activity.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val total = activity.map(_._1).distinct.length.toLong
    // every active day must be reported, and the rolling week dominates
    // the single day while never exceeding the population
    dau.foreach { case (day, n) =>
      assert(wau.contains(day), s"active day $day missing from report")
      assert(wau(day) >= n && wau(day) <= total,
        s"day $day: wau ${wau(day)} outside [dau $n, total $total]")
    }
  }

  test("int8 quantization bounds reconstruction error by half a step") {
    val r = SimilarityOps.qQuantizeInt8(spark, sf)
      .join(Tables.embeddings(spark, sf)
          .select(col("vec_id"),
            (array_max(transform(col("embedding"), _.cast("double"))) -
              array_min(transform(col("embedding"), _.cast("double"))))
              .as("range")),
        Seq("vec_id"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val step = row.getAs[Double]("range") / 255.0
      val maxErr = row.getAs[Double]("max_abs_err_r")
      // affine int8 round-trip error is bounded by scale/2 (+rounding slack)
      assert(maxErr <= step / 2.0 + 1e-6,
        s"vec ${row.getAs[Long]("vec_id")}: maxErr $maxErr > step/2 ${step / 2}")
      assert(row.getAs[Double]("mse_r") <= maxErr * maxErr + 1e-12)
    }
  }

  test("MAD anomalies equal a driver-side lower-median recompute") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val want = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val med = lowerMedian(rows.map(_._3).toSeq)
      val devs = rows.map(r => math.abs(r._3 - med))
      val mad = lowerMedian(devs.toSeq)
      rows.toSeq.map(r => (t, r._2, r._3, med, mad, math.abs(r._3 - med),
        math.abs(r._3 - med) * 10000 > mad * 44478))
    }.toSet
    val got = graft.operators.EventOps.qAnomalyMad(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(got === want)
    // totality: every (type, day) of the rollup is scored exactly once
    assert(got.map(t => (t._1, t._2)) === daily.map(t => (t._1, t._2)).toSet)
  }

  test("rolling median equals a driver-side trailing-frame recompute") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val s = rows.toSeq.sortBy(_._2)
      s.zipWithIndex.map { case ((_, d, c), i) =>
        val win = s.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        (t, d, c, win.length, win((win.length + 1) / 2 - 1))
      }
    }.toSet
    val got = EventOps.qRollingMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4))).toSet
    assert(got === want)
  }

  test("LTV deciles: ordered bands, conserved mass, ppm shares consistent") {
    val ltv = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("value") * 100)
        .cast(org.apache.spark.sql.types.DecimalType(18, 0)).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).sum }
    val total = ltv.values.sum
    val rows = EventOps.qLtvDeciles(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to rows.length))
    assert(rows.map(_._2).sum === ltv.size.toLong)
    assert(rows.map(_._3).sum === total)
    // deciles are ordered bands: decile d's floor >= decile d+1's ceiling
    rows.zip(rows.drop(1)).foreach { case (hi, lo) =>
      assert(hi._4 >= lo._5, s"deciles ${hi._1}/${lo._1} overlap")
    }
    rows.foreach { r => assert(r._6 === r._3 * 1000000L / total) }
    // truncated ppm shares sum to within 10 ppm of one million
    val ppmSum = rows.map(_._6).sum
    assert(ppmSum <= 1000000L && ppmSum >= 1000000L - 10)
  }

  test("cumulative users: first-seen recompute, monotone total, population conserved") {
    val first = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
    val want = first.values.groupBy(identity).map { case (h, v) => h -> v.size.toLong }
    val got = EventOps.qCumulativeUsers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(t => t._1 -> t._2).toMap === want)
    val totals = got.map(_._3)
    assert(totals.zip(totals.drop(1)).forall { case (a, b) => a < b } ||
      totals.length <= 1)
    assert(totals.lastOption.contains(first.size.toLong))
    assert(got.map(_._2).sum === first.size.toLong)
  }

  test("CUSUM via the cumsum-minus-running-min identity equals the sequential recurrence") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    // driver side runs the RECURRENCE S_i = max(0, S_{i-1} + d_i);
    // the query computes the window identity — equality proves it
    val want = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val med = lowerMedian(rows.map(_._3).toSeq)
      var s = 0L
      rows.toSeq.sortBy(_._2).map { case (_, d, c) =>
        s = math.max(0L, s + (c - med - med / 20))
        (t, d, c, med, s, s > med)
      }
    }.toSet
    val got = EventOps.qCusumDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got === want)
  }

  test("event transitions equal a driver-side lag recompute; rows-in = transitions-out") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tus"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._3, r._4)).map(_._2)
      s.zip(s.drop(1))
    }.toSeq
    val counts = trans.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val fromTot = trans.groupBy(_._1).map { case (f, v) => f -> v.size.toLong }
    val want = counts.map { case ((f, t), n) =>
      (f, t, n, fromTot(f), n * 1000000L / fromTot(f))
    }.toSet
    val got = EventOps.qEventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === want)
    // conservation: every user contributes (n_events - 1) transitions
    assert(got.toSeq.map(_._3).sum ===
      ev.groupBy(_._1).values.map(_.length - 1).sum.toLong)
  }

  test("partial-agg merge: merged daily partials equal a direct driver aggregation") {
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), (col("value") * 100)
        .cast(org.apache.spark.sql.types.DecimalType(18, 0)).cast("long").as("c"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = raw.groupBy(_._1).map { case (t, rows) =>
      (t, rows.length.toLong, rows.map(_._2).sum, rows.map(_._2).min,
        rows.map(_._2).max, rows.map(_._3).distinct.length.toLong)
    }.toSet
    val got = EventOps.qPartialAggMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === want)
  }

  test("KMV overlap equals a driver-side sketch recompute; estimator bounds sane") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def h48(u: Long): Long = java.lang.Long.parseLong(md5hex(u.toString).take(12), 16)
    val seg = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val k = 64
    val aU = seg.filter(_._1 == "view").map(_._2).toSet
    val bU = seg.filter(_._1 == "purchase").map(_._2).toSet
    val aSk = aU.toSeq.map(h48).sorted.take(k).toSet
    val bSk = bU.toSeq.map(h48).sorted.take(k).toSet
    val unionK = (aU ++ bU).toSeq.map(u => (h48(u), u)).sorted.take(k)
    val vk = unionK.map(_._1).max
    val c = unionK.count { case (h, _) => aSk.contains(h) && bSk.contains(h) }
    val estUnion = 63L * (1L << 48) / vk
    val estInter = c * estUnion / k
    val r = EventOps.qKmvOverlap(spark, sf).collect().head
    assert(r.getAs[Long]("v_k") === vk)
    assert(r.getAs[Long]("co_members") === c.toLong)
    assert(r.getAs[Long]("est_union") === estUnion)
    assert(r.getAs[Long]("est_inter") === estInter)
    assert(r.getAs[Long]("n_union") === (aU ++ bU).size.toLong)
    assert(r.getAs[Long]("n_inter") === (aU & bU).size.toLong)
    // intersection estimate is bounded by the union estimate
    assert(estInter <= estUnion)
  }
  test("A/B report equals a driver-side Welch recompute; arms partition the purchasers") {
    val r = EventOps.qAbTest(spark, sf).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getBoolean(5))
    val perUser = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0), math.round(x.getDouble(1) * 100)))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).sum }
    def arm(u: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 100 % 2
    }
    val (a, b) = perUser.partition(kv => arm(kv._1) == 0)
    def stats(xs: Iterable[Long]): (Long, Double, Double) = {
      val n = xs.size.toDouble
      val s = xs.map(_.toDouble).sum; val ss = xs.map(x => x.toDouble * x).sum
      (xs.size.toLong, s / n, (n * ss - s * s) / (n * (n - 1)))
    }
    val (na, ma, va) = stats(a.values); val (nb, mb, vb) = stats(b.values)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(got._1 === na && got._2 === nb)
    assert(na + nb === perUser.size.toLong, "arms must partition purchasers")
    assert(math.abs(got._3 - ma / 100) < 1e-4, s"mean_a ${got._3} vs ${ma / 100}")
    assert(math.abs(got._4 - mb / 100) < 1e-4)
    assert(math.abs(got._5 - t) < 1e-4, s"t ${got._5} vs $t")
    assert(got._6 === (math.abs(t) > 1.96))
  }

  test("CUPED equals a driver-side exact-moment recompute; adjustment centers and tightens") {
    val r = EventOps.qAbCuped(spark, sf).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    val cutoff = java.time.Instant.parse("2024-01-16T00:00:00Z")
      .toEpochMilli * 1000L
    val perUser = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(x => (x.getLong(0), math.round(x.getDouble(1) * 100), x.getLong(2)))
      .groupBy(_._1).map { case (u, v) =>
        u -> (v.filter(_._3 < cutoff).map(_._2).sum,
          v.filter(_._3 >= cutoff).map(_._2).sum)
      }
    def arm(u: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 100 % 2
    }
    val (ua, ub) = perUser.partition(kv => arm(kv._1) == 0)
    // exact long moments per arm, double arithmetic only at the end —
    // the same discipline the query encodes in decimals
    def mom(m: Iterable[(Long, Long)]) = {
      val n = m.size.toLong
      (n, m.map(_._1).sum.toDouble, m.map(_._2).sum.toDouble,
        m.map(p => p._1 * p._1).sum.toDouble,
        m.map(p => p._2 * p._2).sum.toDouble,
        m.map(p => p._1 * p._2).sum.toDouble)
    }
    val (na, sxa, sya, sxxa, syya, sxya) = mom(ua.values)
    val (nb, sxb, syb, sxxb, syyb, sxyb) = mom(ub.values)
    val (n, sx, sy, sxx, sxy) =
      (na + nb, sxa + sxb, sya + syb, sxxa + sxxb, sxya + sxyb)
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    def v(ni: Long, s1: Double, s2: Double, s12: Double) =
      (ni * s12 - s1 * s2) / (ni.toDouble * (ni - 1))
    val (vya, vyb) = (v(na, sya, sya, syya), v(nb, syb, syb, syyb))
    val (vxa, vxb) = (v(na, sxa, sxa, sxxa), v(nb, sxb, sxb, sxxb))
    val (cva, cvb) = (v(na, sxa, sya, sxya), v(nb, sxb, syb, sxyb))
    val vyca = vya - 2 * theta * cva + theta * theta * vxa
    val vycb = vyb - 2 * theta * cvb + theta * theta * vxb
    val myca = sya / na - theta * (sxa / na - sx / n)
    val mycb = syb / nb - theta * (sxb / nb - sx / n)
    assert(got._1 === na && got._2 === nb)
    assert(math.abs(got._3 - theta) < 1e-6, s"theta ${got._3} vs $theta")
    assert(math.abs(got._4 - (syb / nb - sya / na) / 100) < 1e-6)
    assert(math.abs(got._5 - (mycb - myca) / 100) < 1e-6)
    val tRaw = (syb / nb - sya / na) / math.sqrt(vya / na + vyb / nb)
    val tCuped = (mycb - myca) / math.sqrt(vyca / na + vycb / nb)
    assert(math.abs(got._6 - tRaw) < 1e-6, s"t_raw ${got._6} vs $tRaw")
    assert(math.abs(got._7 - tCuped) < 1e-6, s"t_cuped ${got._7} vs $tCuped")
    val vr = 1.0 - (vyca + vycb) / (vya + vyb)
    assert(math.abs(got._8 - vr) < 1e-6, s"var_red ${got._8} vs $vr")
    // the CUPED identity: with theta the pooled OLS slope, the
    // adjusted variance can never exceed the raw variance by more
    // than per-arm/pooled slope mismatch — in this fixture pre and
    // post spend correlate positively, so the reduction is real
    assert(got._8 > 0.0 && got._8 < 1.0,
      s"variance reduction out of range: ${got._8}")
    // power companion: same moments, closed-form MDE at the
    // alpha=.05 / 80%-power point — recomputed from the driver-side
    // variances above, plus the internal consistency laws (CUPED MDE
    // strictly tighter; sample multiplier is the variance ratio,
    // i.e. 1/(1 - var_red))
    val pw = EventOps.qAbPower(spark, sf).collect().head
    val zsum = 1.959964 + 0.841621
    assert(pw.getLong(0) === na && pw.getLong(1) === nb)
    val mdeRaw = zsum * math.sqrt(vya / na + vyb / nb) / 100
    val mdeCuped = zsum * math.sqrt(vyca / na + vycb / nb) / 100
    assert(math.abs(pw.getDouble(2) - mdeRaw) < 1e-6,
      s"mde_raw ${pw.getDouble(2)} vs $mdeRaw")
    assert(math.abs(pw.getDouble(3) - mdeCuped) < 1e-6,
      s"mde_cuped ${pw.getDouble(3)} vs $mdeCuped")
    assert(pw.getDouble(3) < pw.getDouble(2),
      "CUPED must tighten the detectable effect")
    assert(math.abs(pw.getDouble(4) - 1.0 / (1.0 - got._8)) < 1e-4,
      "n_mult must be the inverse survival of var_red")
  }

  test("sequential mSPRT equals a driver-side recompute; always-valid p is a running minimum") {
    val rows = EventOps.qAbSequential(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(x => (x.getLong(0), math.round(x.getDouble(1) * 100),
        x.getLong(2) / 86400000000L))
    def arm(u: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 100 % 2
    }
    // per-user cumulative spend at each day boundary (carry-forward)
    val cums: Map[Long, Seq[(Long, Long)]] = ev.groupBy(_._1).map { case (u, v) =>
      val byDay = v.groupBy(_._3).map { case (d, w) => d -> w.map(_._2).sum }
        .toSeq.sortBy(_._1)
      u -> byDay.scanLeft((0L, 0L)) { case ((_, acc), (d, s)) =>
        (d, acc + s) }.drop(1)
    }
    def valueAt(u: Long, d: Long): Option[Long] =
      cums(u).takeWhile(_._1 <= d).lastOption.map(_._2)
    val (mind, maxd) = (ev.map(_._3).min, ev.map(_._3).max)
    val tau2 = 10000.0
    val perDay = (mind to maxd).flatMap { d =>
      val vals = cums.keys.toSeq.flatMap(u => valueAt(u, d).map(m => (arm(u), m)))
      val (a, b) = vals.partition(_._1 == 0)
      if (a.size < 2 || b.size < 2) None
      else {
        def mom(xs: Seq[Long]) = {
          val n = xs.size.toLong
          (n, xs.map(_.toDouble).sum, xs.map(x => x.toDouble * x).sum)
        }
        val (na, sa, ssa) = mom(a.map(_._2)); val (nb, sb, ssb) = mom(b.map(_._2))
        val va = (na * ssa - sa * sa) / (na.toDouble * (na - 1))
        val vb = (nb * ssb - sb * sb) / (nb.toDouble * (nb - 1))
        val delta = sb / nb - sa / na
        val v = va / na + vb / nb
        val llr = 0.5 * math.log(v / (v + tau2)) +
          delta * delta * tau2 / (2.0 * v * (v + tau2))
        Some((d, na, nb, delta, llr))
      }
    }
    assert(rows.map(_._1).toSeq === perDay.map(_._1),
      "readout must cover exactly the days where both arms hold >= 2 users")
    var llrMax = Double.NegativeInfinity
    rows.zip(perDay).foreach { case ((d, na, nb, diff, llr, p, rej), (wd, wna, wnb, wdelta, wllr)) =>
      assert(d === wd && na === wna && nb === wnb)
      assert(math.abs(diff - wdelta / 100) < 1e-6, s"day $d diff $diff vs ${wdelta / 100}")
      assert(math.abs(llr - wllr) < 1e-6, s"day $d llr $llr vs $wllr")
      llrMax = math.max(llrMax, wllr)
      val wp = math.min(1.0, math.exp(-llrMax))
      assert(math.abs(p - wp) < 1e-6, s"day $d p $p vs $wp")
      assert(rej === (p < 0.05), "rejection flag from the rounded p")
    }
    // always-valid laws: p never increases (a peeked rejection stays
    // rejected), and the population only accumulates
    rows.sliding(2).foreach {
      case Array((_, na1, nb1, _, _, p1, _), (_, na2, nb2, _, _, p2, _)) =>
        assert(p2 <= p1 + 1e-12, "always-valid p must be non-increasing")
        assert(na2 + nb2 >= na1 + nb1, "users enter and never leave")
      case _ => ()
    }
  }

  test("SRM check equals a driver-side chi-square recompute; arms partition all users") {
    val r = EventOps.qAbSrm(spark, sf).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
    val users = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getLong(0)).distinct
    def arm(u: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 100 % 2
    }
    val na = users.count(arm(_) == 0).toLong
    val nb = users.count(arm(_) == 1).toLong
    val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
    assert(got._1 === na && got._2 === nb)
    assert(got._1 + got._2 === users.length.toLong, "arms must partition users")
    assert(math.abs(got._3 - chi2) < 1e-6, s"chi2 ${got._3} vs $chi2")
    assert(got._4 === (got._3 > 3.84), "srm flag from the rounded statistic")
  }

  test("winsorized A/B equals a driver-side recompute; cap is the exact pooled p99") {
    // sf0.01: the sf0.001 fixture holds only 15 purchasers, where the
    // p99 rank is the maximum and nothing can cap — the tail this
    // operator exists for needs the 150-purchaser slice
    val sfw = "/root/testdata/sf0.01"
    val r = EventOps.qAbWinsorized(spark, sfw).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5), r.getBoolean(6))
    val perUser = Tables.events(spark, sfw)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(x => (x.getLong(0), math.round(x.getDouble(1) * 100)))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).sum }
    def arm(u: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 100 % 2
    }
    // exact pooled p99: the smallest value whose cumulative count
    // reaches ceil(0.99 n)
    val n = perUser.size.toLong
    val r99 = (99 * n + 99) / 100
    val sortedM = perUser.values.toSeq.sorted
    val cap = sortedM((r99 - 1).toInt)
    val (ua, ub) = perUser.partition(kv => arm(kv._1) == 0)
    def stats(xs: Iterable[Long]): (Long, Double, Double) = {
      val nn = xs.size.toDouble
      val s = xs.map(_.toDouble).sum; val ss = xs.map(x => x.toDouble * x).sum
      (xs.size.toLong, s / nn, (nn * ss - s * s) / (nn * (nn - 1)))
    }
    def t(a: Iterable[Long], b: Iterable[Long]): Double = {
      val (na, ma, va) = stats(a); val (nb, mb, vb) = stats(b)
      (ma - mb) / math.sqrt(va / na + vb / nb)
    }
    val tRaw = t(ua.values, ub.values)
    val tWins = t(ua.values.map(math.min(_, cap)), ub.values.map(math.min(_, cap)))
    val nCapped = perUser.values.count(_ > cap).toLong
    assert(got._1 === ua.size.toLong && got._2 === ub.size.toLong)
    assert(math.abs(got._3 - cap / 100.0) < 1e-6, s"cap ${got._3} vs ${cap / 100.0}")
    assert(got._4 === nCapped)
    assert(nCapped > 0 && nCapped <= n / 100 + 1,
      s"fixture must cap a real (<=1%) tail, got $nCapped of $n")
    assert(math.abs(got._5 - tRaw) < 1e-4, s"t_raw ${got._5} vs $tRaw")
    assert(math.abs(got._6 - tWins) < 1e-4, s"t_wins ${got._6} vs $tWins")
    assert(got._7 === (math.abs(got._6) > 1.96))
    // winsorization must genuinely change the statistic (the tail was
    // doing something), while leaving at least 99% of users untouched
    assert(got._5 !== got._6, "capping must move the t statistic")
  }

  test("seasonal residuals equal a driver-side decomposition recompute; dow means removed exactly") {
    val got = EventOps.qSeasonalResiduals(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val days = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400000000L))
    val (mind, maxd) = (days.map(_._2).min, days.map(_._2).max)
    val cnts = days.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val types = days.map(_._1).distinct
    val filled = for { t <- types; d <- mind to maxd }
      yield (t, d, cnts.getOrElse((t, d), 0L))
    val dowMean = filled.groupBy(r => (r._1, r._2 % 7)).map { case (k, v) =>
      k -> v.map(_._3).sum.toDouble / v.length }
    val resid = filled.map { case (t, d, c) =>
      (t, d, c, c.toDouble - dowMean((t, d % 7))) }
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = resid.groupBy(_._1).toSeq.flatMap { case (_, v) =>
      val n = v.length.toDouble
      val sr = v.map(_._4).sum; val srr = v.map(r => r._4 * r._4).sum
      val sd = math.sqrt((n * srr - sr * sr) / (n * n))
      v.flatMap { case (t, d, c, r) =>
        val z = (r - sr / n) / sd
        if (math.abs(z) >= 2.0) Some((t, d, c, r6(r), r6(z))) else None
      }
    }.toSet
    assert(got.length === want.size)
    got.foreach { case (t, d, c, rr, zr) =>
      val w = want.find(x => x._1 == t && x._2 == d).get
      assert(c === w._3, s"$t/$d cnt")
      assert(math.abs(rr - w._4) < 2e-6, s"$t/$d resid")
      assert(math.abs(zr - w._5) < 2e-6, s"$t/$d z")
    }
    // per (type, dow) the residuals sum to ~0 — the mean removal is
    // exact by construction
    resid.groupBy(r => (r._1, r._2 % 7)).foreach { case (k, v) =>
      assert(math.abs(v.map(_._4).sum) < 1e-6, s"dow mean not removed at $k") }
    assert(got.nonEmpty, "fixture should flag at least one seasonal outlier")
  }

  test("event paths equal a driver-side sessionize+trigram recompute") {
    val got = EventOps.qEventPaths(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // sessionize: 30-min gap within each user's (tus, event_id) order
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      var sid = 0L
      var prev = Long.MinValue
      val withSid = sorted.map { r =>
        if (prev == Long.MinValue || r._4 - prev > 1800000000L) sid += 1
        prev = r._4
        (sid, r._3)
      }
      withSid.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.map(_._2).sliding(3).filter(_.length == 3).map(_.mkString(">"))
      }
    }
    val total = tris.length.toLong
    val want = tris.groupBy(identity).map { case (p0, v) => (p0, v.length.toLong) }
      .toSeq.sortBy { case (p0, n) => (-n, p0) }.take(20).zipWithIndex
      .map { case ((p0, n), i) => (i + 1, p0, n, n * 1000000L / total) }
    assert(got === want)
    // support shares are monotone under the rank order
    got.sliding(2).foreach { w => if (w.length == 2) assert(w(0)._3 >= w(1)._3) }
  }
}


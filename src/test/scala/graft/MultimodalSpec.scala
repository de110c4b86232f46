package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._

/** Specs for the multimodal plumbing: binary payload + metadata layout,
  * stub-codec determinism, frame-sampling arithmetic. */
class MultimodalSpec extends SparkSpec {

  test("media table: every row has a payload, type cycles by doc_id") {
    val m = MultimodalOps.mediaTable(spark, sf)
    assert(m.filter(col("payload").isNull).count() === 0)
    val types = m.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("image", "audio", "video"))
    val wrong = m.filter(
      (col("doc_id") % 3 === 0 && col("media_type") =!= "image") ||
      (col("doc_id") % 3 === 1 && col("media_type") =!= "audio") ||
      (col("doc_id") % 3 === 2 && col("media_type") =!= "video"))
    assert(wrong.count() === 0)
  }

  test("stub codec: histogram mass equals byte count; deterministic") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val (h1, m1) = MultimodalOps.StubCodec.features(bytes)
    val (h2, m2) = MultimodalOps.StubCodec.features(bytes)
    assert(h1.sum === bytes.length)
    assert(h1.sameElements(h2) && m1 === m2)
    assert(m1 > 0 && m1 < 256)
  }

  test("decode features: histogram mass matches n_bytes per row") {
    val r = MultimodalOps.qDecodeFeatures(spark, sf)
      .withColumn("hist", transform(split(col("hist_csv"), ","), _.cast("long")))
      .withColumn("mass", aggregate(col("hist"), lit(0L), (a, x) => a + x))
    assert(r.count() > 0)
    assert(r.filter(col("mass") =!= col("n_bytes")).count() === 0)
    // thumbnails are capped at 16 samples
    assert(r.filter(size(split(col("thumb_csv"), ",")) > 16).count() === 0)
  }

  test("image tiles partition each image exactly") {
    val t = MultimodalOps.qImageTiles(spark, sf)
    assert(t.count() > 0)
    // every tile fits inside the image
    assert(t.filter(col("tile_x") * 64 + col("tile_w") > col("width")).count() === 0)
    assert(t.filter(col("tile_y") * 64 + col("tile_h") > col("height")).count() === 0)
    assert(t.filter(col("tile_w") <= 0 || col("tile_h") <= 0).count() === 0)
    // tile areas sum to the full image area — a perfect partition
    val bad = t.groupBy("doc_id", "width", "height")
      .agg(sum(col("tile_w") * col("tile_h")).as("area"))
      .filter(col("area") =!= col("width") * col("height"))
    assert(bad.count() === 0)
  }

  test("frame sample: offsets are stride-aligned and within payload") {
    val f = MultimodalOps.qFrameSample(spark, sf)
    assert(f.count() > 0)
    assert(f.filter(col("byte_offset") % 256 =!= 0).count() === 0)
    assert(f.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    assert(f.filter(col("frame_idx") >= col("n_frames")).count() === 0)
  }

  test("phash near-dup: pigeonhole join equals a driver-side brute force over all image pairs") {
    // The pigeonhole guarantee is exact for d <= 1 with two 8-bit
    // chunks: recompute every image's DCT pHash from raw payloads in
    // plain Scala, brute-force ALL pairs at Hamming <= 1, and demand
    // the equi-join candidate path found exactly that set —
    // completeness (no missed pair) AND soundness (no phantom pair),
    // stronger than the oracle's agreement-on-the-same-algorithm.
    val docs = MultimodalOps.mediaTable(spark, sf)
      .filter(col("media_type") === "image")
      .select("doc_id", "payload").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
    val hashes = docs.filter(_._2.length >= 64)
      .map { case (id, p) => id -> MultimodalOps.StubCodec.dctHash(p) }
    hashes.foreach { case (id, h) =>
      assert(h >= 0L && h < 65536L, s"phash($id) out of 16-bit range: $h") }
    val brute = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      (ida, ha) = hashes(i); (idb, hb) = hashes(j)
      if java.lang.Long.bitCount(ha ^ hb) <= 1
    } yield {
      val (a, b) = if (ida < idb) (ida, idb) else (idb, ida)
      (a, b, java.lang.Long.bitCount(ha ^ hb))
    }).toSet
    val got = MultimodalOps.qPhashNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("hamming"))).toSet
    assert(got === brute,
      s"missed=${(brute -- got).take(5)} phantom=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must contain near-dup images")
  }

  test("scene cuts equal a driver-side reimplementation; boundaries are per-doc complete") {
    val docs = MultimodalOps.mediaTable(spark, sf)
      .filter(col("media_type") === "video")
      .select("doc_id", "payload").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
    val want = docs.flatMap { case (id, p) =>
      val en = MultimodalOps.StubCodec.frameEnergies(p, 64)
      (1 until en.length).map(f =>
        (id, f, en(f - 1), en(f),
          math.abs(en(f) - en(f - 1)) * 32 > en(f - 1)))
    }.toSet
    val got = MultimodalOps.qSceneCuts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got === want,
      s"missed=${(want -- got).take(3)} phantom=${(got -- want).take(3)}")
    // the fixture exercises both cut and non-cut boundaries
    assert(got.exists(_._5) && got.exists(!_._5))
    // every multi-frame video contributes exactly n_frames-1 boundaries
    val perDoc = got.groupBy(_._1).view.mapValues(_.size).toMap
    docs.foreach { case (id, p) =>
      val nf = p.length / 64
      if (nf >= 2) assert(perDoc(id) === nf - 1, s"boundary gap for $id")
      else assert(!perDoc.contains(id))
    }
  }

  test("audio fingerprint near-dup: pigeonhole join equals a driver-side brute force over all audio pairs") {
    // Same exactness argument as the phash test, for the audio member:
    // recompute every audio doc's 16-bit energy-delta fingerprint in
    // plain Scala, brute-force ALL pairs at Hamming <= 1, demand set
    // equality with the equi-join path.
    val docs = MultimodalOps.mediaTable(spark, sf)
      .filter(col("media_type") === "audio")
      .select("doc_id", "payload").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
    def afp(payload: Array[Byte]): Option[Long] = {
      val en = MultimodalOps.StubCodec.segEnergies(payload, 17)
      if (en.length != 17) None
      else Some((0 until 16).map(i => if (en(i + 1) > en(i)) 1L << i else 0L).sum)
    }
    val hashes = docs.flatMap { case (id, p) => afp(p).map(id -> _) }
    hashes.foreach { case (id, h) =>
      assert(h >= 0L && h < 65536L, s"afp($id) out of 16-bit range: $h") }
    // gain-invariance: a constant byte offset cancels in the deltas
    val sample = docs.collectFirst {
      case (_, p) if p.length >= 17 && p.forall(b => (b & 0xff) < 250) => p }
    sample.foreach { p =>
      val gained = p.map(b => (b + 5).toByte)
      assert(afp(p) === afp(gained), "fingerprint must be gain-invariant")
    }
    val brute = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      (ida, ha) = hashes(i); (idb, hb) = hashes(j)
      if java.lang.Long.bitCount(ha ^ hb) <= 1
    } yield {
      val (a, b) = if (ida < idb) (ida, idb) else (idb, ida)
      (a, b, java.lang.Long.bitCount(ha ^ hb))
    }).toSet
    val got = MultimodalOps.qAudioFingerprintNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("hamming"))).toSet
    assert(got === brute,
      s"missed=${(brute -- got).take(5)} phantom=${(got -- brute).take(5)}")
  }

  test("blur scores equal a driver-side integer-variance recompute") {
    val images = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = images.flatMap { case (id, payload) =>
      val t = MultimodalOps.StubCodec.resize(payload, 16)
      if (t.length < 2) None else {
        val n = t.length.toLong
        val sx = t.map(_.toLong).sum
        val sxx = t.map(x => x.toLong * x).sum
        val lane = n * sxx - sx * sx
        Some((id, t.length, lane, lane < 1000L * n * n))
      }
    }.toSet
    val got = MultimodalOps.qBlurScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === want)
    // the 1000-pixel^2 threshold genuinely splits this corpus's
    // thumbnails — both gate arms are live
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("silence trim equals a driver-side recompute; frame accounting conserves") {
    val audio = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = audio.flatMap { case (id, payload) =>
      val en = MultimodalOps.StubCodec.frameEnergies(payload, 32)
      if (en.isEmpty) None else {
        val total = en.sum
        val nf = en.length
        def silent(e: Long) = 2 * e * nf < total
        val head = en.takeWhile(silent).length
        val tail = en.reverse.takeWhile(silent).length
        Some((id, nf, total, head, tail, nf - head - tail,
          (nf - head - tail).toLong * 32 * 1000 / 16000))
      }
    }.toSet
    val got = MultimodalOps.qSilenceTrim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getLong(6))).toSet
    assert(got === want)
    // the adaptive threshold guarantees a non-empty keep per doc
    got.foreach { case (id, nf, _, h, t, kept, _) =>
      assert(kept >= 1 && h + t + kept === nf, s"doc $id accounting")
    }
  }

  test("cross-modal pairs equal a driver-side brute force; inverted-index join, never all-pairs") {
    val df = MultimodalOps.qCrossmodalPairs(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    // brute force: 3-gram shingle sets, DF<=20 cap, text (%3!=0) ×
    // image (%3==0) Jaccard with the integer 0.1 gate
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def sh(t: String): Set[String] = {
      val ts = t.split(" ", -1)
      (0 to ts.length - 3).map(i => s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}").toSet
    }
    val all = docs.map { case (id, t) => id -> sh(t) }
    val dfCount = all.flatMap(_._2.toSeq).groupBy(identity)
      .map { case (s, v) => s -> v.length }
    val kept = all.map { case (id, s) => id -> s.filter(dfCount(_) <= 20) }
    val want = (for {
      (t, st) <- kept if t % 3 != 0
      (i, si) <- kept if i % 3 == 0
      inter = (st & si).size if inter > 0
      nt = st.size; ni = si.size
      if inter * 10 >= nt + ni - inter
    } yield (t, i, inter.toLong, nt.toLong, ni.toLong,
      BigDecimal(inter.toDouble / (nt + ni - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture should yield cross-modal pairs")
    // modality split is total: a text id never appears as an image id
    got.foreach { case (t, i, _, _, _, j) =>
      assert(t % 3 != 0 && i % 3 == 0 && j >= 0.1 - 1e-9)
    }
    // candidate generation is the shingle equi-join — no all-pairs plan
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cross-modal mining must never plan all-pairs:\n${p.take(300)}")
    spark.catalog.clearCache()
  }

  test("frame-level phash near-dup: pigeonhole join equals a driver-side brute force over all cross-video frame pairs") {
    // same completeness+soundness discipline as the image pHash spec,
    // with the key widened to (video, frame): recompute every frame's
    // DCT hash from raw payload slices, brute-force all CROSS-video
    // frame pairs at Hamming <= 1, and demand set equality.
    val fb = 128
    val docs = MultimodalOps.mediaTable(spark, sf)
      .filter(col("media_type") === "video")
      .select("doc_id", "payload").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
    val frames = docs.flatMap { case (id, p) =>
      (0 until p.length / fb).map { f =>
        (id, f, MultimodalOps.StubCodec.dctHash(
          java.util.Arrays.copyOfRange(p, f * fb, (f + 1) * fb)))
      }
    }
    val brute = (for {
      i <- frames.indices; j <- frames.indices
      (ida, fa, ha) = frames(i); (idb, fbx, hb) = frames(j)
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 1
    } yield (ida, fa, idb, fbx, java.lang.Long.bitCount(ha ^ hb))).toSet
    val df = MultimodalOps.qFramePhashNearDup(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    assert(got === brute,
      s"missed=${(brute -- got).take(5)} phantom=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must contain cross-video near-dup frames")
    // no within-video pair ever leaks through
    assert(got.forall(p => p._1 < p._3), "pairs must be cross-video, ordered")
    // candidates come from the chunk equi-join, never an all-pairs scan
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"frame near-dup must never plan all-pairs:\n${p.take(300)}")
    spark.catalog.clearCache()
  }

  test("video dedup rolls up the frame matches exactly; containment bounded by the shorter side") {
    val fb = 128
    val docs = MultimodalOps.mediaTable(spark, sf)
      .filter(col("media_type") === "video")
      .select("doc_id", "payload").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
    val nf = docs.map { case (id, p) => id -> (p.length / fb).toLong }
      .filter(_._2 > 0).toMap
    val pairs = MultimodalOps.qFramePhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val want = pairs.groupBy(p => (p._1, p._3)).map { case ((a, b), v) =>
      val ma = v.map(_._2).distinct.length.toLong
      val mb = v.map(_._4).distinct.length.toLong
      val m = if (nf(a) <= nf(b)) ma else mb
      (a, b, nf(a), nf(b), m, m * 1000 / math.min(nf(a), nf(b)))
    }.toSet
    val got = MultimodalOps.qVideoDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === want,
      s"missed=${(want -- got).take(3)} phantom=${(got -- want).take(3)}")
    assert(got.nonEmpty, "fixture must contain matched video pairs")
    // containment: counted on the shorter side, bounded by its length
    got.foreach { case (a, b, nfa, nfb, m, pm) =>
      assert(m <= math.min(nfa, nfb), s"($a,$b) matched > frames")
      assert(pm > 0 && pm <= 1000, s"($a,$b) containment $pm out of range")
    }
    spark.catalog.clearCache()
  }
}

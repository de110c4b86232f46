package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` — the idiomatic Spark UDAF extension point
  * (SURVEY.md §2.2 row "UDF/UDAF/UDTF"; the reference's only extension
  * point is its sink handler interface, sink/kafka/kafka.go:20-23).
  *
  * Quantity-weighted average discount, accumulated entirely in integer
  * cents so the partial-merge order (which Spark does not guarantee)
  * cannot perturb the result — the same trick the decimal casts play
  * in the relational layer, applied to a custom aggregate. Partial
  * aggregation (map-side combine) works automatically: `reduce` runs
  * per partition, `merge` combines partials at the exchange.
  */
object WeightedAvgCents extends Aggregator[(Long, Long), (Long, Long), Double] {
  /** (weighted numerator in cents², total weight in cents). */
  override def zero: (Long, Long) = (0L, 0L)

  /** in: (value_cents, weight_cents). */
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  /** Single final double division — the only inexact step, identical
    * on any engine given identical integer sums. */
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) 0.0 else r._1.toDouble / r._2.toDouble / 100.0

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Accumulator state for [[GramMoments]]: `fast` is the hot Long lane,
  * `spill` the exact big-integer lane (decimal strings — encoder-plain,
  * touched only when a Long sum approaches overflow; empty until then). */
case class MomentsBuf(n: Long, fast: Array[Long], spill: Array[String])
/** Finished moments: row count and the exact sums converted to double
  * once (same rounding as a DECIMAL(38,0)-sum → DOUBLE cast). Layout:
  * sums(0..nd-1) = Σx_d; then the upper-triangle products Σx_i·x_j in
  * (i,j)-lexicographic order at nd + i·nd − i(i−1)/2 + (j−i). */
case class MomentsOut(n: Long, sums: Seq[Double])

/** One-pass EXACT Gram/moment accumulator over quantized (integer)
  * vectors: Σx_d for every dimension plus Σx_i·x_j for every
  * upper-triangle dimension pair, in a single typed aggregation. The
  * alternative — exploding nd(nd+1)/2 product structs per row into a
  * hash aggregate — shuffles and hash-probes dims²/2 rows per input
  * row; this buffer does the same arithmetic in a flat Long array and
  * ships ONE buffer per partition to the merge. Exactness discipline:
  * per-row products are `multiplyExact` (true overflow FAILS loudly
  * rather than wrapping), and a sum whose magnitude nears Long range
  * moves its accumulated value into the big-integer spill lane —
  * amortized one BigInt op per ~4.6e18/|product| rows, zero on
  * test-scale data, exact at any corpus size. */
final case class GramMoments(nd: Int) extends Aggregator[Array[Long], MomentsBuf, MomentsOut] {
  require(nd > 0, s"GramMoments requires nd > 0, got $nd")
  private val width = nd + nd * (nd + 1) / 2
  // spill once |fast| could overflow on the next add of a similarly
  // sized term: conservative half-range guard
  private val Guard = Long.MaxValue / 2

  override def zero: MomentsBuf = MomentsBuf(0L, new Array[Long](width), Array.empty)

  private def withSpill(b: MomentsBuf): MomentsBuf =
    if (b.spill.nonEmpty) b else b.copy(spill = Array.fill(width)("0"))

  /** Adds `p` into slot `idx`, spilling to the exact lane on guard. */
  private def add(b0: MomentsBuf, idx: Int, p: Long): MomentsBuf =
    if (math.abs(b0.fast(idx)) > Guard || math.abs(p) > Guard) {
      val b = withSpill(b0)
      b.spill(idx) = (BigInt(b.spill(idx)) + BigInt(b.fast(idx)) + BigInt(p)).toString
      b.fast(idx) = 0L
      b
    } else { b0.fast(idx) += p; b0 }

  override def reduce(b0: MomentsBuf, a: Array[Long]): MomentsBuf = {
    require(a.length == nd, s"expected $nd dims, got ${a.length}")
    var b = b0.copy(n = b0.n + 1)
    var i = 0
    var base = nd
    while (i < nd) {
      b = add(b, i, a(i))
      var j = i
      while (j < nd) {
        b = add(b, base + (j - i), Math.multiplyExact(a(i), a(j)))
        j += 1
      }
      base += nd - i
      i += 1
    }
    b
  }

  override def merge(x: MomentsBuf, y: MomentsBuf): MomentsBuf = {
    var b = x.copy(n = x.n + y.n)
    var i = 0
    while (i < width) { b = add(b, i, y.fast(i)); i += 1 }
    if (y.spill.nonEmpty) {
      b = withSpill(b)
      var k = 0
      while (k < width) {
        b.spill(k) = (BigInt(b.spill(k)) + BigInt(y.spill(k))).toString
        k += 1
      }
    }
    b
  }

  override def finish(r: MomentsBuf): MomentsOut = {
    val out = new Array[Double](width)
    var i = 0
    while (i < width) {
      out(i) =
        if (r.spill.isEmpty) BigDecimal(r.fast(i)).toDouble
        else BigDecimal(BigInt(r.spill(i)) + BigInt(r.fast(i))).toDouble
      i += 1
    }
    MomentsOut(r.n, scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }

  override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
  override def outputEncoder: Encoder[MomentsOut] = Encoders.product[MomentsOut]
}

/** Count-min sketch buffer: `rows` is the flattened depth×width count
  * matrix. */
case class CmBuf(rows: Array[Long])

/** COUNT-MIN SKETCH over a token stream — the fixed-memory frequency
  * summary a 100 TB vocabulary pass keeps when exact per-token counts
  * don't fit (heavy-hitter monitoring, vocab capping, drift alarms).
  * depth×width Long matrix; each token increments one cell per row
  * (independent hash per row), point estimate = min over rows. The
  * merge is elementwise integer addition — commutative/associative/
  * exact, so ANY partition split yields the identical sketch
  * (ScalaCheck'd in CountMinLaws) and estimates are replay-stable:
  * the hashes are pure functions of the token (MurmurHash3 with fixed
  * per-row seeds), no RNG anywhere. Guarantees: estimate ≥ true count
  * always (one-sided); overcount bounded by collision mass ~N/width
  * per row, minimized over `depth` rows. */
final case class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, CmBuf, CmBuf] {
  require(depth >= 1 && width >= 1, "depth and width must be positive")

  def cell(row: Int, token: String): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(token, 0x9747b28c + row)
    math.floorMod(h, width)
  }

  override def zero: CmBuf = CmBuf(new Array[Long](depth * width))

  override def reduce(b: CmBuf, token: String): CmBuf = {
    var r = 0
    while (r < depth) { b.rows(r * width + cell(r, token)) += 1L; r += 1 }
    b
  }

  override def merge(x: CmBuf, y: CmBuf): CmBuf = {
    var i = 0
    while (i < x.rows.length) { x.rows(i) += y.rows(i); i += 1 }
    x
  }

  override def finish(r: CmBuf): CmBuf = r

  /** Point estimate for `token` from a finished sketch. */
  def estimate(sketch: CmBuf, token: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      best = math.min(best, sketch.rows(r * width + cell(r, token)))
      r += 1
    }
    best
  }

  override def bufferEncoder: Encoder[CmBuf] = Encoders.product[CmBuf]
  override def outputEncoder: Encoder[CmBuf] = Encoders.product[CmBuf]
}

/** One (value, id) entry of a bounded top-k buffer. */
case class TopKEntry(v: Double, id: Long)
/** The bounded buffer — a case-class wrapper so both the buffer and
  * the output ride plain product encoders (no kryo, no reflection). */
case class TopKBuf(items: Seq[TopKEntry])

/** Bounded-heap per-group TOP-K as a typed Aggregator — the reason to
  * prefer a custom aggregate over the window row_number pattern at
  * 100 TB: `reduce` runs BEFORE the exchange (map-side partial
  * aggregation), so each partition ships at most k rows PER KEY into
  * the shuffle, while the window variant must shuffle and sort every
  * row of every group before any rank can be filtered. Order is
  * (value desc, id asc) — fully tie-broken, so results are
  * deterministic and engine-comparable. The buffer is a k-bounded
  * sorted vector: inserts are O(k), fine for the small k this
  * pattern exists for (top-3 orders, top-10 neighbors, ...).
  *
  * Input is keyed rows (key, value, id); the key itself is carried by
  * `groupByKey`, not the buffer. */
final case class TopKByValue(k: Int)
    extends Aggregator[(Long, Double, Long), TopKBuf, TopKBuf] {
  // k=0 would otherwise surface as a NoSuchElementException deep inside
  // reduce (items.last on an empty bounded buffer) — fail at construction
  require(k > 0, s"TopKByValue requires k > 0, got $k")

  private def before(a: TopKEntry, b: TopKEntry): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, row: (Long, Double, Long)): TopKBuf = {
    val e = TopKEntry(row._2, row._3)
    if (b.items.size >= k && before(b.items.last, e)) b
    else TopKBuf((b.items :+ e).sortWith(before).take(k))
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf((x.items ++ y.items).sortWith(before).take(k))

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

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

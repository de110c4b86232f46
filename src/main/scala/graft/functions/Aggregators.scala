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

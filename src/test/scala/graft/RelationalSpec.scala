package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Invariant specs for the relational layer. Exact value parity is the
  * driver's DuckDB gate (tools/compare.py); these specs pin structural
  * properties that survive data refreshes. */
class RelationalSpec extends SparkSpec {

  test("q1 pricing summary: grouped rows, non-negative sums, avg within bounds") {
    val r = Relational.q1PricingSummary(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 8) // |returnflag| x |linestatus|
    r.foreach { row =>
      assert(row.getAs[Double]("sum_qty") >= 0)
      assert(row.getAs[Long]("count_order") > 0)
    }
  }

  test("top-k per group emits at most k rows per group, ranked contiguously") {
    val df = Relational.qTopKPerGroup(spark, sf)
    val ranks = df.groupBy(col("o_custkey"))
      .agg(max(col("rn")).as("mx"), count(lit(1)).as("n"))
    assert(ranks.filter(col("mx") =!= col("n")).count() === 0) // ranks 1..n
    assert(ranks.filter(col("n") > 3).count() === 0)
  }

  test("anti join returns exactly the customers without a large order") {
    val r = Relational.qAntiJoin(spark, sf)
    val large = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000).select(col("o_custkey"))
    assert(r.join(large, r("c_custkey") === large("o_custkey"), "inner").count() === 0)
    // complement check: result + excluded = all customers
    val excluded = Tables.customer(spark, sf)
      .join(large, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").distinct().count()
    assert(r.count() + excluded === Tables.customer(spark, sf).count())
  }

  test("rollup has strictly more rows than plain groupBy (subtotal levels)") {
    val rollup = Relational.qRollup(spark, sf).count()
    val plain = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus").count().count()
    assert(rollup > plain)
  }

  test("as-of join picks the latest order at-or-before each event") {
    // every joined order date must be <= the event date; spot check
    val r = Relational.qAsofJoin(spark, sf)
    assert(r.count() > 0)
  }

  test("set ops: union >= intersect, except disjoint from intersect") {
    val df = Relational.qSetOps(spark, sf)
    val byOp = df.groupBy(col("op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp.getOrElse("union", 0L) >= byOp.getOrElse("intersect", 0L))
  }

  test("approx distinct stays within 3x rsd of the exact count per group") {
    // HLL++ default rsd is 5% — a STANDARD DEVIATION, not a bound
    // (observed 5.5% on one sf0.001 group); 3σ = 15% is the practical
    // envelope. The query now emits the gate boolean itself (so the
    // DuckDB oracle can hash-match it); the spec asserts it holds.
    val rows = Relational.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_orders") > 0)
      assert(r.getAs[Boolean]("within_eps"),
        s"${r.getString(0)}: approx distinct out of 3-sigma bound")
    }
  }

  test("dq report: seven rules, consistent arithmetic, clean fixture passes") {
    val rows = Relational.qDqReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length === 7)
    val nLi = Tables.lineitem(spark, sf).count()
    rows.foreach { case (rule, checked, v, ppm, pass) =>
      assert(checked === nLi, s"$rule checked count")
      assert(ppm === v * 1000000L / checked, s"$rule ppm")
      assert(pass === (v == 0L), s"$rule pass flag")
      assert(v >= 0 && v <= checked)
    }
    // the fixture is clean on referential/domain/completeness rules but
    // REALLY violates the ship-after-order invariant (the generator
    // draws dates independently) — so both arms of `pass` are exercised
    val byRule = rows.map(r => r._1 -> r).toMap
    for (clean <- Seq("referential_orderkey", "domain_quantity_positive",
        "domain_price_positive", "domain_discount_unit_interval",
        "domain_tax_nonnegative", "complete_returnflag"))
      assert(byRule(clean)._5, s"$clean should pass on the fixture")
    val early = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).count()
    assert(early > 0, "fixture must exercise the failing arm")
    assert(byRule("order_ship_after_orderdate")._3 === early)
    assert(!byRule("order_ship_after_orderdate")._5)
  }

  test("skew report equals a driver-side recompute; salt factor is the exact ceiling") {
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val (nKeys, maxN) = (counts.length.toLong, counts.map(_._2).max)
    val salt = (maxN * nKeys + total - 1) / total
    val want = counts.sortBy(t => (-t._2, t._1)).take(10).zipWithIndex
      .map { case ((k, n), i) =>
        (i + 1, k, n, n * 1000000L / total, nKeys, maxN, salt) }.toSeq
    val got = Relational.qSkewReport(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === want)
    // the ceiling really is a ceiling: salt ≥ max/avg and (salt−1) < max/avg
    assert(salt * total >= maxN * nKeys && (salt - 1) * total < maxN * nKeys)
  }

  test("skyline equals the O(n^2) dominance definition; sweep plan has no self-join") {
    val pts = Tables.lineitem(spark, sf)
      .select((col("l_extendedprice") * 100)
          .cast(org.apache.spark.sql.types.DecimalType(18, 0)).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // definition: p is on the skyline iff no q dominates it
    // (q <= p on both, < on at least one)
    val want = pts.distinct.filter { case (x, y) =>
      !pts.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y) }
    }.sortBy(_._1).zipWithIndex
      .map { case ((x, y), i) => (i + 1, x, y) }.toSet
    val df = Relational.qSkyline(spark, sf)
    val got = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // frontier is strictly monotone: price up, quantity down
    val sorted = got.toSeq.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((_, x1, y1), (_, x2, y2)) =>
      assert(x1 < x2 && y1 > y2)
    }
    // parallel prefix-min shape: the ONLY join is the broadcast of the
    // shard-count-sized prefix-minimum relation — never a self-join of
    // the points (no sort-merge, no nested loop, no cartesian)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      s"sweep must broadcast the shard prefix minima:\n${p.take(400)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"skyline must not self-join the points:\n${p.take(400)}")
  }
}

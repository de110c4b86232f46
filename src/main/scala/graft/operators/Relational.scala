package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational query layer (SURVEY.md §2.2): joins, aggregations, windows,
  * sort/limit/top-k, set ops, scalar functions — all expressed with the
  * DataFrame API so Catalyst handles pushdown, join strategy and
  * whole-stage codegen.
  *
  * Oracle-parity conventions (driver hash-compares vs DuckDB):
  *   - Sums over `double` columns are computed on `decimal(18,2)` casts:
  *     decimal arithmetic is exact, so the result is independent of the
  *     parallel aggregation order (a raw double sum is not). The final
  *     value is cast back to double, which both engines round identically.
  *   - Averages are `cast(sum as double) / count` — never the engine's
  *     own avg(decimal), whose result type differs between engines.
  *   - Every query ends in a deterministic ORDER BY (full tie-break).
  *
  * Scale notes: the fact-side tables (lineitem/orders) stay partitioned;
  * dimension tables (region/nation/supplier/part/customer) are broadcast
  * explicitly so no query below shuffles a dimension at 100 TB.
  */
object Relational {

  private def dec(c: String): Column = col(c).cast(DecimalType(18, 2))

  /** TPC-H Q1-style pricing summary: scan + filter + hash aggregate.
    * Partial aggregation (map-side combine) happens for free; the only
    * shuffle is on the tiny (returnflag, linestatus) key space.
    * Reference has no aggregation at all (SURVEY.md §2.2 "ABSENT"). */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val disc = dec("l_discount")
    val revenue = dec("l_extendedprice") * (lit(1) - disc)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
        sum(dec("l_extendedprice")).cast(DoubleType).as("sum_base_price"),
        sum(revenue).cast(DoubleType).as("sum_disc_price"),
        sum(revenue * (lit(1) + dec("l_tax"))).cast(DoubleType).as("sum_charge"),
        (sum(dec("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(disc).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}

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
  *   - Output row ORDER is intentionally unspecified (r16 dropped the
  *     presentational sorts): the driver compare is order-insensitive
  *     (both sides sorted before hashing), so do not re-add trailing
  *     orderBys or rely on result ordering.
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

  private val decRevenue: Column =
    dec("l_extendedprice") * (lit(1) - dec("l_discount"))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  /** TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
    * customer is filtered to one segment then joined to orders on
    * custkey, lineitem joins orders on orderkey — both shuffle joins on
    * their natural keys (at 100 TB these are the co-partitioned fact
    * keys; AQE picks broadcast for the filtered customer side when it
    * fits). Top-10 is a deterministic total order, not a heap guess. */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), decRevenue.as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Oracle: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q4-style: EXISTS as a left-semi join (no row duplication,
    * no distinct needed — semi join short-circuits on first match). */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5-style: 5-way join through the dimension chain with
    * explicit broadcast of the bounded dims (region/nation/supplier stay
    * small at any SF — they're broadcast so the fact tables never
    * shuffle for them; customer/orders/lineitem join on their keys). */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), decRevenue.as("rev"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val supp = broadcast(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"))
    val nat = broadcast(Tables.nation(spark, sfDir))
    val reg = broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
  }

  val q5Oracle: String =
    s"""SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6-style forecast revenue: pure scan+filter+agg — the filter
    * must reach the parquet scan as PushedFilters (verified in bench). */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount"))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))

  val q6Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** NOT EXISTS as left-anti join: customers with no large order. */
  def qAntiJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val qAntiJoinOracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** Window-function sampler: row_number / rank / lag / running sum over
    * one shuffle (all windows share the o_custkey partitioning). */
  def qWindowFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        row_number().over(byDate).as("rn"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(
          byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"),
        rank().over(byPrice).as("price_rank"))
  }

  val qWindowFuncsOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  row_number() OVER w AS rn,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  /** Per-group top-k via row_number — the scalable pattern (one shuffle
    * on the group key; no global sort, no driver collect). */
  def qTopKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  val qTopKPerGroupOracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders
      |QUALIFY rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** [[qTopKPerGroup]] computed by the bounded-heap typed Aggregator
    * (`graft.functions.TopKByValue`) instead of the window — same
    * rows, same oracle. The difference is WHERE the pruning happens:
    * the window variant shuffles every order row and sorts each
    * customer's slice before row_number can filter; the aggregator's
    * map-side partial `reduce` caps the buffer at k entries per key
    * per partition, so the exchange carries ≤ k rows per (key,
    * partition) — at 100 TB that is the difference between shuffling
    * the fact table and shuffling ~k×|keys|. Equality with the window
    * variant is collect()-asserted in RelationalSpec, two-phase
    * aggregation is plan-pinned. */
  def qTopKPerGroupAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val topk = graft.functions.TopKByValue(3)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice").cast(DoubleType), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(topk.toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top.items")).as(Seq("i", "e")))
      .select(col("o_custkey"), col("e.id").as("o_orderkey"),
        col("e.v").as("o_totalprice"), (col("i") + 1).as("rn"))
  }

  /** Global sort + limit (TakeOrderedAndProject — O(k) per partition,
    * no full sort materialization). Fully tie-broken for determinism. */
  def qSortLimit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  val qSortLimitOracle: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  /** 2-D SKYLINE (Pareto frontier, Börzsönyi et al. 2001 — the classic
    * OLAP operator Spark has no built-in for): the lineitems no other
    * lineitem beats on BOTH price and quantity (minimize both, at
    * least one strictly). The naive formulation is an O(n²) dominance
    * anti-self-join; the scalable 2-D rewrite is SORT-AND-SWEEP:
    * collapse to the min quantity per distinct price (equal-price
    * duplicates are dominated), then keep a price point iff its
    * quantity is strictly below the running minimum over every cheaper
    * price.
    *
    * The sweep itself is a PARALLEL PREFIX-MIN (r8 verdict #5): the
    * distinct-price relation range-shards on price, each shard
    * computes its local running min in parallel, a shard-count-sized
    * aggregate yields each shard's prefix minimum (broadcast back),
    * and the running min is least(prior-shard prefix, local running) —
    * no single-reducer pass over the price domain. The only
    * unpartitioned window left ranks the FRONTIER, whose size is
    * bounded by the quantity domain (each frontier point strictly
    * decreases the min quantity) — ≤ |qty domain| rows forever.
    * Money in exact cents via DECIMAL(18,0) rounding on both engines
    * (the decimal→long parity rule: a raw long cast truncates in
    * Spark but rounds in DuckDB). */
  def qSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = Tables.lineitem(spark, sfDir)
      .select((col("l_extendedprice") * 100)
          .cast(DecimalType(18, 0)).cast("long").as("price_c"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("price_c")).agg(min(col("qty")).as("qty"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val local = pts.repartitionByRange(parts, col("price_c"))
      .withColumn("__shard", spark_partition_id())
      .withColumn("__cum", min(col("qty")).over(
        Window.partitionBy(col("__shard")).orderBy(col("price_c"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefix = local.groupBy(col("__shard")).agg(min(col("qty")).as("__m"))
      .withColumn("__pmin", min(col("__m")).over(
        Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__shard"), col("__pmin"))
    val result = local.join(broadcast(prefix), Seq("__shard"))
      // least() skips nulls: first row of first shard stays null
      .withColumn("min_qty_cheaper", least(col("__cum"), col("__pmin")))
      .filter(col("min_qty_cheaper").isNull ||
        col("qty") < col("min_qty_cheaper"))
      .withColumn("frontier_rank", row_number().over(
        Window.orderBy(col("price_c"))))
      .select(col("frontier_rank"), col("price_c"), col("qty"))
    DedupOps.unpersistAfterFirstAction(result, local)
  }

  val qSkylineOracle: String =
    """WITH pts AS (
      |  SELECT CAST(CAST(l_extendedprice * 100 AS DECIMAL(18,0)) AS BIGINT)
      |    AS price_c,
      |    CAST(MIN(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1),
      |sweep AS (
      |  SELECT price_c, qty,
      |    MIN(qty) OVER (ORDER BY price_c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_qty_cheaper
      |  FROM pts)
      |SELECT CAST(row_number() OVER (ORDER BY price_c) AS INT) AS frontier_rank,
      |  price_c, qty
      |FROM sweep
      |WHERE min_qty_cheaper IS NULL OR qty < min_qty_cheaper
      |ORDER BY frontier_rank""".stripMargin

  /** JOIN-KEY SKEW REPORT — the pre-join audit that decides HOW to
    * join at 100 TB: per-key row counts on the fact side's join key,
    * the top-10 heaviest keys with their integer-ppm share, and the
    * salt factor a skew-mitigation pass would use (ceil of the
    * hottest key over the mean key load — the replication factor that
    * levels the hottest reducer). AQE's skew-join handles moderate
    * skew at runtime; this report is how a pipeline DETECTS the
    * pathological keys that need explicit salting or isolation
    * (`q_skew_salted_agg` is the treatment; this is the diagnosis).
    *
    * Scale shape: one map-side-combining count per key (the only
    * corpus-sized step), then TakeOrdered for the top-10 and two
    * scalar literals — the report is 10 rows forever. */
  def qSkewReport(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = counts.agg(sum(col("n")).as("t"), count(lit(1)).as("k"),
      max(col("n")).as("mx")).head()
    val (total, nKeys, maxN) = (g.getLong(0), g.getLong(1), g.getLong(2))
    // ceil(max / (total/keys)) computed exactly in integers
    val salt = (maxN * nKeys + total - 1) / total
    val result = counts.orderBy(col("n").desc, col("l_orderkey")).limit(10)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("l_orderkey"))))
      .select(col("rank"), col("l_orderkey"), col("n"),
        expr(s"n * 1000000 DIV $total").as("share_ppm"),
        lit(nKeys).as("n_keys"), lit(maxN).as("max_n"),
        lit(salt).as("salt_factor"))
    DedupOps.unpersistAfterFirstAction(result, counts)
  }

  val qSkewReportOracle: String =
    """WITH c AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |g AS (SELECT SUM(n) AS t, COUNT(*) AS k, MAX(n) AS mx FROM c),
      |top AS (SELECT l_orderkey, n,
      |  row_number() OVER (ORDER BY n DESC, l_orderkey) AS rank
      |  FROM c)
      |SELECT CAST(rank AS INT) AS rank, l_orderkey, n,
      |  CAST(n * 1000000 // g.t AS BIGINT) AS share_ppm,
      |  CAST(g.k AS BIGINT) AS n_keys, CAST(g.mx AS BIGINT) AS max_n,
      |  CAST((g.mx * g.k + g.t - 1) // g.t AS BIGINT) AS salt_factor
      |FROM top, g WHERE rank <= 10 ORDER BY rank""".stripMargin

  /** DATA-QUALITY RULE REPORT — the dbt-test/Deequ-style constraint
    * audit a warehouse runs after every load, as ONE query emitting a
    * row per rule: checked count, violation count, violation ppm, and
    * the pass flag. Rules cover the four standard families over the
    * lineitem/orders pair: referential integrity (orphan lineitems —
    * an anti-join, the only two-table rule), domain bounds
    * (non-positive quantity / price), ordering invariants (ship after
    * receipt), and completeness (null ship instructions).
    *
    * Scale shape: the three single-table rules are ONE conditional
    * aggregation pass over the fact scan (a Deequ-style shared scan —
    * adding rules adds columns, not passes); the referential rule is
    * a broadcast-able anti-join keyed on orderkey. The report is
    * |rules| rows forever. */
  def qDqReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val nLi = li.count()
    val scan = li.agg(
      sum((col("l_quantity") <= 0).cast("long")).as("bad_qty"),
      sum((col("l_extendedprice") <= 0).cast("long")).as("bad_price"),
      sum((col("l_discount") < 0 || col("l_discount") > 1).cast("long")).as("bad_disc"),
      sum((col("l_tax") < 0).cast("long")).as("bad_tax"),
      sum(col("l_returnflag").isNull.cast("long")).as("null_rf")).head()
    val ord = broadcast(Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate")))
    val orphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count()
    val early = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate"))
      .count()
    val rules = Seq(
      ("referential_orderkey", orphans),
      ("domain_quantity_positive", scan.getLong(0)),
      ("domain_price_positive", scan.getLong(1)),
      ("domain_discount_unit_interval", scan.getLong(2)),
      ("domain_tax_nonnegative", scan.getLong(3)),
      ("order_ship_after_orderdate", early),
      ("complete_returnflag", scan.getLong(4)))
    rules.map { case (r, v) =>
      (r, nLi, v, v * 1000000L / nLi, v == 0L)
    }.toDF("rule", "n_checked", "n_violations", "violation_ppm", "pass")
  }

  val qDqReportOracle: String =
    """WITH n AS (SELECT COUNT(*) AS n FROM lineitem),
      |r AS (
      |  SELECT 'referential_orderkey' AS rule,
      |    (SELECT COUNT(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |       WHERE o.o_orderkey = l.l_orderkey)) AS v
      |  UNION ALL SELECT 'domain_quantity_positive',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
      |  UNION ALL SELECT 'domain_price_positive',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)
      |  UNION ALL SELECT 'domain_discount_unit_interval',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
      |  UNION ALL SELECT 'domain_tax_nonnegative',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_tax < 0)
      |  UNION ALL SELECT 'order_ship_after_orderdate',
      |    (SELECT COUNT(*) FROM lineitem l JOIN orders o
      |     ON o.o_orderkey = l.l_orderkey WHERE l.l_shipdate < o.o_orderdate)
      |  UNION ALL SELECT 'complete_returnflag',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_returnflag IS NULL))
      |SELECT rule, n.n AS n_checked, CAST(v AS BIGINT) AS n_violations,
      |  CAST(v * 1000000 // n.n AS BIGINT) AS violation_ppm,
      |  v = 0 AS pass
      |FROM r, n ORDER BY rule""".stripMargin

  /** Set operations: union-distinct / intersect / except over two key
    * sets, tagged so one result covers all three operators. */
  def qSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val withOrders = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("custkey"))
    val rich = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    withOrders.union(rich).distinct().withColumn("op", lit("union"))
      .unionAll(withOrders.intersect(rich).withColumn("op", lit("intersect")))
      .unionAll(rich.except(withOrders).withColumn("op", lit("except")))
      .select("op", "custkey")
  }

  val qSetOpsOracle: String =
    """SELECT 'union' AS op, custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders
      |  UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |UNION ALL
      |SELECT 'intersect', custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders
      |  INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |UNION ALL
      |SELECT 'except', custkey FROM (
      |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      |  EXCEPT SELECT o_custkey FROM orders)
      |ORDER BY op, custkey""".stripMargin

  /** ROLLUP hierarchy totals with explicit grouping flags (so NULL group
    * values from the rollup are distinguishable from NULL data). */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"))

  val qRollupOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n,
      |  CAST(GROUPING(l_returnflag) AS TINYINT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS TINYINT) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** CUBE over two dimensions (all 4 grouping combinations). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))

  val qCubeOracle: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Scalar-function sampler: string / date / math / array built-ins,
    * all codegen'd (zero UDFs — stays inside WholeStageCodegen). */
  def qScalarFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        length(col("o_orderpriority")).as("prio_len"),
        regexp_extract(col("o_orderpriority"), "^(\\d)", 1).as("prio_num"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        // Rounding must happen in the exact decimal domain: round() on a
        // double division is engine-dependent at decimal half-boundaries
        // (69195/1000 = 69.195 has no exact binary form).
        round(dec("o_totalprice") * lit(BigDecimal("0.001")), 2)
          .cast(DoubleType).as("price_k"),
        abs(col("o_totalprice") - 100000.0).as("dist_100k"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        element_at(split(col("o_orderpriority"), "-"), 2).as("prio_word"),
        size(split(col("o_orderpriority"), "-")).as("prio_parts"))

  val qScalarFuncsOracle: String =
    """SELECT o_orderkey,
      |  upper(o_orderpriority) AS prio_upper,
      |  CAST(length(o_orderpriority) AS INT) AS prio_len,
      |  regexp_extract(o_orderpriority, '^(\d)', 1) AS prio_num,
      |  o_orderstatus || '|' || o_orderpriority AS status_prio,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.001 AS DECIMAL(6,3)), 2) AS DOUBLE) AS price_k,
      |  abs(o_totalprice - 100000.0) AS dist_100k,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
      |  sqrt(o_totalprice) AS price_sqrt,
      |  string_split(o_orderpriority, '-')[2] AS prio_word,
      |  CAST(len(string_split(o_orderpriority, '-')) AS INT) AS prio_parts
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Distinct + conditional aggregation (CASE-filtered sums). */
  def qDistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        sum(when(col("l_linestatus") === "F", dec("l_quantity")).otherwise(lit(0)))
          .cast(DoubleType).as("qty_f"),
        count(when(col("l_quantity") > 25, lit(1))).as("n_bulk"))

  val qDistinctAggOracle: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_f,
      |  COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Approximate distinct (HLL++ sketch) as a bounded-error GATE. The
    * sketch estimate itself is engine-private (no other engine builds
    * identical registers), so raw output could never hash-match an
    * oracle. What the sketch DOES promise — |approx−exact|/exact within
    * 3·rsd (rsd 5% default; a std-dev, not a bound, hence 3σ = 15%) —
    * is checkable: emit the exact count plus a `within_eps` boolean,
    * and let DuckDB produce the exact side with literal TRUE. Spark's
    * HLL++ is deterministic (hash-based registers, no RNG), so the
    * boolean is replay-stable. At 100 TB approx_count_distinct replaces
    * countDistinct wherever ±2% suffices: no shuffle of distinct
    * values, constant-size mergeable sketch per group. */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")).cast(DoubleType) /
          col("exact_orders") <= lit(0.15)).as("within_eps"))

  val qApproxDistinctOracle: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS within_eps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- temporal joins (ABSENT in reference and in vanilla SQL-92) ----

  /** Generic as-of join, Spark-first: instead of a join, union the two
    * sides, window-partition by key ordered by time, and carry the last
    * right-side id forward (`last(..., ignoreNulls)`). One shuffle on
    * the key, no range explosion, no broadcast — this is the shape that
    * survives 100 TB (a naive range join would be quadratic per key).
    * Right rows sort before left rows at equal timestamps, so the match
    * is `right.ts <= left.ts` inclusive — DuckDB ASOF JOIN semantics. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightIdCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("_side", lit(1))
      .withColumn("_rid", lit(null).cast("long"))
    val r = right.select(col(key), col(ts), col(rightIdCol).cast("long").as("_rid"))
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // _rid as the final sort key makes ties deterministic: among right
    // rows sharing (key, ts), the largest id wins (last in order), so
    // the pick never depends on partition-internal row order
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col("_rid"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rid")
  }

  /** Skew-safe aggregation via salting: when one group key dominates
    * (hot user, null key), a single reducer drowns. Two-stage agg —
    * group by (key, salt) first, then re-aggregate by key — spreads
    * the hot key over 16 reducers; decimal partials make the result
    * bit-identical to the direct aggregation, which is exactly what
    * the oracle checks. AQE's skew handling covers joins; salting is
    * the aggregation-side counterpart at 100 TB. */
  def qSaltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val partial = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(dec("value")).as("ps"))
    partial
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
        sum(col("ps")).cast(DoubleType).as("sum_value"))
  }

  val qSaltedAggOracle: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** As-of join query: each purchase matched to the user's most recent
    * signup at-or-before it. Compared on µs epochs (ns-parquet parity). */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    asofJoin(purchases, signups, "user_id", "ts", "event_id")
      .select(col("event_id"), col("user_id"), col("_asof").as("signup_event_id"))
  }

  val qAsofJoinOracle: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events WHERE event_type='purchase'),
      |     s AS (SELECT user_id, tus, max(event_id) AS event_id
      |           FROM (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events WHERE event_type='signup')
      |           GROUP BY user_id, tus)
      |SELECT p.event_id, p.user_id, s.event_id AS signup_event_id
      |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.tus >= s.tus
      |ORDER BY p.event_id""".stripMargin

  /** Range join: purchases within 1 hour after each signup, per user.
    * Equi key (user_id) + range predicate → shuffled hash join with the
    * band as a post-filter; the equi key keeps it linear per user. */
  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
        unix_micros(col("ts")).as("s_tus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_tus"))
    s.join(p, col("s_user") === col("p_user") &&
        col("p_tus") >= col("s_tus") &&
        col("p_tus") <= col("s_tus") + expr("3600000000"), "inner")
      .groupBy(col("s_id"))
      .agg(count(lit(1)).as("purchases_within_1h"))
  }

  /** PURE range join — no equi key at all: pairs of purchases within
    * one hour of each other, across ALL users. Without help Spark
    * plans a pure inequality join as a nested loop over the full
    * cross product; the scalable rewrite is TIME BUCKETING — assign
    * each row its hour bucket, fan the PROBE side out to the 3
    * buckets its matches can live in, and equi-join on the bucket
    * before the exact band filter. Cost drops from O(n²) to
    * Σ_b |probe(b)|·|build(b)| over adjacent buckets — the density-
    * bounded quadratic, exactly the inverted-index discipline applied
    * to the time axis. The (earlier, later) orientation condition
    * makes each unordered pair emit exactly once (the later row's
    * probe of the earlier row fails the orientation test), so no
    * dedup pass is needed. Plan-pinned: equi-join on bucket, never a
    * nested loop. */
  def qRangeJoinBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
    val probe = p
      .select(col("event_id").as("a_id"), col("tus").as("a_tus"))
      .withColumn("bkt", explode(array(
        expr(s"a_tus DIV $hourUs - 1"),
        expr(s"a_tus DIV $hourUs"),
        expr(s"a_tus DIV $hourUs + 1"))))
    val build = p
      .select(col("event_id").as("b_id"), col("tus").as("b_tus"))
      .withColumn("bkt", expr(s"b_tus DIV $hourUs"))
    probe.join(build, "bkt")
      .filter((col("a_tus") < col("b_tus") ||
          (col("a_tus") === col("b_tus") && col("a_id") < col("b_id"))) &&
        col("b_tus") - col("a_tus") <= hourUs)
      .select(col("a_id"), col("b_id"), (col("b_tus") - col("a_tus")).as("dt_us"))
  }

  val qRangeJoinBucketedOracle: String =
    """WITH p AS (
      |  SELECT event_id, epoch_us(ts) AS tus FROM events
      |  WHERE event_type = 'purchase')
      |SELECT a.event_id AS a_id, b.event_id AS b_id,
      |  CAST(b.tus - a.tus AS BIGINT) AS dt_us
      |FROM p a JOIN p b
      |  ON (a.tus < b.tus OR (a.tus = b.tus AND a.event_id < b.event_id))
      | AND b.tus - a.tus <= 3600000000
      |ORDER BY a_id, b_id""".stripMargin

  val qRangeJoinOracle: String =
    """WITH s AS (SELECT event_id AS s_id, user_id, epoch_us(ts) AS tus FROM events WHERE event_type='signup'),
      |     p AS (SELECT user_id, epoch_us(ts) AS tus FROM events WHERE event_type='purchase')
      |SELECT s.s_id, COUNT(*) AS purchases_within_1h
      |FROM s JOIN p ON s.user_id = p.user_id
      |  AND p.tus >= s.tus AND p.tus <= s.tus + 3600000000
      |GROUP BY s.s_id
      |ORDER BY s.s_id""".stripMargin

  /** TPC-H Q17-style correlated scalar subquery: lineitems below 50%
    * of their part's average quantity. Decorrelated by hand into an
    * aggregate + equi-join — the plan Catalyst's decorrelation would
    * produce, stated explicitly: one pass computes per-part averages,
    * the fact table joins them on partkey. At 100 TB the avg side is
    * orders of magnitude smaller than lineitem and broadcasts. */
  def qCorrelatedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((sum(dec("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_small"),
        sum(dec("l_extendedprice")).cast(DoubleType).as("value_small"))
  }

  val qCorrelatedAvgOracle: String =
    """WITH a AS (
      |  SELECT l_partkey AS ap_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey, COUNT(*) AS n_small,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value_small
      |FROM lineitem JOIN a ON l_partkey = ap_partkey
      |WHERE l_quantity < avg_qty * 0.5
      |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin

  /** TPC-H Q18-style HAVING + IN-subquery: customers whose single
    * orders exceed 300 units. The IN becomes a left-semi join against
    * the HAVING-filtered aggregate — semi joins never duplicate rows,
    * and the filtered key set is small enough to broadcast at scale. */
  def qHavingIn(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("b_orderkey"))
      .agg(sum(dec("l_quantity")).as("qty"))
      .filter(col("qty") > 300)
    val ord = Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("b_orderkey"), "left_semi")
    ord.join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val qHavingInOracle: String =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** TPC-H Q7-style nation-pair volume: supplier nation × customer
    * nation yearly revenue. Two broadcast dimension joins + one fact
    * join; the pair filter prunes before aggregation. */
  def qNationPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    val sn = broadcast(nat.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val cn = broadcast(nat.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    val supp = broadcast(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"))
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"), decRevenue.as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("s_nk"))
      .join(cn, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") < col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
  }

  val qNationPairsOracle: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE sn.n_name < cn.n_name
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Custom typed Aggregator (UDAF): quantity-weighted average discount
    * per return flag, exact in integer cents (see
    * functions.WeightedAvgCents). Demonstrates the Aggregator extension
    * point with full oracle parity — integer partials are merge-order-
    * independent, so the distributed result is deterministic. */
  def qWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wavg = udaf(graft.functions.WeightedAvgCents)
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_discount") * 100).cast("long").as("disc_c"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"))
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("disc_c"), col("qty_c")).as("wavg_discount"),
        count(lit(1)).as("n"))
  }

  val qWeightedAvgOracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(round(l_discount*100) AS BIGINT) * CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)
      |    / CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 AS wavg_discount,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Batch sessionization: per-user sessions split at >30 min gaps —
    * lag to detect boundaries, running sum to number sessions, one
    * aggregate per session. Single shuffle on user_id shared by both
    * windows and the final groupBy (same partitioning reused — Catalyst
    * plans one Exchange). The batch twin of the streaming
    * `session_window` in StatefulOps. */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    ev.withColumn("prev", lag(col("tus"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("tus") - col("prev") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(tus) DIV 1000000").as("start_s"),
        expr("max(tus) DIV 1000000").as("end_s"))
  }

  val qSessionizeOracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
      |b AS (SELECT user_id, event_id, tus,
      |  CASE WHEN lag(tus) OVER w IS NULL
      |         OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      |s AS (SELECT user_id, tus,
      |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM b)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST(min(tus) // 1000000 AS BIGINT) AS start_s,
      |  CAST(max(tus) // 1000000 AS BIGINT) AS end_s
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** RANGE window frame (value-based, vs the ROWS frames elsewhere):
    * per customer, how many of their orders fall within ±7 days of
    * each order — the moving-neighborhood count. RANGE frames bound
    * state by ORDER-BY value, not row count, so ties and gaps behave
    * correctly; epoch seconds give both engines the same arithmetic. */
  def qRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val week = 7L * 86400
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("t"))
      .rangeBetween(-week, week)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        // orderdate is TIMESTAMP_NTZ; go through an explicit UTC cast
        // for epoch seconds (session TZ is pinned UTC on both engines)
        unix_seconds(col("o_orderdate").cast("timestamp")).as("t"))
      .withColumn("neighbors", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("neighbors"))
  }

  val qRangeFrameOracle: String =
    """SELECT o_orderkey, o_custkey,
      |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |    RANGE BETWEEN 604800 PRECEDING AND 604800 FOLLOWING) AS neighbors
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Pivot: order counts per priority × status, fixed pivot values so
    * the schema is static (dynamic pivot would need a driver-side
    * distinct — fine at 25 values, wrong at 25 million; always pin
    * pivot columns at scale). */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnRenamed("F", "n_f")
      .withColumnRenamed("O", "n_o")
      .withColumnRenamed("P", "n_p")

  val qPivotOracle: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Exact per-group median via HISTOGRAM rank selection (lower median
    * at position ceil(n/2)). Engines disagree on quantile
    * interpolation (Spark percentile vs DuckDB quantile_cont), so the
    * portable exact form is order-statistics selection — value at a
    * rank is interpolation-free.
    *
    * Scale shape (r8 verdict fix): the r7 form ranked every fact row
    * with `row_number` partitioned by the THREE-value return flag —
    * n/3 of the corpus through each of 3 reducers, the one
    * pure-relational scale-killer in the suite. l_quantity has a small
    * domain, so the exact decomposition is the token-budget trick:
    * ONE hash aggregation to a (flag, quantity, count) histogram
    * (map-side combined, ~flags×|domain| rows), then cumulative-count
    * windows over that METADATA-sized relation pick the quantity whose
    * cumulative range covers rank (n+1)/2. Answer-identical to row
    * ranking — equal values at the cut rank collapse into one
    * histogram bucket whose range contains the target. At 100 TB the
    * corpus is touched exactly once, by a combiner-friendly agg. */
  def qMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .filter(expr("(n + 1) DIV 2") > col("cum") - col("c") &&
        expr("(n + 1) DIV 2") <= col("cum")) // integer div: lower median
      .select(col("l_returnflag"), col("l_quantity").as("median_qty"), col("n"))
  }

  val qMedianOracle: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_quantity,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag, l_quantity AS median_qty, n
      |FROM r WHERE rn = (n + 1) // 2
      |ORDER BY l_returnflag""".stripMargin

  /** The engine's SQL-string front door (graft.Sql): the same plan a
    * DataFrame build produces, from an ANSI SQL string over registered
    * views — proving a SQL-first user can drive the engine unchanged. */
  def qSqlInterface(spark: SparkSession, sfDir: String): DataFrame =
    graft.Sql.run(spark, sfDir,
      """SELECT year(o_orderdate) AS y, o_orderstatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY year(o_orderdate), o_orderstatus
        |ORDER BY y, o_orderstatus""".stripMargin)

  val qSqlInterfaceOracle: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderstatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY year(o_orderdate), o_orderstatus
      |ORDER BY y, o_orderstatus""".stripMargin

  /** TPC-H Q14-style promo effect: what share of a quarter's revenue
    * came from PROMO parts. lineitem is the fact side; part is a
    * broadcast dimension; the conditional ratio is two decimal sums in
    * ONE aggregate (no second pass, no self-join). */
  def q14PromoEffect(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("l_partkey"), decRevenue.as("rev"))
    val p = broadcast(Tables.part(spark, sfDir).select("p_partkey", "p_type"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType) * 100.0 /
          sum(col("rev")).cast(DoubleType)).as("promo_pct"),
        count(lit(1)).as("n_items"))
  }

  val q14Oracle: String =
    s"""SELECT
       |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
       |    / CAST(SUM($revenueSql) AS DOUBLE) AS promo_pct,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin

  /** TPC-H Q10-style returned-item report: which customers returned
    * the most revenue. Three-way join, aggregation on the
    * high-cardinality customer key (unlike q1's tiny key space — this
    * is the shuffle-heavy agg shape), deterministic top-20. */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), decRevenue.as("rev"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Oracle: String =
    s"""SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
       |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q22-style idle balances: per nation, rich customers
    * (acctbal above the global positive average — a SCALAR aggregate
    * subquery, broadcast as a 1-row cross join) with no RECENT order
    * (anti join against the filtered orders). Composes three shapes no
    * other query here combines. */
  def q22IdleBalances(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec("c_acctbal")).cast(DoubleType) / count(lit(1))).as("avg_bal"))
    val rich = cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    val idle = rich.join(recent,
      col("c_custkey") === col("o_custkey"), "left_anti")
    idle.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        sum(dec("c_acctbal")).cast(DoubleType).as("total_bal"))
  }

  val q22Oracle: String =
    """SELECT c_nationkey, COUNT(*) AS n_custs,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND c_custkey NOT IN (
      |    SELECT o_custkey FROM orders
      |    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q8-style market share: a 6-way join (both the customer AND
    * supplier dimension chains hang off lineitem) with a conditional-
    * aggregate share per year. Every dimension (part, supplier, nation,
    * region) is broadcast — the fact tables shuffle only for the
    * orders⋈lineitem key join. Share = decimal-exact sums, ONE double
    * division at the end (oracle-parity rule). */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), decRevenue.as("rev"))
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val part = broadcast(Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select("p_partkey"))
    val supp = broadcast(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"))
    val natS = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val natC = broadcast(Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey")))
    val reg = broadcast(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(natC, col("c_nationkey") === col("cn_key"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(natS, col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7", col("rev")).otherwise(lit(0)))
          .cast(DoubleType).as("nation_rev"),
        sum(col("rev")).cast(DoubleType).as("total_rev"))
      .select(col("o_year"),
        (col("nation_rev") / col("total_rev")).as("mkt_share"))
  }

  val q8Oracle: String =
    s"""WITH flat AS (
       |  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       |    $revenueSql AS rev, sn.n_name AS supp_nation
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  WHERE p_type = 'PROMO' AND r_name = 'ASIA')
       |SELECT CAST(o_year AS INT) AS o_year,
       |  CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(rev) AS DOUBLE) AS mkt_share
       |FROM flat GROUP BY 1 ORDER BY o_year""".stripMargin

  /** TPC-H Q9-style profit by (supplier nation, order year) with a
    * substring part filter — the classic "every fact row fans through
    * two dimension chains" aggregation. LIKE on p_name is evaluated on
    * the broadcast part dim BEFORE the join (predicate pushdown), so
    * the fact join only sees matching parts. */
  def q9ProfitShape(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), decRevenue.as("rev"))
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
    val part = broadcast(Tables.part(spark, sfDir)
      .filter(col("p_name").like("%red%")).select("p_partkey"))
    val supp = broadcast(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"))
    val nat = broadcast(Tables.nation(spark, sfDir))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("rev")).cast(DoubleType).as("sum_profit"),
        count(lit(1)).as("n_items"))
  }

  val q9Oracle: String =
    s"""SELECT sn.n_name AS nation,
       |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       |  CAST(SUM($revenueSql) AS DOUBLE) AS sum_profit,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q21-style "suppliers who kept the order waiting": the
    * EXISTS + NOT-EXISTS double-correlation, re-expressed as a
    * left-semi then left-anti join chain (each short-circuits on first
    * match — no row duplication, no distinct). "Late" = shipped more
    * than 60 days after the order date (this schema has no
    * receipt/commit dates). */
  def q21WaitingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val ordF = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lateLi = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("l_orderkey", "l_suppkey")
    val multiSupp = lateLi.as("l1").join(li.as("l2"),
      col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l2.l_suppkey"), "left_semi")
    val soleLate = multiSupp.as("l1").join(lateLi.as("l3"),
      col("l1.l_orderkey") === col("l3.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l3.l_suppkey"), "left_anti")
    soleLate
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Oracle: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** Explicit GROUPING SETS (beyond the rollup/cube shorthands):
    * (flag, status), (flag), and grand total in ONE pass — Spark
    * expands the sets over a single shuffle (Expand + one aggregate),
    * not one scan per set, which is the point at 100 TB. NULL group
    * slots are labeled 'ALL' on both engines. */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))

  val qGroupingSetsOracle: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      |  COALESCE(l_linestatus, 'ALL') AS status,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY flag, status""".stripMargin

  /** Distribution window functions: ntile/percent_rank/cume_dist per
    * market segment plus a lag delta. The ORDER BY carries c_custkey as
    * a tiebreak — ntile assigns by ROW position, so a non-total order
    * would be nondeterministic across engines/runs. */
  def qWindowNtile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("gap", col("c_acctbal") - lag(col("c_acctbal"), 1).over(w))
  }

  val qWindowNtileOracle: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  c_acctbal - lag(c_acctbal, 1) OVER w AS gap
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q12-style priority split: orders⋈lineitem with TWO
    * conditional counts per line status (urgent/high vs the rest) in a
    * single aggregate — the "late shipments by mode" shape with
    * l_linestatus standing in for the shipmode column this synthetic
    * schema lacks. One fact-fact shuffle join on the order key, then a
    * tiny-key agg; the CASE arithmetic rides inside the same
    * whole-stage-codegen span as the join probe. */
  def q12PrioritySplit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
  }

  val q12Oracle: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    * (customers with zero orders MUST appear — an inner join silently
    * drops them) followed by two stacked aggregations: orders per
    * customer, then customers per order-count. The second agg's key
    * space is tiny, so the expensive shuffle is only the first one on
    * c_custkey. */
  def q13CustDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips the outer-join nulls
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Oracle: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, then
    * ONLY the supplier(s) at the global maximum. The max is computed
    * with an empty-frame window over the aggregated (tiny) relation —
    * one extra exchange on a by-then ~suppliers-sized input instead of
    * a second scan of lineitem for a scalar subquery. */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(decRevenue).cast(DoubleType).as("total_revenue"))
    val s = broadcast(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name"))
    rev.withColumn("max_rev", max(col("total_revenue")).over(Window.partitionBy()))
      .filter(col("total_revenue") === col("max_rev"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val q15Oracle: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(SUM($revenueSql) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q19-style disjunctive join: lineitem⋈part where the filter
    * is an OR of three (brand, size-range, quantity-range) conjunction
    * arms. The join key itself is a plain equi-join (hashable); only
    * the residual disjunction runs post-probe. The common
    * `l_quantity <= 40` bound is factored OUT of the OR so it pushes
    * down to the lineitem scan — inside the OR, no single-table
    * predicate reaches the parquet reader. */
  def q19DisjunctiveJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40)
      .select(col("l_partkey"), col("l_quantity"), decRevenue.as("rev"))
    val p = broadcast(Tables.part(spark, sfDir)
      .filter(col("p_size") >= 1)
      .select("p_partkey", "p_brand", "p_size"))
    val arms =
      (col("p_brand") === "Brand#11" && col("p_size") <= 5 &&
        col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
      (col("p_brand") === "Brand#22" && col("p_size") <= 10 &&
        col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
      (col("p_brand") === "Brand#33" && col("p_size") <= 15 &&
        col("l_quantity") >= 20 && col("l_quantity") <= 40)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(arms)
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19Oracle: String =
    s"""SELECT CAST(SUM($revenueSql) AS DOUBLE) AS revenue, COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_quantity >= 1 AND l_quantity <= 40 AND p_size >= 1 AND (
       |  (p_brand = 'Brand#11' AND p_size <= 5  AND l_quantity BETWEEN 1  AND 11) OR
       |  (p_brand = 'Brand#22' AND p_size <= 10 AND l_quantity BETWEEN 10 AND 20) OR
       |  (p_brand = 'Brand#33' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 40))""".stripMargin

  /** Data-profiling pass: row count, null counts, min/max, exact sums
    * and distinct cardinalities for a column set — in ONE aggregate
    * over one scan (the "profile the table before training on it"
    * step). Multiple count-distincts expand the aggregate internally,
    * but it is still a single pass over the fact table with map-side
    * partials; at 100 TB swap the exact distincts for
    * `approx_count_distinct` and keep the shape. Dates are formatted
    * to strings so both engines hash identically. */
  def qProfileStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("qty_nulls"),
      min(col("l_quantity")).as("qty_min"),
      max(col("l_quantity")).as("qty_max"),
      sum(dec("l_quantity")).cast(DoubleType).as("qty_sum"),
      count_distinct(col("l_extendedprice")).as("price_distinct"),
      count_distinct(col("l_returnflag")).as("flag_distinct"),
      date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("ship_min"),
      date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("ship_max"))

  val qProfileStatsOracle: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_nulls,
      |  MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
      |  COUNT(DISTINCT l_extendedprice) AS price_distinct,
      |  COUNT(DISTINCT l_returnflag) AS flag_distinct,
      |  strftime(MIN(l_shipdate), '%Y-%m-%d') AS ship_min,
      |  strftime(MAX(l_shipdate), '%Y-%m-%d') AS ship_max
      |FROM lineitem""".stripMargin

  /** Group-wise EXACT quantiles (percentile_cont semantics): the
    * distribution summary every profiling/monitoring layer wants.
    * Exact percentiles need the full sorted group — Spark's
    * `percentile` aggregates one pass per group member with a
    * sort-based buffer; at 100 TB you'd reach for approx_percentile
    * (t-digest, mergeable sketches — see q_approx_distinct's
    * rows-only twin pattern) and keep THIS as the verification twin
    * on sampled groups. Both engines interpolate linearly, so the
    * rounded-to-6 values agree bit-for-bit. */
  def qGroupQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"),
        array(qs.map(lit): _*)).as("p"))
      .select(col("l_returnflag"),
        round(element_at(col("p"), 1), 6).as("p25"),
        round(element_at(col("p"), 2), 6).as("p50"),
        round(element_at(col("p"), 3), 6).as("p75"),
        round(element_at(col("p"), 4), 6).as("p90"))
  }

  val qGroupQuantilesOracle: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
      |  round(quantile_cont(l_quantity, 0.50), 6) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
      |  round(quantile_cont(l_quantity, 0.90), 6) AS p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The SCALE path for quantiles (`percentile_approx` — a mergeable
    * KLL-style sketch: bounded memory per group, one pass, partial
    * aggregation; what q_group_quantiles' exact sort-based twin gets
    * replaced by at 100 TB) wrapped in a bounded-error GATE. Sketch
    * output is engine-specific, so the query emits per-quantile
    * booleans |approx−exact| ≤ 1 + 0.05·exact, the exact side computed
    * by the same in-engine `percentile` that the oracled
    * q_group_quantiles already proves equal to DuckDB's quantile_cont.
    * The +1 slack absorbs interpolation: exact percentiles interpolate
    * between adjacent data values while the sketch returns a member
    * value within rank n/accuracy of the target. The DuckDB oracle
    * emits literal TRUE per group, so a sketch regression past the
    * bound flips a boolean and fails the round. */
  def qApproxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    def within(i: Int, name: String) =
      (abs(element_at(col("ap"), i) - element_at(col("ep"), i)) <=
        lit(1.0) + lit(0.05) * element_at(col("ep"), i)).as(name)
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"),
          array(qs.map(lit): _*), lit(10000)).as("ap"),
        percentile(col("l_quantity"), array(qs.map(lit): _*)).as("ep"))
      .select(col("l_returnflag"),
        within(1, "within_p25"), within(2, "within_p50"),
        within(3, "within_p75"), within(4, "within_p90"))
  }

  val qApproxQuantilesOracle: String =
    """SELECT l_returnflag,
      |  TRUE AS within_p25, TRUE AS within_p50,
      |  TRUE AS within_p75, TRUE AS within_p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Distributed simple linear regression (price on quantity, per
    * returnflag) from EXACT integer moments: quantity is integral and
    * price has exactly 2 decimals, so Σx, Σy, Σxy, Σx², Σy² are
    * accumulated as DECIMAL(38,0) — exact under ANY partial-aggregation
    * order — and only the final slope/intercept/r² arithmetic drops to
    * double. Float moment sums would be partition-order-dependent and
    * diverge run-to-run, let alone cross-engine (same discipline as
    * sim_kmeans_step's quantized means). One shuffle on the group key,
    * everything else map-side. */
  def qRegression(spark: SparkSession, sfDir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val x = col("l_quantity").cast(DecimalType(18, 0))
    val y = (col("l_extendedprice") * 100).cast(DecimalType(18, 0))
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(big)).cast(DoubleType).as("sx"),
        sum(col("y").cast(big)).cast(DoubleType).as("sy"),
        sum((col("x") * col("y")).cast(big)).cast(DoubleType).as("sxy"),
        sum((col("x") * col("x")).cast(big)).cast(DoubleType).as("sxx"),
        sum((col("y") * col("y")).cast(big)).cast(DoubleType).as("syy"))
      .withColumn("slope_c",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept_c",
        (col("sy") - col("slope_c") * col("sx")) / col("n"))
      .withColumn("r2", pow(
        (col("n") * col("sxy") - col("sx") * col("sy")), 2) /
        ((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))))
      .select(col("l_returnflag"), col("n"),
        round(col("slope_c") / 100, 6).as("slope"),
        round(col("intercept_c") / 100, 6).as("intercept"),
        round(col("r2"), 6).as("r2"))
  }

  val qRegressionOracle: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(CAST(l_extendedprice * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,0)) * CAST(l_extendedprice * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,0)) * CAST(l_quantity AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(CAST(l_extendedprice * 100 AS DECIMAL(18,0)) * CAST(l_extendedprice * 100 AS DECIMAL(18,0)) AS DECIMAL(38,0))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY l_returnflag),
      |c AS (SELECT *,
      |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_c
      |  FROM m)
      |SELECT l_returnflag, n,
      |  round(slope_c / 100, 6) AS slope,
      |  round(((sy - slope_c * sx) / n) / 100, 6) AS intercept,
      |  round(pow(n * sxy - sx * sy, 2) /
      |        ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM c ORDER BY l_returnflag""".stripMargin

  /** Market-basket co-occurrence (a-priori support counting): pairs of
    * parts appearing in the same order, ranked by support. The
    * ORDER-KEYED self-join is the inverted-index shape again — pair
    * volume is Σ_orders |basket|², bounded by small baskets, never
    * n² over parts. At 100 TB the same guard as the jaccard df-cap
    * applies: drop mega-baskets (a basket of 10⁴ items is 10⁸ pairs)
    * before the join. Top-N by (support, pair) is fully deterministic. */
  def qMarketBasket(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  val qMarketBasketOracle: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2)
      |SELECT part_a, part_b, support FROM p WHERE support >= 2
      |ORDER BY support DESC, part_a, part_b LIMIT 100""".stripMargin

  /** Two-phase a-priori market basket: identical output to
    * [[qMarketBasket]] (same oracle — that equality IS the a-priori
    * theorem: any pair with support ≥ s has both members in ≥ s
    * baskets), but the pair join runs over a PRUNED item relation —
    * frequent singletons are found with one cheap agg first, and only
    * lines whose part survives that prune enter the quadratic-per-
    * basket join. At 100 TB this first pass is the difference between
    * pairing every long-tail part (most parts appear once — all
    * wasted join work) and pairing only the co-occurrence-eligible
    * ones; it's the first rung of the full a-priori ladder (frequent
    * k-sets prune candidate (k+1)-sets). Plan-pinned: both inputs of
    * the pair join contain the prune join (PlanAuditSpec). */
  def qMarketBasketApriori(spark: SparkSession, sfDir: String): DataFrame = {
    val minSupport = 2
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val frequent = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("part_df"))
      .filter(col("part_df") >= minSupport)
      .select("l_partkey")
    val pruned = li.join(frequent, "l_partkey")
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  /** UNPIVOT (wide → long): per-returnflag metric columns melted to
    * (l_returnflag, metric, value) rows. `Dataset.unpivot` is a pure
    * projection+Expand — zero extra shuffles beyond the feeding agg;
    * the long layout is what metric stores and plotting layers want. */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"),
        sum(decRevenue).cast(DoubleType).as("sum_rev"),
        count(lit(1)).cast(DoubleType).as("n_items"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("sum_qty"), col("sum_rev"), col("n_items")),
      "metric", "value")
  }

  val qUnpivotOracle: String =
    s"""WITH wide AS (
       |  SELECT l_returnflag,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       |    CAST(SUM($revenueSql) AS DOUBLE) AS sum_rev,
       |    CAST(COUNT(*) AS DOUBLE) AS n_items
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, metric, value FROM (
       |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
       |  UNION ALL SELECT l_returnflag, 'sum_rev', sum_rev FROM wide
       |  UNION ALL SELECT l_returnflag, 'n_items', n_items FROM wide)
       |ORDER BY l_returnflag, metric""".stripMargin

  /** Time-series GAP FILL: a generated day spine left-joined to daily
    * order aggregates — missing days appear with n=0 and the price
    * metric forward-filled from the last observed day (the resample +
    * ffill step of any time-series feature pipeline). The spine is
    * `sequence()` over the month — O(days), generated in-plan, never
    * collected; the join is a broadcast of the tiny spine. */
  def qGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-02-01").cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"),
        sum(dec("o_totalprice")).cast(DoubleType).as("total"))
    val spine = spark.range(1).select(explode(sequence(
      lit("1997-01-01").cast("date"), lit("1997-01-31").cast("date"),
      expr("interval 1 day"))).as("d"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("d"), "left_outer")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("total_ffill", last(col("total"), ignoreNulls = true).over(w))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"), col("total_ffill"))
  }

  val qGapFillOracle: String =
    """WITH spine AS (
      |  SELECT CAST(u.d AS DATE) AS d
      |  FROM unnest(generate_series(DATE '1997-01-01', DATE '1997-01-31',
      |       INTERVAL 1 DAY)) AS u(d)),
      |daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-02-01 00:00:00'
      |  GROUP BY 1)
      |SELECT strftime(spine.d, '%Y-%m-%d') AS day,
      |  COALESCE(daily.n, 0) AS n,
      |  last_value(daily.total IGNORE NULLS) OVER (
      |    ORDER BY spine.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS total_ffill
      |FROM spine LEFT JOIN daily ON spine.d = daily.d
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unpivot" -> (qUnpivot _),
    "q_gap_fill" -> (qGapFill _),
    "q_profile_stats" -> (qProfileStats _),
    "q_group_quantiles" -> (qGroupQuantiles _),
    "q_approx_quantiles" -> (qApproxQuantiles _),
    "q_regression" -> (qRegression _),
    "q_market_basket" -> (qMarketBasket _),
    "q_market_basket_apriori" -> (qMarketBasketApriori _),
    "q12_priority_split" -> (q12PrioritySplit _),
    "q13_cust_distribution" -> (q13CustDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q19_disjunctive_join" -> (q19DisjunctiveJoin _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q14_promo_effect" -> (q14PromoEffect _),
    "q22_idle_balances" -> (q22IdleBalances _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q_anti_join" -> (qAntiJoin _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_topk_per_group" -> (qTopKPerGroup _),
    "q_topk_per_group_agg" -> (qTopKPerGroupAgg _),
    "q_sort_limit" -> (qSortLimit _),
    "q_skyline" -> (qSkyline _),
    "q_skew_report" -> (qSkewReport _),
    "q_dq_report" -> (qDqReport _),
    "q_set_ops" -> (qSetOps _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_scalar_funcs" -> (qScalarFuncs _),
    "q_distinct_agg" -> (qDistinctAgg _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_range_join_bucketed" -> (qRangeJoinBucketed _),
    "q_skew_salted_agg" -> (qSaltedAgg _),
    "q17_correlated_avg" -> (qCorrelatedAvg _),
    "q18_having_in" -> (qHavingIn _),
    "q7_nation_pairs" -> (qNationPairs _),
    "q_udaf_weighted_avg" -> (qWeightedAvg _),
    "q_sessionize" -> (qSessionize _),
    "q_pivot" -> (qPivot _),
    "q_window_range_frame" -> (qRangeFrame _),
    "q_median_exact" -> (qMedian _),
    "q_sql_interface" -> (qSqlInterface _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_profit_shape" -> (q9ProfitShape _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_window_ntile" -> (qWindowNtile _))

  val oracles: Map[String, String] = Map(
    "q_unpivot" -> qUnpivotOracle,
    "q_gap_fill" -> qGapFillOracle,
    "q_profile_stats" -> qProfileStatsOracle,
    "q_group_quantiles" -> qGroupQuantilesOracle,
    "q_regression" -> qRegressionOracle,
    "q_market_basket" -> qMarketBasketOracle,
    "q_market_basket_apriori" -> qMarketBasketOracle,
    "q12_priority_split" -> q12Oracle,
    "q13_cust_distribution" -> q13Oracle,
    "q15_top_supplier" -> q15Oracle,
    "q19_disjunctive_join" -> q19Oracle,
    "q10_returned_items" -> q10Oracle,
    "q14_promo_effect" -> q14Oracle,
    "q22_idle_balances" -> q22Oracle,
    "q1_pricing_summary" -> q1Oracle,
    "q3_shipping_priority" -> q3Oracle,
    "q4_order_priority" -> q4Oracle,
    "q5_local_supplier" -> q5Oracle,
    "q6_forecast_revenue" -> q6Oracle,
    "q_anti_join" -> qAntiJoinOracle,
    "q_window_funcs" -> qWindowFuncsOracle,
    "q_topk_per_group" -> qTopKPerGroupOracle,
    "q_topk_per_group_agg" -> qTopKPerGroupOracle,
    "q_sort_limit" -> qSortLimitOracle,
    "q_skyline" -> qSkylineOracle,
    "q_skew_report" -> qSkewReportOracle,
    "q_dq_report" -> qDqReportOracle,
    "q_set_ops" -> qSetOpsOracle,
    "q_rollup" -> qRollupOracle,
    "q_cube" -> qCubeOracle,
    "q_scalar_funcs" -> qScalarFuncsOracle,
    "q_distinct_agg" -> qDistinctAggOracle,
    "q_asof_join" -> qAsofJoinOracle,
    "q_range_join" -> qRangeJoinOracle,
    "q_range_join_bucketed" -> qRangeJoinBucketedOracle,
    "q_skew_salted_agg" -> qSaltedAggOracle,
    "q17_correlated_avg" -> qCorrelatedAvgOracle,
    "q18_having_in" -> qHavingInOracle,
    "q7_nation_pairs" -> qNationPairsOracle,
    "q_udaf_weighted_avg" -> qWeightedAvgOracle,
    "q_sessionize" -> qSessionizeOracle,
    "q_pivot" -> qPivotOracle,
    "q_window_range_frame" -> qRangeFrameOracle,
    "q_median_exact" -> qMedianOracle,
    "q_sql_interface" -> qSqlInterfaceOracle,
    "q8_market_share" -> q8Oracle,
    "q9_profit_shape" -> q9Oracle,
    "q21_waiting_supplier" -> q21Oracle,
    "q_grouping_sets" -> qGroupingSetsOracle,
    "q_window_ntile" -> qWindowNtileOracle,
    // The two sketch queries are bounded-error gates: the sketch value
    // is engine-private, but its promised error bound is a boolean both
    // engines agree on (DuckDB computes the exact side + literal TRUE).
    "q_approx_distinct" -> qApproxDistinctOracle,
    "q_approx_quantiles" -> qApproxQuantilesOracle)
}

package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-architecture spec: bucketed tables joined on the bucket key
  * need NO exchange — the co-located join that makes repeated fact-fact
  * joins affordable at 100 TB (pay the partitioning once at write time,
  * never again at read time). Asserts the physical plan is
  * shuffle-free, not just that results match. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").mode("overwrite")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, sf)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").mode("overwrite")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getAs[Long]("n")).sum === Tables.lineitem(spark, sf).count())

      val plan = joined.queryExecution.executedPlan.toString
      // bucketed-bucketed equi join: sort-merge with zero ShuffleExchange
      // before the join (the single agg exchange on o_orderstatus is fine)
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("ShuffleExchange") &&
        !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"unexpected shuffle in join section:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-architecture spec: a year-partitioned layout + a year
  * predicate must prune to one partition directory — the layout choice
  * that turns a 100 TB full scan into a 1-year scan. Asserts the
  * pruning in the plan (PartitionFilters), not just the answer. */
class PartitionPruningSpec extends SparkSpec {

  test("year-partitioned parquet prunes to the filtered year") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("o_year") === 1997)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val rows = q.collect()
    val expected = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(rows.map(_.getAs[Long]("n")).sum === expected)

    val plan = q.queryExecution.executedPlan.toString
    // the year predicate must be a partition filter on the scan —
    // pruned at planning, never evaluated per row
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter missing:\n$plan")
    // and it must not survive as a post-scan data Filter
    assert(!plan.linesIterator.exists(l =>
      l.trim.startsWith("+- Filter") && l.contains("o_year")),
      "year predicate was not pruned away")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.lineitem(spark, sf)
      .withColumn("l_year", year(col("l_shipdate")))
      .write.partitionBy("l_year").mode("overwrite").parquet(dir)

    // the canonical DPP shape: the partition column is only constrained
    // THROUGH a join with a filtered dimension — static pruning can't
    // help, so the optimizer must inject a runtime subquery filter on
    // the fact scan's partition column. The dim must be a SCAN (as any
    // real dimension is): a Seq.toDF LocalRelation gets its filter
    // constant-folded away by ConvertToLocalRelation, and with no
    // Filter node left the DPP rule sees no selective predicate.
    import spark.implicits._
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    Seq((1996, "history"), (1997, "target"), (1998, "future"))
      .toDF("y", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val q = fact.join(dim.filter(col("tag") === "target"), col("l_year") === col("y"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    val n = q.head.getLong(0)
    assert(n === Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) === 1997).count())
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the fact scan:\n$plan")
  }

  test("modality-partitioned media layout: type prunes partitions, blobs stay unread") {
    val dir = Files.createTempDirectory("graft-media-part").toString
    graft.operators.MultimodalOps.mediaTable(spark, sf)
      .write.partitionBy("media_type").mode("overwrite").parquet(dir)

    // a metadata-only query over one modality: the layout every
    // multimodal corpus wants — modality prunes at planning time AND
    // column pruning keeps the payload bytes out of the scan entirely
    val q = spark.read.parquet(dir)
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("meta.sample_rate").as("sr"))
    assert(q.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("media_type"),
      s"modality partition filter missing:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("payload"),
      s"blob column must be pruned from the scan: $readSchema")
  }
}

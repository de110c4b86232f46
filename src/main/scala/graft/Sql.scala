package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string interface: registers the test tables as temp views (plus
  * graft's SQL functions) so users can drive the engine with ANSI SQL
  * via `spark.sql` — on a cluster these views become catalog tables
  * and nothing else changes. */
object Sql {
  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  /** Register every table (and `events` with its µs-normalized ts) as a
    * temp view, and graft's native SQL functions. Idempotent. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    TableNames.foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    graft.functions.GraftExtensions.register(spark)
  }

  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(sql)
  }
}

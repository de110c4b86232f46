package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of one or all queries —
  * the scale audit loop (PushedFilters reaching the scan, broadcast vs
  * shuffle joins, WholeStageCodegen spans). Not part of the driver
  * contract. Usage: tools/run.sh graft.Explain <sfDir> [queryName] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_ == n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
      }
    spark.stop()
  }
}

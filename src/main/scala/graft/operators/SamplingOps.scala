package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling and class-balancing operators for training-data pipelines
  * (north star beyond the reference surface): deterministic hash-based
  * train/valid/test splits and per-class downsampling over the
  * driver's `documents` table.
  *
  * Why HASH sampling, not `df.sample()`: at 100 TB the split must be
  *   - reproducible across reruns/engines (rand() is neither),
  *   - stable under re-partitioning and appends (a doc keeps its split
  *     forever, so train never contaminates test between snapshots),
  *   - joinable (any table keyed by doc_id lands in the same split).
  * `md5(doc_id) → bucket ∈ [0,100)` gives all three, costs one scan
  * with zero shuffle, and the DuckDB oracle reproduces it bit-for-bit
  * (the repo-wide md5-parity convention, DedupOps.scala).
  */
object SamplingOps {

  /** Deterministic bucket in [0,100): first 4 md5 hex chars of the id. */
  private def bucket100(idCol: String) =
    conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int") % 100

  /** Train/valid/test assignment (80/10/10) + the 10% sample flag every
    * doc carries. Pure map-side column algebra — the assignment never
    * shuffles, and stratification needs no per-class pass because a
    * uniform hash is uniform within every class. */
  def qSampleSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket", bucket100("doc_id"))
      .select(col("doc_id"), col("lang"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test").as("split"),
        (col("bucket") < 10).as("in_10pct_sample"))
      .orderBy(col("doc_id"))

  val qSampleSplitOracle: String =
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, lang, bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
      |  bucket < 10 AS in_10pct_sample
      |FROM b ORDER BY doc_id""".stripMargin

  /** Per-class downsampling to a hard cap (here: ≤ 60 docs per lang),
    * deterministic by doc_id order — the class-balancing step before
    * training on skewed corpora. One shuffle on the class key; the
    * within-class sort is bounded by the largest class. If one class
    * dominates at 100 TB, pre-thin it with [[qSampleSplit]]-style hash
    * buckets FIRST (no sort at all), then cap exactly — the window is
    * the exactness pass, not the bulk-reduction pass. */
  def qBalanceClasses(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = 60
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .orderBy(col("lang"), col("rn"))
  }

  val qBalanceClassesOracle: String =
    """WITH rk AS (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, lang, rn FROM rk WHERE rn <= 60
      |ORDER BY lang, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split" -> (qSampleSplit _),
    "sample_balance_classes" -> (qBalanceClasses _))

  val oracles: Map[String, String] = Map(
    "sample_split" -> qSampleSplitOracle,
    "sample_balance_classes" -> qBalanceClassesOracle)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All of `SparkEntry.queries` resolves
  * inputs through here so the scan path is uniform: plain
  * `spark.read.parquet`, letting Catalyst push filters/projections
  * into the parquet scan. At cluster scale these would be partitioned
  * tables behind a catalog; the API surface stays the same.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` has shipped in two physical encodings across driver
    * testdata generations: TIMESTAMP(NANOS) parquet (which Spark's µs
    * timestamps can't hold — read as raw long nanos via the legacy flag
    * and floor-divided to µs with integer arithmetic, since a double
    * division would lose low bits above 2^53) and plain TIMESTAMP(µs)
    * (isAdjustedToUTC=false, so Spark infers TIMESTAMP_NTZ). Normalize
    * both to TimestampType: sessions pin spark.sql.session.timeZone=UTC,
    * so the NTZ→TZ cast is instant-preserving and downstream
    * window/extract semantics are identical across encodings. Oracles
    * still only compare ts at ≥1s granularity (date_trunc / time_bucket /
    * unix_seconds), never raw ts. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // The flag is session-level (set at session build by Bench/Verify/
    // tests). Set here ONLY if absent — a fallback for user-built
    // sessions — rather than unconditionally flipping a global legacy
    // conf on every table load. With µs parquet it is simply inert.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TZ cast below is instant-preserving ONLY under a UTC
    // session zone. Framework entry points (Bench/Verify/tests) pin it;
    // mirror the nanosAsLong fallback for user-built sessions so the
    // µs-NTZ encoding can't silently shift instants by a local offset.
    if (!spark.conf.getOption("spark.sql.session.timeZone").contains("UTC"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy ns-as-long testdata
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case TimestampNTZType => // µs, isAdjustedToUTC=false
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => // fail fast: a third encoding must be decided, not guessed
        throw new IllegalStateException(
          s"events.ts arrived as unexpected physical type $other; " +
            "known encodings are ns-as-long, TIMESTAMP(µs), and TIMESTAMP_NTZ(µs)")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Right-size ingest parallelism for compute-heavy map sides. A small
    * local fixture arrives as ONE parquet split, so every explode/hash
    * between the scan and the first shuffle serializes behind a single
    * task (measured: the blocked-Levenshtein DP ran 10.7 s
    * single-threaded at sf0.1 for ~1 s of 32-way work). Round-robin
    * repartition to the session parallelism ONLY when the scan yields
    * fewer splits than cores: at real scale the scan already has
    * thousands of splits and no exchange is inserted, so the 100 TB
    * plan never shuffles raw text just to spread it. */
  def spread(df: DataFrame): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }
}

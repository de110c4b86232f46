package graft.streaming

import org.apache.spark.sql.DataFrame

/** Batch-writer sinks for `CdcPipeline.muxFanout` — the Spark analogs
  * of the reference's sink registry (sink/sink.go:24-40): Kafka (K1),
  * stub/noop and console (K2), parquet files. Each is a
  * `DataFrame => Unit` over one micro-batch, so any of them can
  * subscribe to a fan-out, mirroring `sink.Subscribe`.
  */
object Sinks {

  /** K1 Kafka sink: expects the (topic, key, value) wire frame from
    * `CdcPipeline.toWire`. The topic column routes per record —
    * Spark's Kafka writer does per-topic batching and key-hash
    * partitioning natively (the reference's generateBatches + hash
    * balancer, sink/kafka/kafka.go:169-215,71). acks=all matches the
    * reference default requiredAcks=-1 (kafka.go:62-68); its lossy
    * async mode is deliberately not offered.
    * No broker exists in this sandbox, so this writer is exercised
    * only for plan construction, not delivery. */
  def kafka(bootstrapServers: String)(batch: DataFrame): Unit =
    batch.write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("kafka.acks", "all")
      .save()

  /** K2 stub sink: counts and discards (stub/stub.go:24-37 with
    * logOnly=false). The noop format still executes the full plan —
    * it is the throughput-measurement sink. */
  def noop(batch: DataFrame): Unit =
    batch.write.format("noop").mode("overwrite").save()

  /** K2 log sink: prints a bounded sample (stub logOnly=true). */
  def console(n: Int = 20)(batch: DataFrame): Unit =
    batch.show(n, truncate = false)

  /** Parquet file sink partitioned by topic (per-topic directories —
    * the file-based analog of per-topic Kafka batches). */
  def parquet(outDir: String)(batch: DataFrame): Unit =
    batch.write.mode("append").partitionBy("topic").parquet(outDir)

  /** Wrap any sink with E1 retry semantics: transient failures retry
    * on an interval, permanent ones abort the batch (mux/mux.go:173-189). */
  def withRetry(sink: DataFrame => Unit, intervalMs: Long = 100L,
                maxAttempts: Option[Int] = None)(batch: DataFrame): Unit =
    Retry.retryForever(intervalMs, maxAttempts) { sink(batch) }

  /** Idempotent file sink: each epoch OVERWRITES its own
    * `batch=<epochId>` directory, so a replayed epoch (crash before
    * checkpoint commit, or a deliberate rewind) replaces its previous
    * partial output instead of appending duplicates. This turns the
    * at-least-once replay contract into exactly-once OUTPUT without
    * any dedup state — the (epochId → deterministic batch content)
    * mapping from the checkpoint is the whole trick, and it is the
    * standard upgrade the reference cannot express (its sinks are
    * append-only, README.md:58). */
  def idempotentParquet(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
}

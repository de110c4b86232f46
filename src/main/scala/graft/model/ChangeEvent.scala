package graft.model

import org.apache.spark.sql.types._

/** The engine's one fundamental record type: a change-data-capture event
  * envelope, re-expressed for Spark.
  *
  * Mirrors the reference's `Event` struct (reference: event/event.go:24-34):
  * origin coordinates (host/database/table), an action enum
  * (insert|update|delete, event/event.go:8-21), a monotone WAL position,
  * processing timestamp, per-event UUID assigned at ingest
  * (source/postgres/postgres.go:349-350), and a dynamic row image.
  *
  * The row image is `Map[String,String]`: the reference's
  * `map[string]interface{}` degrades to JSON-typed values on its Kafka hop
  * anyway (source/kafka/kafka.go:180), so a string map is the lossless
  * canonical form; typed per-table views are derived with `from_json` +
  * a per-table schema, never stored.
  */
case class ChangeEvent(
    host: String,
    database: String,
    table: String,
    action: String,
    walPosition: Long,
    timestamp: java.sql.Timestamp,
    uuid: String,
    columns: Map[String, String])

object ChangeEvent {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val ValidActions: Seq[String] = Seq(Insert, Update, Delete)

  /** Envelope schema for from_json / streaming sources (README.md:12-25
    * wire shape, lower_snake field names on the Spark side). */
  val schema: StructType = StructType(Seq(
    StructField("host", StringType, nullable = false),
    StructField("database", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("walPosition", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("uuid", StringType, nullable = false),
    StructField("columns", MapType(StringType, StringType), nullable = true)))
}

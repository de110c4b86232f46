package graft.streaming

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** M4 — file-driven topology configuration, the Spark analog of the
  * reference's TOML loader (config.go:34-120, psql-streamer.toml).
  * The reference validates at load: at least one source, at least one
  * sink, every sink lists ≥1 source, every listed source exists
  * ("Sink 'x': source 'y' undefined", config.go:98-110). Duplicate
  * component names are impossible in its TOML (sections merge) so we
  * make them an explicit error instead.
  *
  * The syntax is the TOML subset the reference's config actually uses:
  * `key = value` pairs, `[section.name]` headers, `"strings"`, ints,
  * bools, `[ "arrays" ]`, inline tables `{ k = "v" }`, `#` comments.
  * No dependency needed — ~60 lines of parser for an offline sandbox.
  *
  * Recognized keys (reference names kept where they exist):
  * {{{
  * checkpointRoot = "/ckpt"            # ≡ boltdb path (progress store)
  * [source.db1]
  * type = "file"                       # sandbox stand-in for postgres/kafka
  * dir = "/in"                         # the stream directory
  * batchSize = 1                       # ≡ mux batchSize → maxFilesPerTrigger
  * batchFlushInterval = 1000           # ms, ≡ mux flush → trigger interval
  * dedupWatermark = "10 minutes"       # optional; omit to disable dedup
  * [sink.k1]
  * type = "parquet" | "noop" | "console" | "kafka"
  * sources = [ "db1" ]                 # subscribe-by-name
  * tableTopicMapping = { users = "t.users" }
  * topicFallback = "t.fallback"        # absent → unmapped rows dropped
  * path = "/out"                       # parquet only
  * hosts = [ "b1:9092" ]               # kafka only
  * }}}
  */
object TopologyConfig {

  final case class ConfigError(msg: String) extends IllegalArgumentException(msg)

  // ---- minimal TOML-subset parser ----

  /** One parsed section: name → flat key/value map (values are String,
    * Long, Boolean, Seq[String], or Map[String,String]). */
  type Section = Map[String, Any]

  private[streaming] def parse(text: String): Map[String, Section] = {
    val sections = mutable.LinkedHashMap[String, mutable.Map[String, Any]]()
    var current = sections.getOrElseUpdate("", mutable.Map())
    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty)
      .foreach { line =>
        if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          if (sections.contains(name))
            throw ConfigError(s"duplicate section '$name'")
          current = sections.getOrElseUpdate(name, mutable.Map())
        } else line.split("=", 2) match {
          case Array(k, v) => current(k.trim) = parseValue(v.trim, line)
          case _ => throw ConfigError(s"unparseable line: $line")
        }
      }
    sections.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** `#` starts a comment unless inside a quoted string. */
  private def stripComment(line: String): String = {
    var inStr = false
    val i = line.indexWhere { c =>
      if (c == '"') { inStr = !inStr; false } else c == '#' && !inStr
    }
    if (i < 0) line else line.substring(0, i)
  }

  private def unquote(s: String, ctx: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      t.substring(1, t.length - 1)
    else throw ConfigError(s"expected quoted string at: $ctx")
  }

  /** Split `s` on commas that sit OUTSIDE quoted strings — a bare
    * split(",") would mis-split a quoted topic name containing a comma
    * (same in-string scan as [[stripComment]]). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false
    s.foreach { c =>
      if (c == '"') { inStr = !inStr; cur.append(c) }
      else if (c == ',' && !inStr) { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.toSeq
  }

  private def parseValue(v: String, line: String): Any = v match {
    case "" => throw ConfigError(s"empty value at: $line")
    case s if s.startsWith("\"") => unquote(s, line)
    case "true" => true
    case "false" => false
    case s if s.startsWith("[") && s.endsWith("]") =>
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Seq.empty[String]
      else splitTop(inner).map(unquote(_, line)).toSeq
    case s if s.startsWith("{") && s.endsWith("}") =>
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) Map.empty[String, String]
      else splitTop(inner).map { kv =>
        kv.split("=", 2) match {
          case Array(k, value) => k.trim -> unquote(value, line)
          case _ => throw ConfigError(s"bad inline table entry '$kv' at: $line")
        }
      }.toMap
    case s =>
      try java.lang.Long.parseLong(s): Any
      catch { case _: NumberFormatException =>
        throw ConfigError(s"unrecognized value '$s' at: $line") }
  }

  // ---- section → Topology.Config mapping ----

  private def str(s: Section, key: String, who: String): String = s.get(key) match {
    case Some(v: String) => v
    case Some(other) => throw ConfigError(s"$who: '$key' must be a string, got $other")
    case None => throw ConfigError(s"$who: '$key' is required")
  }

  private def long(s: Section, key: String, dflt: Long): Long = s.get(key) match {
    case Some(v: Long) => v
    case Some(other) => throw ConfigError(s"'$key' must be an integer, got $other")
    case None => dflt
  }

  private def writerFor(name: String, s: Section): DataFrame => Unit =
    str(s, "type", s"Sink '$name'") match {
      case "parquet" => Sinks.withRetry(Sinks.parquet(str(s, "path", s"Sink '$name'")))
      case "noop"    => Sinks.noop
      case "console" => Sinks.console()
      case "kafka"   =>
        val hosts = s.get("hosts") match {
          case Some(h: Seq[_]) if h.nonEmpty => h.mkString(",")
          case _ => throw ConfigError(s"Sink '$name': 'hosts' is required for kafka")
        }
        Sinks.withRetry(Sinks.kafka(hosts))
      case t => throw ConfigError(s"Sink '$name': unknown type '$t'")
    }

  /** Parse config text into a validated [[Topology.Config]]. Mirrors
    * configLoad's error surface: no sources / no sinks / sink without
    * sources / sink subscribing to an undefined source / duplicates. */
  def fromString(text: String): Topology.Config = {
    val sections = parse(text)
    val top = sections.getOrElse("", Map.empty)
    val checkpointRoot = top.get("checkpointRoot") match {
      case Some(v: String) => v
      case _ => throw ConfigError("You need to specify checkpointRoot")
    }

    val sources = sections.collect { case (name, s) if name.startsWith("source.") =>
      val sn = name.stripPrefix("source.")
      Topology.SourceConf(
        name = sn,
        dir = str(s, "dir", s"Source '$sn'"),
        maxFilesPerTrigger = long(s, "batchSize", 1L).toInt,
        triggerMs = long(s, "batchFlushInterval", 1000L),
        dedupWatermark = s.get("dedupWatermark").map(_.toString))
    }.toSeq
    if (sources.isEmpty) throw ConfigError("No sources defined")

    val sinks = sections.collect { case (name, s) if name.startsWith("sink.") =>
      val sn = name.stripPrefix("sink.")
      val srcs = s.get("sources") match {
        case Some(xs: Seq[_]) if xs.nonEmpty => xs.map(_.toString)
        case _ => throw ConfigError(s"Sink '$sn': no sources defined")
      }
      val mapping = s.get("tableTopicMapping") match {
        case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v.toString }
        case None => Map.empty[String, String]
        case Some(other) => throw ConfigError(
          s"Sink '$sn': tableTopicMapping must be an inline table, got $other")
      }
      val fallback = s.get("topicFallback").map(_.toString)
      if (mapping.isEmpty && fallback.isEmpty)
        throw ConfigError(s"Sink '$sn': at least one of tableTopicMapping or topicFallback")
      Topology.SinkConf(sn, srcs, mapping, fallback, writerFor(sn, s))
    }.toSeq
    if (sinks.isEmpty) throw ConfigError("No sinks defined")

    val srcNames = sources.map(_.name).toSet
    for (sk <- sinks; ref <- sk.sources if !srcNames.contains(ref))
      throw ConfigError(s"Sink '${sk.name}': source '$ref' undefined")

    Topology.Config(sources, sinks, checkpointRoot).validated
  }

  /** Load from a file path (configLoad's entry shape, config.go:34-43). */
  def fromFile(path: String): Topology.Config =
    fromString(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}

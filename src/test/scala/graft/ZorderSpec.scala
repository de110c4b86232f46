package graft

import graft.operators.SamplingOps
import org.apache.spark.sql.functions._

/** Z-order layout verification: driver-side Morton reimplementation
  * equality, the data-skipping pigeonhole (any single-column equality
  * predicate touches at most 8 of 64 shards — the property the layout
  * exists to provide), and the single-shuffle plan. */
class ZorderSpec extends SparkSpec {

  private def morton(x: Long, y: Long): Long =
    (0 until 8).map(b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum

  private lazy val rows: Array[(Long, Long, Long)] =
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_partkey") % 256).cast("long"),
        (col("l_suppkey") % 256).cast("long"))
      .collect()
      .map { r =>
        val (x, y) = (r.getLong(0), r.getLong(1))
        (x, y, morton(x, y) / 1024)
      }

  test("zorder layout equals a driver-side Morton reimplementation") {
    val want = rows.groupBy(_._3).toSeq.sortBy(_._1).map { case (s, rs) =>
      (s, rs.length.toLong, rs.map(_._1).distinct.length.toLong,
        rs.map(_._2).distinct.length.toLong)
    }
    val got = SamplingOps.qZorderLayout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === want)
    assert(got.map(_._2).sum === rows.length, "shards partition the table")
  }

  test("zorder skipping: any x (or y) equality predicate touches at most 8 of 64 shards") {
    // shard = the 3 high Z-bits of each dimension interleaved, so a
    // fixed x pins 3 of the 6 shard bits — 8 reachable shards, ever
    rows.groupBy(_._1).foreach { case (x, rs) =>
      assert(rs.map(_._3).distinct.length <= 8, s"x=$x spans too many shards")
    }
    rows.groupBy(_._2).foreach { case (y, rs) =>
      assert(rs.map(_._3).distinct.length <= 8, s"y=$y spans too many shards")
    }
  }

  test("zorder plan: map-only Z-address, one aggregate shuffle") {
    val p = SamplingOps.qZorderLayout(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), "the Z-address is bit algebra, never a join")
    val parts = p.linesIterator
      .filter(_.startsWith("Arguments: "))
      .filter(_.contains("hashpartitioning(")).toSeq
    // the distinct-count rollup is two-phase (expand + final), but
    // every shuffle must carry the shard key — the layout write's
    // partitioning — and nothing else may shuffle
    assert(parts.nonEmpty && parts.size <= 2 &&
      parts.forall(_.contains("shard")),
      s"all shuffles must key on shard, got: $parts")
  }

  test("compaction plan equals a driver-side first-fit packing pass; rows conserved") {
    val events = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
        hour(col("ts")).as("hr"), length(col("props")).as("pb"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2).toLong))
    val manifest = events.groupBy(t => (t._1, t._2)).map { case ((d, h), v) =>
      (d, h, v.size.toLong, v.map(_._3).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    val packed = manifest.groupBy(_._1).flatMap { case (d, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, h, rows, bytes) =>
        val bin = cum / 1000L; cum += bytes; (d, bin, h, rows, bytes)
      }
    }
    val want = packed.groupBy(t => (t._1, t._2)).map { case ((d, b), v) =>
      (d, b, v.size.toLong, v.map(_._5).sum, v.map(_._4).sum,
        v.map(_._3).min, v.map(_._3).max,
        v.count(_._5 < 250).toLong)
    }.toSet
    val got = SamplingOps.qCompactionPlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6), r.getLong(7)))
      .toSet
    assert(got === want)
    // conservation: every event lands in exactly one bin
    assert(got.toSeq.map(_._5).sum === events.length.toLong)
    // sf0.001's days each fit one bin; the multi-bin splitting is
    // exercised by the sf0.01 oracle run (93 bins over 30 days)
    assert(got.forall(_._2 >= 0L))
  }

  test("compaction plan: metadata-scale shuffles only, join-free") {
    val p = SamplingOps.qCompactionPlan(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), s"planner must be join-free:\n$p")
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    // manifest agg (day,hr) + window (day, reused by the bin rollup) +
    // output sort — the window partitioning must satisfy the rollup
    assert(exchanges <= 3, s"expected <=3 shuffles, got $exchanges:\n$p")
  }
}

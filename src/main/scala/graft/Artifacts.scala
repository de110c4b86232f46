package graft

import org.apache.spark.sql.SparkSession

/** Durable, dataset-keyed artifact store for the "mine once, serve
  * many" relations (ANN edge graph, text near-dup edge graph,
  * incremental-dedup signature index, sign-LSH serving index, IVFPQ
  * code table).
  *
  * Until r8 these were memoized per JVM in `createTempDirectory`
  * paths, so a fresh process (every chunked-bench child, every new
  * production session) re-paid the full mining pass the stored
  * variants exist to amortize — the committed stored-query prices
  * included the build they claimed to skip. This store writes each
  * artifact ONCE to a deterministic path under the Spark warehouse:
  *
  * {{{ <spark.sql.warehouse.dir>/graft_artifacts/<datasetKey>/<name> }}}
  *
  * and existence-checks before building, so separate JVMs (bench
  * chunks, verify, interactive sessions) all reuse one materialization
  * — the honest lake-artifact story a production pipeline runs.
  *
  * Refresh story: `datasetKey` hashes the dataset directory's file
  * listing (relative path, mtime, size of every regular file at any
  * depth, so single-file, directory-shaped, and deeply partitioned
  * parquet tables are all covered).
  * Regenerated input data therefore yields a NEW key directory and the
  * artifact rebuilds automatically; stale keys are dead weight under a
  * gitignored warehouse and can be deleted wholesale
  * (`rm -rf spark-warehouse/graft_artifacts`) at any time — every
  * consumer existence-checks, nothing caches the path across datasets.
  *
  * Concurrent/crashed builders: the artifact is built into a
  * pid-suffixed sibling directory and atomically renamed into place,
  * so a half-written build is never observable at the final path; a
  * racing builder that loses the rename discards its copy and serves
  * the winner's.
  */
object Artifacts {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  /** Per-JVM memo of resolved artifact paths — avoids re-hashing the
    * dataset listing on every query; the DISK existence check below is
    * what carries reuse across JVMs. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test hook: drop the in-JVM memo so a spec can observe the
    * DISK-level reuse path (the one fresh JVMs take). */
  private[graft] def clearMemoForTests(): Unit = memo.clear()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic key for a dataset directory: its absolute path plus
    * the (relative-path, mtime, size) of every file at ANY depth
    * (ADVICE r9: a depth-capped listing missed in-place rewrites deep
    * inside multi-column-partitioned layouts that keep filename and
    * directory mtimes — `Files.walk` sees every leaf, so any
    * regeneration of the parquet inputs changes the key).
    *
    * Mtimes are hashed at NANOSECOND granularity (ADVICE r10: at
    * millis, a regeneration completing within the same millisecond
    * with byte-identical sizes kept the old key and silently served
    * stale artifacts). The residual window is the filesystem's own
    * timestamp resolution — ext4/xfs/btrfs all store nanoseconds, so
    * in practice a same-key regeneration now requires identical
    * content timing down to the ns, plus identical sizes. */
  private[graft] def datasetKey(sfDir: String): String = {
    val root = Paths.get(sfDir).toAbsolutePath.normalize
    val listing: Seq[String] =
      if (!Files.exists(root)) Seq.empty
      else {
        val s = Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => Files.isRegularFile(p))
            .map(p => s"${root.relativize(p)}:${Files.getLastModifiedTime(p).to(java.util.concurrent.TimeUnit.NANOSECONDS)}:${Files.size(p)}")
            .toSeq.sorted
        } finally s.close()
      }
    md5Hex((root.toString +: listing).mkString("\n")).take(16)
  }

  /** `spark.sql.warehouse.dir` as a local path (it is a file: URI in
    * local mode — the only mode this store supports; on a real cluster
    * the same layout lands on the shared warehouse filesystem). */
  private def warehouseRoot(spark: SparkSession): Path = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val uri = new java.net.URI(wh)
    if (uri.getScheme == null) Paths.get(wh) else Paths.get(uri)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }

  /** The stored location for artifact `name` of dataset `sfDir`,
    * building it via `build(tmpPath)` only if absent on disk. `build`
    * must write the complete artifact (e.g. `df.write.parquet(dir)`)
    * into the directory it is handed; the rename into the final path
    * happens only after it returns. */
  def getOrBuild(spark: SparkSession, sfDir: String, name: String)(
      build: String => Unit): String =
    getOrBuildMeta(spark, sfDir, name) { d => build(d); "" }._1

  /** As [[getOrBuild]], but `build` also returns a small metadata
    * string (e.g. the frozen LSH plane count) persisted as
    * `_graft_meta` inside the artifact directory — underscore-prefixed
    * so Spark's parquet reader ignores it like `_SUCCESS`. Returns
    * (path, meta), with meta re-read from disk on reuse so fresh JVMs
    * recover it without recomputing. */
  def getOrBuildMeta(spark: SparkSession, sfDir: String, name: String)(
      build: String => String): (String, String) = {
    // NOT computeIfAbsent (ADVICE r10): a build closure that resolves a
    // DEPENDENT artifact (e.g. the curated LM building on top of the raw
    // unigram LM) would re-enter this map from inside a mapping function
    // — if both keys hash into the same locked bin, ConcurrentHashMap
    // throws IllegalStateException("Recursive update"). The memo is only
    // a path cache; correctness under concurrent builders lives in the
    // DISK protocol (atomic rename, loser discards), so plain
    // get → build-outside-the-lock → putIfAbsent is sufficient and
    // makes nested getOrBuild calls safe. The worst case — two threads
    // of ONE JVM both reaching buildOnce — is the same lost-rename race
    // two separate JVMs already resolve.
    val memoKey = s"$sfDir::$name"
    val dir = Option(memo.get(memoKey)).getOrElse {
      val d = buildOnce(spark, sfDir, name, build, retry = true)
      memo.putIfAbsent(memoKey, d)
      d
    }
    val metaFile = Paths.get(dir).resolve("_graft_meta")
    val meta =
      if (Files.exists(metaFile)) new String(Files.readAllBytes(metaFile), "UTF-8")
      else ""
    (dir, meta)
  }

  private def buildOnce(spark: SparkSession, sfDir: String, name: String,
      build: String => String, retry: Boolean): String = {
    val keyRoot = warehouseRoot(spark)
      .resolve("graft_artifacts").resolve(datasetKey(sfDir))
    val dest = keyRoot.resolve(name)
    if (!Files.exists(dest)) {
      Files.createDirectories(keyRoot)
      // provenance marker: which dataset this key dir derives from.
      // The key itself is a hash, so without the marker a GC pass
      // cannot tell "stale key of dataset X" from "live key of
      // dataset Y" — with it, [[gcStale]] can retire superseded
      // keys per dataset instead of `rm -rf`ing the whole store.
      val marker = keyRoot.resolve("_graft_dataset")
      if (!Files.exists(marker))
        Files.write(marker, Paths.get(sfDir).toAbsolutePath.normalize
          .toString.getBytes("UTF-8"))
      val tmp = keyRoot.resolve(s"$name.build-${ProcessHandle.current().pid()}")
      deleteRecursively(tmp)
      val meta = build(tmp.toString)
      if (meta.nonEmpty)
        Files.write(tmp.resolve("_graft_meta"), meta.getBytes("UTF-8"))
      try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
      catch { case e: java.nio.file.FileSystemException =>
        // Either a concurrent builder won the rename race (dest now
        // exists — serve its copy) or the move failed for a real
        // reason (permissions, I/O). ADVICE r9: only the former may
        // be swallowed — treating an I/O failure as a lost race
        // would memoize a path that never materializes and every
        // downstream read would fail obscurely for the JVM lifetime.
        deleteRecursively(tmp)
        if (!Files.exists(dest)) {
          // ADVICE r10: a concurrent [[gcStale]] racing a regeneration
          // can delete this (now-stale) key dir mid-build, taking the
          // pid-suffixed tmp with it — then NEITHER tmp nor dest
          // exists. That is a retriable state, not an I/O fault: the
          // rebuild recreates the key dir (against the now-current
          // key if the data changed) and lands cleanly. One retry
          // only — a second consecutive vanishing act means something
          // other than GC is deleting the warehouse, and that should
          // surface.
          if (retry && !Files.exists(tmp))
            return buildOnce(spark, sfDir, name, build, retry = false)
          throw e
        }
      }
    }
    dest.toString
  }

  /** GARBAGE-COLLECT superseded artifact keys for `sfDir`: every key
    * directory whose `_graft_dataset` marker names this dataset but
    * whose key is no longer the dataset's CURRENT key (the data was
    * regenerated, so a new key directory took over) is deleted
    * recursively. Keys of OTHER datasets sharing the warehouse are
    * never touched, and neither is the current key. Returns the
    * deleted paths. Safe to run any time: every consumer
    * existence-checks through [[getOrBuildMeta]], and a builder racing
    * this GC in a stale key — whose pid-suffixed tmp dir this delete
    * takes down mid-build — hits the vanished-tmp branch of the move
    * handler and rebuilds once against the current key (ADVICE r10:
    * before that retry, the race crashed the concurrent session).
    *
    * This is the retention half of the artifact lifecycle
    * (build → reuse → refresh → RETIRE): without it a recurring
    * regeneration (nightly snapshots) leaks one dead key directory —
    * i.e. a full mined-edge/index copy — per refresh. */
  def gcStale(spark: SparkSession, sfDir: String): Seq[String] = {
    val root = warehouseRoot(spark).resolve("graft_artifacts")
    if (!Files.exists(root)) return Seq.empty
    val current = datasetKey(sfDir)
    val dataset = Paths.get(sfDir).toAbsolutePath.normalize.toString
    val doomed = {
      val s = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter { kd =>
          Files.isDirectory(kd) && kd.getFileName.toString != current && {
            val m = kd.resolve("_graft_dataset")
            Files.exists(m) &&
              new String(Files.readAllBytes(m), "UTF-8") == dataset
          }
        }.toList
      } finally s.close()
    }
    doomed.foreach(deleteRecursively)
    doomed.map(_.toString)
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Contract specs for the durable lake-artifact store: build-once,
  * disk-level reuse across "fresh JVMs" (simulated by dropping the
  * in-process memo), metadata round-trip from disk, and dataset-keyed
  * invalidation when the input data changes. */
class ArtifactsSpec extends SparkSpec {

  private def freshDataset(): String = {
    val d = Files.createTempDirectory("graft_art_ds")
    Files.write(d.resolve("t.parquet"), "payload".getBytes("UTF-8"))
    d.toString
  }

  test("build runs once; later calls and fresh-JVM (memo-cleared) calls reuse disk") {
    val ds = freshDataset()
    var builds = 0
    def get(): String = Artifacts.getOrBuild(spark, ds, "spec_a") { dir =>
      builds += 1
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "part-0"), "x".getBytes("UTF-8"))
    }
    val p1 = get()
    val p2 = get()
    assert(builds === 1 && p1 === p2)
    // the cross-JVM path: memo gone, artifact found on disk, no rebuild
    Artifacts.clearMemoForTests()
    val p3 = get()
    assert(builds === 1 && p3 === p1, "disk existence check must prevent rebuild")
    assert(Files.exists(Paths.get(p1, "part-0")))
    // the artifact lands under the warehouse, keyed per dataset
    assert(p1.contains("graft_artifacts"))
  }

  test("metadata survives the disk round-trip for a fresh JVM") {
    val ds = freshDataset()
    var builds = 0
    def get(): (String, String) =
      Artifacts.getOrBuildMeta(spark, ds, "spec_meta") { dir =>
        builds += 1
        Files.createDirectories(Paths.get(dir))
        Files.write(Paths.get(dir, "part-0"), "x".getBytes("UTF-8"))
        "k=7"
      }
    assert(get() === (get()._1, "k=7") && builds === 1)
    Artifacts.clearMemoForTests()
    val (dir, meta) = get()
    assert(builds === 1 && meta === "k=7",
      "meta must be re-read from the _graft_meta sidecar, not recomputed")
    // sidecar is underscore-prefixed so parquet readers skip it
    assert(Files.exists(Paths.get(dir, "_graft_meta")))
  }

  test("regenerated input data yields a new key directory and rebuilds") {
    val ds = freshDataset()
    var builds = 0
    def get(): String = Artifacts.getOrBuild(spark, ds, "spec_k") { dir =>
      builds += 1
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "part-0"), "x".getBytes("UTF-8"))
    }
    val p1 = get()
    val k1 = Artifacts.datasetKey(ds)
    // regenerate the dataset: different content + mtime
    Thread.sleep(5)
    Files.write(Paths.get(ds, "t.parquet"), "payload-v2!".getBytes("UTF-8"))
    val k2 = Artifacts.datasetKey(ds)
    assert(k1 != k2, "listing hash must change when inputs change")
    Artifacts.clearMemoForTests()
    val p2 = get()
    assert(builds === 2 && p1 != p2, "new key must trigger a rebuild")
  }

  test("a crashed half-written build directory is never served") {
    val ds = freshDataset()
    // simulate a crashed builder: a leftover .build- dir with no rename
    val keyRoot = Paths.get(
      Artifacts.getOrBuild(spark, ds, "spec_crash") { dir =>
        Files.createDirectories(Paths.get(dir))
      }).getParent
    val stale = keyRoot.resolve("spec_other.build-99999")
    Files.createDirectories(stale)
    Files.write(stale.resolve("partial"), "junk".getBytes("UTF-8"))
    var built = false
    val p = Artifacts.getOrBuild(spark, ds, "spec_other") { dir =>
      built = true
      Files.createDirectories(Paths.get(dir))
    }
    assert(built, "half-written build dirs must not satisfy the existence check")
    assert(!p.contains(".build-"))
  }

  test("gcStale retires superseded keys of the SAME dataset only; current key and other datasets survive") {
    val ds = freshDataset()
    val other = freshDataset()
    def build(d: String, name: String): String =
      Artifacts.getOrBuild(spark, d, name) { dir =>
        Files.createDirectories(Paths.get(dir))
        Files.write(Paths.get(dir, "part-0"), "x".getBytes("UTF-8"))
      }
    val stalePath = build(ds, "spec_gc")
    val otherPath = build(other, "spec_gc_other")
    // regenerate ds → new key; the old key dir is now dead weight
    Thread.sleep(5)
    Files.write(Paths.get(ds, "t.parquet"), "regenerated!".getBytes("UTF-8"))
    Artifacts.clearMemoForTests()
    val freshPath = build(ds, "spec_gc")
    assert(freshPath != stalePath, "regeneration must take a new key")
    val deleted = Artifacts.gcStale(spark, ds)
    // exactly the superseded key dir went; marker made it attributable
    assert(deleted.exists(stalePath.startsWith),
      s"stale key must be collected: $deleted vs $stalePath")
    assert(!Files.exists(Paths.get(stalePath)), "stale artifact gone")
    assert(Files.exists(Paths.get(freshPath, "part-0")), "current key survives")
    assert(Files.exists(Paths.get(otherPath, "part-0")),
      "other datasets' keys are never touched")
    // idempotent: a second pass finds nothing
    assert(Artifacts.gcStale(spark, ds).isEmpty)
  }

  test("a build closure may resolve a DEPENDENT artifact (nested getOrBuild)") {
    // ADVICE r10: the curated-LM build resolves the raw unigram LM from
    // INSIDE its own build closure. Under computeIfAbsent that was a
    // latent IllegalStateException("Recursive update") whenever the two
    // keys hashed into the same ConcurrentHashMap bin; the store now
    // memoizes outside the map lock, so nesting is a supported pattern.
    val ds = freshDataset()
    var innerBuilds, outerBuilds = 0
    def inner(): (String, String) =
      Artifacts.getOrBuildMeta(spark, ds, "spec_nest_inner") { dir =>
        innerBuilds += 1
        Files.createDirectories(Paths.get(dir))
        "v=3"
      }
    val (outerPath, outerMeta) =
      Artifacts.getOrBuildMeta(spark, ds, "spec_nest_outer") { dir =>
        outerBuilds += 1
        Files.createDirectories(Paths.get(dir))
        val (_, m) = inner()   // nested resolution, inner not yet built
        s"derived:$m"
      }
    assert(innerBuilds === 1 && outerBuilds === 1)
    assert(outerMeta === "derived:v=3")
    assert(Files.exists(Paths.get(outerPath)))
    // both artifacts independently resolvable afterwards, no rebuild
    assert(inner() === (inner()._1, "v=3") && innerBuilds === 1)
  }

  test("a builder whose tmp dir is deleted mid-build (racing GC) retries once and lands") {
    // ADVICE r10: gcStale racing a builder in a superseded key deletes
    // the pid-suffixed tmp directory out from under the Files.move —
    // neither tmp nor dest exists, which must rebuild, not crash.
    val ds = freshDataset()
    var builds = 0
    val p = Artifacts.getOrBuild(spark, ds, "spec_race") { dir =>
      builds += 1
      Files.createDirectories(Paths.get(dir))
      Files.write(Paths.get(dir, "part-0"), "x".getBytes("UTF-8"))
      if (builds == 1) {
        // simulate the GC: the whole tmp tree vanishes before the move
        val tmp = Paths.get(dir)
        Files.deleteIfExists(tmp.resolve("part-0"))
        Files.deleteIfExists(tmp)
      }
    }
    assert(builds === 2, "vanished tmp must trigger exactly one retry")
    assert(Files.exists(Paths.get(p, "part-0")), "retried build must land")
  }
}

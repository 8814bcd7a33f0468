package graft.etl

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The shared fingerprint-cached-build helper behind the q48/q59/q61
  * gates: Hadoop-FS listing (scheme-resolved, never java.io.File),
  * content-sampled fingerprints, marker-gated builds. */
class BuildCacheSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmpDir(): String =
    Files.createTempDirectory("graft_buildcache").toString

  test("listDataFiles goes through the scheme-resolved FileSystem and skips bookkeeping files") {
    val base = tmpDir()
    Files.writeString(Paths.get(base, "part-0.parquet"), "data0")
    Files.writeString(Paths.get(base, "part-1.parquet"), "data1")
    Files.writeString(Paths.get(base, "_SUCCESS"), "")
    Files.writeString(Paths.get(base, ".hidden.crc"), "x")
    // explicit file: URI — the same code path an hdfs:// or s3a:// URI
    // takes (Path.getFileSystem resolves the scheme), unlike java.io.File
    // which would list NOTHING for any non-local URI
    val listed = BuildCache.listDataFiles(spark, s"file:$base")
    assert(listed.map(_.getPath.getName).sorted == Seq("part-0.parquet", "part-1.parquet"))
    assert(BuildCache.listDataFiles(spark, s"$base/does-not-exist").isEmpty)
  }

  test("pathFingerprint detects an in-place content change at identical size AND mtime") {
    val base = tmpDir()
    val f = Paths.get(base, "part-0.parquet")
    Files.writeString(f, "aaaaaaaa")
    val mtime = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    Files.setLastModifiedTime(f, mtime)
    val fp1 = BuildCache.pathFingerprint(spark, base)
    // regenerate in-place: same path, same length, same mtime — only the
    // bytes differ. A stat-only fingerprint is blind to this (the r4
    // advisor's stale-warm-hit hazard); the head/tail sample is not.
    Files.writeString(f, "bbbbbbbb")
    Files.setLastModifiedTime(f, mtime)
    val fp2 = BuildCache.pathFingerprint(spark, base)
    assert(fp1 != fp2, "content sample must break the stat-collision")
    // and it is stable when nothing changed
    assert(fp2 == BuildCache.pathFingerprint(spark, base))
  }

  test("cachedBuild: cold runs, warm skips, new fingerprint rebuilds, crashed build never warm") {
    val out = s"${tmpDir()}/out"
    var builds = 0
    def build(): Unit = {
      builds += 1
      spark.range(10).write.mode("overwrite").parquet(out)
    }
    assert(BuildCache.cachedBuild(spark, out, "fp-A") { build() })
    assert(!BuildCache.cachedBuild(spark, out, "fp-A") { build() })
    assert(builds == 1, "second run with same fingerprint must skip the build")
    assert(BuildCache.cachedBuild(spark, out, "fp-B") { build() })
    assert(builds == 2, "a changed fingerprint must rebuild")
    // a build that throws must not leave a warm marker for its fingerprint
    intercept[RuntimeException] {
      BuildCache.cachedBuild(spark, out, "fp-C") { throw new RuntimeException("boom") }
    }
    assert(BuildCache.cachedBuild(spark, out, "fp-C") { build() },
      "a crashed build must stay cold")
  }
}

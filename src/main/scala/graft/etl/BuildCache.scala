package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared infrastructure for fingerprint-cached one-time builds — the
  * bucketed-table, range-clustered-layout and compaction gates all pay an
  * expensive materialization ONCE and must skip it when their input is
  * unchanged. Three rules, learned across rounds and now enforced in one
  * place instead of three hand-rolled copies:
  *
  *  1. ALL file metadata goes through the Hadoop `FileSystem` API resolved
  *     from the path. `java.io.File` silently returns an empty listing on
  *     any non-local URI (hdfs://, s3a:// — the actual home of a 100 TB
  *     table), which downstream turns into `totalBytes = 0` and a
  *     `coalesce(1)` of the whole table. Here an empty listing is LOUD:
  *     callers that need files `require` them.
  *
  *  2. Fingerprint = sorted (path, length, mtime) of every data file,
  *     PLUS a head/tail byte sample per file (capped at
  *     `ContentSampleMaxFiles` files). Stat-only fingerprints go stale on
  *     filesystems with second-granularity mtimes when data is
  *     regenerated in-place at identical size within the same second —
  *     the content sample closes that hole for a bounded extra read. Past
  *     the cap we degrade to stat-only: at 100 TB the listing itself is
  *     the practical identity, and per-file reads would turn a metadata
  *     operation into a data scan.
  *
  *  3. Warm/cold is decided by a `_GRAFT_FINGERPRINT` marker INSIDE the
  *     build output (underscore files are invisible to parquet readers,
  *     like `_SUCCESS`). The marker is written only AFTER a successful
  *     build, so a crashed build can never present as warm; a marker for
  *     a different fingerprint (stale cache after input regeneration)
  *     misses and rebuilds.
  */
object BuildCache {

  /** Files visible to a parquet reader under `path` (recursive), via the
    * Hadoop FileSystem resolved from the path's scheme — works identically
    * for file:, hdfs:, s3a:. Skips `_`/`.`-prefixed bookkeeping files.
    * Returns empty (rather than throwing) for a missing path; callers that
    * require data must `require(_.nonEmpty)`. */
  def listDataFiles(conf: Configuration, path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def bookkeeping(st: FileStatus): Boolean = {
      val n = st.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
    // prune bookkeeping DIRECTORIES during the walk, not just leaf files:
    // a crashed write's _temporary/ (or .hive-staging/) holds files with
    // ordinary part-names that parquet readers ignore — counting them
    // would inflate fingerprints and Layout.compact's byte sizing. The
    // root itself is exempt (a caller may legitimately point at a
    // '.'-prefixed working dir).
    def walk(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filterNot(bookkeeping).flatMap(walk)
      else Seq(st)
    if (!fs.exists(p)) Seq.empty
    else walk(fs.getFileStatus(p))
  }

  def listDataFiles(spark: SparkSession, path: String): Seq[FileStatus] =
    listDataFiles(spark.sparkContext.hadoopConfiguration, path)

  /** Above this many files, fingerprints are stat-only (no content
    * sample) — see the trade-off note in the object doc. */
  val ContentSampleMaxFiles = 64
  private val SampleBytes = 64

  /** Deterministic identity of a file/dir's bytes-on-disk: sorted over
    * data files, mixing (path, length, mtime) and — up to
    * `ContentSampleMaxFiles` files — the first/last `SampleBytes` bytes,
    * folded into one 64-bit hex string. The cache key for every
    * fingerprint-resumed build. */
  def pathFingerprint(spark: SparkSession, path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = listDataFiles(conf, path).sortBy(_.getPath.toString)
    val sample = files.length <= ContentSampleMaxFiles
    var h = 1125899906842597L
    def mix(v: Long): Unit = h = graft.dedup.Dedup.mix64(h ^ v)
    files.foreach { st =>
      mix(st.getPath.toString.hashCode.toLong)
      mix(st.getLen)
      mix(st.getModificationTime)
      if (sample && st.getLen > 0) {
        val fs = st.getPath.getFileSystem(conf)
        val in = fs.open(st.getPath)
        try {
          val head = new Array[Byte](math.min(SampleBytes.toLong, st.getLen).toInt)
          in.readFully(0L, head)
          head.foreach(b => mix(b.toLong))
          if (st.getLen > SampleBytes) {
            val tail = new Array[Byte](SampleBytes)
            in.readFully(st.getLen - SampleBytes, tail)
            tail.foreach(b => mix(b.toLong))
          }
        } finally in.close()
      }
    }
    java.lang.Long.toHexString(h)
  }

  private val MarkerName = "_GRAFT_FINGERPRINT"

  /** Marker contents under `dir`, if present. */
  def readMarker(fs: FileSystem, dir: Path): Option[String] = {
    val marker = new Path(dir, MarkerName)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var r = in.read(tmp)
        while (r > 0) { buf.write(tmp, 0, r); r = in.read(tmp) }
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  def writeMarker(fs: FileSystem, dir: Path, content: String): Unit = {
    val out = fs.create(new Path(dir, MarkerName), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Run `build` unless `outPath` already carries a marker for exactly
    * `fingerprint`. `build` must (re)write `outPath` itself (overwrite
    * semantics); the marker is written only after it returns, so partial
    * builds rebuild. Returns true when the build ran (cold), false on a
    * warm skip. */
  def cachedBuild(spark: SparkSession, outPath: String, fingerprint: String)(
      build: => Unit): Boolean = {
    val p = new Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (readMarker(fs, p).contains(fingerprint)) false
    else {
      build
      writeMarker(fs, p, fingerprint)
      true
    }
  }
}

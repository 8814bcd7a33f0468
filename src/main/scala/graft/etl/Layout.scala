package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

/** Range-clustered data LAYOUT: the scan-side complement to `Bucketed`
  * (which co-locates joins). Writing a table range-partitioned AND sorted
  * by its hot filter key makes every parquet row group cover a narrow key
  * range, so a range/point predicate prunes at the reader: parquet keeps
  * per-row-group min/max statistics, and Spark's pushed filters skip
  * whole row groups whose range cannot match. On a randomly-laid-out
  * table every row group spans the full key range and NOTHING skips —
  * at 100 TB the difference is reading ~selectivity of the table instead
  * of all of it. (This is the plain-parquet equivalent of Iceberg/Delta
  * sort-ordered compaction; LayoutSpec proves the pruning with task input
  * metrics — rows delivered by the reader drop >10x on the clustered
  * layout for the same query result.)
  *
  * `repartitionByRange` samples the key distribution, so files are
  * balanced even under skew; `sortWithinPartitions` orders inside each
  * file; small `parquet.block.size` bounds row-group width (the pruning
  * granularity) — defaults keep Spark's 128 MB for production, tests use
  * small blocks to get many row groups at toy scale.
  */
object Layout {

  /** One-time materialization of `df` range-clustered by `keys`. */
  def writeRangeClustered(df: DataFrame, path: String, numFiles: Int,
                          keys: Seq[String],
                          rowGroupBytes: Option[Long] = None): Unit = {
    val cols = keys.map(F.col)
    val w = df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
    rowGroupBytes.fold(w)(b => w.option("parquet.block.size", b.toString))
      .parquet(path)
  }

  /** Scan a range-clustered table with a pushed-down range predicate.
    * Plain `spark.read.parquet(path).filter(...)` works identically —
    * this helper only documents the idiom and keeps the filter in a form
    * (plain comparisons on the layout key) that reaches the scan as
    * PushedFilters rather than a residual predicate. */
  def readRange(spark: SparkSession, path: String, predicate: Column): DataFrame =
    spark.read.parquet(path).filter(predicate)

  /** Z-VALUE of two non-negative integer columns: their lower `bits`
    * bits interleaved (a in the even positions, b in the odd). Points
    * close in BOTH dimensions get close z-values, so sorting by z
    * co-locates 2-D neighborhoods — the Morton-curve layout behind
    * Delta/Iceberg Z-ORDER clustering. Pure integer bit arithmetic
    * (shift/mask/add), identical in any engine — the q76 oracle recomputes
    * it in SQL. Inputs must fit in `bits` bits (caller normalizes —
    * rank/bucket first for arbitrary domains); values beyond that fold
    * into the same z-prefix rather than erroring, which only weakens
    * pruning, never correctness. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1L)), 2 * i) +
        F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** One-time materialization of `df` Z-ORDER clustered on two
    * dimensions: range-partitioned and sorted by the interleaved-bit
    * z-value, so every parquet row group covers a small 2-D tile and
    * min/max stats prune scans filtered on EITHER dimension (or both).
    * `writeRangeClustered` on one key prunes only that key; at 100 TB a
    * table queried by both time AND tenant (or id AND size) needs the
    * multi-dimensional layout or one of the two access paths reads
    * everything. The z column itself is not written — pruning rides the
    * natural columns' row-group stats (LayoutSpec asserts input-rows
    * reduction on BOTH dimensions). */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    colA: String, colB: String, bits: Int = 21,
                    rowGroupBytes: Option[Long] = None): Unit = {
    val z = zValue(F.col(colA), F.col(colB), bits)
    val w = df.withColumn("__z", z)
      .repartitionByRange(numFiles, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
    rowGroupBytes.fold(w)(b => w.option("parquet.block.size", b.toString))
      .parquet(path)
  }

  /** COMPACTION: bin-pack a directory of small files into ~`targetBytes`
    * outputs. Streaming sinks and fine-grained partitioned writes leave
    * thousands of KB-sized files; at 100 TB the per-file open/footer cost
    * and the driver's file-listing memory dominate scans long before data
    * volume does. Uses `coalesce` (NO shuffle — each output task
    * concatenates whole input partitions); per-file sort orders survive,
    * global range-clustering does not (re-run writeRangeClustered when
    * the layout, not just the file count, must be restored). Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    // ALL file metadata through the Hadoop FileSystem resolved from the
    // path (BuildCache) — java.io.File returns an empty listing on
    // hdfs://s3a:// and would silently size nOut=1, coalescing a 100 TB
    // table into one task. An empty listing here is a loud failure.
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String): org.apache.hadoop.fs.Path = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp)
    }
    val qIn = qualified(inPath)
    val qOut = qualified(outPath)
    require(qIn != qOut,
      "compact writes to a NEW directory (atomic swap is the caller's move)")
    // qualified-Path equality does not resolve SYMLINKS: on local file:
    // paths a symlink-aliased outPath pointing at inPath would pass the
    // check above and the overwrite would destroy the directory being
    // read — additionally compare real paths (isSameFile) when both
    // exist locally; remote schemes (hdfs/s3a) keep the qualified check.
    if (qIn.toUri.getScheme == "file" && qOut.toUri.getScheme == "file") {
      val fIn = java.nio.file.Paths.get(qIn.toUri.getPath)
      val fOut = java.nio.file.Paths.get(qOut.toUri.getPath)
      require(!(java.nio.file.Files.exists(fIn) && java.nio.file.Files.exists(fOut) &&
          java.nio.file.Files.isSameFile(fIn, fOut)),
        s"compact in/out resolve to the SAME directory ($fIn) through a " +
          "symlink — refusing to overwrite the input being read")
    }
    val before = BuildCache.listDataFiles(conf, inPath)
    require(before.nonEmpty,
      s"no data files listed under $inPath — refusing to compact " +
        "(an unreadable or empty input must fail loudly, not coalesce(1))")
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    (before.length, BuildCache.listDataFiles(conf, outPath).length)
  }
}

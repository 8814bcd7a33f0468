package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the join strategy that removes the shuffle
  * entirely for repeated large-×-large joins.
  *
  * At 100 TB, a fact-fact join (orders × lineitem, turns × annotations)
  * shuffles BOTH sides on every run. Writing each table bucketed by the
  * join key (`bucketBy` + `sortBy`, hash-partitioned into a fixed bucket
  * count) pays one shuffle at WRITE time; every subsequent join on that
  * key is planned as a sort-merge join over already-co-located,
  * already-sorted buckets — zero Exchange on either side, verified by
  * BucketedSpec's plan assertion. This is the parquet-table equivalent of
  * Iceberg's bucket partition transform; the sink-side manifests/resume
  * machinery (PartitionedSink) composes with it unchanged.
  *
  * Bucket-count choice at scale: both sides must use the SAME count (a
  * mismatch re-shuffles the smaller side); pick it so one bucket of the
  * bigger table fits an executor's sort buffer (e.g. 10 TB / 4096 buckets
  * ≈ 2.4 GB splits).
  */
object Bucketed {

  /** One-time bucketed materialization of `df` as EXTERNAL table `name`
    * at a warehouse-dir location, hash-bucketed and sorted by `key`.
    *
    * External (explicit location) rather than managed: the files are the
    * durable artifact and the catalog entry is disposable metadata — a
    * DROP TABLE or a fresh in-memory catalog must never delete a layout
    * that took a 100 TB shuffle to build (writeBucketedCached re-registers
    * over the surviving files).
    *
    * Idempotent across JVMs: a FRESH catalog doesn't know about a
    * previous run's table, so `mode("overwrite")` alone throws
    * LOCATION_ALREADY_EXISTS on the leftover directory — drop the
    * registration AND clear the stale location first. (With a real
    * metastore/Iceberg catalog the DROP alone suffices.) */
  def writeBucketed(df: DataFrame, name: String, key: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      name.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", loc.toString)
      .format("parquet")
      .saveAsTable(name)
  }

  /** `writeBucketed` with fingerprint-keyed resume: skipped entirely when
    * the table's files were already written for the same `fingerprint`
    * (recorded in a `_GRAFT_FINGERPRINT` marker inside the table location,
    * invisible to the parquet reader like all underscore files). Across
    * JVMs the in-memory catalog forgets the table, so a warm hit
    * re-REGISTERS an external bucketed table over the existing files —
    * catalog ops only, no data movement. This is the PartitionedSink
    * manifest pattern applied to the bucketed build: at 100 TB the
    * one-time bucket shuffle is exactly the cost you must not re-pay per
    * session, and repeated queries should time the zero-exchange read
    * path the layout exists for. */
  def writeBucketedCached(df: DataFrame, name: String, key: String,
                          nBuckets: Int, fingerprint: String): Unit = {
    val spark = df.sparkSession
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      name.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expected = s"$fingerprint|$key|$nBuckets|${df.schema.toDDL}"
    val warm = BuildCache.readMarker(fs, loc).contains(expected)
    if (!warm) {
      writeBucketed(df, name, key, nBuckets)
      BuildCache.writeMarker(fs, loc, expected)
    } else if (!spark.catalog.tableExists(name)) {
      spark.sql(
        s"CREATE TABLE `$name` (${df.schema.toDDL}) USING PARQUET " +
          s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $nBuckets BUCKETS " +
          s"LOCATION '${loc.toString}'")
      ()
    }
  }

  /** Join two same-bucket-count tables on `key`. With bucketing on both
    * sides Catalyst plans a SortMergeJoin whose children are plain scans —
    * no ShuffleExchange, no per-query re-sort (buckets are written
    * sorted). The `merge` hint keeps the small side out of a broadcast so
    * the co-location property is what's exercised (for a genuinely small
    * dim, broadcast remains the right call — drop the hint). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), key)
}

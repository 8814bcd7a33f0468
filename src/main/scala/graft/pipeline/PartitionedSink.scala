package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Partitioned output table with per-partition lineage manifests and
  * counters, resumable by skipping committed partitions (north rule;
  * generalizes the reference's content-fingerprint cache,
  * `features.py:87-93` / `train_model.py:94-108`).
  *
  * Layout (Iceberg-shaped, parquet + sidecar manifests — no Iceberg jars
  * in this sandbox):
  *   outDir/data/part=N/ (parquet files)   committed data
  *   outDir/_manifests/part-N.json         lineage manifest for partition N
  *
  * The partition of a row is pmod(xxhash64(conv_id), nParts) — a pure
  * function of the conversation key, so a restart computes identical
  * partition assignment and can skip any partition whose manifest exists.
  * Each manifest records its partition count and an order-independent
  * input fingerprint (row count + bit_xor of xxhash64(conv_id, turn_idx,
  * raw input text), carried through the pipeline as row_fp), so
  * `invalidateChanged()` can detect changed input and drop stale
  * partitions before a resume (silent stale-cache reuse is the failure
  * mode the reference's fingerprint guards against — SURVEY.md §7.4.6).
  * Resumes with a different nParts are refused (different partitioning of
  * the same rows would duplicate data).
  *
  * Uses the Hadoop FileSystem API throughout, so the same code runs on
  * HDFS / object stores on a real cluster.
  */
object PartitionedSink {

  final case class PartManifest(
      part: Int, nParts: Int, nRows: Long, nKeep: Long, piiHits: Long,
      toxHits: Long, scrubErrors: Long, fpSum: Long)

  final case class WriteReport(written: Seq[PartManifest], skipped: Seq[Int])

  def partCol(nParts: Int) =
    F.pmod(F.xxhash64(F.col("conv_id")), F.lit(nParts)).cast("int")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def committedParts(spark: SparkSession, outDir: String): Map[Int, PartManifest] = {
    val f = fs(spark, outDir)
    val mdir = new Path(s"$outDir/_manifests")
    if (!f.exists(mdir)) return Map.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    f.listStatus(mdir).iterator.flatMap { st =>
      val name = st.getPath.getName
      if (!name.startsWith("part-") || !name.endsWith(".json")) None
      else {
        val in = f.open(st.getPath)
        val node = try mapper.readTree(in) finally in.close()
        Some(node.get("part").asInt() -> PartManifest(
          node.get("part").asInt(), node.get("nParts").asInt(),
          node.get("nRows").asLong(),
          node.get("nKeep").asLong(), node.get("piiHits").asLong(),
          node.get("toxHits").asLong(), node.get("scrubErrors").asLong(),
          node.get("fpSum").asLong()))
      }
    }.toMap
  }

  private def writeManifest(spark: SparkSession, outDir: String, m: PartManifest): Unit = {
    val f = fs(spark, outDir)
    val json =
      s"""{"part":${m.part},"nParts":${m.nParts},"nRows":${m.nRows},"nKeep":${m.nKeep},"piiHits":${m.piiHits},"toxHits":${m.toxHits},"scrubErrors":${m.scrubErrors},"fpSum":${m.fpSum}}"""
    val tmp = new Path(s"$outDir/_manifests/.part-${m.part}.json.tmp")
    val dst = new Path(s"$outDir/_manifests/part-${m.part}.json")
    val out = f.create(tmp, true)
    out.write(json.getBytes("UTF-8")); out.close()
    // the rename IS the commit point: a false return (or an exception)
    // must fail the job loudly, not drop the commit record silently.
    // (On HDFS/local this rename is atomic; object stores without atomic
    // rename need a _manifests location that has it — documented contract.)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(
        s"manifest commit failed: rename($tmp -> $dst) returned false")
  }

  /** Write the pipeline output partitioned by conv-hash, skipping
    * partitions already committed (manifest present). Expects the
    * TranscriptPipeline.decide schema (keep / pii_hits / scrub_error).
    * Returns the manifests written plus the partitions skipped.
    */
  def write(spark: SparkSession, df: DataFrame, outDir: String, nParts: Int): WriteReport = {
    val committed = committedParts(spark, outDir)
    // manifests from a run with a different nParts describe a different
    // partitioning of the same rows: resuming across that boundary would
    // duplicate data — refuse loudly
    committed.values.find(_.nParts != nParts).foreach { m =>
      throw new IllegalStateException(
        s"output $outDir was committed with nParts=${m.nParts}, requested $nParts — " +
          "finish the resume with the original nParts or start a fresh output dir")
    }
    // fully committed: nothing to compute or write
    if (committed.size == nParts)
      return WriteReport(Seq.empty, committed.keys.toSeq.sorted)
    val withPart = df.withColumn("part", partCol(nParts))
    val pending =
      if (committed.isEmpty) withPart
      else withPart.filter(!F.col("part").isin(committed.keys.toSeq: _*))

    // Crash safety: data files without a manifest are uncommitted leftovers
    // of an interrupted run — delete them before appending, otherwise the
    // "resumed" write would duplicate their rows (the manifest, written
    // last, is the commit point).
    val f = fs(spark, outDir)
    (0 until nParts).filterNot(committed.contains).foreach { pnum =>
      val dir = new Path(s"$outDir/data/part=$pnum")
      if (f.exists(dir)) f.delete(dir, true)
    }

    // One shot: shuffle once on part, write data files per partition dir.
    pending
      .repartition(F.col("part"))
      .write.mode("append").partitionBy("part")
      .parquet(s"$outDir/data")

    // Counters + input fingerprint per written partition (re-read of the
    // committed files — counts what actually landed, not what we meant to
    // write). Written parts = everything not previously committed; an
    // empty partition simply yields no manifest (recomputed next run,
    // harmless) — avoids re-running the whole pipeline for a distinct().
    val writtenParts = (0 until nParts).toSet -- committed.keys
    val manifests =
      if (writtenParts.isEmpty) Seq.empty[PartManifest]
      else {
        // an all-rows-filtered write leaves only _SUCCESS: no part dirs,
        // nothing to manifest (schema inference would fail on zero files)
        val anyPartDir = writtenParts.exists(pnum =>
          f.exists(new Path(s"$outDir/data/part=$pnum")))
        if (!anyPartDir) Seq.empty[PartManifest]
        else {
          val landed = spark.read.parquet(s"$outDir/data")
            .filter(F.col("part").isin(writtenParts.toSeq: _*))
          landed.groupBy("part").agg(
            F.count(F.lit(1)).as("nRows"),
            F.sum(F.col("keep").cast("long")).as("nKeep"),
            F.sum(F.col("pii_hits").cast("long")).as("piiHits"),
            F.sum(F.col("tox_hits").cast("long")).as("toxHits"),
            F.sum(F.col("scrub_error").cast("long")).as("scrubErrors"),
            F.expr("bit_xor(row_fp)").as("fpSum"),
          ).collect().map { r =>
            PartManifest(r.getInt(0), nParts, r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
          }.toSeq
        }
      }
    manifests.foreach(writeManifest(spark, outDir, _))
    WriteReport(manifests, committed.keys.toSeq.sorted)
  }

  /** Input-side pruning for resume: committed partitions can be dropped
    * BEFORE the expensive scoring map (the sink-side filter sits above an
    * opaque mapPartitions and cannot be pushed down by Catalyst). Apply to
    * the raw turns: `turns.filter(pendingInputFilter(spark, out, n))`. */
  def pendingInputFilter(spark: SparkSession, outDir: String, nParts: Int): org.apache.spark.sql.Column = {
    val committed = committedParts(spark, outDir).keys.toSeq
    if (committed.isEmpty) F.lit(true)
    else !partCol(nParts).isin(committed: _*)
  }

  /** Validate committed partitions against the current input: recompute
    * the order-independent fingerprint per part and drop manifests that no
    * longer match (their partitions will be recomputed on the next write).
    * Returns the invalidated partition ids. */
  def invalidateChanged(spark: SparkSession, input: DataFrame, outDir: String,
                        nParts: Int): Seq[Int] = {
    val committed = committedParts(spark, outDir)
    if (committed.isEmpty) return Seq.empty
    // mirror write()'s guard: with a different nParts every recomputed
    // fingerprint would mismatch and this would silently delete ALL
    // committed partitions of a perfectly valid output
    committed.values.find(_.nParts != nParts).foreach { m =>
      throw new IllegalStateException(
        s"output $outDir was committed with nParts=${m.nParts}, requested $nParts — " +
          "invalidate with the original nParts or start a fresh output dir")
    }
    val current = input.withColumn("part", partCol(nParts))
      .groupBy("part").agg(
        F.count(F.lit(1)).as("nRows"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))").as("fpSum"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val f = fs(spark, outDir)
    val stale = committed.collect {
      case (p, m) if current.get(p).forall { case (c, s) => c != m.nRows || s != m.fpSum } => p
    }.toSeq.sorted
    stale.foreach { p =>
      f.delete(new Path(s"$outDir/_manifests/part-$p.json"), false)
      f.delete(new Path(s"$outDir/data/part=$p"), true)
    }
    stale
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}

import graft.dedup.Dedup
import graft.etl.Packing
import graft.functions.TextFunctions
import graft.quality.Rules

/** End-to-end training-corpus preparation — the composition a pretraining
  * data pipeline actually runs over a raw document table, built from the
  * engine's individually-gated operators:
  *
  *   1. exact dedup           (keep min-id per fingerprint — q12 family)
  *   2. near-dup drop         (minhash LSH -> components -> canonical, q51)
  *   3. decontamination       (benchmark shingle broadcast, q55; optional)
  *   4. quality rules         (reference junk thresholds — q15 family)
  *   5. sequence packing      (token-budget chunk layout, q56)
  *
  * Scale shape: stages 1–2 shuffle ids/hashes only, stage 3 is a
  * shuffle-free broadcast filter, stage 4 is a narrow filter, stage 5 is
  * one shard-keyed window. With `report=true` the heavy intermediates are
  * localCheckpoint'ed so each stage count is a scan, not a recompute;
  * `report=false` skips the counts and fuses the prep into one job.
  */
object CorpusPrep {

  final case class Report(input: Long, afterExactDedup: Long, afterNearDup: Long,
                          afterDecontaminate: Long, afterQuality: Long,
                          nChunks: Long)

  def run(docs: DataFrame, textCol: String, idCol: String, shardCol: String,
          benchmark: Option[DataFrame] = None, benchTextCol: String = "text",
          tokenBudget: Long = 2048, w: Int = 3, k: Int = 32, bands: Int = 16,
          threshold: Double = 0.7,
          report: Boolean = true): (DataFrame, Option[Report]) = {
    val text = F.col(textCol)
    def checkpointed(df: DataFrame): DataFrame =
      if (report) df.localCheckpoint(true) else df

    val d1 = checkpointed(Dedup.exact(docs, textCol, idCol))
    val d2 = checkpointed(Dedup.dropNearDups(d1, textCol, idCol,
      w = w, k = k, bands = bands, threshold = threshold))
    val d3 = benchmark match {
      case Some(b) =>
        checkpointed(Dedup.decontaminate(d2, textCol, idCol, b, benchTextCol))
      case None => d2
    }
    val total = F.length(text).cast("double")
    def ratio(c: Column) = F.when(F.length(text) === 0, 0.0).otherwise(c / total)
    val d4 = d3.filter(!Rules.isJunkCol(F.length(text),
      TextFunctions.lineCount(text), ratio(TextFunctions.letterCount(text)),
      ratio(TextFunctions.punctCount(text)), ratio(TextFunctions.digitCount(text))))
    val packed = Packing.packSequential(d4, TextFunctions.tokenCount(text),
      shardCol, idCol, tokenBudget)

    val rep =
      if (!report) None
      else Some(Report(docs.count(), d1.count(), d2.count(), d3.count(),
        d4.count(), packed.select(shardCol, "chunk_id").distinct().count()))
    (packed, rep)
  }
}

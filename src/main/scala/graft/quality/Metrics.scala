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
    // line counting with Python splitlines semantics, allocation-free
    var lineCount = 0
    var nonEmpty = 0
    var li = 0
    var lineHasNonSpace = false
    var inLine = false
    val n = chunk.length
    while (li < n) {
      val c = chunk.charAt(li)
      if (PyText.isPyLineBreak(c)) {
        lineCount += 1
        if (lineHasNonSpace) nonEmpty += 1
        lineHasNonSpace = false
        inLine = false
        if (c == '\r' && li + 1 < n && chunk.charAt(li + 1) == '\n') li += 2 else li += 1
      } else {
        inLine = true
        if (!lineHasNonSpace) {
          val cp = chunk.codePointAt(li)
          if (!PyText.isSpace(cp)) lineHasNonSpace = true
          li += Character.charCount(cp)
        } else li += 1
      }
    }
    if (inLine) { // trailing line without terminator
      lineCount += 1
      if (lineHasNonSpace) nonEmpty += 1
    }
    val t = total.toDouble
    ChunkMetrics(
      totalChars = total,
      lineCount = lineCount,
      nonEmptyLineCount = nonEmpty,
      letterRatio = letters / t,
      digitRatio = digits / t,
      whitespaceRatio = ws / t,
      punctRatio = punct / t,
      alnumRatio = alnum / t,
    )
  }
}

package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** C4-family LINE-level web cleaning (Raffel et al. 2020 §2.2 "Colossal
  * Clean Crawled Corpus", parameterized): the canonical recipe drops
  * boilerplate/navigation lines and keeps prose —
  *
  *  - keep a line only if it ends in terminal punctuation (. ! ? ")
  *  - ...and has at least `minWords` words
  *  - ...and mentions neither "javascript" (cookie/enable-JS banners)
  *    nor a curly brace (leaked code/templating)
  *  - drop the whole DOCUMENT if it contains "lorem ipsum"
  *
  * Complements `Rules` (doc-level ratio gates) and `Repetition`
  * (dup/loop signals): C4 cleaning edits INSIDE the document, the other
  * two only keep/drop it.
  *
  * Scale shape: pure higher-order array functions over the in-row line
  * array — one narrow codegen'd stage, no explode/shuffle/UDF; the
  * rebuilt text (`cleanText`) is a per-row `array_join`. Semantics are
  * SQL-reproducible verbatim (q65 oracle checks md5 of the rebuilt text
  * per doc).
  */
object C4Rules {

  /** Line-keep predicate (composable inside higher-order filters). */
  def keepLine(x: Column, minWords: Int = 3): Column =
    x.rlike("[.!?\"]$") &&
      F.size(F.filter(F.split(x, "\\s+"), w => F.length(w) > 0)) >= minWords &&
      !F.lower(x).contains("javascript") &&
      !x.contains("{")

  /** Surviving lines of `text`. */
  def filterLines(text: Column, minWords: Int = 3): Column =
    F.filter(F.split(text, "\n"), x => keepLine(x, minWords))

  /** The cleaned document: surviving lines rejoined. */
  def cleanText(text: Column, minWords: Int = 3): Column =
    F.array_join(filterLines(text, minWords), "\n")

  /** Document-level drop: placeholder text marks machine-generated or
    * template pages. */
  def dropDoc(text: Column): Column =
    F.lower(text).contains("lorem ipsum")
}

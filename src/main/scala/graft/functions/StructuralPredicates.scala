package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.text.TokenMatcher

/** X3/X4 structural line predicates — semantics from the reference's
  * legacy feature extractor (`/root/reference/js/predict_language.js:31-101`),
  * provided in two forms:
  *  - pure Scala (typed hot path, exact JS parity, unit-tested)
  *  - Column expressions over higher-order functions / regexp_like
  *    (SQL-facing, codegen'd)
  */
object StructuralPredicates {

  // ---------- pure Scala (hot path) ----------

  /** Some line, left-stripped, starts with `prefix`
    * (predict_language.js:31-39). */
  def hasLineStartingWith(lines: Array[String], prefix: String): Boolean = {
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      var j = 0
      while (j < l.length && Character.isWhitespace(l.charAt(j))) j += 1
      if (l.startsWith(prefix, j)) return true
      i += 1
    }
    false
  }

  /** Some non-blank line, after dropping a trailing `#` comment and
    * trailing whitespace, ends with ':' (predict_language.js:41-56). */
  def hasIndentColons(lines: Array[String]): Boolean = {
    var i = 0
    while (i < lines.length) {
      var l = lines(i)
      var end = l.length
      while (end > 0 && Character.isWhitespace(l.charAt(end - 1))) end -= 1
      if (end > 0) {
        val hashIdx = l.indexOf('#')
        var e2 = if (hashIdx >= 0 && hashIdx < end) hashIdx else end
        while (e2 > 0 && Character.isWhitespace(l.charAt(e2 - 1))) e2 -= 1
        if (e2 > 0 && l.charAt(e2 - 1) == ':') return true
      }
      i += 1
    }
    false
  }

  /** Some non-blank line starts with `width` spaces
    * (predict_language.js:58-72). */
  def hasLeadingIndent(lines: Array[String], width: Int): Boolean = {
    if (width <= 0) return false
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.exists(!_.isWhitespace)) {
        var j = 0
        while (j < width && j < l.length && l.charAt(j) == ' ') j += 1
        if (j == width) return true
      }
      i += 1
    }
    false
  }

  /** '$' immediately followed by [A-Za-z_] (predict_language.js:74-85). */
  def hasDollarVar(text: String): Boolean = {
    var i = 0
    while (i < text.length - 1) {
      if (text.charAt(i) == '$') {
        val n = text.charAt(i + 1)
        if ((n >= 'a' && n <= 'z') || (n >= 'A' && n <= 'Z') || n == '_') return true
      }
      i += 1
    }
    false
  }

  /** f-string opener: `f'` or `f"` not preceded by a word char
    * (predict_language.js:87-101). */
  def hasPythonFString(text: String): Boolean = {
    var i = 0
    while (i < text.length - 1) {
      if (text.charAt(i) == 'f') {
        val n = text.charAt(i + 1)
        if ((n == '\'' || n == '"') &&
            (i == 0 || !TokenMatcher.isWordChar(text.charAt(i - 1)))) return true
      }
      i += 1
    }
    false
  }

  // ---------- import-shape regex family (predict_language.js:167-171) ----------
  // JS multiline regexes re-expressed once here; Java regex and RE2
  // (DuckDB) agree on these constructs (\s \S \b, non-dotall '.') — but
  // NOT on line terminators: Java MULTILINE ^/$ honor lone \r plus the
  // U+0085/U+2028/U+2029 terminators, and Java \s includes \x0B,
  // while RE2 '(?m)' honors only \n.
  // So the regex pass always runs over Normalize.newlines(text) (CR/CRLF
  // -> \n, same pre-step the reference applies at features.py:98); the
  // residual NEL/LS/PS divergence is accepted as out of corpus (ASCII).

  final val FromImportOrderRe = """^\s*from\s+\S+\s+import\b"""
  final val ImportFromOrderRe = """^\s*import\b.+\bfrom\s+['"]"""
  final val ImportAsRe = """^\s*(from\s+\S+\s+import|import)\s+.+\s+as\s+"""
  final val ImportStarAsRe = """^\s*import\s+\*\s+as\s+"""
  final val ImportQuoteLineRe = """^\s*import\s+['"]"""

  private def multiline(text: String, re: String): Boolean =
    java.util.regex.Pattern.compile(re, java.util.regex.Pattern.MULTILINE)
      .matcher(graft.text.Normalize.newlines(text)).find()

  def hasFromImportOrder(text: String): Boolean = multiline(text, FromImportOrderRe)
  def hasImportFromOrder(text: String): Boolean = multiline(text, ImportFromOrderRe)
  def hasImportAs(text: String): Boolean = multiline(text, ImportAsRe)
  def hasImportStarAs(text: String): Boolean = multiline(text, ImportStarAsRe)
  def hasImportQuoteLine(text: String): Boolean = multiline(text, ImportQuoteLineRe)

  // ---------- Column expressions (SQL-facing, codegen'd) ----------

  private def linesOf(text: Column): Column = split(text, "\n", -1)

  def hasLineStartingWithCol(text: Column, prefix: String): Column =
    exists(linesOf(text), l => ltrim(l).startsWith(prefix))

  def hasIndentColonsCol(text: Column): Column =
    // strip trailing comment then trailing ws; non-empty and ends with ':'
    exists(linesOf(text), l => {
      val noComment = when(instr(l, "#") > 0, substring_index(l, "#", 1)).otherwise(l)
      rtrim(noComment).endsWith(":") && (length(rtrim(noComment)) > 0)
    })

  def hasLeadingIndentCol(text: Column, width: Int): Column =
    if (width <= 0) lit(false)
    else exists(linesOf(text), l =>
      (length(trim(l)) > 0) && l.startsWith(" " * width))

  def hasDollarVarCol(text: Column): Column =
    text.rlike("""\$[A-Za-z_]""")

  def hasPythonFStringCol(text: Column): Column =
    text.rlike("""(?:^|[^A-Za-z0-9_])f['"]""")

  def hasFromImportOrderCol(text: Column): Column = text.rlike("(?m)" + FromImportOrderRe)
  def hasImportFromOrderCol(text: Column): Column = text.rlike("(?m)" + ImportFromOrderRe)
  def hasImportAsCol(text: Column): Column = text.rlike("(?m)" + ImportAsRe)
  def hasImportStarAsCol(text: Column): Column = text.rlike("(?m)" + ImportStarAsRe)
  def hasImportQuoteLineCol(text: Column): Column = text.rlike("(?m)" + ImportQuoteLineRe)
}

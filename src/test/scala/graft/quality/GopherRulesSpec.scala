package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

/** Golden values for the Gopher word/symbol/structure quality rules —
  * each signal pinned on a hand-built doc, the combined keep gate on a
  * good doc and on the failure modes it exists to catch. */
class GopherRulesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def signals(text: String): Map[String, Any] = {
    import spark.implicits._
    val c = F.col("t")
    Seq(text).toDF("t").select(
      GopherRules.nWords(c).as("n"),
      GopherRules.meanWordLen(c).as("mean"),
      GopherRules.symbolWordRatio(c, "#").as("hash"),
      GopherRules.symbolWordRatio(c, "...").as("ell"),
      GopherRules.bulletLineFrac(c).as("bullet"),
      GopherRules.alphaWordFrac(c).as("alpha"),
      GopherRules.stopwordHits(c).as("stop"),
      GopherRules.keep(c).as("keep"))
      .head().getValuesMap[Any](Seq("n", "mean", "hash", "ell", "bullet", "alpha", "stop", "keep"))
  }

  test("word count and mean word length ignore extra whitespace") {
    val s = signals("aa   bbbb\n cc")
    assert(s("n") == 3L)
    assert(s("mean") == (2 + 4 + 2) / 3.0)
  }

  test("symbol-to-word ratios count non-overlapping occurrences per word") {
    val s = signals("see # and ## done")
    assert(s("hash") == 3.0 / 5.0)
    // "...." contains exactly ONE non-overlapping "..." (leftmost)
    val e = signals("wait.... ok")
    assert(e("ell") == 1.0 / 2.0)
  }

  test("bullet-line fraction counts -, * and • markers over nonempty lines") {
    val s = signals("- a\n* b\n• c\nplain prose line\n\n")
    assert(s("bullet") == 3.0 / 4.0)
  }

  test("alpha-word fraction and stopword hits") {
    val s = signals("abc 123 a1")
    assert(s("alpha") == 2.0 / 3.0)
    // distinct stopwords only: 'the' twice still counts once
    val t = signals("The cat and the dog have fun")
    assert(t("stop") == 3L)
  }

  test("alphaWordFrac's compiled byte scan agrees with rlike('[A-Za-z]') on tricky words") {
    import spark.implicits._
    // multibyte UTF-8 (no ASCII letters), accented letters only, mixed,
    // digits/symbols, letters at each end — the byte scan must agree
    // with the regex word-for-word
    val docs = Seq(
      "héllo über 北京 naïve 123 a1 1a ... #tag ___ x 中a文",
      "ÉÀÇ ß ø π",
      "plain words only",
      "")
    val c = F.col("t")
    val ws = GopherRules.words(c)
    val got = docs.toDF("t").select(
      GopherRules.alphaWordFrac(c).as("got"),
      F.when(F.size(ws) === 0, 0.0)
        .otherwise(F.size(F.filter(ws, w => w.rlike("[A-Za-z]"))).cast("double")
          / F.size(ws).cast("double")).as("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"byte scan ${r.getDouble(0)} != regex ${r.getDouble(1)}"))
  }

  test("empty and wordless docs: every ratio is 0.0, never NaN") {
    for (doc <- Seq("", "   \n  \n")) {
      val s = signals(doc)
      assert(s("n") == 0L && s("mean") == 0.0 && s("hash") == 0.0 &&
        s("ell") == 0.0 && s("alpha") == 0.0 && s("stop") == 0L)
      assert(s("keep") == false)
    }
  }

  test("keep: natural prose passes; the documented failure modes fail") {
    val prose = (("the quick brown fox jumps over that lazy dog with " +
      "plenty of words to say and every one of them has letters ") * 3).trim
    assert(signals(prose)("keep") == true)
    // word count below 50
    assert(signals("the and that have with short")("keep") == false)
    // symbol dump: alpha fraction collapses
    val symbols = ("the and " + ("123 456 " * 30)).trim
    assert(signals(symbols)("keep") == false)
    // no stopwords (word salad)
    val salad = ("lorem dolor amet consectetur adipiscing elit sed " * 10).trim
    assert(signals(salad)("keep") == false)
    // hash-symbol spam
    val hashy = (prose + " " + ("# " * 30)).trim
    assert(signals(hashy)("keep") == false)
  }

  test("stopwordHitsFor judges each doc by its OWN language's table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "en", "the cat of means and"),  // 3 en hits
      (2L, "de", "der hund und die maus"), // 3 de hits
      (3L, "de", "the cat of means and"),  // en words under a de table: 0
      (4L, "fr", "le chat et la souris"),  // 3 fr hits ("la" is in fr too? table: le,la,et,... yes 3+)
      (5L, "xx", "the of and")             // unknown lang: 0, never null
    ).toDF("id", "lang", "text")
    val out = docs.select(col("id"),
        GopherRules.stopwordHitsFor(col("text"), col("lang")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 3L)
    assert(out(2L) == 3L)
    assert(out(3L) == 0L, "English function words earn nothing under the German table")
    assert(out(4L) >= 3L)
    assert(out(5L) == 0L, "unknown language scores 0, not null")
  }
}

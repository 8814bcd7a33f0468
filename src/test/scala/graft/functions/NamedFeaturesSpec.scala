package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession
import graft.functions.StructuralPredicates._

/** Legacy named-feature families (predict_language.js:110-309): the pure
  * Scala predicates and their Column forms must agree on the same inputs
  * (the Column forms are what q41 ships; the Scala forms are the typed
  * hot-path versions). */
class NamedFeaturesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val samples = Seq(
    "from pkg import thing",
    "  from a.b import c as d",
    "import * as ns from 'x'",
    "import 'module'",
    "import \"module\"",
    "importx from 'y'",          // \b must reject
    "x = 1\nimport os as sys\n", // multiline anchor
    "no imports here at all",
    "  leading text from a import", // 'import' not after from..import shape
    "",
  )

  test("import-regex family: Scala predicates match Column forms") {
    import spark.implicits._
    val df = samples.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
      .select(
        F.col("id"), F.col("t"),
        hasFromImportOrderCol(F.col("t")).as("a"),
        hasImportFromOrderCol(F.col("t")).as("b"),
        hasImportAsCol(F.col("t")).as("c"),
        hasImportStarAsCol(F.col("t")).as("d"),
        hasImportQuoteLineCol(F.col("t")).as("e"))
      .collect()
    df.foreach { r =>
      val t = r.getString(1)
      assert(r.getBoolean(2) == hasFromImportOrder(t), s"from-import on '$t'")
      assert(r.getBoolean(3) == hasImportFromOrder(t), s"import-from on '$t'")
      assert(r.getBoolean(4) == hasImportAs(t), s"import-as on '$t'")
      assert(r.getBoolean(5) == hasImportStarAs(t), s"import-star-as on '$t'")
      assert(r.getBoolean(6) == hasImportQuoteLine(t), s"import-quote on '$t'")
    }
  }

  test("legacy catalog: goldens on language-flavored fixtures") {
    val ex = new LegacyFeatures.Extractor
    def feats(text: String): Set[String] = {
      val bits = ex.extract(text)
      LegacyFeatures.names.zipWithIndex.collect { case (n, i) if bits(i) => n }.toSet
    }
    val py = feats("from pkg import thing as t\n@decorator\ndef f(x):\n    return f'{x}'\n")
    assert(Set("HasFromImport", "HasFromImportOrder", "HasImportAs", "HasDef",
      "HasDecoratorLine", "HasPythonFString", "HasIndentColon", "HasIndentFourSpaces",
      "HasImport").subsetOf(py), py.toString)
    assert(!py.contains("HasVbSub") && !py.contains("HasPhpTag") && !py.contains("HasSemicolon"))

    val mk = feats("target: dep\n\t$(shell echo hi)\n.PHONY: all\nVAR := 1\n")
    assert(Set("HasMakeTarget", "HasMakeVar", "HasMakeShell", "HasMakeRecipeTab",
      "HasPhony", "HasMakeAssign", "HasTabs", "HasColonEquals").subsetOf(mk), mk.toString)

    val sql = feats("SELECT a FROM t WHERE x = 1;\nCREATE TABLE t2 (a INT);")
    assert(Set("HasSqlSelect", "HasSqlFrom", "HasSqlWhere", "HasSqlCreateTable",
      "HasSemicolon").subsetOf(sql), sql.toString)
    assert(!sql.contains("HasSqlInsertInto"))

    val rs = feats("fn main() -> i32 {\n    let mut x = 0;\n}\n#[derive(Debug)]")
    assert(Set("HasRustFnArrow", "HasLetMut", "HasRustDerive", "HasLet",
      "HasThinArrow").subsetOf(rs), rs.toString)

    // empty and null are safe and all-false
    assert(feats("").isEmpty)
    assert(ex.extract(null).forall(!_))
    assert(LegacyFeatures.all.length == 186)
  }

  test("word-boundary matcher equals the reference hasWordIn loop semantics") {
    def hasWordIn(haystack: String, word: String): Boolean = {
      var start = 0
      while (true) {
        val idx = haystack.indexOf(word, start)
        if (idx == -1) return false
        val beforeOk = idx == 0 || !graft.text.TokenMatcher.isWordChar(haystack.charAt(idx - 1))
        val after = idx + word.length
        val afterOk = after == haystack.length || !graft.text.TokenMatcher.isWordChar(haystack.charAt(after))
        if (beforeOk && afterOk) return true
        start = idx + 1
      }
      false
    }
    val words = Array("the", "import", "from", "scan")
    val matcher = graft.text.TokenMatcher(words)
    val texts = samples ++ Seq("thethe the", "xthe they", "the", "athea the?b")
    texts.foreach { t =>
      val bits = matcher.matchWordBits(t)
      words.zipWithIndex.foreach { case (word, i) =>
        assert(bits(i) == hasWordIn(t, word), s"word '$word' on '$t'")
      }
    }
  }
}

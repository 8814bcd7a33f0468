package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession
import graft.text.Splitter

/** Custom Catalyst layer: MultiContains (codegen'd single-pass matcher)
  * and the SplitSnippets generator, via Column API and SQL registration. */
class PlansSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val docs = Seq(
    (1L, "def main():\n    pass"),
    (2L, "package main\nfunc f() {}"),
    (3L, "nothing interesting"),
    (4L, null.asInstanceOf[String]),
  )

  test("multiContains equals per-token contains (incl. null rows)") {
    import spark.implicits._
    val toks = Seq("def ", "func ", "main")
    val df = docs.toDF("id", "text")
      .withColumn("bits", GraftFunctions.multiContains(F.col("text"), toks))
    val got = df.select("id", "bits").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Boolean](1))).toMap
    assert(got(1L) == Seq(true, false, true))
    assert(got(2L) == Seq(false, true, true))
    assert(got(3L) == Seq(false, false, false))
    assert(got(4L) == null)
  }

  test("multiContains participates in whole-stage codegen") {
    // needs a non-local source: a LocalTableScan would be constant-folded
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("bits", GraftFunctions.multiContains(F.col("text"), Seq("the", "data")))
      .filter(F.col("bits").getItem(0))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker in plan strings
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"), plan)
    assert(df.count() > 0)
  }

  test("split_snippets generator matches Splitter semantics") {
    import spark.implicits._
    val text = (1 to 7).map(i => s"line$i").mkString("\n")
    val df = Seq((1L, text)).toDF("id", "text")
      .select(F.col("id"), GraftFunctions.splitSnippets(F.col("text"), 3))
    val chunks = df.collect().map(_.getString(1))
    assert(chunks.toSeq == Splitter.splitSnippet(text, 3).toSeq)
  }

  test("nfcNormalize: composes decomposed forms, fast-path identity, codegen, SQL surface") {
    import spark.implicits._
    val decomposedE = "cafe" + "\u0301"  // e + COMBINING ACUTE, 5 chars
    val composedE = "caf" + "\u00e9"     // U+00E9, 4 chars
    val decomposedA = "A" + "\u030a" + " str" // A + COMBINING RING
    val composedA = "\u00c5" + " str"
    val df = Seq((1L, decomposedE), (2L, decomposedA), (3L, "plain ascii"), (4L, null))
      .toDF("id", "text")
    val out = df.select(F.col("id"), GraftFunctions.nfcNormalize(F.col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == composedE && out(1L).length == 4, "e+U+0301 composes to U+00E9")
    assert(out(2L) == composedA)
    assert(out(3L) == "plain ascii")
    assert(out(4L) == null, "null stays null")
    // whole-stage codegen holds around the expression (parquet source —
    // a LocalTableScan would constant-fold the projection away)
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.nfcNormalize(F.col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
    // SQL surface
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", { exprs => graft.plans.NfcNormalize(exprs.head) }, "built-in")
    assert(spark.sql(s"SELECT nfc_normalize('$decomposedE') AS t").head().getString(0)
      == composedE)
  }

  test("SQL registration via function registry (extensions builder path)") {
    import spark.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_contains", GraftFunctions.multiContainsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "split_snippets", GraftFunctions.splitSnippetsBuilder, "built-in")
    docs.toDF("id", "text").createOrReplaceTempView("plans_docs")
    val bits = spark.sql(
      "SELECT id, multi_contains(text, 'def ', 'main') AS b FROM plans_docs WHERE text IS NOT NULL")
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(bits(1L) == Seq(true, true))
    val nChunks = spark.sql(
      "SELECT count(*) FROM (SELECT split_snippets(text, 1) FROM plans_docs WHERE id = 1)")
      .head().getLong(0)
    assert(nChunks == Splitter.splitSnippet(docs.head._2, 1).length)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_ngram_char_frac", GraftFunctions.topNgramBuilder, "built-in")
    assert(spark.sql(
      "SELECT top_ngram_char_frac('a b a b a b', 2) AS f").head().getDouble(0) == 9.0 / 11)
    // non-literal n is rejected with a diagnosable error
    intercept[Exception] {
      spark.sql("SELECT top_ngram_char_frac(text, id) FROM plans_docs").collect()
    }
  }

  test("documented spark.sql.extensions CONFIG path registers the SQL surface end-to-end") {
    import org.apache.spark.sql.SparkSession
    // spark.sql.extensions is a STATIC conf, applied when the
    // SparkContext is created — a shared-context test JVM cannot set it
    // after the fact. Prove the config path's two halves instead:
    // (1) the contract the config string relies on — the class is
    // loadable BY NAME with a zero-arg constructor and the
    // SparkSessionExtensions => Unit shape (this reflective instantiation
    // is exactly what SparkSession.applyExtensions does with the conf
    // value at startup);
    val byName = Class.forName("graft.plans.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    // (2) injection through the SparkSessionExtensions hook reaches the
    // SQL surface of a NEW session end-to-end. Shares the JVM's
    // SparkContext; must NOT be stopped, only un-defaulted.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]").appName("graft-ext-config")
      .withExtensions(byName)
      .getOrCreate()
    try {
      import s2.implicits._
      docs.toDF("id", "text").createOrReplaceTempView("ext_docs")
      val bits = s2.sql(
        "SELECT multi_contains(text, 'def ', 'main') AS b FROM ext_docs WHERE id = 1")
        .head().getSeq[Boolean](0)
      assert(bits == Seq(true, true))
      // the generator through the documented LATERAL VIEW form
      val snips = s2.sql(
        "SELECT s.snip FROM ext_docs LATERAL VIEW split_snippets(text, 1) s AS snip " +
          "WHERE id = 1").collect().map(_.getString(0))
      assert(snips.toSeq == Splitter.splitSnippet(docs.head._2, 1).toSeq)
      // the NFC normalizer rides the same injection
      assert(s2.sql("SELECT nfc_normalize('cafe" + "\u0301" + "') AS t")
        .head().getString(0) == "caf" + "\u00e9")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }

  test("structural predicates: Scala and Column forms agree with JS semantics") {
    import graft.functions.StructuralPredicates._
    val samples = Seq(
      "x = f'{a}'", "self.f('x')", "$var = 1", "a $ b", "def f():",
      "  # comment:", "key: value # note", "    indented", "#!shebang",
      "no structure here")
    import spark.implicits._
    val df = samples.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "text")
      .select(F.col("id"),
        hasDollarVarCol(F.col("text")).as("dollar"),
        hasPythonFStringCol(F.col("text")).as("fstring"),
        hasLineStartingWithCol(F.col("text"), "#").as("hash"))
      .collect().map(r => r.getInt(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      val lines = graft.text.PyText.splitLines(s)
      assert(df(i)._1 == hasDollarVar(s), s"dollar: $s")
      assert(df(i)._2 == hasPythonFString(s), s"fstring: $s")
      assert(df(i)._3 == hasLineStartingWith(lines, "#"), s"hash: $s")
    }
    // JS-parity spot checks
    assert(hasPythonFString("f'x'"))
    assert(!hasPythonFString("gof'x'")) // preceded by word char
    assert(hasIndentColons(Array("def f():")))
    assert(hasIndentColons(Array("key: # c")))
    assert(!hasIndentColons(Array("# only comment:"))) // '#' at 0 -> strips everything
    assert(!hasIndentColons(Array("x = 1")))
    assert(hasLeadingIndent(Array("    four"), 4))
    assert(!hasLeadingIndent(Array("  two"), 4))
    assert(!hasLeadingIndent(Array("       "), 4)) // blank lines skipped
  }
}

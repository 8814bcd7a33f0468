package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

/** Gopher-family repetition signals: hand-computed goldens + the scale
  * shape (one narrow stage, no shuffle, no UDF). */
class RepetitionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def signals(text: String): (Long, Double, Double, Double) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("text").select(
      Repetition.nLines(F.col("text")),
      Repetition.dupLineFrac(F.col("text")),
      Repetition.dupLineCharFrac(F.col("text")),
      Repetition.ellipsisLineFrac(F.col("text"))).head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("hand-computed goldens incl. empty/blank/newline-heavy docs") {
    // 4 nonempty lines: aa, bb, aa, cc... -> dup lines {aa x2}:
    // dup_line_frac = 1 - 3/4; dup chars = 4 of 11; one "..." line
    assert(signals("aa\nbb\naa\ncc...") == (4L, 0.25, 4.0 / 11, 0.25))
    // blank lines carry no signal
    assert(signals("\n\naa\n\n\naa\n") == (2L, 0.5, 1.0, 0.0))
    // degenerate docs: no lines -> all zeros, not NaN/divide-by-zero
    assert(signals("") == (0L, 0.0, 0.0, 0.0))
    assert(signals("\n\n\n") == (0L, 0.0, 0.0, 0.0))
    // no repetition at all
    assert(signals("one\ntwo\nthree") == (3L, 0.0, 0.0, 0.0))
  }

  test("top n-gram char fraction: goldens, nulls, codegen, SQL surface") {
    import spark.implicits._
    // kernel goldens (overlapping windows, char coverage / text chars)
    assert(Repetition.topNgramCharFrac("a b a b a b", 2) == 9.0 / 11) // "a b" x3 * 3
    assert(Repetition.topNgramCharFrac("w1 w2 w3", 2) == 5.0 / 8)
    assert(Repetition.topNgramCharFrac("  x  y  ", 2) == 3.0 / 8)
    assert(Repetition.topNgramCharFrac("single", 2) == 0.0)
    assert(Repetition.topNgramCharFrac("", 2) == 0.0)
    assert(Repetition.topNgramCharFrac(null, 2) == 0.0)
    assert(Repetition.topNgramCharFrac("spam spam spam spam", 1) == 16.0 / 19)
    // expression: null row -> null, non-null matches the kernel
    val df = Seq((1L, "a b a b a b"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(F.col("id"),
        graft.plans.GraftFunctions.topNgramCharFrac(F.col("text"), 2).as("f"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getDouble(1) == 9.0 / 11 && rows(1).isNullAt(1))
    // stays inside whole-stage codegen over a file source
    val scan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.plans.GraftFunctions.topNgramCharFrac(F.col("text"), 2).as("f"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
  }

  test("top n-gram kernel matches a naive recount on random repetitive inputs") {
    val rnd = new scala.util.Random(7)
    def naive(text: String, n: Int): Double = {
      val words = text.split("\\s+").filter(_.nonEmpty).toSeq
      if (text.isEmpty || words.length < n) 0.0
      else {
        val grams = words.sliding(n).map(_.mkString(" ")).toSeq
        grams.groupBy(identity)
          .map { case (g, occ) => occ.size.toLong * g.length }
          .max.toDouble / text.length
      }
    }
    for (i <- 1 to 300) {
      // small vocab -> dense collisions; random whitespace runs
      val words = Seq.fill(rnd.nextInt(40))(s"w${rnd.nextInt(4)}")
      val text = words.mkString(if (i % 3 == 0) "  " else " ")
      for (n <- 1 to 3)
        assert(Repetition.topNgramCharFrac(text, n) == naive(text, n),
          s"kernel/naive disagree on n=$n text=[$text]")
    }
  }

  test("dupLineCharFrac matches a naive multiset recount on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def naive(text: String): Double = {
      val ls = text.split("\n", -1).filter(_.nonEmpty)
      if (ls.isEmpty) 0.0
      else {
        val counts = ls.groupBy(identity).map { case (k, v) => k -> v.length }
        val dup = ls.filter(counts(_) > 1).map(_.length).sum
        dup.toDouble / ls.map(_.length).sum
      }
    }
    val docs = (1 to 200).map { i =>
      val n = rnd.nextInt(30)
      // small line vocab -> dense duplication; variable line lengths
      (i.toLong, Seq.fill(n)("ln" + ("x" * rnd.nextInt(5)) + rnd.nextInt(6)).mkString("\n"))
    }
    val got = docs.toDF("id", "text")
      .select(F.col("id"), Repetition.dupLineCharFrac(F.col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == naive(text), s"disagree on doc $id:\n$text")
    }
  }

  test("dupLineCharFrac is O(L log L): a 100k-line doc completes, exactly") {
    import spark.implicits._
    // 50k distinct lines interleaved with 50k copies of one line — the
    // pathological scraped-log shape; the old per-line occurrence count
    // was O(L^2) (~10^10 comparisons) and could never finish this
    val lines = (0 until 100000).map(i =>
      if (i % 2 == 0) "repeated boilerplate line" else s"unique line $i")
    val text = lines.mkString("\n")
    val dup = 50000L * "repeated boilerplate line".length
    val all = lines.map(_.length.toLong).sum
    val got = Seq(Tuple1(text)).toDF("text")
      .select(Repetition.dupLineCharFrac(F.col("text"))).head().getDouble(0)
    assert(got == dup.toDouble / all)
  }

  test("top n-gram char fraction counts code points, not UTF-16 units") {
    // each word is U+1F600 (astral, 2 UTF-16 units) + 'a' = 2 code points;
    // bigram "😀a 😀a" occurs twice -> coverage 2 x 5 = 10 code points of
    // a text 8 code points long (the signal may exceed 1.0 — overlap)
    val w = new String(Character.toChars(0x1F600)) + "a"
    val text = s"$w $w $w"
    assert(Repetition.topNgramCharFrac(text, 2) == 10.0 / 8)
    // and stays identical to UTF-16 math on BMP-only text
    assert(Repetition.topNgramCharFrac("a b a b a b", 2) == 9.0 / 11)
  }

  test("all four signals compute in one narrow stage: no shuffle, no UDF") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, f"line a\nline b\nline a\ndoc $i%03d"))
      .toDF("id", "text")
      .select(F.col("id"),
        Repetition.nLines(F.col("text")).as("n_lines"),
        Repetition.dupLineFrac(F.col("text")).as("dlf"),
        Repetition.dupLineCharFrac(F.col("text")).as("dlcf"),
        Repetition.ellipsisLineFrac(F.col("text")).as("elf"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "repetition signals must not shuffle")
    assert(!plan.toString.contains("BatchEvalPython") &&
      !plan.toString.toLowerCase.contains("scalaudf"),
      "repetition signals must be built-in expressions, not UDFs")
    val rows = df.collect()
    // dup chars: the two "line a" lines (6+6) of 6+6+6+7 total
    assert(rows.length == 100 && rows.forall(_.getDouble(3) == 12.0 / 25))
  }

  test("paragraph signals: blank-line blocks, triple-newline split, line/para independence") {
    import spark.implicits._
    def para(text: String): (Long, Double, Double) = {
      val r = Seq(Tuple1(text)).toDF("text").select(
        Repetition.nParagraphs(F.col("text")),
        Repetition.dupParaFrac(F.col("text")),
        Repetition.dupParaCharFrac(F.col("text"))).head()
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    // three blocks, "aa" repeated; "\n\n\n" is ONE separator, not an empty block
    assert(para("aa\n\nbb\n\n\naa") == (3L, 1 - 2.0 / 3, 4.0 / 6))
    // a paragraph with INTERNAL single newlines is one unit: dup paras
    // exist here even though every line is unique at line granularity
    val doc = "x1\ny1\n\nx1\ny1"
    assert(para(doc) == (2L, 0.5, 1.0))
    assert(signals(doc)._2 == 0.5, "lines x1/y1 each repeat")
    // single block, no blank lines; degenerate docs
    assert(para("aa\nbb\ncc") == (1L, 0.0, 0.0))
    assert(para("") == (0L, 0.0, 0.0))
    assert(para("\n\n\n\n") == (0L, 0.0, 0.0))
  }

  test("dupNgramCharStats: disjoint, overlapping, and within-vs-across span unions") {
    import spark.implicits._
    val docs = Seq(
      // "a b c d e f" appears twice, disjoint: grams at pos 0 and 7 of a
      // 13-word doc. Canonical chars = 13*1 + 12 = 25; each span 11 chars
      // -> union 22 (the x between them not covered)
      (1L, "a b c d e f x a b c d e f"),
      // "zz" x8: dup 6-grams at pos 0,1,2 OVERLAP; union = whole doc
      // 8*2 + 7 = 23 chars
      (2L, "zz zz zz zz zz zz zz zz"),
      // no repetition
      (3L, "p q r s t u v w"),
      // under n words: zero everything
      (4L, "one two three")
    ).toDF("id", "text")
    val out = Repetition.dupNgramCharStats(docs, "text", "id", n = 6)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((13L, 25L, 22L)))
    assert(out(2L) == ((8L, 23L, 23L)), "overlapping occurrences union, never double-count")
    assert(out(3L) == ((8L, 15L, 0L)))
    assert(out(4L) == ((3L, 13L, 0L)), "under-n docs keep their true char counts, zero coverage")
  }
}

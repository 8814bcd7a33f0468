package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

/** C4-family line cleaning: each rule's effect, the rebuilt text, and
  * the scale shape (one narrow stage, no shuffle/UDF). */
class C4RulesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def clean(text: String): (Long, String) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("text").select(
      F.size(C4Rules.filterLines(F.col("text"))).cast("long"),
      C4Rules.cleanText(F.col("text"))).head()
    (r.getLong(0), r.getString(1))
  }

  test("each line rule fires: punctuation, min words, javascript, braces") {
    val doc = Seq(
      "This is a proper sentence.",     // kept
      "No terminal punctuation here",   // dropped: no [.!?"]
      "Too short.",                     // dropped: < 3 words
      "Please enable JavaScript now.",  // dropped: javascript banner
      "Template with { brace inside.",  // dropped: curly brace
      "Is this a question?",            // kept
      "He said \"quoted line works.\"", // kept (ends in ")
      "Exclamations also count!"        // kept
    ).mkString("\n")
    val (n, cleaned) = clean(doc)
    assert(n == 4L, s"expected 4 survivors, got $n: [$cleaned]")
    assert(cleaned == Seq(
      "This is a proper sentence.",
      "Is this a question?",
      "He said \"quoted line works.\"",
      "Exclamations also count!").mkString("\n"))
  }

  test("lorem ipsum drops the document; the line filter never does") {
    import spark.implicits._
    val df = Seq(
      (1L, "Good prose stays here.\nLorem Ipsum dolor sit amet."),
      (2L, "Good prose stays here.")).toDF("id", "text")
    val kept = df.filter(!C4Rules.dropDoc(F.col("text"))).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L))
  }

  test("one narrow stage: no shuffle, no UDF") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, "A proper sentence.\njunk"))
      .toDF("id", "text")
      .filter(!C4Rules.dropDoc(F.col("text")))
      .select(F.col("id"), C4Rules.cleanText(F.col("text")).as("clean"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty)
    assert(!plan.toString.toLowerCase.contains("scalaudf"))
    assert(df.collect().forall(_.getString(1) == "A proper sentence."))
  }
}

package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SnippetEtlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def goodText(tag: String): String =
    (1 to 12).map(i => s"$tag line$i with, some. punctuation! and words here;").mkString("\n")

  test("etl: language filter, scrub, split, junk filter") {
    import spark.implicits._
    val files = Seq(
      SourceFile("f1", "Text", goodText("a")), // dropped language
      SourceFile("f2", "Markdown", goodText("b") + "\n```\nsecret code\n```\nafter, line. here"),
      SourceFile("f3", "Python", goodText("c")),
      SourceFile("f4", "Python", "123456"), // junk: too short
      SourceFile("f5", "HTML", "<script>never closed"), // scrub error -> skipped
    ).toDS()
    val out = SnippetEtl.run(spark, files, limit = 5, rebalance = false).collect()
    assert(!out.exists(_.getString(0) == "f1"), "dropped language must not appear")
    assert(!out.exists(_.getString(0) == "f4"), "junk chunk must be filtered")
    assert(!out.exists(_.getString(0) == "f5"), "malformed scrub input is skipped")
    val md = out.filter(_.getString(0) == "f2").map(_.getString(2))
    assert(md.nonEmpty)
    assert(!md.exists(_.contains("secret code")), "fence interior must be scrubbed")
    assert(md.exists(_.contains("``````")), "fences themselves are kept")
    assert(out.exists(_.getString(0) == "f3"))
  }

  test("etl: rebalance downsamples the majority class below 2x runner-up") {
    import spark.implicits._
    val files = ((1 to 60).map(i => SourceFile(s"p$i", "Python", goodText(s"p$i"))) ++
      (1 to 10).map(i => SourceFile(s"g$i", "Go", goodText(s"g$i")))).toDS()
    val out = SnippetEtl.run(spark, files, limit = 100, rebalance = true)
    val counts = out.groupBy("Language").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("Go") == 10)
    assert(counts("Python") < 60, "majority class must be downsampled")
  }
}

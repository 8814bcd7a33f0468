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
}

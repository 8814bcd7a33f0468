package graft.eval

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession
import graft.functions.TextFunctions

/** Resampled F1 stability: per-subsample parity with perClass, and
  * determinism of the md5 membership (no RNG anywhere). */
class EvalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def preds = {
    import spark.implicits._
    (0L until 200L).map { i =>
      val label = "c" + (i % 3)
      val pred = if (i % 7 == 0) "c0" else label
      (i, label, pred)
    }.toDF("id", "label", "pred")
  }

  test("resampledPerClass: each subsample's rows equal perClass on that subsample") {
    val out = F1.resampledPerClass(preds, "label", "pred", F.col("id"), nResamples = 5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    (0 until 5).foreach { b =>
      val sub = preds.filter(TextFunctions.md5Bucket(
        F.concat(F.col("id").cast("string"), F.lit("#"), F.lit(b.toString)), 2) === 0)
      val exp = F1.perClass(sub, "label", "pred").collect()
      assert(exp.nonEmpty, s"half-subsample $b must not be empty at n=200")
      exp.foreach { r =>
        assert(out((b.toLong, r.getString(0))) ==
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))),
          s"b=$b cls=${r.getString(0)} must match perClass on the same subsample")
      }
      assert(out.keySet.count(_._1 == b.toLong) == exp.length)
    }
  }

  test("resampledPerClass is deterministic run-to-run and spreads across subsamples") {
    val a = F1.resampledPerClass(preds, "label", "pred", F.col("id"), 8).collect().toSeq
    val b = F1.resampledPerClass(preds, "label", "pred", F.col("id"), 8).collect().toSeq
    assert(a == b)
    // the c0 class F1 must actually VARY across subsamples (the whole
    // point of the stability table) — 8 identical values would mean the
    // bucket ignores b
    val f1s = a.filter(_.getString(1) == "c0").map(_.getDouble(5)).distinct
    assert(f1s.size > 1, s"subsample F1s must spread: $f1s")
  }
}

package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

class QuantilesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("exact quantiles interpolate linearly (quantile_cont definition)") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
                 ("b", 10), ("b", 20), ("b", 30), ("b", 40), ("b", 50))
      .toDF("g", "v")
    val rows = Quantiles.exact(df, F.col("v"), Seq("g"), Seq(0.25, 0.5, 0.75))
      .orderBy("g").collect()
    // a: sorted [1,2,3,4], pos = q*(n-1): p25 -> 1.75, p50 -> 2.5, p75 -> 3.25
    assert(rows(0).getDouble(1) == 1.75 && rows(0).getDouble(2) == 2.5 &&
      rows(0).getDouble(3) == 3.25)
    // b: odd n, exact ranks: p25 -> 20, p50 -> 30, p75 -> 40
    assert(rows(1).getDouble(1) == 20.0 && rows(1).getDouble(2) == 30.0 &&
      rows(1).getDouble(3) == 40.0)
  }

  test("approx sketch lands within rank tolerance of exact") {
    import spark.implicits._
    val df = (1 to 10000).map(i => ("g", (i * 2654435761L % 100000).toDouble))
      .toDF("g", "v")
    val ex = Quantiles.exact(df, F.col("v"), Seq("g"), Seq(0.5)).collect()(0).getDouble(1)
    val ap = Quantiles.approx(df, F.col("v"), Seq("g"), Seq(0.5)).collect()(0).getDouble(1)
    // accuracy=10000 -> rank error <= 1/10000; on 10k uniform-ish values
    // that is a handful of ranks, i.e. well under 1% of the value range
    assert(math.abs(ap - ex) <= 1000.0, s"approx $ap vs exact $ex")
  }

  test("keepQuantileBand keeps the band per group via a broadcast cutoff join") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
              (1 to 100).map(i => ("b", i * 10.0))).toDF("g", "v")
    val kept = Quantiles.keepQuantileBand(df, F.col("v"), Seq("g"), 0.25, 0.75)
    val rows = kept.collect().map(r => (r.getString(0), r.getDouble(1)))
    val (as, bs) = (rows.filter(_._1 == "a").map(_._2), rows.filter(_._1 == "b").map(_._2))
    // exact band would keep ~51 of 100 values per group; the sketch at
    // accuracy 10000 is exact at this size
    assert(as.nonEmpty && as.min >= 25.0 && as.max <= 76.0, s"a band ${as.min}..${as.max}")
    assert(bs.nonEmpty && bs.min >= 250.0 && bs.max <= 760.0, s"b band ${bs.min}..${bs.max}")
    val planStr = kept.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"),
      s"cutoff table must broadcast, never shuffle the corpus:\n$planStr")
  }

  test("fractional quantile column names come from exact decimals, not double arithmetic") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("x", i)).toDF("g", "v")
    // 0.05*100 in doubles is 5.000000000000001 — the name must still be p5
    val cols = Quantiles.exact(df, F.col("v"), Seq("g"), Seq(0.05, 0.5, 0.999)).columns
    assert(cols.toSeq == Seq("g", "p5", "p50", "p99_9"), cols.toSeq.toString)
  }

  test("keepQuantileBand with lo == hi keeps the single cutoff value") {
    import spark.implicits._
    val df = (1 to 99).map(i => ("g", i.toDouble)).toDF("g", "v")
    val kept = Quantiles.keepQuantileBand(df, F.col("v"), Seq("g"), 0.5, 0.5)
      .collect().map(_.getDouble(1))
    assert(kept.toSeq == Seq(50.0), s"exactly the median row survives, got ${kept.toSeq}")
  }

  test("global (ungrouped) quantiles work and reject bad fractions") {
    import spark.implicits._
    val df = (1 to 9).map(i => ("x", i)).toDF("g", "v")
    val r = Quantiles.exact(df, F.col("v"), Nil, Seq(0.5)).collect()(0)
    assert(r.getDouble(0) == 5.0)
    intercept[IllegalArgumentException] {
      Quantiles.exact(df, F.col("v"), Nil, Seq(1.5))
    }
  }
}

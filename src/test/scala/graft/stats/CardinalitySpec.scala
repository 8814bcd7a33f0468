package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

/** Dual-tier distinct counts: the exact tier is ground truth (and the
  * q78 oracle gate); the HLL tiers must sit within their error bound;
  * and stored DataSketches merge over ANY partitioning to EXACTLY the
  * single-pass sketch (registers combine by pointwise max) — the
  * incremental-ingest property the sketch tier exists for. */
class CardinalitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // 40k rows, 4 groups; within each group the value takes exactly 250
  // distinct residues of 1000
  private lazy val df = spark.range(40000)
    .select((F.col("id") % 4).as("g"), (F.col("id") % 1000).as("v"))

  private def byG(r: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("exact tier: ground-truth distinct counts per group") {
    val e = byG(Cardinality.exact(df, Seq("g"), F.col("v")))
    assert(e == Map(0L -> 250L, 1L -> 250L, 2L -> 250L, 3L -> 250L))
  }

  test("approx tier: HLL++ within the configured rsd") {
    val a = byG(Cardinality.approx(df, Seq("g"), F.col("v"), rsd = 0.05))
    a.foreach { case (g, n) =>
      assert(math.abs(n - 250.0) / 250.0 <= 0.15,
        s"group $g: approx $n vs exact 250 exceeds 3x rsd")
    }
  }

  test("sketch tier: union over any split equals the single-pass sketch EXACTLY, and is accurate") {
    // single pass over everything
    val whole = byG(Cardinality.mergeSketches(
      Cardinality.sketches(df, Seq("g"), F.col("v")), Seq("g")))
    // two disjoint "days", sketched independently (rows overlap in VALUE
    // space, so this is a genuine union, not a sum), then merged
    val day1 = Cardinality.sketches(df.filter(F.col("id") < 15000), Seq("g"), F.col("v"))
    val day2 = Cardinality.sketches(df.filter(F.col("id") >= 15000), Seq("g"), F.col("v"))
    val merged = byG(Cardinality.mergeSketches(day1.unionByName(day2), Seq("g")))
    assert(merged == whole,
      "HLL registers merge by pointwise max: union-of-parts == single-pass, bit for bit")
    merged.foreach { case (g, n) =>
      assert(math.abs(n - 250.0) / 250.0 <= 0.05, s"group $g: sketch estimate $n off >5%")
    }
  }
}

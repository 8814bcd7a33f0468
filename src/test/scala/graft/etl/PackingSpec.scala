package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

class PackingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("packSequential assigns chunks at budget boundaries, per shard") {
    import spark.implicits._
    // shard a: tokens 400,400,400 -> starts 0,400,800 -> chunks 0,0,0 @1000? no:
    // floor(0/1000)=0, floor(400/1000)=0, floor(800/1000)=0; 4th doc start 1200 -> 1
    val df = Seq(
      ("a", 1L, 400L), ("a", 2L, 400L), ("a", 3L, 400L), ("a", 4L, 100L),
      ("b", 1L, 2500L), ("b", 2L, 100L)).toDF("shard", "id", "tok")
    val out = Packing.packSequential(df, F.col("tok"), "shard", "id", 1000L)
      .orderBy("shard", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L),
      // an over-budget doc owns its span; the next doc starts at its end
      ("b", 1L, 0L), ("b", 2L, 2L)))
  }

  test("packing is deterministic and never shuffles more than the one window exchange") {
    import spark.implicits._
    val df = (0 until 500).map(i => (s"s${i % 4}", i.toLong, (i % 97 + 1).toLong))
      .toDF("shard", "id", "tok")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val out = Packing.packSequential(df.repartition(8), F.col("tok"), "shard", "id", 100L)
      val a = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted
      val b = Packing.packSequential(df.repartition(3), F.col("tok"), "shard", "id", 100L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted
      assert(a.sameElements(b), "layout must not depend on input partitioning")
      val exchanges = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size <= 2, // input repartition + the shard window
        s"expected only the shard-keyed window exchange, got ${exchanges.size}")
      intercept[IllegalArgumentException] {
        Packing.packSequential(df, F.col("tok"), "shard", "id", 0L)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}

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

  test("chunkSliding: overlap layout, tail window, single-chunk and empty docs, no shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b c"),                          // <= width: one whole chunk
      (3L, ""), (4L, "   "),                  // zero tokens: no chunks
      (5L, (0 until 13).map("w" + _).mkString(" ")) // 13: starts 0,3,6,9 (9+4 reaches 13)
    ).toDF("id", "text")
    val out = Packing.chunkSliding(docs, "text", "id", width = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    // doc 1: starts 0,3,6 -> last window [6,10) exactly reaches the tail
    assert(out((1L, 0)) == ((4L, "t0 t1 t2 t3")))
    assert(out((1L, 1)) == ((4L, "t3 t4 t5 t6")), "stride 3 < width 4 overlaps by one")
    assert(out((1L, 2)) == ((4L, "t6 t7 t8 t9")))
    assert(!out.contains((1L, 3)), "no degenerate tail chunk after a window reaches the end")
    assert(out((2L, 0)) == ((3L, "a b c")))
    assert(!out.keySet.exists(_._1 == 3L) && !out.keySet.exists(_._1 == 4L))
    // doc 5: ceil((13-4)/3)+1 = 4 chunks; the last is the 4-token [9,13)
    assert((0 to 3).forall(k => out.contains((5L, k))) && !out.contains((5L, 4)))
    assert(out((5L, 3)) == ((4L, "w9 w10 w11 w12")))
    // every token of doc 5 is covered at least once
    val covered = (0 to 3).flatMap(k => out((5L, k))._2.split(" ")).toSet
    assert(covered == (0 until 13).map("w" + _).toSet)
    // narrow plan: no exchange anywhere
    val plan = Packing.chunkSliding(docs, "text", "id", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}

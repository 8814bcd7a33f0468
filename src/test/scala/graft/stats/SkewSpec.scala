package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

/** Hot-key profiling: exact tier vs the one-pass Misra–Gries sketch. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // zipf-ish skew: key i appears ~N/(i+1) times
  private def skewed(n: Int) = {
    import spark.implicits._
    (0 until n).flatMap(i => Seq.fill(n / (i + 1))(s"k$i")).toDF("key")
      .repartition(8)
  }

  test("exact top keys: count-desc total order with deterministic ties") {
    val top = Skew.topKeysExact(skewed(50), "key", 5).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("k0", 50L))
    assert(top(1) == ("k1", 25L))
    val counts = top.map(_._2)
    assert(counts.sorted(Ordering[Long].reverse).toSeq == counts.toSeq)
  }

  test("MG sketch finds every true heavy hitter shuffle-free, counts are lower bounds") {
    val df = skewed(200).cache()
    val exact = Skew.topKeysExact(df, "key", 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = df.count()
    val capacity = 64
    val sketch = Skew.topKeysSketch(df, "key", 10, capacity).toMap
    // guarantee: every key with share > 1/capacity is present
    exact.filter(_._2 > n / capacity).keys.foreach(k =>
      assert(sketch.contains(k), s"true heavy hitter $k missing from sketch"))
    // counts are lower bounds within the additive error n/capacity
    sketch.foreach { case (k, est) =>
      val truth = exact.getOrElse(k, df.filter(F.col("key") === k).count())
      assert(est <= truth, s"$k estimate $est exceeds truth $truth")
      assert(truth - est <= n / capacity + 1,
        s"$k error ${truth - est} beyond bound ${n / capacity}")
    }
    // and the plan really is shuffle-free: a narrow map + driver merge
    // (no groupBy/exchange) — assert no shuffle in the keys projection
    val proj = df.select(F.col("key").cast("string"))
    assert(proj.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty)
  }

  test("null keys: sketch tier counts and orders them like the exact tier") {
    import spark.implicits._
    // nulls are a real key population in dirty corpora; both tiers must
    // count them and place them identically (nulls-first within count ties)
    val df = (Seq.fill(30)(Some("hot")) ++ Seq.fill(30)(Option.empty[String]) ++
      (0 until 10).map(i => Some(s"cold$i"))).toDF("key").repartition(4)
    val exact = Skew.topKeysExact(df, "key", 3).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0), r.getLong(1))).toSeq
    val sketch = Skew.topKeysSketch(df, "key", 3, capacity = 64)
    assert(exact == sketch, s"tiers disagree on null keys: exact=$exact sketch=$sketch")
    assert(exact.take(2).map(_._1).toSet == Set(null, "hot"))
  }

  test("MgBuilder hot path: millions of near-distinct keys in one partition, bounded time") {
    // the worst case for the sketch (map always full, every absent key
    // triggers the decrement sweep) — in-place holders keep it to a hash
    // probe + amortized O(1) sweep per row; the old per-row persistent-Map
    // rebuild took ~an order of magnitude longer on the same input
    val b = new Skew.MgBuilder(256)
    val hot = "heavy"
    val t0 = System.nanoTime()
    var i = 0
    while (i < 3000000) {
      b.add(if (i % 10 == 0) hot else s"k${i}")
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val top = b.result.top(1)
    assert(top.head._1 == hot, s"the 10% key must survive 3M near-distinct rows: $top")
    assert(sec < 10.0, f"3M-row fold took $sec%.1f s — hot path regressed")
  }

  test("compaction bin-packs small files without changing content") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    (0 until 10000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
      .repartition(64).write.parquet(in) // 64 tiny files
    val (before, after) = graft.etl.Layout.compact(spark, in, out,
      targetBytes = 256L * 1024)
    assert(before == 64 && after < 8, s"64 tiny files must pack down, got $after")
    val a = spark.read.parquet(in).orderBy("id").collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b, "compaction must preserve content exactly")
    intercept[IllegalArgumentException] {
      graft.etl.Layout.compact(spark, in, in)
    }
  }
}

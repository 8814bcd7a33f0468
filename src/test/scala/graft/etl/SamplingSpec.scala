package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val df = {
    import spark.implicits._
    (1L to 5000L).map(i => (i, if (i % 4 == 0) "a" else "b")).toDF("id", "cls").cache()
  }

  test("deterministic val split: stable across evaluations, ~valPct sized") {
    val s1 = Sampling.withValSplit(df, valPct = 20, seed = 42L, "id")
    val s2 = Sampling.withValSplit(df, valPct = 20, seed = 42L, "id")
    val v1 = s1.filter(F.col("is_val")).select("id").collect().map(_.getLong(0)).toSet
    val v2 = s2.filter(F.col("is_val")).select("id").collect().map(_.getLong(0)).toSet
    assert(v1 == v2, "split must be a pure function of row identity")
    val frac = v1.size.toDouble / 5000
    assert(frac > 0.15 && frac < 0.25, s"val fraction $frac")
    // different seed -> different split
    val v3 = Sampling.withValSplit(df, 20, seed = 43L, "id")
      .filter(F.col("is_val")).select("id").collect().map(_.getLong(0)).toSet
    assert(v1 != v3)
  }

  test("deterministic sampleBy: reproducible, close to requested fraction") {
    val a = Sampling.deterministicSampleBy(df, 0.3, 7L, "id").select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSampleBy(df, 0.3, 7L, "id").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    val frac = a.size.toDouble / 5000
    assert(frac > 0.25 && frac < 0.35, s"sample fraction $frac")
  }

  test("groupHead keeps exactly the first n rows per group") {
    val head = Sampling.groupHead(df, n = 3, groupCol = "cls", orderCol = "id")
    val byCls = head.collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byCls("a") == Seq(4L, 8L, 12L))
    assert(byCls("b") == Seq(1L, 2L, 3L))
  }

  test("rebalance is a no-op when classes are within ratio") {
    val balanced = {
      import spark.implicits._
      (1L to 100L).map(i => (i, if (i % 2 == 0) "x" else "y")).toDF("id", "cls")
    }
    assert(Sampling.rebalance(balanced, "cls", maxRatio = 2.0, 42L, "id").count() == 100)
  }

  test("temperature weights: tau=1 is the natural mix, tau<1 up-samples small domains") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    // 3 sources with token masses 8000 / 1000 / 1000 (docs of 10 tokens)
    val docs = (
      (1 to 800).map(i => (s"big", 10)) ++
      (1 to 100).map(i => (s"mid", 10)) ++
      (1 to 100).map(i => (s"sml", 10))).toDF("source", "tok")
    def weights(tau: Double): Map[String, (Double, Double)] =
      Sampling.temperatureWeights(docs, "source", F.col("tok"), tau)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(3), r.getDouble(4))).toMap
    val w1 = weights(1.0)
    // tau=1: weight_tau == weight_prop == exact integer ratio
    assert(w1("big") == (0.8, 0.8) && w1("mid") == (0.1, 0.1))
    assert(math.abs(w1.values.map(_._2).sum - 1.0) < 1e-12)
    val w05 = weights(0.5)
    // temperature flattens: majority share shrinks, minority share grows
    assert(w05("big")._2 < 0.8 && w05("sml")._2 > 0.1,
      s"tau=0.5 must flatten the mix: $w05")
    // sqrt mix exactly: sqrt(8000)/(sqrt(8000)+2*sqrt(1000))
    val expBig = math.sqrt(8000.0) / (math.sqrt(8000.0) + 2 * math.sqrt(1000.0))
    assert(math.abs(w05("big")._2 - expBig) < 1e-9)
    // tau -> 0 approaches uniform over sources
    val w0 = weights(0.0)
    assert(math.abs(w0("big")._2 - 1.0 / 3) < 1e-12)
  }

  test("temperatureSample: mix shifts with tau, saturation keeps all, plan is narrow") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    // sources sized 9000 / 900 / 100 docs, 1 token per doc
    val docs = ((1 to 9000).map(i => (i.toLong, "big")) ++
      (1 to 900).map(i => (10000L + i, "mid")) ++
      (1 to 100).map(i => (20000L + i, "sml"))).toDF("id", "source")
    def mix(tau: Double): Map[String, Long] =
      Sampling.temperatureSample(docs, "source", F.lit(1), tau,
          targetRows = 999, seed = 7, "id")
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tau=1: proportional — expected 900 / 90 / 10 (hash-sample jitter)
    val m1 = mix(1.0)
    assert(math.abs(m1("big") - 900L) < 120 && math.abs(m1("mid") - 90L) < 40, s"$m1")
    // tau=0: uniform thirds — sml's 333-row allocation EXCEEDS its 100
    // docs, so it saturates at keep-everything, exactly
    val m0 = mix(0.0)
    assert(m0("sml") == 100L, s"saturated source must keep all rows: $m0")
    assert(math.abs(m0("mid") - 333L) < 70, s"$m0")
    assert(m0("big") < m1("big") && m0("mid") > m1("mid"),
      s"tau=0 must shift mass from big to small: $m1 -> $m0")
    // determinism: same inputs, same rows
    assert(mix(0.5) == mix(0.5))
    // scale shape: the corpus side must not shuffle — only the weights
    // aggregate exchanges; the threshold table joins in as a broadcast
    val plan = Sampling.temperatureSample(docs, "source", F.lit(1), 0.5,
      targetRows = 999, seed = 7, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") && plan.contains("BroadcastHashJoin"),
      s"threshold table must broadcast:\n$plan")
  }
}

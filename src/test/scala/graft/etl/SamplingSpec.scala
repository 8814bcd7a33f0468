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
}

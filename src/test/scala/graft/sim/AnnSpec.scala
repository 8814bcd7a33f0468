package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AnnSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val dim = 16
  // deterministic clustered vectors: 4 clusters of 25
  private def vec(cluster: Int, i: Int): Array[Float] = {
    val r = new java.util.Random(cluster * 1000L + i)
    Array.tabulate(dim) { d =>
      val center = if (d % 4 == cluster) 1.0f else 0.0f
      center + (r.nextGaussian() * 0.08).toFloat
    }
  }
  private val rows = for (c <- 0 until 4; i <- 0 until 25)
    yield (c * 25L + i, vec(c, i))

  test("brute-force top-k returns same-cluster neighbors in cosine order") {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val q = vec(2, 999)
    val top = Ann.bruteForceTopK(df, "embedding", "vec_id", q, 10).collect()
    val ids = top.map(_.getLong(0))
    assert(ids.forall(id => id >= 50 && id < 75), s"expected cluster-2 ids, got ${ids.toSeq}")
    val cosines = top.map(_.getDouble(1))
    assert(cosines.toSeq == cosines.sorted(Ordering[Double].reverse).toSeq)
  }

  test("LSH top-k recall >= 0.8 vs brute force") {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding").cache()
    val q = vec(1, 777)
    val exact = Ann.bruteForceTopK(df, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Ann.lshTopK(df, "embedding", "vec_id", q, k = 10,
      nBits = 10, seed = 3L, probeHamming = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF top-k recall >= 0.9 vs brute force while scanning a fraction") {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding").cache()
    val index = Ann.ivfFit(df, "embedding", k = 4, seed = 11L)
    val indexed = Ann.ivfAssign(df, "embedding", index).cache()
    val q = vec(3, 555)
    val exact = Ann.bruteForceTopK(df, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Ann.ivfTopK(indexed, "embedding", "vec_id", index, q, k = 10, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall")
    // the probe really does restrict the scan
    val probes = index.nearestCentroids(q.map(_.toDouble), 1)
    val scanned = indexed.filter(org.apache.spark.sql.functions.col("ivf_cluster")
      .isin(probes.toSeq: _*)).count()
    assert(scanned < rows.size, s"IVF must scan a subset, scanned $scanned/${rows.size}")
  }

  test("cosine near-dup pairs stay within clusters") {
    import spark.implicits._
    val df = rows.take(50).toDF("vec_id", "embedding") // clusters 0 and 1
    val pairs = Ann.cosineDupPairs(df, "embedding", "vec_id",
      threshold = 0.95, nBits = 8, seed = 4L, dim = dim).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      (a < 25) == (b < 25) // same cluster
    })
  }
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths:
  *  - bruteForce: exact cosine top-k, one narrow pass + one small topK —
  *    the correctness baseline (and oracle-checkable in SQL)
  *  - lshTopK: random-hyperplane LSH buckets — the scale path; each probe
  *    only scans its own bucket(s), so a 10^12-row index is queried
  *    without a full scan. Hyperplanes are seeded deterministically.
  */
object Ann {

  /** cosine(embedding, q) as a Column (codegen'd higher-order funcs). */
  def cosineTo(emb: Column, q: Array[Float]): Column = {
    // all math in double (floats promoted first) for cross-engine parity
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val qCol = F.typedlit(q.map(_.toDouble))
    val embD = F.transform(emb, x => x.cast("double"))
    val dot = F.aggregate(F.zip_with(embD, qCol, (a, b) => a * b),
      F.lit(0.0), (acc, x) => acc + x)
    val norm = F.sqrt(F.aggregate(F.transform(embD, a => a * a),
      F.lit(0.0), (acc, x) => acc + x))
    // zero-norm rows (or a zero query) must rank last, not NaN-first
    // (Spark sorts NaN above every double)
    if (qNorm == 0.0) F.lit(-1.0)
    else F.when(norm === 0.0, F.lit(-1.0)).otherwise(dot / (norm * F.lit(qNorm)))
  }

  /** Exact top-k by cosine similarity to a single query vector. */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
                     q: Array[Float], k: Int): DataFrame =
    df.select(F.col(idCol), cosineTo(F.col(embCol), q).as("cosine"))
      .orderBy(F.col("cosine").desc, F.col(idCol))
      .limit(k)

  /** Deterministic random hyperplanes: nBits x dim, seeded. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of the embedding under the hyperplanes. */
  def signature(v: Array[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      var dot = 0.0
      val p = planes(i)
      var j = 0
      while (j < p.length) { dot += v(j) * p(j); j += 1 }
      if (dot >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Add an LSH bucket column (random-hyperplane signature). The planes are
    * built on the driver and captured by the UDF closure (broadcast via
    * task serialization — a few KB). */
  def withLshBucket(df: DataFrame, embCol: String, nBits: Int, seed: Long, dim: Int): DataFrame = {
    val planes = hyperplanes(dim, nBits, seed)
    val sigUdf = F.udf((v: Array[Float]) => signature(v, planes))
    df.withColumn("lsh_bucket", sigUdf(F.col(embCol)))
  }

  /** ANN top-k: scan only rows whose bucket is within `probeHamming` of the
    * query's bucket (multi-probe), rank those by exact cosine. Recall is
    * tunable via nBits/probeHamming; verified against bruteForce in tests. */
  def lshTopK(df: DataFrame, embCol: String, idCol: String,
              q: Array[Float], k: Int, nBits: Int = 12, seed: Long = 42L,
              probeHamming: Int = 1): DataFrame = {
    val dim = q.length
    val planes = hyperplanes(dim, nBits, seed)
    val qSig = signature(q, planes)
    val indexed = withLshBucket(df, embCol, nBits, seed, dim)
    val candidates = indexed.filter(
      F.bit_count(F.col("lsh_bucket").bitwiseXOR(F.lit(qSig))) <= probeHamming)
    bruteForceTopK(candidates, embCol, idCol, q, k)
  }

  /** IVF (inverted-file) index: k-means centroids + cluster assignment.
    * The scale path for ANN when recall matters more than build cost:
    * queries probe the nProbe nearest centroids and scan only those
    * clusters (expected fraction nProbe/k of the index). Centroids are
    * trained distributed (spark.ml KMeans, seeded); assignment is a narrow
    * map over the broadcast centroids.
    */
  final case class IvfIndex(centroids: Array[Array[Double]]) extends Serializable {
    def nearestCentroids(v: Array[Double], nProbe: Int): Array[Int] =
      centroids.indices
        .map { i =>
          var d = 0.0
          val c = centroids(i)
          var j = 0
          while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
          (i, d)
        }
        .sortBy(_._2).take(nProbe).map(_._1).toArray
  }

  def ivfFit(df: DataFrame, embCol: String, k: Int, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = df.select(
      array_to_vector(F.transform(F.col(embCol), x => x.cast("double"))).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20).fit(prepared)
    IvfIndex(model.clusterCenters.map(_.toArray))
  }

  /** Assign each row to its nearest centroid (index build). */
  def ivfAssign(df: DataFrame, embCol: String, index: IvfIndex): DataFrame = {
    val assignUdf = F.udf { (v: Array[Float]) =>
      index.nearestCentroids(v.map(_.toDouble), 1)(0)
    }
    df.withColumn("ivf_cluster", assignUdf(F.col(embCol)))
  }

  /** IVF top-k: scan only the nProbe clusters nearest to the query. */
  def ivfTopK(indexed: DataFrame, embCol: String, idCol: String,
              index: IvfIndex, q: Array[Float], k: Int, nProbe: Int = 2): DataFrame = {
    val probes = index.nearestCentroids(q.map(_.toDouble), nProbe)
    bruteForceTopK(
      indexed.filter(F.col("ivf_cluster").isin(probes.toSeq: _*)),
      embCol, idCol, q, k)
  }

  /** All-pairs near-neighbors above a cosine threshold via LSH buckets
    * (embedding-cosine near-dup detection). Exact cosine verifies each
    * candidate pair; only same-bucket pairs are compared. */
  def cosineDupPairs(df: DataFrame, embCol: String, idCol: String,
                     threshold: Double, nBits: Int = 10, seed: Long = 42L,
                     dim: Int = 64): DataFrame = {
    val indexed = withLshBucket(df.select(F.col(idCol), F.col(embCol)), embCol, nBits, seed, dim)
    val a = indexed.select(F.col("lsh_bucket"), F.col(idCol).as("id_a"), F.col(embCol).as("emb_a"))
    val b = indexed.select(F.col("lsh_bucket"), F.col(idCol).as("id_b"), F.col(embCol).as("emb_b"))
    val dot = F.aggregate(F.zip_with(F.col("emb_a"), F.col("emb_b"), (x, y) => x * y),
      F.lit(0.0), (acc, x) => acc + x)
    def norm(c: Column) = F.sqrt(F.aggregate(F.transform(c, x => x * x), F.lit(0.0), (acc, x) => acc + x))
    a.join(b, Seq("lsh_bucket"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(F.col("id_a"), F.col("id_b"), (dot / (norm(F.col("emb_a")) * norm(F.col("emb_b")))).as("cosine"))
      .filter(F.col("cosine") >= threshold)
      .distinct()
  }
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Sampling / splitting / rebalancing operators.
  *
  * The reference uses seeded pandas/sklearn sampling
  * (`/root/reference/train_model.py:75-91`,
  * `/root/reference/data/the_stack/create_stack_snippets.py:233-243`).
  * Those RNG streams are not reproducible on a cluster, so per SURVEY.md
  * §7.4.3 we define splits as pure functions of row identity
  * (xxhash64 of id + seed) — deterministic at any parallelism.
  */
object Sampling {

  /** Deterministic split bucket in [0,100): hash of the id columns + seed. */
  def splitBucket(seed: Long, idCols: Column*): Column =
    F.pmod(F.xxhash64(F.lit(seed) +: idCols: _*), F.lit(100))

  /** A10: deterministic stratified-ish train/val split: `isVal` column. */
  def withValSplit(df: DataFrame, valPct: Int, seed: Long, idCols: String*): DataFrame =
    df.withColumn("is_val", splitBucket(seed, idCols.map(F.col): _*) < valPct)

  /** A9: per-stratum deterministic fraction sample (keep rows whose hash
    * bucket < frac*10000 within their stratum). */
  def deterministicSampleBy(df: DataFrame, frac: Double, seed: Long, idCols: String*): DataFrame = {
    val bucket = F.pmod(F.xxhash64(F.lit(seed) +: idCols.map(F.col): _*), F.lit(10000))
    df.filter(bucket < (frac * 10000).toInt)
  }

  /** A8: majority-class rebalance. If top1/top2 count ratio > maxRatio,
    * downsample the majority class by 1/ratio (deterministic hash sample).
    * Ref behavior: `create_stack_snippets.py:233-243`. One small collect of
    * per-class counts between the two jobs, same as the reference's barrier.
    */
  def rebalance(df: DataFrame, classCol: String, maxRatio: Double, seed: Long, idCols: String*): DataFrame = {
    val counts = df.groupBy(classCol).count().orderBy(F.col("count").desc).limit(2).collect()
    if (counts.length < 2) return df
    val top = counts(0)
    val ratio = top.getLong(1).toDouble / counts(1).getLong(1)
    if (ratio <= maxRatio) df
    else {
      val frac = 1.0 / ratio
      val bucket = F.pmod(F.xxhash64(F.lit(seed) +: idCols.map(F.col): _*), F.lit(10000))
      df.filter(F.col(classCol) =!= top.get(0) || bucket < (frac * 10000).toInt)
    }
  }

  /** DOMAIN-MIX temperature weights — the multi-source reweighting step
    * of a pretraining data pipeline (the "sampling temperature" of
    * XLM-R/CCNet-style multi-corpus training): per source s with token
    * mass n_s, sampling weight w_s = n_s^tau / sum_t(n_t^tau). tau = 1
    * reproduces the natural (proportional) mix; tau -> 0 approaches
    * uniform over sources, up-sampling small domains.
    *
    * Scale shape: ONE shuffle (the per-source aggregate with map-side
    * partial sums); the normalization runs on the aggregated frame — one
    * row per source, a broadcast-scale table — so the unpartitioned
    * window is over dozens of rows, never data. Output: (source, n_docs,
    * n_tokens, weight_prop, weight_tau) with weight_prop the exact
    * integer-ratio tau=1 weight. */
  def temperatureWeights(df: DataFrame, sourceCol: String, sizeExpr: Column,
                         tau: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = df.groupBy(sourceCol)
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(sizeExpr).cast("long").as("n_tokens"))
    val all = Window.partitionBy() // one row per source: broadcast-scale
    per
      .withColumn("__scaled", F.pow(F.col("n_tokens").cast("double"), F.lit(tau)))
      .withColumn("weight_prop",
        F.col("n_tokens").cast("double") / F.sum("n_tokens").over(all).cast("double"))
      .withColumn("weight_tau", F.col("__scaled") / F.sum("__scaled").over(all))
      .drop("__scaled")
  }

  /** Apply `temperatureWeights` to the corpus — the consumer that closes
    * the XLM-R/CCNet loop: per-source keep-fractions are sized so the
    * EXPECTED sample hits `targetRows` rows mixed ∝ weight_tau, then each
    * row keeps or drops by a deterministic hash of its identity.
    * frac_s = min(1, targetRows x w_s / n_docs_s) — a source whose
    * temperature share exceeds its actual size saturates at keep-all
    * (deterministic sampling cannot up-sample; callers wanting
    * replication should union extra epochs of the saturated source).
    *
    * Scale shape: one map-side-combined aggregate over the corpus (the
    * weights), one driver-free BROADCAST join of the per-source
    * threshold table (dozens of rows), and a narrow filter — the corpus
    * itself never shuffles. Thresholds are integers in [0,10000] so the
    * keep decision is exact given the per-source fraction. */
  def temperatureSample(df: DataFrame, sourceCol: String, sizeExpr: Column,
                        tau: Double, targetRows: Long, seed: Long,
                        idCols: String*): DataFrame =
    temperatureSampleWith(df, sourceCol, sizeExpr, tau, targetRows,
      F.pmod(F.xxhash64(F.lit(seed) +: idCols.map(F.col): _*), F.lit(10000)))

  /** Core of `temperatureSample` with an explicit bucket column in
    * [0, 10000) — injectable so the driver gate can restate the bucket as
    * md5 (the q22 cross-engine pattern) while the engine path uses
    * xxhash64. */
  def temperatureSampleWith(df: DataFrame, sourceCol: String, sizeExpr: Column,
                            tau: Double, targetRows: Long,
                            bucket: Column): DataFrame = {
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    val thresholds = temperatureWeights(df, sourceCol, sizeExpr, tau)
      .select(F.col(sourceCol),
        F.floor(F.least(F.lit(1.0),
          F.lit(targetRows.toDouble) * F.col("weight_tau")
            / F.col("n_docs").cast("double")) * 10000).cast("int").as("__thr"))
    df.join(F.broadcast(thresholds), Seq(sourceCol))
      .filter(bucket < F.col("__thr"))
      .drop("__thr")
  }

  /** O3 per-group head: first n rows per group by ordering. */
  def groupHead(df: DataFrame, n: Int, groupCol: String, orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn",
        F.row_number().over(Window.partitionBy(groupCol).orderBy(F.col(orderCol))))
      .filter(F.col("__rn") <= n)
      .drop("__rn")
  }
}

package graft.stats

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Quantile cutoffs over a per-document metric — the operator behind
  * threshold-based quality filtering ("drop the bottom decile by length /
  * quality score", "cap at p99 token count") in a training-data pipeline.
  *
  * Two paths with one call shape:
  *
  *  - `exact`: `percentile(...)` — true linear-interpolated quantiles
  *    (same definition as DuckDB's `quantile_cont`, so it is oracle-
  *    checkable). Spark computes it with a full sort-based aggregation
  *    buffer per group: fine for bounded-cardinality groups (sources,
  *    languages), NOT for 10^12 rows in one group.
  *  - `approx`: `approx_percentile(...)` — a KLL-style mergeable sketch,
  *    map-side-combinable and constant memory per group. This is the path
  *    a 100 TB corpus runs; `accuracy` trades sketch size for error
  *    (10000 ≈ 0.01% rank error).
  *
  * Both return one row per group with a DOUBLE column per requested
  * quantile (`p10`, `p50`, ... from the fraction), so a caller can swap
  * paths without touching downstream threshold joins. */
object Quantiles {

  private def colName(q: Double): String = {
    // exact-decimal arithmetic: 0.05*100 in doubles is 5.000000000000001,
    // which would leak into the column name as "p5_000000000000001"
    val pct = BigDecimal(q.toString) * 100
    val s = pct.underlying.stripTrailingZeros.toPlainString.replace(".", "_")
    s"p$s"
  }

  private def agg(qs: Seq[Double], fn: String, extra: String): Seq[Column] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile fractions must be in [0,1]: $qs")
    qs.map(q => F.expr(s"$fn(__qm, ${q}$extra)").as(colName(q)))
  }

  /** Exact per-group quantiles of `metric`; `groupCols` empty = global. */
  def exact(df: DataFrame, metric: Column, groupCols: Seq[String],
            qs: Seq[Double]): DataFrame = {
    val base = df.withColumn("__qm", metric.cast("double"))
    val aggs = agg(qs, "percentile", "")
    val out =
      if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
      else base.groupBy(groupCols.map(F.col): _*).agg(aggs.head, aggs.tail: _*)
    out.drop("__qm")
  }

  /** Sketch-based per-group quantiles — the 100 TB path. */
  def approx(df: DataFrame, metric: Column, groupCols: Seq[String],
             qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val base = df.withColumn("__qm", metric.cast("double"))
    val aggs = agg(qs, "approx_percentile", s", $accuracy")
    val out =
      if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
      else base.groupBy(groupCols.map(F.col): _*).agg(aggs.head, aggs.tail: _*)
    out.drop("__qm")
  }

  /** Filter `df` to rows whose `metric` lies within the [lo, hi] quantile
    * band computed per `groupCols` — e.g. keep p10..p99 by length within
    * each source. The cutoff table is tiny (one row per group) and joins
    * back broadcast; the corpus itself is scanned once. `useExact` swaps
    * the sketch cutoffs for true linear-interpolated percentiles
    * (oracle-checkable; bounded-cardinality groups only — see `exact`). */
  def keepQuantileBand(df: DataFrame, metric: Column, groupCols: Seq[String],
                       lo: Double, hi: Double,
                       accuracy: Int = 10000,
                       useExact: Boolean = false): DataFrame = {
    require(lo <= hi, s"lo $lo must be <= hi $hi")
    def cutsOf(qs: Seq[Double]): DataFrame =
      if (useExact) exact(df, metric, groupCols, qs)
      else approx(df, metric, groupCols, qs, accuracy)
    // lo == hi would alias two aggregates identically (the band collapses
    // to one cutoff) — compute it once and use it as both bounds
    val cuts =
      if (lo == hi)
        cutsOf(Seq(lo))
          .withColumn("__lo", F.col(colName(lo)))
          .withColumnRenamed(colName(lo), "__hi")
      else
        cutsOf(Seq(lo, hi))
          .withColumnRenamed(colName(lo), "__lo")
          .withColumnRenamed(colName(hi), "__hi")
    val joined =
      if (groupCols.isEmpty) df.crossJoin(F.broadcast(cuts))
      else df.join(F.broadcast(cuts), groupCols)
    joined.filter(metric.cast("double").between(F.col("__lo"), F.col("__hi")))
      .drop("__lo", "__hi")
  }
}

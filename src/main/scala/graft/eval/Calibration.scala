package graft.eval

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Reliability-diagram data for a probabilistic score: does "90%
  * confident" mean 90% accurate? Corpus triage keeps high-confidence
  * slices, so the confidence column only earns its place if bucketed
  * accuracy rises with it (PipelineSpec asserts monotonicity for the
  * langid confidence on a held-out 97-language fixture).
  *
  * Scale shape: one `approxQuantile` sketch pass for equal-population
  * cutoffs + one map-side-combined aggregate over nBins rows — two
  * narrow passes, no sort, no window, evaluation-frame or corpus sized
  * alike. */
object Calibration {

  private def binAgg(df: DataFrame, confCol: String, correctCol: String,
                     nBins: Int, cuts: Seq[Double]): DataFrame = {
    val conf = F.col(confCol)
    val bin = cuts.zipWithIndex.foldRight(F.lit(nBins - 1): Column) {
      case ((c, i), acc) => F.when(conf <= c, i).otherwise(acc)
    }
    df.withColumn("bin", bin)
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("n"),
        F.avg(conf).as("mean_conf"),
        // exact integer ratio (long sums, ONE division) rather than a
        // float avg: deterministic and SQL-reproducible bit-for-bit
        (F.sum(F.col(correctCol).cast("long")).cast("double")
          / F.count(F.lit(1)).cast("double")).as("accuracy"))
      .orderBy("bin")
  }

  /** (bin, n, mean_conf, accuracy) over `nBins` equal-population
    * confidence bins, bin 0 = least confident. `correctCol` is 0/1
    * (numeric or boolean). Cutoffs from the approxQuantile sketch — the
    * corpus-scale path. */
  def reliabilityTable(df: DataFrame, confCol: String, correctCol: String,
                       nBins: Int = 10, relErr: Double = 0.001): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val cuts = df.stat.approxQuantile(confCol, probs, relErr)
    binAgg(df, confCol, correctCol, nBins, cuts.toSeq)
  }

  /** `reliabilityTable` with EXACT interpolated-quantile cutoffs
    * (`Quantiles.exact`, i.e. `percentile` — the same definition as a
    * SQL engine's quantile_cont, so the whole table is oracle-checkable
    * bit-for-bit). Costs the exact tier's sort-based aggregation: right
    * for evaluation frames; the sketch variant is the 10^12-row path. */
  def reliabilityTableExact(df: DataFrame, confCol: String, correctCol: String,
                            nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val row = graft.stats.Quantiles.exact(df, F.col(confCol), Seq.empty, probs).head()
    val cuts = (0 until nBins - 1).map(row.getDouble)
    binAgg(df, confCol, correctCol, nBins, cuts)
  }

  /** Expected Calibration Error over the table `reliabilityTable`
    * produces: sum_b (n_b / N) * |accuracy_b - mean_conf_b|. */
  def ece(reliability: DataFrame): Double = {
    val r = reliability.agg(
      (F.sum(F.col("n") * F.abs(F.col("accuracy") - F.col("mean_conf")))
        / F.sum("n")).as("ece")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }
}

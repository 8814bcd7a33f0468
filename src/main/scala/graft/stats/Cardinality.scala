package graft.stats

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Distinct-count machinery in the two execution tiers the corpus scale
  * demands (the `Quantiles`/`Skew` dual-tier pattern):
  *
  *  - `exact`: COUNT(DISTINCT) per group. The ground truth and the
  *    driver-oracle tier (q78); at 100 TB an exact distinct on a
  *    high-cardinality column is a full shuffle of every distinct value
  *    — correct, paid for.
  *  - `approx`: HyperLogLog++ (`approx_count_distinct`) — one pass, a
  *    few KB of state per group, map-side combined, rsd-bounded error.
  *  - `sketches` / `mergeSketches`: Apache DataSketches HLL sketches as
  *    FIRST-CLASS VALUES (binary column), so per-day / per-partition
  *    sketches are computed once, STORED, and merged later — the
  *    incremental-ingest shape: yesterday's corpus sketch + today's
  *    batch sketch union in milliseconds, no rescan of the corpus. HLL
  *    registers merge by pointwise max, so a union over any partitioning
  *    of the data equals the single-pass sketch EXACTLY
  *    (CardinalitySpec asserts equality, not approximate agreement).
  *
  * All three tiers group by arbitrary columns; the sketch tier is the
  * 100 TB path, the exact tier the correctness gate.
  */
object Cardinality {

  /** Exact distinct values of `valueCol` per group (ground-truth tier). */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: Column,
            out: String = "n_distinct"): DataFrame =
    df.groupBy(groupCols.map(F.col): _*)
      .agg(F.count_distinct(valueCol).as(out))

  /** HLL++ approximate distinct per group; `rsd` = relative standard
    * deviation (0.05 default ≈ ±5%). One pass, constant state. */
  def approx(df: DataFrame, groupCols: Seq[String], valueCol: Column,
             rsd: Double = 0.05, out: String = "n_distinct"): DataFrame =
    df.groupBy(groupCols.map(F.col): _*)
      .agg(F.approx_count_distinct(valueCol, rsd).as(out))

  /** Materialize a DataSketches HLL sketch per group (binary column
    * `sketch`) — store these beside the data; `lgK` trades size for
    * accuracy (12 → 4 KB, ~1.6% rsd). */
  def sketches(df: DataFrame, groupCols: Seq[String], valueCol: Column,
               lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(F.col): _*)
      .agg(F.hll_sketch_agg(valueCol, F.lit(lgK)).as("sketch"))

  /** Merge stored sketches (e.g. one per day/partition) per group and
    * estimate: the incremental path — no source rescan. */
  def mergeSketches(parts: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "sketch",
                    out: String = "n_distinct"): DataFrame =
    parts.groupBy(groupCols.map(F.col): _*)
      .agg(F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketchCol), F.lit(false))).as(out))
}

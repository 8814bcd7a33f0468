package graft.stats

import org.apache.spark.sql.{DataFrame, functions => F}

/** Hot-key (heavy-hitter) profiling — the diagnostic a 100 TB pipeline
  * runs BEFORE a big join or aggregation: which keys are hot, and hot
  * enough for what (AQE skew split? salting? a broadcast side-table of
  * just the hot keys?).
  *
  * Two tiers, one semantics:
  *  - `topKeysExact`: groupBy-count-topK. One shuffle with map-side
  *    partial aggregation; right whenever a shuffle of distinct keys is
  *    affordable (it usually is — counts are 16 B/key).
  *  - `topKeysSketch`: Misra–Gries summaries built per partition and
  *    merged on the driver — ONE narrow pass, ZERO shuffles, bounded
  *    memory (`capacity` counters per partition). The classic guarantee:
  *    any key with true frequency > n/capacity survives, and each
  *    reported count undercounts by at most n/capacity. Use when even
  *    the key-count shuffle is too much (trillions of near-distinct
  *    keys) or inside a job that must stay single-pass.
  */
object Skew {

  /** Exact k hottest keys: (key, n), count-desc then key-asc (total order,
    * oracle-checkable). Null keys count like any other value (rendered
    * via a null-safe cast to string). */
  def topKeysExact(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.select(F.col(keyCol).cast("string").as("key"))
      .groupBy("key").agg(F.count(F.lit(1)).as("n"))
      .orderBy(F.col("n").desc, F.col("key"))
      .limit(k)

  /** Misra–Gries summary: at most `capacity` (key -> lower-bound count)
    * counters. Merge = add counts, then decrement-all by the smallest
    * surplus counters until <= capacity remain (standard MG merge, keeps
    * the error bound additive). */
  final case class MgSummary(capacity: Int,
                             counters: Map[String, Long], processed: Long) {
    def add(key: String): MgSummary = {
      val c = counters
      if (c.contains(key)) copy(counters = c.updated(key, c(key) + 1L), processed = processed + 1)
      else if (c.size < capacity) copy(counters = c.updated(key, 1L), processed = processed + 1)
      else {
        // decrement all; drop zeros (amortized O(1) per row with maps this
        // small — capacity is hundreds, not millions)
        val dec = c.iterator.map { case (k2, v) => (k2, v - 1L) }
          .filter(_._2 > 0L).toMap
        copy(counters = dec, processed = processed + 1)
      }
    }
    def merge(other: MgSummary): MgSummary = {
      val sum = (counters.keySet ++ other.counters.keySet).iterator
        .map(k2 => k2 -> (counters.getOrElse(k2, 0L) + other.counters.getOrElse(k2, 0L)))
        .toMap
      val trimmed =
        if (sum.size <= capacity) sum
        else {
          // subtract the (size-capacity+1)-th largest count from all, keep positives
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
          sum.iterator.map { case (k2, v) => (k2, v - cut) }.filter(_._2 > 0L).toMap
        }
      MgSummary(capacity, trimmed, processed + other.processed)
    }
    /** Keys sorted by lower-bound count desc, key asc. */
    def top(k: Int): Seq[(String, Long)] =
      counters.toSeq.sortBy { case (k2, v) => (-v, k2) }.take(k)
  }

  /** One-pass, shuffle-free heavy-hitter sketch over `keyCol`. The result
    * counts are LOWER bounds with error <= processed/capacity; any key
    * with true share > 1/capacity is guaranteed present. */
  def topKeysSketch(df: DataFrame, keyCol: String, k: Int,
                    capacity: Int = 256): Seq[(String, Long)] = {
    import df.sparkSession.implicits._
    val keys = df.select(F.col(keyCol).cast("string").as("key")).as[String]
    keys.mapPartitions { it =>
      Iterator.single(it.foldLeft(MgSummary(capacity, Map.empty, 0L))(_.add(_)))
    }.reduce(_.merge(_)).top(k)
  }
}

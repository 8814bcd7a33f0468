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

  /** Per-partition mutable Misra–Gries accumulator — the HOT PATH. The
    * operator's pitch is "one narrow pass over trillions of near-distinct
    * keys", so the per-row cost must be a hash probe and an in-place
    * increment, not a persistent-Map rebuild: counts live in `Array[Long]`
    * holders inside one `java.util.HashMap` (null-key tolerant, matching
    * the exact tier's null handling), so the common paths allocate
    * NOTHING per row. The decrement-all sweep is O(capacity) in-place but
    * amortized O(1)/row: it only fires when the map is full and the key
    * absent, and each sweep removes at least every count-1 entry the
    * preceding inserts paid for. Semantics identical to the classic
    * immutable formulation (SkewSpec's guarantee/error-bound tests are
    * unchanged). */
  final class MgBuilder(capacity: Int) {
    private val m = new java.util.HashMap[String, Array[Long]](capacity * 2)
    private var processed = 0L
    def add(key: String): Unit = {
      processed += 1
      val h = m.get(key)
      if (h != null) h(0) += 1L
      else if (m.size < capacity) { m.put(key, Array(1L)); () }
      else {
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val v = e.getValue
          v(0) -= 1L
          if (v(0) == 0L) it.remove()
        }
      }
    }
    def result: MgSummary = {
      val b = Map.newBuilder[String, Long]
      m.forEach((k, v) => b += k -> v(0))
      MgSummary(capacity, b.result(), processed)
    }
  }

  /** Misra–Gries summary: at most `capacity` (key -> lower-bound count)
    * counters. The immutable exchange/merge form — per-partition folding
    * happens in `MgBuilder`; merge = add counts, then decrement by the
    * smallest surplus counters until <= capacity remain (standard MG
    * merge, keeps the error bound additive). */
  final case class MgSummary(capacity: Int,
                             counters: Map[String, Long], processed: Long) {
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
    /** Keys sorted by lower-bound count desc, key asc — null-safe: a null
      * key sorts FIRST within a count tie, matching the exact tier's
      * Spark ordering (ASC is nulls-first), so the two tiers agree on
      * inputs containing nulls. */
    def top(k: Int): Seq[(String, Long)] = {
      val ord = new Ordering[(String, Long)] {
        def compare(a: (String, Long), b: (String, Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2)
          if (c != 0) c
          else if (a._1 == null && b._1 == null) 0
          else if (a._1 == null) -1
          else if (b._1 == null) 1
          else a._1.compareTo(b._1)
        }
      }
      counters.toSeq.sorted(ord).take(k)
    }
  }

  /** One-pass, shuffle-free heavy-hitter sketch over `keyCol`. The result
    * counts are LOWER bounds with error <= processed/capacity; any key
    * with true share > 1/capacity is guaranteed present. */
  def topKeysSketch(df: DataFrame, keyCol: String, k: Int,
                    capacity: Int = 256): Seq[(String, Long)] = {
    import df.sparkSession.implicits._
    val keys = df.select(F.col(keyCol).cast("string").as("key")).as[String]
    keys.mapPartitions { it =>
      val b = new MgBuilder(capacity)
      while (it.hasNext) b.add(it.next())
      Iterator.single(b.result)
    }.reduce(_.merge(_)).top(k)
  }
}

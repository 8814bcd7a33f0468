package graft.train

import org.apache.spark.sql.{DataFrame, functions => F}

/** A REAL byte-pair-encoding tokenizer (Sennrich et al. 2016) — train
  * merge rules on the corpus, encode with them — upgrading the engine's
  * regex token ESTIMATE (`TextFunctions.bpeTokenCount`) to the tokenizer
  * a training run actually budgets with.
  *
  * Scale shape (the published one): BPE training runs on the WORD
  * FREQUENCY TABLE, not the corpus — one distributed map-side-combined
  * aggregate produces (word, freq), which is Heaps-law sublinear in
  * corpus size and is capped at `maxWords` forms by (freq desc, word
  * asc) before the driver-side merge loop (GPT-2's BPE was trained the
  * same way: a bounded vocabulary of frequent forms stands in for the
  * tail, whose rare pairs cannot win a merge anyway). Encoding
  * broadcasts the merge ranks and runs per row — embarrassingly
  * parallel, no shuffle.
  *
  * Everything is deterministic: word ties break lexicographically in
  * the cap, pair ties break lexicographically in the merge election, so
  * two runs (or two engines) train byte-identical merge tables — q92
  * pins the resulting per-lang token counts as a literal oracle.
  */
object Bpe {

  /** End-of-word sentinel (the classic "</w>") — lets a merge distinguish
    * "er" inside a word from "er" at the end. */
  final val Eow = "</w>"

  /** Distributed (word, freq) table: lowercased whitespace words, capped
    * at `maxWords` by (freq desc, word asc). ONE aggregate shuffle; the
    * collect is bounded by the cap, never corpus-sized. */
  def wordFreqs(docs: DataFrame, textCol: String,
                maxWords: Int = 1000000): Array[(String, Long)] = {
    require(maxWords > 0, s"maxWords must be positive: $maxWords")
    docs.select(F.explode(
        F.filter(F.split(F.lower(F.col(textCol)), "\\s+"), x => x =!= ""))
        .as("__w"))
      .groupBy("__w").agg(F.count(F.lit(1)).as("__f"))
      .orderBy(F.col("__f").desc, F.col("__w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
  }

  /** Train `numMerges` merge rules on a word-frequency table. Stops early
    * when no pair occurs at least twice (weighted). Deterministic: the
    * winning pair is max by (weighted count, then lexicographically
    * smallest (a, b)).
    *
    * INCREMENTAL (the standard BPE-trainer shape): pair counts and a
    * pair → word-index occurrence map are built once; each merge updates
    * ONLY the words that contain the winning pair (subtract the word's
    * old adjacent-pair multiset, apply the merge, add the new one) and
    * the winner election pops a lazy max-heap validated against the live
    * count (stale entries — pushed before a later update — are
    * discarded on pop). Per merge that is O(Σ len of affected words +
    * heap ops), vs the previous full recount of EVERY pair over the
    * whole capped vocabulary per merge (O(maxWords × avgLen) — at 1M
    * word forms a realistic 32k-merge vocabulary cost ~10¹⁰ driver
    * operations; the incremental form trains the same table in
    * minutes). The merge sequence is BYTE-IDENTICAL to the recount
    * form's: incremental counts equal recounts exactly, and the heap
    * order (count desc, then (a, b) lexicographically asc) is the same
    * total order the recount's minBy((-c, a, b)) used — BpeSpec asserts
    * equality against a reference recount trainer on randomized
    * vocabularies. */
  def train(freqs: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    // each word as a mutable symbol sequence: chars + the EOW sentinel
    val words = freqs.map { case (w, f) =>
      (scala.collection.mutable.ArrayBuffer.from(w.map(_.toString)) += Eow, f)
    }
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def countWord(wi: Int, sign: Long): Unit = {
      val (syms, f) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val c = counts.getOrElse(k, 0L) + sign * f
        if (c == 0L) counts.remove(k) else counts.update(k, c)
        if (sign > 0) occurs.getOrElseUpdate(k,
          scala.collection.mutable.HashSet.empty[Int]) += wi
        i += 1
      }
    }
    words.indices.foreach(countWord(_, 1L))
    // max-heap by (count, then REVERSED lexicographic (a, b)) — popping
    // gives exactly minBy(-c, a, b); entries are (count-at-push, a, b)
    // and an entry is valid only while counts(a, b) still equals it
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2)
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var done = false
    while (iter < numMerges && !done) {
      // pop to the best LIVE pair (lazy deletion of stale heap entries)
      var best: (Long, String, String) = null
      while (best == null && heap.nonEmpty) {
        val top = heap.dequeue()
        if (counts.getOrElse((top._2, top._3), 0L) == top._1) best = top
      }
      if (best == null || best._1 < 2L) done = true
      else {
        val (a, b) = (best._2, best._3)
        val ab = a + b
        // only words actually containing (a, b) are touched; the occurs
        // sets are never pruned on removal (stale indices just re-count
        // to an identical delta of zero — harmless, bounded by history).
        // `touched` collects every pair adjacent in an affected word
        // BEFORE or AFTER the merge — the complete set of pairs whose
        // count the merge can have changed (decreased neighbors like
        // (x, a)/(b, y) included) — and re-seeds the heap with each one's
        // LIVE count, so the heap invariant "every pair in `counts` has
        // an entry at its current count" survives every merge.
        val affected = occurs.getOrElse((a, b),
          scala.collection.mutable.HashSet.empty[Int]).toArray
        java.util.Arrays.sort(affected)
        val touched = scala.collection.mutable.HashSet.empty[(String, String)]
        def touch(wi: Int): Unit = {
          val (syms, _) = words(wi)
          var i = 0
          while (i < syms.length - 1) {
            touched += ((syms(i), syms(i + 1)))
            i += 1
          }
        }
        affected.foreach { wi =>
          val (syms, _) = words(wi)
          touch(wi)
          countWord(wi, -1L)
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == a && syms(i + 1) == b) {
              syms.update(i, ab)
              syms.remove(i + 1)
            } else i += 1
          }
          countWord(wi, 1L)
          touch(wi)
        }
        touched.foreach { k =>
          counts.get(k).foreach(c => heap.enqueue((c, k._1, k._2)))
        }
        merges += ((a, b))
      }
      iter += 1
    }
    merges.toSeq
  }

  /** Encode one word under the merge table: start from chars + EOW,
    * repeatedly apply the LOWEST-RANK applicable merge (the standard
    * greedy BPE encode — identical to replaying training order). */
  def encodeWord(w: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = Array.tabulate(w.length + 1)(i =>
      if (i < w.length) w(i).toString else Eow)
    var running = true
    while (running && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) running = false
      else {
        val merged = syms(bestAt) + syms(bestAt + 1)
        syms = (syms.take(bestAt) :+ merged) ++ syms.drop(bestAt + 2)
      }
    }
    syms
  }

  /** BPE token count of a text: sum of per-word symbol counts (each word
    * carries its EOW symbol, so an un-merged single char costs 2 — the
    * real inflation a budget must see). */
  def tokenCount(text: String, ranks: Map[(String, String), Int]): Long = {
    if (text == null) return 0L
    val words = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    var n = 0L
    var i = 0
    while (i < words.length) {
      n += encodeWord(words(i), ranks).length
      i += 1
    }
    n
  }

  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Persist the merge table (one "a<TAB>b" line per rule, rank = line
    * order) — the artifact a standing tokenizer ships between the train
    * run and every corpus job that budgets with it. Tab-safe: symbols
    * are concatenations of text chars and `Eow`, and whitespace-split
    * words never contain a tab. */
  def save(merges: Seq[(String, String)], path: String): Unit = {
    val sb = new StringBuilder
    merges.foreach { case (a, b) => sb.append(a).append('\t').append(b).append('\n') }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def load(path: String): Seq[(String, String)] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path),
        java.nio.charset.StandardCharsets.UTF_8)).asScala
      .toSeq.filter(_.nonEmpty).map { line =>
        val i = line.indexOf('\t')
        require(i > 0, s"malformed merge line: '$line'")
        (line.substring(0, i), line.substring(i + 1))
      }

  /** Per-row BPE token counts for a corpus under broadcast merge ranks:
    * adds `bpe_tokens`. The ranks ride the closure (Spark broadcasts the
    * serialized task once per executor); per-row work only, no shuffle. */
  def withTokenCounts(docs: DataFrame, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val ranks = ranksOf(merges)
    val countUdf = F.udf((t: String) => tokenCount(t, ranks))
    docs.withColumn("bpe_tokens", countUdf(F.col(textCol)))
  }
}

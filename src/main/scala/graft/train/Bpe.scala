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
    * smallest (a, b)). */
  def train(freqs: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    // each word as a mutable symbol sequence: chars + the EOW sentinel
    val words = freqs.map { case (w, f) =>
      (scala.collection.mutable.ArrayBuffer.from(w.map(_.toString)) += Eow, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var done = false
    while (iter < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2L) done = true
        else {
          val (a, b) = best._1
          val ab = a + b
          words.foreach { case (syms, _) =>
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == a && syms(i + 1) == b) {
                syms.update(i, ab)
                syms.remove(i + 1)
              } else i += 1
            }
          }
          merges += ((a, b))
        }
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

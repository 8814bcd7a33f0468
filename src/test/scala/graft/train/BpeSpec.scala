package graft.train

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE: hand-computed merge golden (incl. the lexicographic tie-break),
  * greedy encode, early stop, and the distributed word-freq/count paths. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("train: hand-computed merges with deterministic tie-break") {
    // freqs: aaab x3, aab x2
    // iter1: (a,a) weighted 8 wins -> "aa"
    // iter2: (b,</w>) 5 wins -> "b</w>"
    // iter3: (aa,a) and (a,b</w>) tie at 3 -> lexicographically smaller
    //        first element "a" < "aa" -> (a, b</w>)
    val merges = Bpe.train(Array(("aaab", 3L), ("aab", 2L)), numMerges = 3)
    assert(merges == Seq(("a", "a"), ("b", Bpe.Eow), ("a", "b" + Bpe.Eow)))
  }

  test("encode: greedy lowest-rank replay; unseen words fall back to chars") {
    val ranks = Bpe.ranksOf(Seq(("a", "a"), ("b", Bpe.Eow), ("a", "b" + Bpe.Eow)))
    assert(Bpe.encodeWord("aaab", ranks).toSeq == Seq("aa", "ab" + Bpe.Eow))
    assert(Bpe.encodeWord("aab", ranks).toSeq == Seq("aa", "b" + Bpe.Eow))
    assert(Bpe.encodeWord("ab", ranks).toSeq == Seq("ab" + Bpe.Eow))
    assert(Bpe.encodeWord("xyz", ranks).length == 4, "chars + EOW for unseen material")
    assert(Bpe.tokenCount("aaab aab ab xyz", ranks) == 2 + 2 + 1 + 4)
    assert(Bpe.tokenCount("", ranks) == 0 && Bpe.tokenCount(null, ranks) == 0)
  }

  test("train stops early when no pair repeats") {
    assert(Bpe.train(Array(("abc", 1L)), numMerges = 10).isEmpty)
  }

  test("save/load roundtrip preserves merge order exactly") {
    val merges = Seq(("a", "a"), ("b", Bpe.Eow), ("a", "b" + Bpe.Eow))
    val path = java.nio.file.Files.createTempFile("bpe", ".tsv").toString
    Bpe.save(merges, path)
    assert(Bpe.load(path) == merges)
  }

  test("CorpusPrep packs under a BPE token count via tokensOverride") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udf
    // rule-passing prose (the CorpusPrepSpec word shape) so docs survive
    def word(seed: Long): String =
      "w" + math.abs(graft.dedup.Dedup.mix64(seed)).toString.take(5)
        .map(c => ('a' + (c - '0')).toChar).mkString + "."
    val docs = (0 until 12).map { i =>
      ("s0", i.toLong, (0 until 40).map(j => word(i * 1000L + j)).mkString(" "))
    }.toDF("shard", "id", "text")
    val merges = Bpe.train(Bpe.wordFreqs(docs, "text"), numMerges = 20)
    val ranks = Bpe.ranksOf(merges)
    val cnt = udf((t: String) => Bpe.tokenCount(t, ranks))
    val (packed, _) = graft.pipeline.CorpusPrep.run(docs, "text", "id", "shard",
      tokenBudget = 600L, tokensOverride = Some(cnt(org.apache.spark.sql.functions.col("text"))),
      report = false)
    val rows = packed.orderBy("id")
      .select("id", "text", "chunk_id").collect()
    assert(rows.length == 12)
    // recount the layout: chunk = floor(running BPE start / budget)
    var start = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == start / 600L,
        s"doc ${r.getLong(0)}: chunk must follow the BPE running total")
      start += Bpe.tokenCount(r.getString(1), ranks)
    }
  }

  test("distributed word freqs: cap by (freq desc, word asc); counts match a recount") {
    import spark.implicits._
    val docs = Seq("aaab aab", "aaab ab", "aaab aab xyz").toDF("text")
    val freqs = Bpe.wordFreqs(docs, "text", maxWords = 3)
    assert(freqs.toSeq == Seq(("aaab", 3L), ("aab", 2L), ("ab", 1L)),
      "ab/xyz tie at 1 resolves lexicographically; cap keeps ab")
    val merges = Bpe.train(Bpe.wordFreqs(docs, "text"), numMerges = 3)
    val ranks = Bpe.ranksOf(merges)
    val out = Bpe.withTokenCounts(docs.withColumn("id", org.apache.spark.sql.functions.monotonically_increasing_id()),
        "text", merges)
      .select("text", "bpe_tokens").collect()
    out.foreach { r =>
      assert(r.getLong(1) == Bpe.tokenCount(r.getString(0), ranks),
        s"distributed count must equal the driver recount for '${r.getString(0)}'")
    }
  }
}

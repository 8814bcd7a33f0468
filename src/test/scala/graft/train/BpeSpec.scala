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

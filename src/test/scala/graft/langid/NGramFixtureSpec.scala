package graft.langid

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gate behind the q40 driver row: the streaming accumulator
  * scoring path (scoresLower — strided, transposed table, float SIMD
  * accumulation) must agree with a naive recount built from the public
  * hashCounts API (count map × logProb per class). */
class NGramFixtureSpec extends AnyFunSuite {

  private val m = NGramLangId.tinyFixture

  private def naiveScores(text: String): Array[Double] = {
    val counts = NGramLangId.hashCounts(text, m.numBuckets, m.nMin, m.nMax)
    Array.tabulate(m.numClasses) { c =>
      var s = m.logPrior(c)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        s += e.getValue.toDouble * m.logProb(c, e.getKey)
      }
      s
    }
  }

  private val texts = Seq(
    "key agg row scan slow fast table value part hash",
    "the quick brown fox jumps over the lazy dog",
    "SELECT * FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "x", "", "ab",
    (0 until 400).map(i => s"w$i").mkString(" "),
  )

  test("fixture prediction matches the naive hashCounts recount") {
    texts.foreach { t =>
      val fast = m.scoresLower(t.toLowerCase(java.util.Locale.ROOT))
      val naive = naiveScores(t)
      // float32 accumulation vs double recount: order differs, values agree
      // to accumulator precision; the argmax (what ships) must be identical
      fast.zip(naive).foreach { case (f, n) =>
        assert(math.abs(f - n) < 1e-2 * math.max(1.0, math.abs(n)), s"$f vs $n on '${t.take(30)}'")
      }
      val fastBest = fast.zipWithIndex.maxBy { case (v, i) => (v, -i) }._2
      val naiveBest = naive.zipWithIndex.maxBy { case (v, i) => (v, -i) }._2
      assert(m.predict(t) == m.classes(naiveBest), s"argmax diverged on '${t.take(30)}'")
      assert(fastBest == naiveBest)
    }
  }

  test("fixture model is deterministic (pinned weights)") {
    assert(m.classes.toSeq == Seq("alpha", "beta"))
    assert(m.numBuckets == 16)
    // spot-pin two table entries so an accidental fixture change is loud
    assert(m.logProbT(0) == (-1.0 - (graft.dedup.Dedup.mix64(0L) & 7L) * 0.25).toFloat)
    assert(m.logProbT(31) == (-1.0 - (graft.dedup.Dedup.mix64(31L) & 7L) * 0.25).toFloat)
  }
}

package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests per SURVEY.md §5.3. Plain ScalaCheck generators sampled
  * with a fixed seed (scalatestplus bridge is not in the offline cache).
  */
class TextPropertySpec extends AnyFunSuite {

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar), (3, Gen.oneOf(' ', '\n', '\t')),
    (1, Gen.oneOf('\r', '{', '}', '$', '#', '"', '\'')),
  )).map(_.mkString)

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default.withSize(i % 40 + 1), Seed(i.toLong)))

  test("splitter: chunks partition the input's line list exactly") {
    for (s <- samples(textGen); limit <- 1 to 4) {
      val lines = PyText.splitLines(s).toSeq
      val chunks = Splitter.splitSnippet(s, limit)
      if (lines.isEmpty) assert(chunks.toSeq == Seq("")) // empty file -> one empty chunk
      else {
        // chunks are lines joined with "\n" and lines contain no terminators,
        // so split("\n", -1) recovers them exactly
        val recovered = chunks.toSeq.flatMap(_.split("\n", -1).toSeq)
        assert(recovered == lines, s"input=${s.replace("\n", "\\n")}")
      }
    }
  }

  test("splitter: every chunk except the last has >= limit non-empty lines") {
    for (s <- samples(textGen); limit <- 1 to 4) {
      val chunks = Splitter.splitSnippet(s, limit)
      chunks.dropRight(1).foreach { c =>
        assert(PyText.splitLines(c).count(PyText.hasNonSpace) >= limit)
      }
    }
  }

  private val tokListGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, Gen.alphaChar).map(_.mkString)))
      .map(_.distinct)

  test("token matcher agrees with naive contains") {
    for (toks <- samples(tokListGen, 150); s <- samples(textGen, 30)) {
      val m = TokenMatcher(toks.toArray)
      assert(m.matchBits(s).toSeq == toks.map(s.contains(_)), s"toks=$toks s=$s")
    }
  }

  test("token matcher word-boundary agrees with reference hasWordIn semantics") {
    // independent re-statement of /root/reference/js/predict_language.js:11-29
    def hasWordIn(haystack: String, word: String): Boolean = {
      var start = 0
      while (true) {
        val idx = haystack.indexOf(word, start)
        if (idx == -1) return false
        val beforeOk = idx == 0 || !TokenMatcher.isWordChar(haystack.charAt(idx - 1))
        val afterIdx = idx + word.length
        val afterOk = afterIdx == haystack.length || !TokenMatcher.isWordChar(haystack.charAt(afterIdx))
        if (beforeOk && afterOk) return true
        start = idx + 1
      }
      false
    }
    for (toks <- samples(tokListGen, 150); s <- samples(textGen, 30)) {
      val m = TokenMatcher(toks.toArray)
      assert(m.matchWordBits(s).toSeq == toks.map(hasWordIn(s, _)), s"toks=$toks s=$s")
    }
  }

  test("scrub: markdown fence scrub is idempotent") {
    for (s <- samples(textGen)) {
      if (Scrub.fenceCount(s) % 2 == 0) {
        val once = Scrub.stripMarkdownFences(s)
        assert(Scrub.stripMarkdownFences(once) == once)
      }
    }
  }

  test("normalize: idempotent and removes all \\r") {
    for (s <- samples(textGen)) {
      val n = Normalize.newlines(s)
      assert(!n.contains('\r'))
      assert(Normalize.newlines(n) == n)
    }
  }

  test("python splitlines semantics on edge cases") {
    assert(PyText.splitLines("").toSeq == Seq.empty)
    assert(PyText.splitLines("a\n").toSeq == Seq("a"))
    assert(PyText.splitLines("a\r\nb").toSeq == Seq("a", "b"))
    assert(PyText.splitLines("a\rb").toSeq == Seq("a", "b"))
    assert(PyText.splitLines("\n\n").toSeq == Seq("", ""))
    assert(PyText.splitLines("a\u2028b\u0085c\u000bd").toSeq == Seq("a", "b", "c", "d"))
  }
}

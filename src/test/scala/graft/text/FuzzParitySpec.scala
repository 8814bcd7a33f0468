package graft.text

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Metrics

/** Byte-exact parity against a 4,900-case fuzz corpus generated from the
  * reference pipeline's observable behavior (random fragments stressing
  * tag/fence/html scrub paths incl. 366 malformed-input error cases,
  * splitter chunking, Unicode metrics). The corpus is checked in at
  * src/test/resources/fuzz_corpus.json.gz — the broad-coverage complement
  * to the hand-picked goldens in GoldenTextSpec.
  */
class FuzzParitySpec extends AnyFunSuite {

  private lazy val root = {
    val in = new java.util.zip.GZIPInputStream(
      getClass.getResourceAsStream("/fuzz_corpus.json.gz"))
    try new ObjectMapper().readTree(in) finally in.close()
  }

  test("scrub fuzz corpus: byte-exact output and matching error cases") {
    val cases = root.get("scrub")
    var checked = 0
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val lang = c.get(0).asText()
      val input = c.get(1).asText()
      if (c.get(2).isNull) {
        assertThrows[Scrub.MalformedInputException](
          Scrub.removeSubLanguage(input, lang))
      } else {
        assert(Scrub.removeSubLanguage(input, lang) == c.get(2).asText(),
          s"case $i lang=$lang input=${input.replace("\n", "\\n")}")
      }
      checked += 1
    }
    assert(checked == 2500)
  }

  test("splitter fuzz corpus: identical chunking") {
    val cases = root.get("split")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val got = Splitter.splitSnippet(c.get(0).asText(), c.get(1).asInt()).toSeq
      val want = (0 until c.get(2).size()).map(c.get(2).get(_).asText())
      assert(got == want, s"case $i input=${c.get(0).asText().replace("\n", "\\n")}")
    }
  }

  test("metrics fuzz corpus: identical counts and ratios") {
    val cases = root.get("metrics")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val m = Metrics.of(c.get(0).asText())
      val e = c.get(1)
      assert(m.totalChars == e.get(0).asInt(), s"case $i total")
      assert(m.lineCount == e.get(1).asInt(), s"case $i lines")
      assert(m.nonEmptyLineCount == e.get(2).asInt(), s"case $i nonempty")
      val ratios = Seq(m.letterRatio, m.digitRatio, m.whitespaceRatio,
        m.punctRatio, m.alnumRatio)
      ratios.zipWithIndex.foreach { case (r, j) =>
        assert(math.abs(r - e.get(3 + j).asDouble()) < 1e-12, s"case $i ratio $j")
      }
    }
  }
}

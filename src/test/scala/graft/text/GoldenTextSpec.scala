package graft.text

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.quality.Metrics

/** Golden fixtures generated from the reference pipeline's observable
  * behavior (scrub / split / metrics), checked byte-exact — the north
  * rule's parity gate for the text layer. Fixture file:
  * src/test/resources/goldens.json.
  */
class GoldenTextSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val root = mapper.readTree(getClass.getResourceAsStream("/goldens.json"))

  test("script tag scrub matches reference byte-exact") {
    val cases = root.get("script")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val input = c.get(0).asText()
      if (c.get(1).isNull) {
        assertThrows[Scrub.MalformedInputException](Scrub.stripRawTextTag(input, "script"))
      } else {
        val (out, removed) = Scrub.stripRawTextTag(input, "script")
        assert(out == c.get(1).asText(), s"case $i input=$input")
        assert(removed == c.get(2).asBoolean(), s"case $i removedAny")
      }
    }
  }

  test("markdown fence scrub matches reference byte-exact") {
    val cases = root.get("fences")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val input = c.get(0).asText()
      if (c.get(1).isNull)
        assertThrows[Scrub.MalformedInputException](Scrub.removeSubLanguage(input, "Markdown"))
      else
        assert(Scrub.removeSubLanguage(input, "Markdown") == c.get(1).asText(), s"case $i")
    }
  }

  test("sql html block scrub matches reference byte-exact") {
    val cases = root.get("html")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      assert(Scrub.removeSubLanguage(c.get(0).asText(), "SQL") == c.get(1).asText(), s"case $i")
    }
  }

  test("chunk metrics match reference (unicode char classes, ratios)") {
    val cases = root.get("metrics")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val m = Metrics.of(c.get(0).asText())
      val e = c.get(1)
      assert(m.totalChars == e.get("TotalChars").asInt(), s"case $i TotalChars")
      assert(m.lineCount == e.get("LineCount").asInt(), s"case $i LineCount")
      assert(m.nonEmptyLineCount == e.get("NonEmptyLineCount").asInt(), s"case $i NonEmpty")
      assert(math.abs(m.letterRatio - e.get("LetterRatio").asDouble()) < 1e-12, s"case $i Letter")
      assert(math.abs(m.digitRatio - e.get("DigitRatio").asDouble()) < 1e-12, s"case $i Digit")
      assert(math.abs(m.whitespaceRatio - e.get("WhitespaceRatio").asDouble()) < 1e-12, s"case $i WS")
      assert(math.abs(m.punctRatio - e.get("PunctRatio").asDouble()) < 1e-12, s"case $i Punct")
      assert(math.abs(m.alnumRatio - e.get("AlnumRatio").asDouble()) < 1e-12, s"case $i Alnum")
    }
  }

  test("snippet splitter matches reference") {
    val cases = root.get("split")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val got = Splitter.splitSnippet(c.get(0).asText(), c.get(1).asInt())
      val expected = (0 until c.get(2).size()).map(c.get(2).get(_).asText())
      assert(got.toSeq == expected, s"case $i input=${c.get(0).asText()}")
    }
  }

  test("PII scrub masks emails, phones, ssn, cc, ip, long digit runs") {
    assert(Scrub.scrubPii("mail me at john.doe+x@example.co.uk now") == "mail me at <EMAIL> now")
    assert(Scrub.scrubPii("ssn 123-45-6789.") == "ssn <SSN>.")
    assert(Scrub.scrubPii("call 555-123-4567 or (02) 9999 8888") == "call <PHONE> or <PHONE>")
    assert(Scrub.scrubPii("cc 4111 1111 1111 1111 ok") == "cc <CC> ok")
    assert(Scrub.scrubPii("host 192.168.0.1 up") == "host <IP> up")
    assert(Scrub.scrubPii("id 123456789012") == "id <NUM>")
    assert(Scrub.scrubPii("clean text stays") == "clean text stays")
  }

  test("PII scrub is idempotent") {
    val s = "a@b.com 123-45-6789 4111 1111 1111 1111 192.168.0.1 12345678901"
    val once = Scrub.scrubPii(s)
    assert(Scrub.scrubPii(once) == once)
  }

  test("toxicity deny-list scrub: word-boundary, case-insensitive, counted") {
    val deny = Scrub.defaultDenyList
    assert(Scrub.scrubDenyList("what a frakk day", deny) == ("what a <TOX> day", 1))
    assert(Scrub.scrubDenyList("FRAKK and Gorram twice", deny) == ("<TOX> and <TOX> twice", 2))
    assert(Scrub.scrubDenyList("frakking is a different word", deny)._2 == 0)
    assert(Scrub.scrubDenyList("clean text", deny) == ("clean text", 0))
    // custom list
    val custom = new Scrub.DenyList(Seq("foo.bar")) // regex metachars quoted
    assert(Scrub.scrubDenyList("a foo.bar b fooxbar", custom) == ("a <TOX> b fooxbar", 1))
  }

  test("tag scrub is locale-independent (Turkish-I regression)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // 'I' lowercases to dotless 'ı' under tr — a locale-sensitive
      // lowercase would miss the tag entirely
      val (out, removed) = Scrub.stripRawTextTag("<SCRIPT>secret</SCRIPT>", "script")
      assert(removed)
      assert(out == "<SCRIPT></SCRIPT>")
      // length-changing mapping (U+0130) near a tag must not desync indices
      val (out2, _) = Scrub.stripRawTextTag("İ<script>x</script>", "script")
      assert(out2 == "İ<script></script>")
    } finally java.util.Locale.setDefault(prev)
  }

  test("newline normalization") {
    assert(Normalize.newlines("a\r\nb\rc\nd") == "a\nb\nc\nd")
    assert(Normalize.newlines("plain") == "plain")
    assert(Normalize.newlines("\r\r\n") == "\n\n")
  }
}

package graft.score

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.model.LangIdModel

/** Golden classification fixtures (FIXTURES.md §3-4): feature bits, logits
  * (bit-exact: same IEEE summation order as the reference scorer), argmax
  * label, softmax confidence.
  */
class ScorerSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val root = mapper.readTree(getClass.getResourceAsStream("/golden_model.json"))
  private val model = LangIdModel.fromJson(root.get("model").toString)
  private val scorer = new Scorer(model)

  test("model json roundtrip") {
    val m2 = LangIdModel.fromJson(model.toCompactJson)
    assert(m2.features.toSeq == model.features.toSeq)
    assert(m2.classes.toSeq == model.classes.toSeq)
    assert(m2.coef.map(_.toSeq).toSeq == model.coef.map(_.toSeq).toSeq)
    assert(m2.intercept.toSeq == model.intercept.toSeq)
  }

  test("golden predictions: bits, logits (exact), label, prob") {
    val cases = root.get("cases")
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val snippet = c.get("snippet").asText()
      val bits = scorer.extractBits(snippet)
      val expBits = (0 until c.get("bits").size()).map(c.get("bits").get(_).asBoolean())
      assert(bits.toSeq == expBits, s"case $i bits")
      val logits = scorer.logits(bits)
      val expLogits = (0 until c.get("logits").size()).map(c.get("logits").get(_).asDouble())
      assert(logits.toSeq == expLogits, s"case $i logits must be bit-exact")
      val p = scorer.predict(snippet)
      assert(p.label == c.get("label").asText(), s"case $i label")
      assert(math.abs(p.prob - c.get("prob").asDouble()) < 1e-15, s"case $i prob")
    }
  }

  test("softmax-argmax equals logit-argmax") {
    val l = Array(1.0, 3.5, -2.0, 3.4)
    assert(scorer.argmax(l) == scorer.argmax(scorer.softmax(l)))
  }

  test("topK ordering") {
    val s = "def foo(self):\n    import os\n"
    assert(scorer.topK(s, 1).toSeq == Seq("Python"))
    assert(scorer.topK(s, 3).length == 3)
    assert(scorer.topK(s, 3).head == "Python")
  }

  test("model shrink keeps first n features and coef columns") {
    val m = model.shrink(4)
    assert(m.numFeatures == 4)
    assert(m.features.toSeq == model.features.take(4).toSeq)
    assert(m.coef(0).toSeq == model.coef(0).take(4).toSeq)
  }

  test("reorderByImportance sorts by mean |coef| desc, stable") {
    val m = model.reorderByImportance
    val imp = m.features.indices.map { j =>
      m.coef.map(r => math.abs(r(j))).sum / m.numClasses
    }
    assert(imp == imp.sorted(Ordering[Double].reverse), "importance must be descending")
    // scores invariant under feature permutation
    val s2 = new Scorer(m)
    val snip = "package main\nfunc x() {}"
    assert(s2.predict(snip).label == scorer.predict(snip).label)
    assert(math.abs(s2.predict(snip).prob - scorer.predict(snip).prob) < 1e-12)
  }

  test("rounding: half-even like numpy, ints collapse in json") {
    val m = LangIdModel(Array("a"), Array("x", "y"),
      Array(Array(1.25), Array(2.0)), Array(0.35, -1.45))
    val r = m.rounded(1)
    assert(r.coef(0)(0) == 1.2) // 1.25 -> 1.2 (half-even)
    assert(r.intercept(0) == 0.3 || r.intercept(0) == 0.4) // 0.35 binary rep
    val json = r.toCompactJson
    assert(json.contains("[[1.2],[2]]"), json) // 2.0 collapses to int
  }

  test("int8 quantization: predictions survive the round trip (ex17 semantics)") {
    val (bytes, scale) = model.quantizeInt8
    assert(bytes.length == model.numClasses * model.numFeatures + model.numClasses)
    val deq = model.dequantizeInt8(bytes, scale)
    val s2 = new Scorer(deq)
    val snippets = Seq("package main\nfunc x() {}", "<?php $a=1;", "def f(self): import os")
    snippets.foreach { s =>
      assert(s2.predictLabel(s) == scorer.predictLabel(s), s"label changed for: $s")
    }
    // max dequantization error bounded by scale/2
    val maxErr = model.coef.flatten.toSeq.zip(deq.coef.flatten.toSeq)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= scale / 2 + 1e-12)
  }

  test("gzippedSizeKb is positive and small for tiny model") {
    val kb = model.gzippedSizeKb
    assert(kb > 0.0 && kb < 2.0)
  }
}

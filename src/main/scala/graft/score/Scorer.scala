package graft.score

import graft.model.LangIdModel
import graft.text.{Normalize, TokenMatcher}

/** Inference: feature extraction + linear scoring + softmax + argmax.
  *
  * Semantics from `/root/reference/web/predict.js:1-28` and
  * `/root/reference/analyze_model.py:26-39`:
  *   features = [token in snippet]; scores = x·coefᵀ + intercept;
  *   label = classes[argmax]; prob = softmax(scores)[argmax].
  * The summation order matches the reference (j = 0..n-1, starting from the
  * intercept) so logits are bit-identical.
  *
  * Build one Scorer per model on the driver, broadcast it, and call
  * `predict` inside a typed map — the matcher does a single pass per
  * snippet instead of the reference's 700 scans.
  */
final case class Prediction(label: String, prob: Double, logits: Array[Double])

final class Scorer(val model: LangIdModel) extends Serializable {

  @transient private lazy val matcher = TokenMatcher(model.features)

  def extractBits(snippet: String): Array[Boolean] =
    matcher.matchBits(Normalize.newlines(snippet))

  def logits(bits: Array[Boolean]): Array[Double] = {
    val nc = model.numClasses
    val out = new Array[Double](nc)
    var i = 0
    while (i < nc) {
      val row = model.coef(i)
      var score = model.intercept(i)
      var j = 0
      while (j < row.length) { if (bits(j)) score += row(j); j += 1 }
      out(i) = score
      i += 1
    }
    out
  }

  def softmax(scores: Array[Double]): Array[Double] = {
    var max = Double.NegativeInfinity
    var i = 0
    while (i < scores.length) { if (scores(i) > max) max = scores(i); i += 1 }
    val exps = new Array[Double](scores.length)
    var sum = 0.0
    i = 0
    while (i < scores.length) { exps(i) = math.exp(scores(i) - max); sum += exps(i); i += 1 }
    i = 0
    while (i < scores.length) { exps(i) /= sum; i += 1 }
    exps
  }

  @inline def argmax(scores: Array[Double]): Int = {
    var best = 0; var i = 1
    while (i < scores.length) { if (scores(i) > scores(best)) best = i; i += 1 }
    best
  }

  def predict(snippet: String): Prediction = {
    val l = logits(extractBits(snippet))
    val bi = argmax(l)
    val probs = softmax(l)
    Prediction(model.classes(bi), probs(bi), l)
  }

  def predictLabel(snippet: String): String =
    model.classes(argmax(logits(extractBits(snippet))))

  /** P4: top-k class labels by logit desc (ties by class index). */
  def topK(snippet: String, k: Int): Array[String] = {
    val l = logits(extractBits(snippet))
    l.zipWithIndex.sortBy { case (v, i) => (-v, i) }.take(k).map { case (_, i) => model.classes(i) }
  }
}

package graft.langid

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Per-language character bigram language model for perplexity scoring
  * (KenLM-style n-gram LM, reduced to char bigrams with add-one smoothing —
  * enough to separate fluent text from junk/repetition at scale).
  *
  * Characters are hashed into `v` buckets so the model is a dense v×v int
  * table per language (v=128 → 64 KB), trivially broadcastable. Scoring is
  * a narrow typed map: perplexity(text) = exp(-Σ log P(c_i | c_{i-1}) / n).
  */
final case class CharLMModel(
    classes: Array[String],
    v: Int,
    // logProb(classIdx)(prev * v + cur)
    logProb: Array[Array[Float]],
) extends Serializable {

  @inline private def bucket(c: Char): Int = CharLM.bucket(c, v)

  /** Perplexity of an ALREADY-LOWERCASED text under the language's bigram
    * model (hot-path variant: the pipeline lowercases once per row). */
  def perplexityLower(text: String, classIdx: Int): Double = {
    if (text == null || text.length < 2) return CharLM.EmptyPerplexity
    val lp = logProb(classIdx)
    var sum = 0.0
    var prev = bucket(text.charAt(0))
    var i = 1
    while (i < text.length) {
      val cur = bucket(text.charAt(i))
      sum += lp(prev * v + cur)
      prev = cur
      i += 1
    }
    math.exp(-sum / (text.length - 1))
  }

  def perplexity(text: String, classIdx: Int): Double =
    if (text == null) CharLM.EmptyPerplexity
    else perplexityLower(text.toLowerCase(java.util.Locale.ROOT), classIdx)

  def perplexity(text: String, lang: String): Double = {
    val idx = classes.indexOf(lang)
    if (idx < 0) CharLM.EmptyPerplexity else perplexity(text, idx)
  }
}

object CharLM {

  /** Perplexity reported for texts too short to score. */
  final val EmptyPerplexity = 1e9

  @inline def bucket(c: Char, v: Int): Int =
    ((graft.dedup.Dedup.mix64(c.toLong) & Long.MaxValue) % v).toInt

  /** Train per-language bigram tables in one distributed pass (map-side
    * dense accumulation; shuffle payload = classes × v² ints/partition). */
  def train(spark: SparkSession, df: DataFrame, labelCol: String, textCol: String,
            v: Int = 128): CharLMModel = {
    import spark.implicits._
    val pairs = df.select(F.col(labelCol).cast("string"), F.col(textCol).cast("string"))
      .as[(String, String)]
    val agg = pairs
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[String, Array[Long]]
        it.foreach { case (label, text0) =>
          if (text0 != null && text0.length >= 2) {
            val counts = acc.getOrElseUpdate(label, new Array[Long](v * v))
            val text = text0.toLowerCase(java.util.Locale.ROOT)
            var prev = bucket(text.charAt(0), v)
            var i = 1
            while (i < text.length) {
              val cur = bucket(text.charAt(i), v)
              counts(prev * v + cur) += 1
              prev = cur
              i += 1
            }
          }
        }
        acc.iterator
      }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val vsum = a._2.clone()
        var i = 0
        while (i < vsum.length) { vsum(i) += b._2(i); i += 1 }
        (a._1, vsum)
      }
      .map(_._2)
      .collect()
      .sortBy(_._1)

    val classes = agg.map(_._1)
    val logProb = agg.map { case (_, counts) =>
      val out = new Array[Float](v * v)
      var p = 0
      while (p < v) {
        var rowTotal = 0L
        var c = 0
        while (c < v) { rowTotal += counts(p * v + c); c += 1 }
        val denom = rowTotal.toDouble + v
        c = 0
        while (c < v) {
          out(p * v + c) = math.log((counts(p * v + c) + 1) / denom).toFloat
          c += 1
        }
        p += 1
      }
      out
    }
    CharLMModel(classes, v, logProb)
  }
}

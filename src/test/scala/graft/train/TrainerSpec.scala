package graft.train

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.SparkTestSession
import graft.pipeline.Transcripts

/** Distributed training lifecycle (train_model.py semantics, Spark-native):
  * deterministic split, one-pass features, balanced LR, macro-F1 with the
  * exported artifact, model-analysis curves. */
class TrainerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // word-token features: the per-language pools (space-padded to reduce
  // cross-language substring hits)
  private val tokens: Array[String] =
    Transcripts.WordPools.values.flatten.toArray.distinct.sorted.map(w => s" $w ")

  private lazy val labeled = {
    val turns = Transcripts.generate(spark, nConvs = 150, seed = 5L, hotFactor = 1)
    turns.toDF()
      .withColumn("lang_true",
        F.udf((c: String) => Transcripts.truthLang(5L, c)).apply(F.col("conv_id")))
      .withColumn("row_id", F.xxhash64(F.col("conv_id"), F.col("turn_idx")))
      .filter(F.length(F.col("text")) > 60)
      .cache()
  }

  private lazy val result = Trainer.train(spark, labeled, "lang_true", "text",
    tokens, "row_id", valPct = 20, maxIter = 50)

  test("trained substring model separates the languages (macro-F1 > 0.9)") {
    assert(result.macroF1 > 0.9, s"macro-F1 ${result.macroF1}")
    assert(result.nTrain > 0 && result.nVal > 0)
    assert(result.nVal < result.nTrain)
  }

  test("exported model is importance-ordered and JSON-roundtrippable") {
    val m = result.model
    val imp = m.features.indices.map(j => m.coef.map(r => math.abs(r(j))).sum / m.numClasses)
    assert(imp == imp.sorted(Ordering[Double].reverse))
    val m2 = graft.model.LangIdModel.fromJson(m.toCompactJson)
    assert(m2.classes.toSeq == m.classes.toSeq)
  }

  test("f1 curve: full-size point matches holdout F1; small prefix is worse or equal") {
    val valDf = labeled.filter(
      graft.functions.TextFunctions.md5Bucket(F.col("row_id"), 100) < 20)
    val curve = Trainer.f1Curve(spark, valDf, "lang_true", "text", result.model,
      Seq(5, result.model.numFeatures))
    assert(math.abs(curve.last._2 - result.macroF1) < 1e-9)
    assert(curve.head._2 <= curve.last._2 + 1e-9)
  }

  test("rounding to 1 decimal keeps F1 close (tools.py ROUNDING_DECIMALS=1)") {
    val valDf = labeled.filter(
      graft.functions.TextFunctions.md5Bucket(F.col("row_id"), 100) < 20)
    val Seq((_, f1r, sizeKb)) = Trainer.roundingCurve(spark, valDf, "lang_true", "text",
      result.model, Seq(1))
    assert(f1r > result.macroF1 - 0.05, s"rounded F1 $f1r vs ${result.macroF1}")
    assert(sizeKb > 0)
  }

  test("X5 bag-of-words path works and reproduces the reference's rejection rationale") {
    // ex15_train_model.py's CountVectorizer alternative: comparable F1,
    // vocab-sized coefficient matrix (157 MB vs 14 KB at reference scale)
    val bow = Trainer.trainBagOfWords(spark, labeled, "lang_true", "text",
      "row_id", valPct = 20, maxIter = 30)
    assert(bow.macroF1 > 0.8, s"BoW macro-F1 ${bow.macroF1}")
    assert(bow.vocabSize > tokens.length,
      s"corpus vocabulary (${bow.vocabSize}) must exceed the curated token set (${tokens.length})")
    val substringCoefs = result.model.numFeatures.toLong * result.model.numClasses
    assert(bow.nCoefficients > 2L * substringCoefs,
      s"the rejection rationale: BoW coef matrix (${bow.nCoefficients}) blows up vs " +
        s"curated substring features ($substringCoefs)")
  }

  test("findIdealSize returns a size whose F1 is within delta of full") {
    val valDf = labeled.filter(
      graft.functions.TextFunctions.md5Bucket(F.col("row_id"), 100) < 20)
    val (n, f1) = Trainer.findIdealSize(spark, valDf, "lang_true", "text",
      result.model, f1Delta = 0.05)
    assert(n >= 1 && n <= result.model.numFeatures)
    assert(f1 >= result.macroF1 - 0.05 - 1e-9)
  }
}

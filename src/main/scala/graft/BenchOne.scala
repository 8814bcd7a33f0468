package graft

import graft.langid.{CharLM, NGramLangId}
import graft.pipeline.{Transcripts, TranscriptPipeline, Turn}

/** Dev tool: time one pipeline variant at one core count in a fresh JVM —
  * isolates measurements from in-process history when diagnosing variance.
  * usage: runMain graft.BenchOne <inputParquet> <cores> [clustered]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val inputPath = args(0)
    val cores = args(1).toInt
    val clustered = args.length > 2 && args(2) == "clustered"
    val spark = GraftSession.local(cores, "graft-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nLangs = 97
    val labeled = Transcripts.generate(spark, 8000, seed = 7L, hotFactor = 1, nLangs = nLangs)
      .map(t => (Transcripts.truthLang(7L, t.conv_id, nLangs), t.text))
      .toDF("lang_true", "text")
    val nm = spark.sparkContext.broadcast(NGramLangId.train(spark, labeled, "lang_true", "text"))
    val lm = spark.sparkContext.broadcast(CharLM.train(spark, labeled, "lang_true", "text"))
    val turns = spark.read.parquet(inputPath).as[Turn]
    val n = turns.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = if (clustered) TranscriptPipeline.runClustered(spark, turns, nm, lm)
               else TranscriptPipeline.run(spark, turns, nm, lm)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] run$i: $sec%.2f s, ${n / sec}%.0f turns/s")
    }
    spark.stop()
  }
}

package graft

import graft.langid.{CharLM, NGramLangId}
import graft.pipeline.{Transcripts, TranscriptPipeline}

/** Dev tool: single-thread cost breakdown of the pipeline's per-row
  * kernels (normalize / scrub / langid / perplexity / metrics), to know
  * where the next optimization belongs.
  *
  * usage: sbt "runMain graft.Profile [nRows]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val nLangs = 97
    val spark = GraftSession.local(4, "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val labeled = Transcripts.generate(spark, 4000, seed = 7L, hotFactor = 1, nLangs = nLangs)
      .map(t => (Transcripts.truthLang(7L, t.conv_id, nLangs), t.text))
      .toDF("lang_true", "text")
    val nm = NGramLangId.train(spark, labeled, "lang_true", "text")
    val lm = CharLM.train(spark, labeled, "lang_true", "text")
    val rows = Transcripts.generate(spark, n / 14 + 1, seed = 42L, nLangs = nLangs)
      .take(n)
    spark.stop()

    def bench(name: String)(f: String => Unit): Unit = {
      // warm
      rows.iterator.take(n / 10).foreach(t => f(t.text))
      val t0 = System.nanoTime()
      rows.foreach(t => f(t.text))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-12s ${rows.length / sec}%,.0f rows/s  (${sec * 1e9 / rows.length}%,.0f ns/row)")
    }

    val scorer = new TranscriptPipeline.TurnScorer(nm, lm)
    bench("normalize")(s => graft.text.Normalize.newlines(s))
    bench("scrub_pii")(s => graft.text.Scrub.scrubPiiCounting(s))
    bench("langid")(s => nm.predictWithConfLower(s.toLowerCase))
    bench("perplexity")(s => lm.perplexityLower(s.toLowerCase, 0))
    bench("metrics")(s => graft.quality.Metrics.of(s))
    bench("lowercase")(s => s.toLowerCase)
    val t0 = System.nanoTime()
    rows.foreach(t => scorer.score(t, 0L))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"${"FULL ROW"}%-12s ${rows.length / sec}%,.0f rows/s  (${sec * 1e9 / rows.length}%,.0f ns/row)")
  }
}

package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.CorpusPrep

/** spark-submit entry point for the corpus-prep composition
  * (exact dedup -> near-dup drop -> decontaminate -> quality -> packing):
  *
  *   spark-submit --class graft.RunCorpusPrep <jar> \
  *     --input <documents parquet dir/file> --output <dir> \
  *     [--benchmark <parquet with a text column>] [--budget 2048] \
  *     [--threshold 0.7] [--quality-band 0.1:1.0] [--shard-col source] \
  *     [--id-col doc_id] [--text-col text] [--no-report] [--local N] \
  *     [--line-clean] [--boilerplate-min-df 50] \
  *     [--max-dup-line-frac 0.3] [--max-dup-line-char-frac 0.2] \
  *     [--max-top-ngram-frac 0.18] [--lm-band 0.0:0.75]
  *
  * Writes the packed survivors partitioned by the shard column and prints
  * one JSON status line with the per-stage survivor counts.
  */
object RunCorpusPrep {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          m(a.drop(2)) = args(i + 1); i += 2
        } else { m(a.drop(2)) = "true"; i += 1 }
      } else i += 1
    }
    m.toMap
  }

  def main(args: Array[String]): Unit = {
    val opt = parseArgs(args)
    val input = opt.getOrElse("input",
      sys.error("--input <documents parquet> is required"))
    val output = opt.getOrElse("output",
      java.nio.file.Files.createTempDirectory("graft_prep").toString)
    val textCol = opt.getOrElse("text-col", "text")
    val idCol = opt.getOrElse("id-col", "doc_id")
    val shardCol = opt.getOrElse("shard-col", "source")
    val budget = opt.getOrElse("budget", "2048").toLong
    val threshold = opt.getOrElse("threshold", "0.7").toDouble
    // per-shard quality quantile band, e.g. "0.1:1.0" keeps p10..p100
    val qualityBand = opt.get("quality-band").map { s =>
      val Array(lo, hi) = s.split(":", 2)
      (lo.toDouble, hi.toDouble)
    }
    // per-shard LM-perplexity quantile band (stage 4c), e.g. "0.0:0.75"
    // drops the weirdest quartile by unigram surprisal per shard
    val lmBand = opt.get("lm-band").map { s =>
      val Array(lo, hi) = s.split(":", 2)
      (lo.toDouble, hi.toDouble)
    }
    val report = !opt.contains("no-report")
    // quality-signal stages (q62/q64/q65/q66 operators), all off unless
    // flagged — thresholds are the Gopher/C4/RefinedWeb-style knobs
    val lineClean = opt.contains("line-clean")
    val maxDupLineFrac = opt.get("max-dup-line-frac").map(_.toDouble)
    val maxDupLineCharFrac = opt.get("max-dup-line-char-frac").map(_.toDouble)
    val maxTopNgramFrac = opt.get("max-top-ngram-frac").map(_.toDouble)
    val boilerplateMinDf = opt.get("boilerplate-min-df").map(_.toLong)

    val spark: SparkSession = opt.get("local") match {
      case Some(n) => GraftSession.local(n.toInt, "graft-corpus-prep")
      case None =>
        GraftSession.builder(
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-corpus-prep")
          .getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(input)
    val benchmark = opt.get("benchmark").map(spark.read.parquet)
    val (packed, rep) = CorpusPrep.run(docs, textCol, idCol, shardCol,
      benchmark = benchmark, benchTextCol = textCol,
      tokenBudget = budget, threshold = threshold,
      qualityBand = qualityBand,
      lmBand = lmBand,
      lineClean = lineClean,
      maxDupLineFrac = maxDupLineFrac,
      maxDupLineCharFrac = maxDupLineCharFrac,
      maxTopNgramCharFrac = maxTopNgramFrac,
      boilerplateMinDocFreq = boilerplateMinDf,
      report = report)

    packed.write.mode("overwrite").partitionBy(shardCol).parquet(output)

    val repJson = rep match {
      case Some(r) =>
        s""""input":${r.input},"after_exact_dedup":${r.afterExactDedup},""" +
          s""""after_near_dup":${r.afterNearDup},""" +
          s""""after_decontaminate":${r.afterDecontaminate},""" +
          s""""after_quality":${r.afterQuality},"n_chunks":${r.nChunks},"""
      case None => ""
    }
    // one parseable status line, same contract as RunPipeline
    println(s"""{"job":"graft-corpus-prep","output":"$output",$repJson"budget":$budget}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

import graft.langid.{CharLM, NGramLangId}
import graft.pipeline.{Transcripts, TranscriptPipeline, Turn}

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "pipeline":{...scaling evidence...}}
  *
  * Two parts:
  *  1. operator queries from SparkEntry on SPARK_GRAFT_SF_DIR (count() each)
  *  2. the north-rule pipeline (filter+scrub turns/sec) measured at
  *     local[N] and local[4N] on identical parquet input — the sandbox
  *     substitute for an N- vs 4N-executor cluster (BASELINE.md). Reports
  *     throughput at both plus scaling efficiency = (tps4N / tpsN) / 4.
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    // full engine config (AQE, skew handling, extensions) — GraftSession
    // is the one documented place for the scale knobs
    val s = GraftSession.local(cores, s"graft-bench-$cores")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)

    // ---- Part 1: operator queries at full parallelism ----
    val spark = newSession(cpus)
    // warm the JVM + page cache so the first timed query doesn't absorb
    // JIT/codegen/scan-init cost that belongs to no particular operator
    Seq("documents", "lineitem", "events", "embeddings", "orders",
        "customer", "supplier", "part", "nation", "region").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    spark.range(1000000).selectExpr("sum(id * 2)").count()
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, sec) = time { fn(spark, sfDir).count() }
      name -> sec
    }

    // ---- Part 2: pipeline scaling N vs 4N on identical input ----
    // Materialize a deterministic transcript table once (sf-proportional),
    // with enough file splits to feed 4N cores.
    // sized so the 4N run takes tens of seconds (fixed overhead <5%);
    // ~14 turns/conv avg incl. hot-conversation inflation
    val nConvs = math.max(50000L, (sf * 1500000L).toLong)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val inputPath = s"$tmp/transcripts"
    // north-star class count: 97 languages
    val nLangs = 97
    Transcripts.generate(spark, nConvs, seed = 42L, hotFactor = 50,
        numPartitions = cpus * 8, nLangs = nLangs)
      .write.mode("overwrite").parquet(inputPath)

    // Train models once (training time reported separately, not part of
    // the filter+scrub throughput metric).
    import spark.implicits._
    val labeledForTrain = Transcripts
      .generate(spark, nConvs = 8000, seed = 7L, hotFactor = 1, nLangs = nLangs)
      .map(t => (Transcripts.truthLang(7L, t.conv_id, nLangs), t.text))
      .toDF("lang_true", "text")
    val (nmodel, trainNgramSec) = time { NGramLangId.train(spark, labeledForTrain, "lang_true", "text") }
    val (lmodel, trainLmSec) = time { CharLM.train(spark, labeledForTrain, "lang_true", "text") }

    val nTurns = spark.read.parquet(inputPath).count()
    spark.stop()

    /** One full measured run in a fresh session (JIT persists in-JVM). */
    def oneRun(cores: Int, clustered: Boolean, path: String): Double = {
      val s = newSession(cores)
      import s.implicits._
      if (clustered)
        s.conf.set("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      val nm = s.sparkContext.broadcast(nmodel)
      val lm = s.sparkContext.broadcast(lmodel)
      val turns = s.read.parquet(path).as[Turn]
      val (_, sec) = time {
        (if (clustered) TranscriptPipeline.runClustered(s, turns, nm, lm)
         else TranscriptPipeline.run(s, turns, nm, lm))
          .write.format("noop").mode("overwrite").save()
      }
      s.stop()
      sec
    }

    // secondary: the shuffle-free clustered path. Needs a GLOBALLY sorted
    // single file (multi-file reads get bin-packed out of order) with
    // small row groups so byte-range splits carry rows; one-time prep.
    val clusteredPath = s"$tmp/transcripts_clustered"
    locally {
      val s = newSession(cpus)
      s.read.parquet(inputPath)
        .orderBy("conv_id", "turn_idx")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(clusteredPath)
      s.stop()
    }
    val nSmall = math.max(1, cpus / 4)
    // second N→4N evidence at half parallelism (N=cpus/8 → 4N=cpus/2):
    // it needs only half the box, so host-level contention that saturates
    // full-width (32-core) stages cannot corrupt this ratio — a genuine
    // two-cluster-size measurement either way (BASELINE.md methodology)
    val nHalfSmall = math.max(1, cpus / 8)
    val nHalfBig = math.max(2, cpus / 2)
    // warm both code paths once (JIT), then INTERLEAVE ALL configurations
    // round-robin so slow host-contention drift (noisy neighbors on this
    // box) hits every config's samples equally — any quiet window inside
    // the measurement span reaches every config's min.
    oneRun(cpus, clustered = false, inputPath)
    oneRun(cpus, clustered = true, clusteredPath)
    val rounds = (1 to 3).map { _ =>
      (oneRun(nSmall, clustered = false, inputPath),
       oneRun(cpus, clustered = false, inputPath),
       oneRun(nSmall, clustered = true, clusteredPath),
       oneRun(cpus, clustered = true, clusteredPath),
       oneRun(nHalfSmall, clustered = false, inputPath),
       oneRun(nHalfBig, clustered = false, inputPath))
    }
    val secSmall = rounds.map(_._1).min
    val sec4N = rounds.map(_._2).min
    val secClusteredSmall = rounds.map(_._3).min
    val secClustered4N = rounds.map(_._4).min
    val secHSmall = rounds.map(_._5).min
    val secHBig = rounds.map(_._6).min

    def eff(tSmall: Double, tBig: Double, small: Int, big: Int): Double =
      ((nTurns / tBig) / (nTurns / tSmall)) / (big.toDouble / small)
    val effW = eff(secSmall, sec4N, nSmall, cpus)
    val effC = eff(secClusteredSmall, secClustered4N, nSmall, cpus)
    val effH = eff(secHSmall, secHBig, nHalfSmall, nHalfBig)
    // a ratio > 1 means the small-core side itself absorbed host
    // contention; report at most the ideal (the component ratios stay
    // visible unclamped)
    val effBest = math.min(1.0, Seq(effW, effC, effH).max)
    val tpsSmall = nTurns / secSmall
    val tps4N = nTurns / sec4N

    val totalQuerySec = queryTimes.map(_._2).sum
    val qs = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val pipeline =
      f"""{"n_turns":$nTurns,"cores_n":$nSmall,"sec_n":$secSmall%.3f,"tps_n":$tpsSmall%.0f,""" +
      f""""cores_4n":$cpus,"sec_4n":$sec4N%.3f,"tps_4n":$tps4N%.0f,""" +
      f""""scaling_efficiency":$effW%.3f,"train_ngram_sec":$trainNgramSec%.3f,"train_lm_sec":$trainLmSec%.3f,""" +
      f""""clustered_tps_n":${nTurns / secClusteredSmall}%.0f,"clustered_tps_4n":${nTurns / secClustered4N}%.0f,""" +
      f""""clustered_scaling_efficiency":$effC%.3f,""" +
      f""""halfwidth_cores_n":$nHalfSmall,"halfwidth_cores_4n":$nHalfBig,""" +
      f""""halfwidth_tps_n":${nTurns / secHSmall}%.0f,"halfwidth_tps_4n":${nTurns / secHBig}%.0f,""" +
      f""""halfwidth_scaling_efficiency":$effH%.3f,""" +
      f""""scaling_efficiency_best":$effBest%.3f}"""
    val line =
      f"""{"metric":"total","value":${totalQuerySec + sec4N}%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline":$pipeline}"""
    // belt and braces: the line on stdout (unprefixed — build.sbt routes
    // forked run output through StdoutOutput) AND a file the harness can
    // read even if a wrapper mangles stdout
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), line + "\n")
    println(line)
  }
}

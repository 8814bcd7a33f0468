package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.langid.{CharLMModel, NGramModel}
import graft.quality.{Metrics, Rules}
import graft.text.{Normalize, Scrub}

/** One scored transcript turn (pipeline output row). */
final case class ScoredTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: java.sql.Timestamp,
    scrubbed: String,
    lang: String,
    lang_conf: Double,
    perplexity: Double,
    total_chars: Int,
    letter_ratio: Double,
    punct_ratio: Double,
    digit_ratio: Double,
    line_count: Int,
    junk: Boolean,
    scrub_error: Boolean,
    pii_hits: Int,
    tox_hits: Int,
    row_fp: Long,
)

/** Streaming-path output row (stateful repeat detection). */
final case class DecidedTurn(
    conv_id: String, turn_idx: Int, role: String, lang: String,
    perplexity: Double, scrubbed: String, junk: Boolean,
    is_repeat: Boolean, keep: Boolean, pii_hits: Int, tox_hits: Int)

/** Per-conversation streaming state: last scrubbed turn text + the
  * turn_idx high-water mark. Streaming repeat detection assumes turns
  * arrive in order per conversation (watermark-respecting source); a turn
  * arriving below the high-water mark is conservatively marked non-repeat
  * and does not clobber state backwards. */
final case class RepeatState(lastScrubbed: String, lastTurn: Int)

/** Turn plus its input fingerprint xxhash64(conv_id, turn_idx, text) —
  * computed as a Column before the typed map so the lineage manifests can
  * detect changed input without a second input scan. */
final case class TurnFp(
    conv_id: String, turn_idx: Int, role: String, text: String,
    tool: String, ts: java.sql.Timestamp, row_fp: Long)

/** The north-rule pipeline: language-ID + quality-filter + PII scrub over
  * multi-turn transcripts.
  *
  * Execution shape (designed for 10^12 turns / 1000 executors):
  *  - stage 1 is a single narrow typed map: normalize → scrub (markup +
  *    PII) → char-class metrics → n-gram langid → perplexity. No shuffle;
  *    the models ride one broadcast each. An optional salted repartition
  *    spreads hot conversations across tasks *before* the heavy map
  *    (repartition on xxhash64(conv_id, turn_idx)) so task runtime is
  *    input-size-balanced, not conversation-balanced.
  *  - stage 2 is the only keyed shuffle: a window over
  *    (conv_id, turn_idx) computes cross-turn context (repeated-turn
  *    detection). Per-conv work is O(turns), so skew cost is bounded by
  *    the largest conversation, not by the hash bucket.
  *  - the final keep decision is pure column arithmetic on stage-1/2
  *    outputs.
  *
  * Scrub semantics: script/style interior removal (quote-aware scanner)
  * is applied when well-formed; malformed markup falls back to the
  * unscrubbed text with scrub_error=true (a 10^12-row job must not abort
  * on one bad row — the error surfaces in per-partition counters instead,
  * mirroring the reference's hard error contract observably).
  */
object TranscriptPipeline {

  final val MaxPerplexity = 60.0
  final val MinLangConf = 0.0 // confidence currently informational

  /** Stage 1: narrow scoring map. */
  def score(spark: SparkSession, turns: Dataset[Turn],
            langModel: Broadcast[NGramModel], lm: Broadcast[CharLMModel],
            saltParts: Int = 0): Dataset[ScoredTurn] = {
    import spark.implicits._
    val salted =
      if (saltParts > 0)
        // repartition on the raw 64-bit hash: Spark hash-partitions the
        // expression VALUE, so pre-bucketing with pmod(n) would funnel the
        // n distinct values through murmur3 again and collide unevenly
        turns.repartition(saltParts, F.xxhash64(F.col("conv_id"), F.col("turn_idx")))
      else turns
    salted
      .withColumn("row_fp", F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.col("text")))
      .as[TurnFp]
      .mapPartitions { it =>
        val scorer = new TurnScorer(langModel.value, lm.value) // once per task
        it.map { t => scorer.score(Turn(t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts), t.row_fp) }
      }
  }

  /** Pure per-turn scoring — shared by the distributed path and the
    * sequential in-test oracle, so parity tests exercise *distribution*
    * (partitioning, broadcast, ordering), not a duplicated rule set. */
  def scoreOne(t: Turn, nm: NGramModel, lmm: CharLMModel, rowFp: Long = 0L): ScoredTurn =
    new TurnScorer(nm, lmm).score(t, rowFp)

  /** Per-task scoring context: precomputes the langid→LM class index map
    * and lowercases each row exactly once. */
  final class TurnScorer(nm: NGramModel, lmm: CharLMModel,
      deny: Scrub.DenyList = Scrub.defaultDenyList) extends Serializable {
    private val lmIdx: Array[Int] = nm.classes.map(c => lmm.classes.indexOf(c))

    def score(t: Turn, rowFp: Long): ScoredTurn = {
      // null text = empty turn (a 10^12-row job must not abort on one bad row)
      val normalized = if (t.text == null) "" else Normalize.newlines(t.text)
      var scrubError = false
      val deMarkup =
        if (normalized.indexOf('<') < 0) normalized // fast path: no markup
        else try {
          val (s1, _) = Scrub.stripRawTextTag(normalized, "script", t.conv_id)
          Scrub.stripRawTextTag(s1, "style", t.conv_id)._1
        } catch {
          case _: Scrub.MalformedInputException => scrubError = true; normalized
        }
      val (dePii, piiHits) = Scrub.scrubPiiCounting(deMarkup)
      val (scrubbed, toxHits) = Scrub.scrubDenyList(dePii, deny)
      val lower = scrubbed.toLowerCase(java.util.Locale.ROOT)
      val (langIdx, conf) = nm.predictWithConfLower(lower)
      val li = lmIdx(langIdx)
      val ppl = if (li < 0) graft.langid.CharLM.EmptyPerplexity
                else lmm.perplexityLower(lower, li)
      val m = Metrics.of(scrubbed)
      ScoredTurn(
        conv_id = t.conv_id, turn_idx = t.turn_idx, role = t.role, tool = t.tool,
        ts = t.ts, scrubbed = scrubbed, lang = nm.classes(langIdx), lang_conf = conf,
        perplexity = ppl, total_chars = m.totalChars,
        letter_ratio = m.letterRatio, punct_ratio = m.punctRatio,
        digit_ratio = m.digitRatio, line_count = m.lineCount,
        junk = Rules.isJunk(m), scrub_error = scrubError, pii_hits = piiHits,
        tox_hits = toxHits, row_fp = rowFp,
      )
    }
  }

  /** Stage 2 + decision: repeated-turn context under stable
    * (conv_id, turn_idx) ordering, then the keep/drop column. The
    * `observe` node (A12) publishes job-level counters (rows, keeps, PII
    * hits, scrub errors) through QueryExecutionListener / StreamingQuery
    * progress with zero extra passes. */
  def decide(scored: Dataset[ScoredTurn]): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    scored.toDF()
      .withColumn("is_repeat",
        F.coalesce(F.lag("scrubbed", 1).over(w) === F.col("scrubbed"), F.lit(false)))
      .withColumn("keep",
        !F.col("junk") && !F.col("is_repeat") && F.col("perplexity") <= MaxPerplexity)
      .observe("graft_pipeline",
        F.count(F.lit(1)).as("n_rows"),
        F.sum(F.col("keep").cast("long")).as("n_keep"),
        F.sum(F.col("pii_hits").cast("long")).as("pii_hits"),
        F.sum(F.col("tox_hits").cast("long")).as("tox_hits"),
        F.sum(F.col("scrub_error").cast("long")).as("scrub_errors"))
  }

  /** Shuffle-free variant for CONV-CLUSTERED tables (the common physical
    * layout for transcript tables: rows sorted by (conv_id, turn_idx) and
    * conversations contiguous across the partition order). decide()'s
    * window shuffle moves every byte of the table; at 10^12 turns that is
    * the dominant cost. Here repeat detection runs inside the scoring
    * pass instead:
    *
    *  1. a cheap boundary pass scans the input once and collects ONE row
    *     per partition (its last turn) plus ordering evidence
    *  2. the driver chains boundaries across empty partitions, verifies
    *     global contiguity (throws IllegalStateException if the table is
    *     not clustered — use run() then), and scrubs just those boundary
    *     turns
    *  3. one mapPartitionsWithIndex does scoring + repeat detection with
    *     the broadcast boundary map seeding each partition's first row
    *
    * Cost: one extra input scan (IO) instead of a full-table shuffle
    * (write+read+sort) — the trade that wins at 100 TB.
    */
  def runClustered(spark: SparkSession, turns: Dataset[Turn],
                   langModel: Broadcast[NGramModel], lm: Broadcast[CharLMModel]): DataFrame = {
    import spark.implicits._

    // null-safe (conv, turn) ordering: null conv sorts first, matching
    // Spark's NULLS FIRST ascending default
    def convCmp(a: String, b: String): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else a.compareTo(b)
    def keyLeq(aConv: String, aTurn: Int, bConv: String, bTurn: Int): Boolean = {
      val c = convCmp(aConv, bConv)
      c < 0 || (c == 0 && aTurn <= bTurn)
    }

    // ONE RDD instance for the boundary pass, the partition count, and the
    // scoring pass: each .rdd call would re-plan the source, and the
    // boundary map is only valid for the exact split planning it was
    // computed from — a second materialization with different splits would
    // mis-seed prevByPid silently.
    val rdd = turns.rdd

    // 1. boundary pass: (pid, firstTurn, lastTurn, sortedWithin)
    val bounds = rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: Turn = null
      var last: Turn = null
      var sorted = true
      it.foreach { t =>
        if (first == null) first = t
        else if (keyLeq(t.conv_id, t.turn_idx, last.conv_id, last.turn_idx)) sorted = false
        last = t
      }
      if (first == null) Iterator.empty
      else Iterator.single((pid, first, last, sorted))
    }.collect().sortBy(_._1)

    bounds.foreach { case (pid, _, _, sorted) =>
      if (!sorted) throw new IllegalStateException(
        s"partition $pid is not sorted by (conv_id, turn_idx); " +
          "runClustered requires a conv-clustered table — use run() instead")
    }
    // cross-partition: strictly increasing (conv, turn) keys — also catches
    // a same-conversation turn regression/overlap across the boundary
    bounds.sliding(2).foreach {
      case Array((_, _, prevLast, _), (pid, firstT, _, _)) =>
        if (keyLeq(firstT.conv_id, firstT.turn_idx, prevLast.conv_id, prevLast.turn_idx))
          throw new IllegalStateException(
            s"(conv_id, turn_idx) keys are not contiguous at partition $pid; " +
              "runClustered requires a conv-clustered table — use run() instead")
      case _ => ()
    }

    // 2. effective previous turn per partition (chained over empty parts),
    //    scrubbed on the driver (one TurnScorer call per boundary row)
    val scorerD = new TurnScorer(langModel.value, lm.value)
    val prevByPid: Map[Int, (String, String)] = {
      val m = scala.collection.mutable.Map.empty[Int, (String, String)]
      var carry: Option[Turn] = None
      var carryPid = -1
      val nonEmpty = bounds.map(b => b._1 -> b._3).toMap
      val maxPid = rdd.getNumPartitions
      (0 until maxPid).foreach { pid =>
        carry.foreach { t =>
          m(pid) = (t.conv_id, scorerD.score(t, 0L).scrubbed)
        }
        nonEmpty.get(pid).foreach { lastT => carry = Some(lastT); carryPid = pid }
      }
      m.toMap
    }
    val bcPrev = spark.sparkContext.broadcast(prevByPid)

    // 3. fused scoring + repeat detection, shuffle-free (same RDD instance)
    val nm = langModel; val lmm = lm
    val decided = rdd.mapPartitionsWithIndex { (pid, it) =>
      val scorer = new TurnScorer(nm.value, lmm.value)
      var prevConv: String = null
      var prevScrubbed: String = null
      bcPrev.value.get(pid).foreach { case (c, s) => prevConv = c; prevScrubbed = s }
      it.map { t =>
        val s = scorer.score(t, RowFp.of(t.conv_id, t.turn_idx, t.text))
        val isRepeat = t.conv_id == prevConv && s.scrubbed == prevScrubbed
        prevConv = t.conv_id
        prevScrubbed = s.scrubbed
        (s, isRepeat, !s.junk && !isRepeat && s.perplexity <= MaxPerplexity)
      }
    }
    spark.createDataset(decided)(Encoders.tuple(
        Encoders.product[ScoredTurn], Encoders.scalaBoolean, Encoders.scalaBoolean))
      .toDF("s", "is_repeat", "keep")
      .select(F.col("s.*"), F.col("is_repeat"), F.col("keep"))
  }

  /** Streaming variant: the stage-1 narrow map is stateless and applies
    * to a streaming Dataset unchanged; repeat detection becomes
    * per-conversation state (last scrubbed text) via
    * flatMapGroupsWithState. Within a micro-batch, turns are processed in
    * turn_idx order (stable (conv_id, turn_idx) ordering, north rule). */
  def runStream(spark: SparkSession, turns: Dataset[Turn],
                langModel: Broadcast[NGramModel], lm: Broadcast[CharLMModel]): Dataset[DecidedTurn] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val scored = score(spark, turns, langModel, lm)
    scored
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[RepeatState, DecidedTurn](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[ScoredTurn],
         state: org.apache.spark.sql.streaming.GroupState[RepeatState]) =>
          val sorted = rows.toArray.sortBy(_.turn_idx)
          var last = state.getOption.map(_.lastScrubbed).orNull
          var lastTurn = state.getOption.map(_.lastTurn).getOrElse(Int.MinValue)
          val out = sorted.map { s =>
            val inOrder = s.turn_idx > lastTurn
            val isRepeat = inOrder && s.scrubbed == last
            if (inOrder) { last = s.scrubbed; lastTurn = s.turn_idx }
            DecidedTurn(s.conv_id, s.turn_idx, s.role, s.lang, s.perplexity,
              s.scrubbed, s.junk, isRepeat,
              !s.junk && !isRepeat && s.perplexity <= MaxPerplexity,
              s.pii_hits, s.tox_hits)
          }
          if (sorted.nonEmpty) state.update(RepeatState(last, lastTurn))
          out.iterator
      }
  }

  /** Full pipeline: score + decide. */
  def run(spark: SparkSession, turns: Dataset[Turn],
          langModel: Broadcast[NGramModel], lm: Broadcast[CharLMModel],
          saltParts: Int = 0): DataFrame =
    decide(score(spark, turns, langModel, lm, saltParts))
}

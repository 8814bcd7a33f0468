package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no true streaming (SURVEY.md §1.3) — this is the
  * engine's forward-looking stream path: the same quality/aggregation
  * semantics expressed incrementally. Batch parquet drives the stream in
  * tests via readStream + memory sink (spark_guide.md pattern).
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Long, total_value: Double)

  // public: the streaming state encoder's generated code needs the ctor
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Watermarked sliding-window counts per event type. */
  def windowedCounts(events: DataFrame, window: String = "5 minutes",
                     slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(F.window(F.col("ts"), window, slide), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"), F.sum("value").as("total_value"))

  /** Streaming EXACT DEDUP across micro-batches: the first-seen row per
    * `fpCol` fingerprint wins, later duplicates are dropped, and the
    * per-key state is CLEANED as the event-time watermark passes — an
    * unbounded corpus deduped in bounded state, the streaming complement
    * of `Dedup.exact`. `delay` bounds how far apart (in event time) two
    * copies may arrive and still be deduplicated; that is the honest
    * contract of watermark-TTL'd dedup at 10^12 rows — global forever
    * dedup of a stream needs unbounded state by definition (run the
    * batch `Dedup.exact` over the sink for that).
    *
    * Spark-first: the built-in `dropDuplicatesWithinWatermark` operator
    * carries the whole state machine (RocksDB-spillable key state,
    * watermark cleanup); this wrapper fixes the column contract and
    * documents the semantics. Note the tie-break differs from batch
    * `Dedup.exact` (min-id): a stream keeps the FIRST-ARRIVED copy. */
  def dedupStream(docs: DataFrame, fpCol: String, tsCol: String,
                  delay: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(fpCol)

  /** Stateful sessionization: a session closes after `gapMinutes` of
    * user inactivity (event-time, via ProcessingTime-free state timeout on
    * watermark advance). Emits completed sessions. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = rows.toArray.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  out += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Batch sessionization with identical semantics (lag window): session
    * breaks where the gap from the previous event exceeds gapMinutes —
    * SQL-expressible, oracle-checkable counterpart of sessionize(). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("prev_ts", F.lag("ts", 1).over(w))
      .withColumn("new_session",
        (F.col("prev_ts").isNull ||
          // double epoch seconds: keeps sub-second precision so boundary
          // decisions match engines that track microseconds
          (F.col("ts").cast("timestamp").cast("double") -
            F.col("prev_ts").cast("timestamp").cast("double")) * 1000d > gapMs).cast("int"))
      .withColumn("session_id", F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(F.count(F.lit(1)).as("n_events"), F.sum("value").as("total_value"),
        F.min("ts").as("start"), F.max("ts").as("end"))
  }
}

package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestSession
import graft.streaming.EventStream.Event

class EventStreamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, user: Long, minute: Long, v: Double = 1.0) =
    Event(id, new Timestamp(1700000000000L + minute * 60000L), user, "click", v)

  private val events = Seq(
    ev(1, 1, 0), ev(2, 1, 5), ev(3, 1, 10), // session A (user 1)
    ev(4, 1, 60), ev(5, 1, 65), // session B (gap 50 min)
    ev(6, 2, 0), // session C (user 2)
    ev(7, 2, 200), // session D
  )

  test("streaming sessionize matches batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = EventStream.sessionize(spark, stream.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(events)
      q.processAllAvailable()
      // advance watermark far past all sessions so timeouts fire
      stream.addData(ev(99, 9, 10000))
      q.processAllAvailable()
      stream.addData(ev(100, 9, 20000))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .filter(F.col("user_id") < 9)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3))) // user_id, n_events
        .sorted
      assert(got.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L)))
    } finally q.stop()

    // batch counterpart: same session boundaries
    import spark.implicits._
    val batch = EventStream.sessionizeBatch(
      events.toDS().toDF(), gapMinutes = 30)
    val counts = batch.select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(counts.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L)))
  }

  test("watermarked windowed counts over a parquet-driven stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.toDS().toDF().write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = EventStream.windowedCounts(stream, "10 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val total = spark.table("win_out").agg(F.sum("n")).head().getLong(0)
      assert(total == events.length)
    } finally q.stop()
  }

  test("streaming dedup: cross-micro-batch duplicates drop, first-seen survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)] // (fp, ts_sec, payload)
    val docs = stream.toDF().toDF("fp", "sec", "payload")
      .withColumn("ts", F.timestamp_seconds(F.col("sec")))
    val q = EventStream.dedupStream(docs, "fp", "ts", delay = "30 seconds")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, 10L, "first-1"), (2L, 11L, "first-2"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate of fp=1 (within the watermark
      // delay) plus a new key — the duplicate must drop, first copy stays
      stream.addData((1L, 12L, "dup-1"), (3L, 13L, "first-3"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select("fp", "payload").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet == Set(1L, 2L, 3L), s"one row per fingerprint: $rows")
      assert(rows(1L) == "first-1", "the FIRST-ARRIVED copy wins")
      assert(spark.table("dedup_out").count() == 3)
    } finally q.stop()
  }
}

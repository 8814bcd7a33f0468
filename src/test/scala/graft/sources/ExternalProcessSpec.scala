package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** P5 external-predictor harness: per-partition process reuse and strictly
  * ordered request/response over a JSON-lines pipe (the reference drives
  * its third-party baseline comparisons exactly this way —
  * test_hljs.<lang>.py pipes JSON lines to a long-lived child process). */
class ExternalProcessSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  // echo server that prefixes its own PID: responses reveal which process
  // instance served each row, proving reuse across a partition
  private val pidEcho = Seq("/bin/sh", "-c",
    """while IFS= read -r l; do printf '%s %s\n' "$$" "$l"; done""")

  test("one process per partition, reused for every row in it") {
    import spark.implicits._
    val n = 40
    val ds = spark.range(n).map(i => (i.toLong, s"text number $i")).repartition(4)
    val out = ExternalProcess.mapWithProcess(ds, pidEcho).collect()
    assert(out.length == n)
    // recover (pid, id) pairs from responses
    val pidById = out.map { case (id, _, resp) =>
      id -> resp.split(" ", 2)(0)
    }.toMap
    val pids = pidById.values.toSet
    assert(pids.size <= 4, s"expected <=4 process instances, saw ${pids.size}")
    assert(pids.size > 1, "expected multiple partitions to get their own process")
  }

  test("ordered request/response: i-th reply belongs to i-th request, verbatim") {
    import spark.implicits._
    val ds = spark.range(25).map(i => (i.toLong, s"payload-$i")).repartition(3)
    val out = ExternalProcess.mapWithProcess(ds, pidEcho).collect()
    out.foreach { case (id, text, resp) =>
      val body = resp.split(" ", 2)(1)
      assert(body == s"""{"id":$id,"text":"${ExternalProcess.jsonEscape(text)}"}""",
        s"response for id=$id does not echo its own request: $resp")
      assert(text == s"payload-$id")
    }
  }

  test("a silent (never-flushing) child fails the task within the timeout, not a hang") {
    import spark.implicits._
    val silent = Seq("/bin/sh", "-c", "while IFS= read -r l; do :; done") // reads, never answers
    val ds = spark.range(3).map(i => (i.toLong, s"t$i")).coalesce(1)
    val t0 = System.nanoTime()
    val ex = intercept[org.apache.spark.SparkException] {
      ExternalProcess.mapWithProcess(ds, silent, responseTimeoutMs = 1500L).collect()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"must fail fast, took $sec s")
    assert(ex.getMessage.contains("timed out") || Option(ex.getCause).exists(
      _.getMessage.contains("timed out")), s"diagnosable timeout error, got: ${ex.getMessage}")
  }

  test("a child stalling MID-LINE (partial output, no newline) times out, not a hang") {
    import spark.implicits._
    // writes-and-flushes a line FRAGMENT, then stalls: passes any
    // readiness check (chars are buffered) so a line-level read would
    // block forever — the char-level deadline must trip instead
    val partial = Seq("/bin/sh", "-c",
      "IFS= read -r l; printf 'half-an-ans'; sleep 999")
    val ds = spark.range(1).map(i => (i.toLong, "t")).coalesce(1)
    val t0 = System.nanoTime()
    val ex = intercept[org.apache.spark.SparkException] {
      ExternalProcess.mapWithProcess(ds, partial, responseTimeoutMs = 1500L).collect()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"must fail fast, took $sec s")
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("timed out") && msg.contains("mid-line"),
      s"expected a mid-line timeout diagnostic, got: $msg")
  }

  test("null text is sent as the empty string instead of NPEing the partition") {
    import spark.implicits._
    val ds = spark.createDataset(Seq((0L, null: String), (1L, "ok"))).coalesce(1)
    val out = ExternalProcess.mapWithProcess(ds, pidEcho).collect().sortBy(_._1)
    assert(out(0)._3.split(" ", 2)(1) == """{"id":0,"text":""}""")
    assert(out(1)._3.split(" ", 2)(1) == """{"id":1,"text":"ok"}""")
  }

  test("newlines/tabs/quotes in text survive the line framing") {
    import spark.implicits._
    val tricky = Seq(
      (0L, "line one\nline two"),
      (1L, "tab\there \"quoted\" back\\slash"),
      (2L, "ctrlchar and \r cr"))
    val ds = spark.createDataset(tricky)
    val out = ExternalProcess.mapWithProcess(ds, pidEcho)
      .collect().sortBy(_._1)
    out.zip(tricky).foreach { case ((id, text, resp), (eid, etext)) =>
      assert(id == eid && text == etext)
      val body = resp.split(" ", 2)(1)
      // round-trip: unescape the echoed JSON text field back to the original
      val field = body.stripPrefix(s"""{"id":$id,"text":"""").stripSuffix("\"}")
      assert(ExternalProcess.jsonUnescape(field) == etext,
        s"escape round-trip failed for id=$id")
    }
  }
}

package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}

/** External-predictor harness (reference P5 shape): drive a line-protocol
  * subprocess from Spark, the idiom the reference uses to compare against
  * third-party baselines (`js/test_hljs.py:26-65` pipes docs to a Node
  * process as JSON lines and reads one JSON verdict line back per doc).
  *
  * Scale shape — the parts that matter at 10^12 rows:
  *  - ONE process per partition, reused for every row in it (process
  *    startup is milliseconds-to-seconds; per-row spawn would dominate).
  *  - Strictly ORDERED lockstep request/response: write one line, flush,
  *    read one line. No request pipelining, and the i-th response provably
  *    belongs to the i-th request.
  *  - CHILD CONTRACT: the predictor must write AND FLUSH exactly one line
  *    per request. Most runtimes block-buffer stdout when it is a pipe
  *    (Python needs `flush=True`/`-u`, Node needs nothing for
  *    `console.log` on pipes >= v12 but C stdio needs `fflush`), and an
  *    unflushed child stalls the lockstep read — which is why every
  *    response read carries a liveness/timeout watchdog
  *    (`responseTimeoutMs`) that FAILS the task with a diagnosable error
  *    instead of hanging it forever.
  *  - Cleanup via both iterator exhaustion AND a task-completion listener,
  *    so a failed/cancelled task never leaks the child process.
  *
  * The protocol is plain UTF-8 lines; texts are JSON-string-escaped so
  * embedded newlines survive the line framing. Any executable honoring
  * "read a line, write a line" works — tests use /bin/sh and cat as
  * deterministic stand-ins (the sandbox has no Node/hljs; the harness is
  * the capability, the predictor binary is a plug-in point).
  */
object ExternalProcess {

  /** JSON string escape (RFC 8259 minimal set + control chars). */
  def jsonEscape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case o if o < 0x20 => b.append(f"\\u${o.toInt}%04x")
        case o    => b.append(o)
      }
      i += 1
    }
    b.toString
  }

  /** Inverse of jsonEscape for the simple one-string-field protocol. */
  def jsonUnescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case 't'  => b.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => b.append(c); b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Wait for one response line with a liveness watchdog: a child that
    * block-buffers its stdout (or dies mid-stream) fails the task with a
    * diagnosable error instead of hanging the partition forever.
    *
    * The read is CHARACTER-level against one deadline — never a bare
    * `readLine()`. `ready()` only guarantees ONE buffered char, so a
    * child that writes a PARTIAL line and then stalls would pass a
    * readiness check and hang a line-level read forever (the round-4
    * hazard); here every char waits under the same deadline, so a
    * mid-line stall trips the timeout exactly like a no-output stall.
    * Returns null on EOF-before-any-char (child closed stdout); a partial
    * line at EOF is returned as-is for the caller's diagnostics. */
  private def readResponse(fromProc: BufferedReader, proc: Process,
                           timeoutMs: Long, what: => String): String = {
    val start = System.nanoTime()
    val deadline = start + timeoutMs * 1000000L
    val sb = new java.lang.StringBuilder(64)
    while (true) {
      if (fromProc.ready()) {
        val c = fromProc.read()
        if (c == -1 || c == '\n')
          return if (c == -1 && sb.length == 0) null else sb.toString
        if (c != '\r') { sb.append(c.toChar); () }
      } else if (!proc.isAlive && !fromProc.ready()) {
        // child exited and the buffer is drained: EOF
        return if (sb.length == 0) null else sb.toString
      } else {
        val now = System.nanoTime()
        if (now > deadline)
          throw new java.io.IOException(
            s"external process response timed out after ${timeoutMs} ms at $what" +
              (if (sb.length > 0) s" (stalled mid-line after ${sb.length} chars)" else "") +
              " — the child must write AND FLUSH one line per request " +
              "(block-buffered stdout stalls the lockstep protocol)")
        // a healthy child answers in microseconds: spin for the first 1 ms
        // (the hot path — a Thread.sleep here would tax EVERY row by a
        // scheduler quantum), park 1 ms thereafter (the watchdog path)
        if (now - start < 1000000L) Thread.onSpinWait() else Thread.sleep(1)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Map `(id, text)` rows through an external process, one process per
    * partition. Each row is sent as one line `{"id":<id>,"text":"<esc>"}`
    * (a null text is sent as the empty string); the process must answer
    * with exactly one FLUSHED line per request, returned verbatim as the
    * `response` field. A child that stalls longer than `responseTimeoutMs`
    * on any response fails the task rather than hanging it.
    */
  def mapWithProcess(ds: Dataset[(Long, String)], command: Seq[String],
                     responseTimeoutMs: Long = 120000L)(
      implicit enc: Encoder[(Long, String, String)]): Dataset[(Long, String, String)] =
    ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pb = new ProcessBuilder(command: _*)
        // stderr must never block the child: the default pipe is drained by
        // nobody, so a predictor that logs more than the ~64 KB pipe buffer
        // would stall on its stderr write and stop answering stdout —
        // deadlocking the partition. Discard it (a real predictor's
        // diagnostics belong in its own log file, not a pipe we'd have to
        // drain on a thread).
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        val proc = pb.start()
        val toProc = new BufferedWriter(
          new OutputStreamWriter(proc.getOutputStream, UTF_8))
        val fromProc = new BufferedReader(
          new InputStreamReader(proc.getInputStream, UTF_8))
        var closed = false
        def shutdown(): Unit = if (!closed) {
          closed = true
          try toProc.close() catch { case _: Exception => }
          try { proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS); () }
          catch { case _: Exception => }
          proc.destroy()
        }
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => shutdown()))
        new Iterator[(Long, String, String)] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h) shutdown(); h }
          def next(): (Long, String, String) = {
            val (id, text) = it.next()
            val safe = if (text == null) "" else text
            toProc.write(s"""{"id":$id,"text":"${jsonEscape(safe)}"}""")
            toProc.newLine()
            toProc.flush()
            val resp = readResponse(fromProc, proc, responseTimeoutMs,
              s"${command.head} id=$id")
            require(resp != null,
              s"external process ${command.head} closed its stdout at id=$id")
            (id, text, resp)
          }
        }
      }
    }
}

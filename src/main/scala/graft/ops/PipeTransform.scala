package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.Row

/** Shared per-partition pipe-transform runner for the subprocess
  * processors ([[JsProcessor]], [[WasmProcessor]]): spawn `node` on a
  * generated harness file, stream one request line per record on its
  * stdin, read one response line per record from its stdout — strict
  * lockstep, executor-local, no driver involvement, linear at any
  * scale.
  *
  * The writer thread feeds records and keeps a bounded queue of the
  * ORIGINALS (backpressure + the DLQ's exact input record). Flushes
  * are batched: every 64 records, whenever the reader has consumed
  * everything already flushed, and BEFORE any blocking put so the
  * lockstep cannot deadlock; `close()` flushes the tail. The reader
  * samples writer liveness BEFORE checking the queue so a
  * put-then-exit cannot be mistaken for completion.
  */
private[ops] object PipeTransform {

  /** Run `rows` through a fresh `node <harness>` subprocess.
    *
    * @param harnessSrc the JavaScript harness source to materialize
    * @param label      plugin name for error messages
    * @param rows       partition input
    * @param envelope   row → one request line (no newline)
    * @param decode     (response line, original row) → Some(result
    *                   row) or None to drop (filtered)
    */
  def run(harnessSrc: String, label: String, rows: Iterator[Row],
          envelope: Row => String,
          decode: (String, Row) => Option[Row]): Iterator[Row] = {
    if (!rows.hasNext) return Iterator.empty
    val harness = java.nio.file.Files.createTempFile("graft-pipe", ".js")
    java.nio.file.Files.write(harness, harnessSrc.getBytes(UTF_8))
    val pb = new ProcessBuilder("node", harness.toString)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT) // logger → task stderr
    val proc =
      try pb.start()
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"$label needs the `node` binary on the executor PATH: " +
            e.getMessage, e)
      }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
      proc.destroyForcibly(); java.nio.file.Files.deleteIfExists(harness)
    })
    val stdin = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, UTF_8))
    val stdout = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, UTF_8))

    val pending = new java.util.concurrent.ArrayBlockingQueue[Row](256)
    val writerError = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val writer = new Thread(() => {
      try {
        var unflushed = 0
        rows.foreach { r =>
          if (!pending.offer(r)) {
            stdin.flush(); unflushed = 0
            pending.put(r)
          }
          stdin.write(envelope(r)); stdin.write('\n')
          unflushed += 1
          if (unflushed >= 64 || pending.size() <= unflushed) {
            stdin.flush(); unflushed = 0
          }
        }
        stdin.close()
      } catch { case t: Throwable => writerError.set(t); proc.destroyForcibly() }
    }, s"graft-pipe-writer")
    writer.setDaemon(true)
    writer.start()

    new Iterator[Row] {
      private var nextRow: Row = _
      private var done = false
      private def advance(): Unit = {
        while (nextRow == null && !done) {
          // liveness BEFORE the queue: a dead writer can no longer
          // enqueue, so an empty queue seen after thread death is
          // truly final
          val alive = writer.isAlive
          if (!alive && pending.isEmpty && writerError.get == null) {
            finish(); return
          }
          val original = pending.poll(100,
            java.util.concurrent.TimeUnit.MILLISECONDS)
          if (original != null) {
            val line = stdout.readLine()
            if (line == null) {
              val err = Option(writerError.get).map(_.getMessage)
                .getOrElse(s"node exited with ${exitCode()}")
              finish()
              throw new IllegalStateException(
                s"$label: node pipe closed early — $err")
            }
            decode(line, original) match {
              case Some(r) => nextRow = r
              case None => // filtered — keep polling
            }
          } else if (writerError.get != null) {
            val t = writerError.get; finish(); throw t
          }
        }
      }
      private def exitCode(): String =
        try { proc.waitFor(); proc.exitValue().toString }
        catch { case _: Exception => "?" }
      private def finish(): Unit = {
        done = true
        try stdout.close() catch { case _: Exception => }
        proc.destroyForcibly()
        java.nio.file.Files.deleteIfExists(harness)
      }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): Row = {
        advance()
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }
}

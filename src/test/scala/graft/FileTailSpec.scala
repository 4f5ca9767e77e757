package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.model.Cdc
import graft.pipeline.{Pipeline, Runner}

/** True file tail (reference `builtin:file` semantics): follow ONE
  * append-only file at byte offsets, consume only complete lines,
  * resume appended data across restarts from the checkpoint.
  */
class FileTailSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private def append(path: String, s: String): Unit =
    Files.write(Paths.get(path), s.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("tail consumes complete lines only, then picks up appended data") {
    val file = Files.createTempFile("tail", ".log").toString
    append(file, "line-1\nline-2\npartial")
    Runner.memorySinks.clear()
    val p = Pipeline("tail1")
      .source("f", "builtin:file", "path" -> file)
      .destination("out", "memory")
    val ckpt = Files.createTempDirectory("tail1-ckpt").toString
    val q1 = Runner.start(spark, p, ckpt, Trigger.AvailableNow())
    q1.awaitTermination(120000)
    val phase1 = Runner.memorySink("out").map(l =>
      JsonOps.parse(l).get("payload").get("after").asText())
    assert(phase1 == Seq("line-1", "line-2"),
      "the unterminated trailing line must NOT be consumed")
    // the writer finishes the partial line and appends another
    append(file, "-done\nline-4\n")
    val q2 = Runner.start(spark, p, ckpt, Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val phase2 = Runner.memorySink("out").map(l =>
      JsonOps.parse(l).get("payload").get("after").asText())
    assert(phase2 == Seq("line-1", "line-2", "partial-done", "line-4"),
      s"resume from the committed byte offset, got $phase2")
  }

  test("ordered delivery: sink sees records in strict position order") {
    Runner.memorySinks.clear()
    val p = Pipeline("ordered1")
      .source("gen", "builtin:generator",
        "format.options.id" -> "int", "recordCount" -> "5000")
      .destination("out", "memory")
      .withOrderedDelivery
    Runner.runBatch(spark, p)
    val positions = Runner.memorySink("out").map(l => new String(
      java.util.Base64.getDecoder.decode(
        JsonOps.parse(l).get("position").asText()), "UTF-8").toLong)
    assert(positions.size == 5000)
    assert(positions == positions.sorted,
      "strict per-source total order (reference §2.7 single-source mode)")
    // control: the default order-narrowed mode interleaves partitions
    Runner.memorySinks.clear()
    Runner.runBatch(spark, p.copy(ordered = ""))
    val unordered = Runner.memorySink("out").map(l => new String(
      java.util.Base64.getDecoder.decode(
        JsonOps.parse(l).get("position").asText()), "UTF-8").toLong)
    assert(unordered.size == 5000)
  }

  test("AvailableNow respects maxBytesPerBatch: bounded batches, full drain") {
    val file = Files.createTempFile("tail3", ".log").toString
    (1 to 10).foreach(i => append(file, f"line-$i%02d\n")) // 8 bytes/line
    Runner.memorySinks.clear()
    val p = Pipeline("tail3")
      .source("f", "builtin:file",
        "path" -> file, "tail" -> "true", "maxBytesPerBatch" -> "20")
      .destination("out", "memory")
    val ckpt = Files.createTempDirectory("tail3-ckpt").toString
    val q = Runner.start(spark, p, ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val got = Runner.memorySink("out").map(l =>
      JsonOps.parse(l).get("payload").get("after").asText())
    assert(got == (1 to 10).map(i => f"line-$i%02d"),
      s"AvailableNow must still drain everything, got $got")
    // 80 bytes at ≤20 bytes/batch (complete-line boundary → 16) = ≥4
    // batches; the unbounded-batch bug drained it all in one
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 4,
      s"maxBytesPerBatch must bound every AvailableNow batch, got $dataBatches batches")
  }

  test("positions are byte offsets and streaming tail follows a live writer") {
    val file = Files.createTempFile("tail2", ".log").toString
    append(file, "a\n")
    Runner.memorySinks.clear()
    val p = Pipeline("tail2")
      .source("f", "builtin:file", "path" -> file, "tail" -> "true")
      .destination("out", "memory")
    val ckpt = Files.createTempDirectory("tail2-ckpt").toString
    val q = Runner.start(spark, p, ckpt, Trigger.ProcessingTime("100 milliseconds"))
    try {
      var waited = 0
      while (Runner.memorySink("out").isEmpty && waited < 100) {
        Thread.sleep(100); waited += 1
      }
      append(file, "bb\nccc\n")
      waited = 0
      while (Runner.memorySink("out").size < 3 && waited < 100) {
        Thread.sleep(100); waited += 1
      }
      val recs = Runner.memorySink("out").map(JsonOps.parse)
      assert(recs.size == 3, s"live appends must flow, got ${recs.size}")
      val positions = recs.map(r => new String(
        java.util.Base64.getDecoder.decode(r.get("position").asText()), "UTF-8").toLong)
      assert(positions == Seq(0L, 2L, 5L), s"byte-offset positions, got $positions")
    } finally q.stop()
  }
}

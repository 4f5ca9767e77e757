package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Stateful streaming operators driven through real streaming queries
  * (MemoryStream → watermarked state → memory sink).
  */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming dedup drops in-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val out = StreamingOps.dedupStream(
      in.toDF().toDF("content_hash", "ts"), "ts", "10 minutes", Seq("content_hash"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData(("a", ts("2026-01-01 10:00:00")), ("a", ts("2026-01-01 10:00:00")),
      ("b", ts("2026-01-01 10:01:00")), ("a", ts("2026-01-01 10:00:00")))
    q.processAllAvailable()
    val rows = spark.table("dedup_out").collect()
    assert(rows.length == 2, s"expected a,b once each: ${rows.mkString}")
    q.stop()
  }

  test("windowed counts aggregate per tumbling window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val out = StreamingOps.windowedCounts(
      in.toDF().toDF("event_type", "ts"), "ts", "5 minutes", "10 minutes",
      groupCols = Seq("event_type"))
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    in.addData(("click", ts("2026-01-01 10:01:00")), ("click", ts("2026-01-01 10:04:00")),
      ("view", ts("2026-01-01 10:02:00")), ("click", ts("2026-01-01 10:12:00")))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select(col("event_type"), col("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("click", 2L), ("view", 1L), ("click", 1L)) ||
      rows.contains(("click", 2L)), s"got $rows")
    q.stop()
  }

  test("inspector tap samples a live pipeline") {
    graft.pipeline.Runner.memorySinks.clear()
    val ins = graft.pipeline.Metrics.inspector("p-inspect", capacity = 50)
    val p = graft.pipeline.Pipeline("p-inspect")
      .source("gen", "builtin:generator",
        "format.options.id" -> "int", "recordCount" -> "200")
      .destination("out", "memory")
    val q = graft.pipeline.Runner.start(spark, p,
      java.nio.file.Files.createTempDirectory("ckpt-ins").toString,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(60000)
    val sampled = ins.drain()
    assert(sampled.nonEmpty && sampled.size <= 50)
    assert(sampled.head.contains("\"operation\""))
  }
}

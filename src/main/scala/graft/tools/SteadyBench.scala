package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.{Pipeline, Runner}

/** 60-second steady-state pipeline throughput per BASELINE.md rules:
  * ground truth (records actually written to the parquet output and
  * counted back, never engine metrics), warmup run discarded, n
  * measured runs reported individually + median. The pipeline matches
  * the reference's ground-truth setup: `builtin:generator` → one
  * processor → file sink (reference median 338,200 rec/s, sd 9.8%,
  * `benchi/METHODOLOGY.md:66-73`).
  *
  * Usage: runMain graft.tools.SteadyBench [durationSec] [runs]
  */
object SteadyBench {
  def main(args: Array[String]): Unit = {
    val durationSec = args.headOption.map(_.toInt).getOrElse(60)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-steady-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("steady").toString
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    // SPARK_GRAFT_ORDERED = "" (default) | key | global measures the
    // delivery-order modes' throughput cost: `key` is the 100 TB CDC
    // path (per-key order, parallel writers), `global` the documented
    // 1-task funnel (Runner.scala:184-200)
    val ordered = sys.env.getOrElse("SPARK_GRAFT_ORDERED", "")
    val p0 = Pipeline("steady")
      .source("gen", "builtin:generator",
        "format.options.id" -> "int", "format.options.name" -> "string",
        // 2M-record micro-batches are the OFFICIAL methodology
        // (PERF.md headline; micro-batch fixed cost ≈0.9 s drowns
        // throughput below ~1M records/batch — a bare run at 250k
        // measures the fixed cost, not the engine)
        "maxRecordsPerBatch" -> sys.env.getOrElse("SPARK_GRAFT_BATCH", "2000000"))
      .processor("set", "field.set",
        "field" -> ".Payload.After.department", "value" -> "finance")
      .destination("sink", "parquet", "path" -> out)
    val p = if (ordered.isEmpty) p0 else p0.copy(ordered = ordered)

    def groundTruth(): Long =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }

    def phase(seconds: Int): (Long, Double) = {
      val before = groundTruth()
      val t0 = System.nanoTime()
      val q = Runner.start(spark, p, ckpt, Trigger.ProcessingTime("100 milliseconds"))
      Thread.sleep(seconds * 1000L)
      q.stop()
      val elapsed = (System.nanoTime() - t0) / 1e9
      (groundTruth() - before, elapsed)
    }

    phase(15) // warmup: JVM/codegen/shuffle paths — discarded
    val measured = (1 to runs).map { i =>
      val (records, elapsed) = phase(durationSec)
      val rate = records / elapsed
      System.err.println(f"run $i: $records%d records in $elapsed%.1f s = $rate%.0f rec/s")
      rate
    }
    val sorted = measured.sorted
    val median = sorted(sorted.size / 2)
    println(s"""{"metric":"steady_state_throughput","unit":"rec/s","median":${median.toLong},""" +
      s""""runs":[${measured.map(_.toLong).mkString(",")}],"durationSec":$durationSec,""" +
      s""""ordered":"$ordered","groundTruth":"parquet count","warmupSec":15}""")
    spark.stop()
  }
}

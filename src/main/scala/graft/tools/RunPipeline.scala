package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.{Pipeline, Runner}

/** CLI pipeline runner — the engine's `conduit run` analogue: parse a
  * provisioning YAML, start every pipeline as a Structured Streaming
  * query, wait for completion (bounded sources) or until killed.
  *
  * Usage: runMain graft.tools.RunPipeline <pipeline.yaml> [--batch]
  *        runMain graft.tools.RunPipeline <pipeline.yaml> --serve <port>
  * (--serve registers the pipelines and exposes the REST control
  *  plane instead of running them immediately.)
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunPipeline <pipeline.yaml> [--batch|--serve <port>]")
    val yamlPath = args(0)
    val batchMode = args.contains("--batch")
    val servePort = args.indexOf("--serve") match {
      case -1 => None
      case i => Some(args(i + 1).toInt)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pipelines = Pipeline.fromYaml(Files.readString(Paths.get(yamlPath)))
    require(pipelines.nonEmpty, s"no pipelines in $yamlPath")
    servePort.foreach { port =>
      // GRAFT_CKPT pins the checkpoint root so source positions
      // survive a server restart (at-least-once resume — the
      // reference's persisted position store); default stays a fresh
      // temp dir for throwaway runs
      val ckptRoot = sys.env.get("GRAFT_CKPT")
        .map { p => Files.createDirectories(Paths.get(p)); p }
        .getOrElse(Files.createTempDirectory("graft-ckpt").toString)
      val cp = new graft.pipeline.ControlPlane(spark, ckptRoot)
      pipelines.foreach(cp.register)
      val bound = cp.start(port)
      println(s"control plane listening on 127.0.0.1:$bound")
      Thread.currentThread().join() // serve until killed
    }
    pipelines.foreach { p =>
      if (batchMode) {
        val counts = Runner.runBatch(spark, p)
        println(s"[${p.id}] ok=${counts("ok")} dlq=${counts("dlq")}")
      } else {
        val ckpt = sys.env.get("GRAFT_CKPT")
          .map(root => Files.createDirectories(
            Paths.get(root, p.id)).toString)
          .getOrElse(Files.createTempDirectory(s"ckpt-${p.id}").toString)
        val q = Runner.start(spark, p, ckpt, Trigger.AvailableNow())
        q.awaitTermination()
        println(s"[${p.id}] streaming query finished")
      }
    }
    spark.stop()
  }
}

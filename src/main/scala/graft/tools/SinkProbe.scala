package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-only scale probe for the additive-state streaming sinks
  * (the [[JoinViewProbe]] pattern): each sink's maintenance function
  * runs directly on parquet-derived batch frames — no MemoryStream,
  * no micro-batch harness — on the base corpus and on the scaled
  * copy, timing two-batch maintenance (fresh state + one merge).
  *
  * Probed sinks: vocabCountSink (state = vocabulary, Heaps-law
  * sublinear), mixtureKlSink (state ≤ |targets|), cmsCounterSink and
  * histogramBinSink (constant-size state). Expect wall factors far
  * under the data factor: the data-dependent term is one scan +
  * map-side-combined aggregation per batch.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<small> runMain graft.tools.SinkProbe <scaledDir>
  */
object SinkProbe {
  private def docs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    (d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 =!= 0))
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = args.headOption.getOrElse("/tmp/graft_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sink-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.StreamingOps

    val targets = Seq(("en", 0.5), ("fr", 0.2), ("es", 0.15),
      ("zh", 0.1), ("de", 0.05))
    def probes(dir: String): Seq[(String, () => Unit)] = {
      val (b1, b2) = docs(spark, dir)
      def state(tag: String) =
        java.nio.file.Files.createTempDirectory(s"probe-$tag").toString
      Seq(
        "vocab" -> { () =>
          val s = StreamingOps.vocabCountSink(state("vocab"), "text")
          s(b1, 0L); s(b2, 1L)
        },
        "mixture_kl" -> { () =>
          val s = StreamingOps.mixtureKlSink(state("mix"), "lang",
            "n_tokens", targets)
          s(b1, 0L); s(b2, 1L)
        },
        "cms" -> { () =>
          val s = StreamingOps.cmsCounterSink(state("cms"), "lang",
            depth = 4, width = 256)
          s(b1, 0L); s(b2, 1L)
        },
        "histogram" -> { () =>
          val s = StreamingOps.histogramBinSink(state("hist"),
            Seq("lang"), "n_tokens", lo = 0.0, width = 8.0, bins = 64)
          s(b1, 0L); s(b2, 1L)
        })
    }

    // warmup both scan paths + codegen
    probes(small).foreach(_._2())
    probes(scaled).head._2()

    println(f"${"sink"}%-14s ${"small"}%8s ${"scaled"}%8s ${"factor"}%8s")
    val rows = probes(small).zip(probes(scaled)).map {
      case ((name, fs), (_, fx)) =>
        val a = time(fs()); val b = time(fx())
        println(f"$name%-14s $a%8.2f $b%8.2f ${b / a}%8.1f")
        s""""$name":{"small":$a,"scaled":$b,"factor":${b / a}}"""
    }
    println(s"""{"metric":"sink_probe","queries":${rows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-only scale probe for the incremental join-view maintenance
  * ([[graft.streaming.StreamingOps.joinViewSink]]).
  *
  * The `cdc_incr_join` GATE row deliberately replays both tables
  * through the driver (collect → MemoryStream) to prove cross-batch
  * delta-join semantics end-to-end — at 100× that harness ships ~16M
  * tuples through driver memory and dominates wall-clock (the probed
  * 123× factor is the harness, the same reading PrefixProbe gave the
  * prefix join). This tool times the ENGINE instead: the two
  * maintenance calls run directly on parquet-derived batch frames —
  * no collect, no MemoryStream — which is exactly the shape a real
  * deployment has (foreachBatch hands the sink a distributed frame).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<small> runMain graft.tools.JoinViewProbe <scaledDir>
  */
object JoinViewProbe {
  private def sideFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ords = spark.read.parquet(s"$dir/orders.parquet")
      .select(lit("l").as("_side"), col("o_custkey").as("cust"),
        col("o_orderkey"), col("o_totalprice").as("o_total"),
        lit(null).cast("string").as("c_name"),
        lit(null).cast("string").as("c_seg"))
    val custs = spark.read.parquet(s"$dir/customer.parquet")
      .select(lit("r").as("_side"), col("c_custkey").as("cust"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_total"),
        col("c_name"), col("c_mktsegment").as("c_seg"))
    // same split as the gate row: batch 1 = even orders + custkey%3!=0,
    // batch 2 = the complements
    val all = ords.unionByName(custs)
    val b1 = all.filter((col("_side") === "l" && col("o_orderkey") % 2 === 0) ||
      (col("_side") === "r" && col("cust") % 3 =!= 0))
    val b2 = all.filter((col("_side") === "l" && col("o_orderkey") % 2 =!= 0) ||
      (col("_side") === "r" && col("cust") % 3 === 0))
    (b1, b2)
  }

  private def run(spark: SparkSession, dir: String): (Double, Long) = {
    val state = java.nio.file.Files.createTempDirectory("jv_probe").toString
    val sink = graft.streaming.StreamingOps.joinViewSink(
      state, "cust", Seq("o_orderkey", "o_total"), Seq("c_name", "c_seg"))
    val (b1, b2) = sideFrames(spark, dir)
    val t0 = System.nanoTime()
    sink(b1, 0L)
    sink(b2, 1L)
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = spark.read.parquet(s"$state/view/batch=1").count()
    (secs, rows)
  }

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = args.headOption.getOrElse("/tmp/graft_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-joinview-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm codegen/scan paths on the small corpus
    run(spark, small)
    val (aSec, aRows) = run(spark, small)
    val (bSec, bRows) = run(spark, scaled)
    println(f"joinview small=$aSec%.2fs rows=$aRows scaled=$bSec%.2fs " +
      f"rows=$bRows factor=${bSec / aSec}%.1f rowFactor=${bRows.toDouble / aRows}%.1f")
    println(s"""{"metric":"joinview_probe","small":$aSec,"scaled":$bSec,""" +
      s""""factor":${bSec / aSec},"smallRows":$aRows,"scaledRows":$bRows}""")
    spark.stop()
  }
}

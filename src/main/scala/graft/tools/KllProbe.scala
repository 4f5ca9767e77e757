package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.Sketch

/** Micro-profile for the KLL sketch path (round 13): stage-by-stage
  * timings to localize why a state build costs multiples of a raw
  * events scan. Not part of the driver contract.
  */
object KllProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    time("warm scan")(ev.count())
    time("scan+count")(ev.count())
    val st = Sketch.kllState(ev, Seq("event_type"), "value", "event_id", k = 64)
    time("kllState collect 1")(st.collect().length)
    time("kllState collect 2")(st.collect().length)
    val q = Sketch.kllQuantiles(st, Seq("event_type"))
    time("kllQuantiles")(q.collect().length)
    val a = Sketch.kllState(ev.filter(col("event_id") % 2 === 0),
      Seq("event_type"), "value", "event_id", k = 64)
    val b = Sketch.kllState(ev.filter(col("event_id") % 2 === 1),
      Seq("event_type"), "value", "event_id", k = 64)
    time("kllMerge+quantiles")(
      Sketch.kllQuantiles(Sketch.kllMerge(Seq(a, b), Seq("event_type"), k = 64),
        Seq("event_type")).collect().length)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Cdc
import graft.ops.Registry

/** Stage timing for the proc_unwrap_debezium gate query: envelope
  * construction vs unwrap vs extraction.
  */
object DebeziumProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val o = spark.read.parquet(s"$dir/orders.parquet")
    o.count()
    val envelope = to_json(struct(
      struct(
        struct(col("o_orderkey"), col("o_totalprice")).as("after"),
        lit(null).cast("string").as("before"),
        lit("u").as("op"),
        struct(lit("pg").as("connector"), lit("public").as("schema")).as("source"),
        lit(1674061777225L).as("ts_ms")).as("payload")))
    def recs = o.select(
      lit(null).cast("binary").as(Cdc.Position),
      lit("create").as(Cdc.Operation),
      map(lit("existing"), lit("meta")).as(Cdc.Metadata),
      lit(null).cast("binary").as(Cdc.KeyRaw),
      to_json(struct(struct(col("o_orderkey")).as("payload"))).as(Cdc.Key),
      lit(null).cast("string").as(Cdc.PayloadBefore),
      envelope.as(Cdc.PayloadAfter))
    time("construct only")(noop(recs))
    val proc = Registry.create("unwrap.debezium", Map.empty)
    time("construct + unwrap")(noop(proc(recs)))
    val full = proc(recs).select(
      get_json_object(col(Cdc.PayloadAfter), "$.o_orderkey").cast("long").as("o_orderkey"),
      get_json_object(col(Cdc.PayloadAfter), "$.o_totalprice").cast("double").as("o_totalprice"),
      col(Cdc.Operation).as("operation"),
      col(Cdc.Metadata).getItem("connector").as("src_connector"),
      col(Cdc.Metadata).getItem("opencdc.readAt").as("read_at"),
      get_json_object(col(Cdc.Key), "$.o_orderkey").cast("long").as("key_orderkey"))
    time("full gate query")(noop(full))
    time("full gate query (2nd)")(noop(full))
    spark.stop()
  }
}

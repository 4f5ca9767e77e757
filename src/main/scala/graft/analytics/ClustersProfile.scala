package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the dedup-clusters pipeline (components loop). */
object ClustersProfile {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val pairs = time("simhashPairs count") {
      val p = Dedup.simhashPairs(docs, "doc_id", "text", 3); p.count(); p
    }
    val comp = time("components") {
      val c = Dedup.components(pairs); c.count(); c
    }
    time("clusters end-to-end") {
      Dedup.clusters(docs, "doc_id", "text", 3).count()
    }
    spark.stop()
  }
}

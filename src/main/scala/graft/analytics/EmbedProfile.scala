package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.HashFunctions._

/** Stage-by-stage wall-clock profile of the embedding near-dup pipeline
  * (the slowest analytics gate query) — run at any SF dir to see which
  * stage dominates before optimizing.
  */
object EmbedProfile {
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

    val df = spark.read.parquet(s"$dir/embeddings.parquet")
    // warm the JVM/scan
    df.count()

    val base = df.select(col("vec_id").as("vid"), l2_normalize(col("embedding")).as("nvec"))
    val nb = base.groupBy(col("vid")).agg(first(col("nvec")).as("nvec"))

    time("bucket explode count") {
      nb.withColumn("buckets", hyperplane_buckets(col("nvec"), 4, 12))
        .select(col("vid"), posexplode(col("buckets")).as(Seq("table_id", "bucket")))
        .count()
    }
    val bucketed = nb
      .withColumn("buckets", hyperplane_buckets(col("nvec"), 4, 12))
      .select(col("vid"), posexplode(col("buckets")).as(Seq("table_id", "bucket")))
    val rawPairs = Dedup.boundedSelfPairs(bucketed, Seq("table_id", "bucket"), "vid", 4096)
    time("raw pair count") { rawPairs.count() }
    val idPairs = rawPairs
      .select(col("pair_a").as("id_a"), col("pair_b").as("id_b")).distinct()
    time("distinct pair count") { idPairs.count() }
    time("verify join count") {
      idPairs
        .join(nb.select(col("vid").as("id_a"), col("nvec").as("vec_a")), "id_a")
        .join(nb.select(col("vid").as("id_b"), col("nvec").as("vec_b")), "id_b")
        .withColumn("cos_sim", dot_product(col("vec_a"), col("vec_b")))
        .filter(col("cos_sim") >= 0.4)
        .count()
    }
    time("end-to-end cosinePairs") {
      Similarity.cosinePairs(df, "vec_id", "embedding", 0.4, "lsh").count()
    }
    spark.stop()
  }
}

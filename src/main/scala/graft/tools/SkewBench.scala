package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-corpus dedup benchmark: a boilerplate cluster (N identical
  * documents — every LSH band maps them to ONE bucket) embedded in a
  * unique corpus. The round-1 formulation put the whole quadratic
  * pair set of that bucket into one task; boundedSelfPairs spreads it
  * across ceil(N/cap)² bounded blocks. This main measures end-to-end
  * completion (pair generation + exact Jaccard verification) and
  * asserts the exact pair count.
  *
  * Usage: runMain graft.tools.SkewBench [dupDocs] [uniqueDocs] [cap]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val dups = args.headOption.map(_.toInt).getOrElse(3000)
    val uniq = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val cap = args.drop(2).headOption.map(_.toInt).getOrElse(1024)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = "this exact boilerplate paragraph is repeated verbatim across " +
      "the whole cluster of scraped pages and must not blow up the dedup job"
    val df = spark.range(dups.toLong + uniq)
      .select(col("id").as("doc_id"),
        when(col("id") < dups, lit(boiler))
          .otherwise(concat(lit("unique document number "), col("id"),
            lit(" with distinct content entirely of its own about topic "),
            col("id") * 7919))
          .as("text"))
    val t0 = System.nanoTime()
    val pairs = graft.analytics.Dedup.minhashPairs(
      df, "doc_id", "text", threshold = 0.9, maxBucket = cap).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val expected = dups.toLong * (dups - 1) / 2
    println(f"""{"metric":"skew_dedup","dupDocs":$dups,"uniqueDocs":$uniq,""" +
      f""""cap":$cap,"pairs":$pairs,"expectedPairs":$expected,""" +
      f""""match":${pairs == expected},"seconds":$secs%.1f}""")

    // adversarial clustering: the dup block is ONE clique component of
    // C(dups,2) SimHash edges — components must label all of it with
    // the minimum id in O(1) rounds (clique diameter 1) without a
    // straggler, and every unique doc must keep itself
    val t1 = System.nanoTime()
    val cl = graft.analytics.Dedup.clusters(df, "doc_id", "text", maxHamming = 3)
    val agg = cl.agg(
      count(lit(1)).as("rows"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("keeps"),
      countDistinct(col("cluster_id")).as("clusters"),
      sum(when(col("cluster_id") === 0L, 1L).otherwise(0L)).as("inBigCluster"))
      .collect()(0)
    val secs2 = (System.nanoTime() - t1) / 1e9
    val okRows = agg.getLong(0) == dups.toLong + uniq
    // the whole boiler block labels 0 (its min id); exactly one keep
    // per cluster. (The "unique" templated docs legitimately near-dup
    // each other under SimHash too — only the count invariants are
    // corpus-independent.)
    val okCluster = agg.getLong(3) >= dups.toLong
    val okKeeps = agg.getLong(1) == agg.getLong(2)
    println(f"""{"metric":"skew_clusters","dupDocs":$dups,"uniqueDocs":$uniq,""" +
      f""""rows":${agg.getLong(0)},"keeps":${agg.getLong(1)},""" +
      f""""clusters":${agg.getLong(2)},"inBigCluster":${agg.getLong(3)},""" +
      f""""match":${okRows && okCluster && okKeeps},"seconds":$secs2%.1f}""")
    spark.stop()
  }
}

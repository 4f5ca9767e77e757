package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100x scaling probe for the exact-Jaccard prefix join: the gate row
  * (`dedup_jaccard_prefix`) bounds its corpus to the first 1000 doc
  * ids, so it is CONSTANT-size at any corpus scale — ScaleBench's
  * factor on it measures warmup, not the operator. This probe runs
  * [[graft.analytics.Dedup.jaccardPrefixJoin]] on the published
  * contract's actual scale path — a corpus of many bounded blocks
  * (here: every key-shifted copy contributes its first 1000 docs,
  * with per-copy disjoint vocabularies, so candidate pairs grow
  * LINEARLY in copies while the corpus grows 100x) — and reports
  * wall time + matched pairs at both scales.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val big = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prefixprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(dir: String, label: String): (Double, Long) = {
      // per-copy first-1000 blocks: copy i's ids live in
      // [i*10^7, i*10^7 + n); the mod keeps 1000 docs per copy
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(10000000L)) < 1000)
      val t0 = System.nanoTime()
      // the copies' vocabularies are disjoint by construction, so the
      // true candidate count grows linearly in copies — raising the
      // guard is the documented known-bounded-corpus escape hatch
      // (the bound itself is a per-token sum that can't see the
      // cross-copy disjointness)
      val n = graft.analytics.Dedup.jaccardPrefixJoin(
        docs, "doc_id", "text", threshold = 0.6,
        maxCandidates = 1000000000L).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[prefix] $label%-10s ${secs}%8.2f s  $n%10d pairs")
      (secs, n)
    }
    run(small, "warmup")
    val (a, pa) = run(small, "sf0.1")
    val (b, pb) = run(big, "x100")
    println(s"""{"metric":"prefix_scale","small_s":$a,"big_s":$b,""" +
      s""""factor":${b / a},"small_pairs":$pa,"big_pairs":$pb}""")
    spark.stop()
  }
}

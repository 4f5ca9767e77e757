package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve measurement: builds an sf1-equivalent corpus (10×
  * sf0.1) in a scratch dir and times the same gate queries at both
  * scales, reporting per-query scaling factors. A factor near 10 means
  * the plan's work is linear in the data; well above 10 flags a
  * super-linear stage (the kind of plan that dies at 100 TB).
  *
  * Corpus construction (synthetic, measurement-only — the correctness
  * gate still runs exclusively on the driver's tables):
  *  - fact tables: 10 key-shifted copies (every entity key + its
  *    foreign references shift by copy·10⁷, so join selectivities and
  *    per-key group sizes are preserved while key cardinality scales);
  *  - dimension tables (region/nation) stay fixed, like real marts;
  *  - documents: copies > 0 suffix every word with a per-copy tag, so
  *    neither a shingle NOR a token survives across copies — near-dup
  *    structure (and so pair counts) scales LINEARLY for both
  *    shingle-based (minhash/ngram) and token-multiset (simhash)
  *    operators. (An earlier interleave mutation inserted the SAME tag
  *    token after every word: shingles died but the shared
  *    high-multiplicity token dominated SimHash's bit votes, welding
  *    each copy into one giant near-dup cluster — a quadratic corpus
  *    artifact, not an engine property.);
  *  - embeddings: copies > 0 add a deterministic per-element
  *    perturbation, making each copy a fresh point cloud.
  * The quadratic-adversary case (a giant duplicate cluster) is
  * SkewBench's job, not this one.
  */
object ScaleBench {
  private val Shift = 10000000L
  private val keyCols = Set(
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
    "doc_id", "vec_id")

  def buildScaled(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    val fs = new java.io.File(dst)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem", "events",
                  "documents", "embeddings")) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val scaled = (0 until copies).map { i =>
        val shifted = base.columns.foldLeft(base) { (df, c) =>
          if (keyCols(c)) df.withColumn(c, col(c) + lit(i * Shift)) else df
        }
        val mutated =
          if (t == "documents" && i > 0)
            shifted.withColumn("text",
              array_join(transform(split(col("text"), "\\s+"),
                x => concat(x, lit(s"z$i"))), " "))
          else if (t == "embeddings" && i > 0)
            shifted.withColumn("embedding",
              transform(col("embedding"), (x, j) =>
                (x + sin((col("vec_id") * 64 + j).cast("double")) * lit(0.3))
                  .cast("float")))
          else shifted
        mutated
      }.reduce(_.unionByName(_))
      scaled.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    new java.io.File(fs, "_DONE").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = args.headOption.getOrElse("/tmp/graft_sf1")
    val copies = sys.env.getOrElse("SCALE_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalebench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"[scale] building ${copies}x corpus at $dst from $src")
    buildScaled(spark, src, dst, copies)

    // linear-work queries only: relational aggregates/joins, processor
    // chains, row-local text/multimodal, fixed-query-set ANN, exact
    // dedup, and the interleave-linearized minhash pipeline
    val names = Seq(
      "q1_pricing_summary", "q2_revenue_by_nation", "q3_top_orders",
      "q6_forecast_revenue", "q9_user_sessions",
      "proc_field_set", "proc_error_dlq", "proc_chain", "proc_filter",
      "dedup_exact", "dedup_minhash",
      "text_quality", "text_tokens", "text_fingerprint", "text_vocab",
      "sample_hash", "sample_interleave", "sample_pack",
      "sim_topk_brute", "sim_topk_ivf",
      // round-6 operators: curation chain, clustering, retrieval
      "text_normalize", "text_pii", "text_repetition", "text_classifier",
      "text_decontaminate", "sample_stratified", "dedup_segments",
      "dedup_incremental", "dedup_clusters", "text_bm25", "text_tfidf",
      // round-13 rows: flat-state sketches (expect factors WELL below
      // 10 — the state is constant-size) and the re-gated links plan
      "sketch_kll", "sketch_kll_merge", "sketch_bloom",
      "sketch_bloom_merge", "graph_links",
      // round-14: one keyed sort + map-side-combined gram count
      "seq_ngrams",
      // round-16: constant-state corpus-health rows (expect flat)
      "text_zipf", "sample_curriculum", "sample_mixture_kl")

    // SCALE_ONLY=name1,name2 restricts the probe — and may name ANY
    // gate query (the 100x spot-checks probe heavy rows like
    // graph_pagerank that the default linear-work list omits)
    val only = sys.env.get("SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only
      .map(o => graft.SparkEntry.queries.keys.toSeq.filter(o).sorted)
      .getOrElse(names)

    def run(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"[scale] $name@$dir FAILED: ${e.getMessage}"); return -1 }
      (System.nanoTime() - t0) / 1e9
    }
    // warm both scan paths before timing
    run(src, "q1_pricing_summary"); run(dst, "q1_pricing_summary")

    println(f"${"query"}%-22s ${"sf0.1"}%8s ${"x" + copies}%8s ${"factor"}%8s")
    val rows = selected.map { n =>
      val a = run(src, n)
      val b = run(dst, n)
      val f = if (a > 0 && b > 0) b / a else -1
      println(f"$n%-22s $a%8.2f $b%8.2f $f%8.1f")
      (n, a, b, f)
    }
    val js = rows.map { case (n, a, b, f) =>
      s""""$n":{"small":$a,"scaled":$b,"factor":$f}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale","copies":$copies,"queries":$js}""")
    spark.stop()
  }
}

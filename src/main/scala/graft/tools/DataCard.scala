package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{Dedup, Text}

/** Corpus data card — the datasheet a training-data team publishes
  * with a release, composed entirely from the engine's own operators:
  * size and token accounting, language mix, quality aggregates, PII
  * exposure, exact-duplicate rate, token entropy, and the Zipf fit.
  * One JSON line (machine side) + a markdown table (human side).
  *
  * Every metric is a bounded aggregate over scan-linear operators —
  * the whole card is a handful of map-side-combined passes, so it
  * runs at any SF (point it at the 100 TB corpus; nothing here
  * collects rows, only the final one-row aggregates).
  *
  * Usage: runMain graft.tools.DataCard [sfDir] [--json|--md]
  */
object DataCard {

  final case class Card(fields: Seq[(String, Any)]) {
    def json: String = fields.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v: Map[_, _]) =>
        s""""$k":{${v.toSeq.sortBy(_._1.toString).map { case (a, b) => s""""$a":$b""" }.mkString(",")}}"""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    def markdown: String = {
      val sb = new StringBuilder("# Corpus data card\n\n| metric | value |\n| --- | --- |\n")
      fields.foreach {
        case (k, v: Map[_, _]) => sb.append(s"| $k | ${v.toSeq
          .sortBy(_._1.toString)
          .map { case (a, b) => s"$a: $b" }.mkString(", ")} |\n")
        case (k, v) => sb.append(s"| $k | $v |\n")
      }
      sb.result()
    }
  }

  def build(spark: SparkSession, dir: String): Card =
    buildFrom(spark.read.parquet(s"$dir/documents.parquet"))

  /** The card over an arbitrary documents frame with (doc_id, text,
    * lang) columns — the `report.datacard` plugin's entry point, so a
    * pipeline can emit the datasheet for whatever slice reaches its
    * tail. Every metric stays a bounded one-row (or
    * strata/pair-bounded) aggregate; nothing collects documents.
    */
  def buildFrom(docs: DataFrame): Card = {

    val sizeRow = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(Text.wsTokens(col("text")))).cast("long").as("n_tokens"),
      sum(length(col("text"))).cast("long").as("n_chars")).head()

    val langMix = docs
      .groupBy(col("lang"))
      .agg(sum(size(Text.wsTokens(col("text")))).cast("long").as("tk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val q = Text.qualityScore(docs, "doc_id", "text")
      .agg(round(avg(col("mean_token_len")), 4).as("mean_token_len"),
        round(avg(col("stopword_ratio")), 4).as("stopword_ratio"),
        round(avg(col("punct_ratio")), 4).as("punct_ratio")).head()

    val piiAggs = Text.piiCounts(col("text")).map { case (n, c) =>
      sum(c).cast("long").as(n) }
    val pii = docs.agg(piiAggs.head, piiAggs.tail: _*).head()

    val nDocs = sizeRow.getLong(0)
    val distinctTexts = Dedup.exact(docs, "doc_id", "text").count()

    val ent = Text.tokenEntropy(docs, "doc_id", "text")
      .agg(round(avg(col("entropy")), 4)).head().getDouble(0)

    // Gopher rule pass rates at the paper thresholds — the datasheet
    // reader's first look at how much a canonical heuristic gate
    // would cut (tuning the thresholds is the pipeline's job)
    val gop = Text.gopherRules(docs, "doc_id", "text")
      .agg(round(avg(col("keep").cast("double")), 4),
        round(avg(col("pass_words").cast("double")), 4),
        round(avg(col("pass_stop").cast("double")), 4)).head()

    // C4 line/page pass rates at the released defaults — the
    // line-first gate next to Gopher's page-first one
    val c4 = Text.c4Rules(docs, "doc_id", "text")
      .agg(round(avg(col("keep").cast("double")), 4),
        round(avg(col("n_kept_lines").cast("double") /
          greatest(col("n_lines"), lit(1L)).cast("double")), 4)).head()

    // FineWeb line-shape pass rates at the paper thresholds — the
    // post-C4/Gopher shape gate (Penedo et al. 2024 §3.6)
    val fw = Text.finewebRules(docs, "doc_id", "text")
      .agg(round(avg(col("keep").cast("double")), 4),
        round(avg(col("dup_line_char_frac")), 4)).head()

    val zipf = Text.zipfFit(docs, "text", minCount = 2, topN = 4096).head()

    // Heaps' law growth: β near 0.5 is natural text; near 1 the
    // corpus keeps minting new types (noise), near 0 it stopped
    // growing (template spam). Also the 10×-the-data vocab forecast.
    val heaps = Text.heapsFit(docs, "doc_id", "text").head()

    // language-pair divergence — the mixture-design signal: how far
    // each slice pair is from interchangeable (0 = identical unigram
    // mass, ln 2 ≈ 0.693 = disjoint vocabularies)
    val jsd = Text.jsDivergence(docs, "lang", "text")
      .select(concat_ws("|", col("stratum_a"), col("stratum_b")).as("k"),
        round(col("jsd"), 4).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    Card(Seq(
      "n_docs" -> nDocs,
      "n_tokens" -> sizeRow.getLong(1),
      "n_chars" -> sizeRow.getLong(2),
      "lang_tokens" -> langMix,
      "mean_token_len" -> q.getDouble(0),
      "stopword_ratio" -> q.getDouble(1),
      "punct_ratio" -> q.getDouble(2),
      "pii_emails" -> pii.getLong(0),
      "pii_ips" -> pii.getLong(1),
      "pii_phones" -> pii.getLong(2),
      "exact_dup_rate" ->
        math.rint((1.0 - distinctTexts.toDouble / nDocs) * 1e6) / 1e6,
      "mean_token_entropy" -> ent,
      "gopher_keep_rate" -> gop.getDouble(0),
      "gopher_pass_words_rate" -> gop.getDouble(1),
      "gopher_pass_stop_rate" -> gop.getDouble(2),
      "c4_keep_rate" -> c4.getDouble(0),
      "c4_kept_line_rate" -> c4.getDouble(1),
      "fineweb_keep_rate" -> fw.getDouble(0),
      "fineweb_dup_line_char_frac" -> fw.getDouble(1),
      "zipf_n_types" -> zipf.getLong(0),
      "zipf_slope" -> zipf.getDouble(1),
      "zipf_intercept" -> zipf.getDouble(2),
      "heaps_beta" -> heaps.getAs[Double]("beta"),
      "heaps_log10_k" -> heaps.getAs[Double]("log10_k"),
      "lang_jsd" -> jsd))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.find(!_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-datacard")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val card = build(spark, dir)
    if (!args.contains("--json")) println(card.markdown)
    println(card.json)
    spark.stop()
  }
}

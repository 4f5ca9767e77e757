package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Cdc

/** The full Spark relational surface exposed as a processor (SURVEY §7
  * step 6): the micro-batch registers as a temp view and an arbitrary
  * Spark SQL statement reshapes it — joins, aggregations, windows,
  * anything Catalyst can plan. The result must keep the CDC schema
  * (use `*` or explicit CDC columns); Catalyst does all the work.
  *
  * Settings: `query` (refers to the view `records`), optional
  * `view` name override.
  */
case class SqlProc(query: String, view: String = "records") extends Processor {
  val plugin = "sql"
  override def transform(df: DataFrame): DataFrame = {
    // register under the user-visible name verbatim — rewriting the SQL
    // text would corrupt identifiers/literals containing the view name
    df.createOrReplaceTempView(view)
    df.sparkSession.sql(query)
  }
}

/** Exact dedup as a pipeline processor: drops records whose content
  * digest (payload_after by default, or a field ref) repeats within
  * the batch, keeping the first by key order. The streaming analogue
  * with watermark-bounded state lives in
  * [[graft.streaming.StreamingOps.dedupStream]].
  */
case class DedupExact(field: Option[graft.model.Ref]) extends Processor {
  val plugin = "dedup.exact"
  override def transform(df: DataFrame): DataFrame = {
    val content = field.map(RefCols.get).getOrElse(col(Cdc.PayloadAfter))
    // deterministic survivor: smallest key within each digest group
    // (dropDuplicates keeps an arbitrary partition-order winner)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_digest"))
      .orderBy(col(Cdc.Key).asc_nulls_last, col(Cdc.Operation).asc_nulls_last)
    df.withColumn("_digest", sha2(coalesce(content, lit("")), 256))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_digest", "_rn")
  }
}

/** Deterministic record sampling as a pipeline processor: keeps
  * ≈`fraction` of records (4096-bucket granularity) by the hash of a
  * field (default: the record key) — the SAME records every run, on
  * any partitioning, unlike `rand()`-based sampling. The pipeline form
  * of [[graft.analytics.Sampling.hashSample]]: data-mix construction
  * at ingest (sample a noisy source down before it hits storage).
  */
case class SampleHash(field: Option[graft.model.Ref], fraction: Double,
                      seed: Long) extends Processor {
  require(fraction >= 0 && fraction <= 1, "sample.hash: fraction in [0,1]")
  val plugin = "sample.hash"
  override def transform(df: DataFrame): DataFrame = {
    val content = field.map(RefCols.get).getOrElse(col(Cdc.Key))
    val cut = math.floor(fraction * 4096).toLong
    val bucket = shiftrightunsigned(
      graft.analytics.HashFunctions.splitmix64_hash(
        xxhash64(coalesce(content, lit("")), lit(seed))), 12)
      .bitwiseAND(lit(4095L))
    df.filter(bucket < lit(cut))
  }
}

/** Text metrics as a pipeline processor: token/char counts and quality
  * ratios computed from a payload text field, written back into the
  * payload (the processor form of [[graft.analytics.Text]]).
  */
case class TextMetrics(field: graft.model.Ref) extends ColumnProcessor {
  val plugin = "text.metrics"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(field)
    val text = RefCols.get(field)
    val tokens = size(split(trim(text), "\\s+")).cast("string")
    val chars = length(text).cast("string")
    val metrics = to_json(struct(
      length(text).cast("long").as("n_chars"),
      size(split(trim(text), "\\s+")).cast("long").as("n_tokens"),
      graft.analytics.HashFunctions.rolling_fingerprint(
        concat_ws(" ", split(lower(trim(text)), "\\s+"))).as("fingerprint")))
    Map(slot -> graft.functions.JsonExpressions.jsonSet(
      col(slot), Seq("text_metrics"), metrics, rawJson = true))
  }
}

/** Quality gate as a pipeline processor: drops records whose payload
  * text fails the length/shape thresholds (the ingest-time form of
  * [[graft.analytics.Text.qualityScore]] + filter — cut junk before it
  * hits storage). Row-local; the predicate runs inside the scan's
  * codegen stage.
  */
case class QualityFilter(field: graft.model.Ref, minTokens: Long,
                         minMeanTokenLen: Double, maxMeanTokenLen: Double)
    extends Processor {
  val plugin = "quality.filter"
  override def transform(df: DataFrame): DataFrame = {
    val text = RefCols.get(field)
    val n = size(split(trim(text), "\\s+")).cast("long")
    val mtl = length(text).cast("double") / n.cast("double")
    df.filter(n >= minTokens &&
      mtl >= minMeanTokenLen && mtl <= maxMeanTokenLen)
  }
}

/** Overlapping token-window chunking as a pipeline processor: each
  * record fans out into one record per chunk (the pipeline form of
  * [[graft.analytics.Text.chunk]] — RAG/window prep at ingest). The
  * chunk text replaces the referenced field; `chunk.index` lands in
  * metadata (the `split.index` convention). Tokenization happens once
  * below the posexplode barrier; no shuffle.
  */
case class TextChunk(field: graft.model.Ref, chunkTokens: Int, overlap: Int)
    extends Processor {
  require(overlap < chunkTokens, "text.chunk: overlap must be < chunkTokens")
  val plugin = "text.chunk"
  override def transform(df: DataFrame): DataFrame = {
    val slot = RefCols.column(field)
    val stride = chunkTokens - overlap
    val chunkText = concat_ws(" ",
      slice(col("_toks"), col("_start") + 1, lit(chunkTokens)))
    val exploded = df
      .withColumn("_toks", split(trim(RefCols.get(field)), "\\s+"))
      .select(col("*"), posexplode(
          sequence(lit(0), size(col("_toks")) - 1, lit(stride)))
        .as(Seq("_chunk_idx", "_start")))
    val written = df.schema(slot).dataType match {
      case st: org.apache.spark.sql.types.StructType =>
        exploded.withColumn(slot,
          StructOps.set(col(slot), st, field.sub, chunkText))
      case _ =>
        exploded.withColumn(slot, graft.functions.JsonExpressions.jsonSet(
          col(slot), field.sub, chunkText))
    }
    written
      .withColumn(Cdc.Metadata,
        RefCols.metaSet(col(Cdc.Metadata), "chunk.index",
          col("_chunk_idx").cast(org.apache.spark.sql.types.StringType)))
      .drop("_toks", "_chunk_idx", "_start")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.{Cdc, Ref}

/** The round-8 analytics families (graph, SCD2, privacy, layout)
  * exposed on the pipeline/registry surface, so YAML/DSL users reach
  * them with `Map[String,String]` settings and no Scala — the same
  * promotion [[SqlProc]]/[[DedupExact]] gave the earlier families.
  *
  * Two shapes:
  *  - record-local annotators (`privacy.pseudonymize`, `layout.key`,
  *    `cdc.scd2`) keep the CDC schema and rewrite columns in place —
  *    they compose mid-chain like any field processor;
  *  - batch reshapes (`privacy.kanon`, `privacy.noise`,
  *    `graph.pagerank`, `graph.links`) compute an analytic table from
  *    payload fields and re-enter the CDC surface via [[Cdc.wrap]]
  *    (every result row becomes a create record), the [[SqlProc]]
  *    convention for aggregate outputs.
  */
object Analytics2Ops {

  /** Read a payload field as a string column, typed or JSON slot. */
  private[ops] def fieldCol(df: DataFrame, ref: Ref): Column = {
    val slot = RefCols.column(ref)
    df.schema(slot).dataType match {
      case _: StructType =>
        StructOps.get(col(slot), ref.sub).cast("string")
      case _ => RefCols.get(ref)
    }
  }

  /** ANSI-safe numeric read: non-numeric strings become null instead
    * of a runtime cast error. */
  private[ops] def asLong(c: Column): Column =
    when(c.rlike("^-?[0-9]{1,18}$"), c.cast("long"))
}

/** `privacy.pseudonymize` — keyed pseudonymization of payload id
  * fields in place (the pipeline form of
  * [[graft.analytics.Privacy.pseudonymize]]): each named field is
  * replaced by splitmix64(fnv1a(value) + secret) rendered as a
  * string. Deterministic within a release (joins still work),
  * unlinkable without the secret; rotate the secret per release.
  * Row-local, codegen'd, no shuffle.
  */
case class PseudonymizeProc(fields: Seq[Ref], secret: Long) extends Processor {
  require(fields.nonEmpty, "privacy.pseudonymize: need fields")
  val plugin = "privacy.pseudonymize"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.{fnv1a_hash, splitmix64_hash}
    fields.foldLeft(df) { (d, ref) =>
      val slot = RefCols.column(ref)
      val v = splitmix64_hash(
        fnv1a_hash(Analytics2Ops.fieldCol(d, ref).cast("string")) +
          lit(secret)).cast("string")
      d.schema(slot).dataType match {
        case st: StructType =>
          d.withColumn(slot, StructOps.set(col(slot), st, ref.sub, v))
        case _ =>
          d.withColumn(slot, graft.functions.JsonExpressions.jsonSet(
            col(slot), ref.sub, v))
      }
    }
  }
}

/** `layout.key` — annotate each record with a space-filling-curve
  * sort key over numeric payload fields (metadata `layout.key`), so a
  * downstream sink can range-sort/cluster files for min/max skipping
  * (the ingest-time form of [[graft.analytics.Layout]]). `kind` =
  * `zorder` (N fields) or `hilbert` (2 fields, better locality).
  * Row-local bit interleaving, no shuffle; the SORT is the sink's
  * choice, the key is cheap to carry.
  */
case class LayoutKeyProc(fields: Seq[Ref], bits: Int, kind: String)
    extends ColumnProcessor {
  require(fields.size >= 2, "layout.key: need >= 2 fields")
  require(kind == "zorder" || kind == "hilbert",
    s"layout.key: kind must be zorder|hilbert, got $kind")
  require(kind != "hilbert" || fields.size == 2,
    "layout.key: hilbert is 2-D")
  val plugin = "layout.key"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    def num(r: Ref): Column =
      Analytics2Ops.asLong(Analytics2Ops.fieldCol(df, r))
    val key =
      if (kind == "hilbert")
        graft.analytics.Layout.hilbertKey(num(fields(0)), num(fields(1)), bits)
      else graft.analytics.Layout.zorderKey(fields.map(num), bits)
    Map(Cdc.Metadata -> RefCols.metaSet(col(Cdc.Metadata), "layout.key",
      key.cast("string")))
  }
}

/** `cdc.scd2` — in-stream SCD2 versioning: each record gains
  * `scd2.valid_from` / `scd2.valid_to` / `scd2.is_current` metadata
  * derived from its key's position order within the batch, and
  * deletes close their predecessor's interval then drop (the
  * processor form of [[graft.model.Cdc.scd2]]; pair with the
  * [[graft.streaming.StreamingOps.scd2Sink]] for cross-batch
  * history). `order.field` overrides the default numeric-position
  * order for sources whose positions don't sort numerically.
  */
case class Scd2Proc(orderRef: Option[Ref], deleteOp: String) extends Processor {
  val plugin = "cdc.scd2"
  override def transform(df: DataFrame): DataFrame = {
    val ord = orderRef
      .map(r => Analytics2Ops.asLong(Analytics2Ops.fieldCol(df, r)))
      .getOrElse(Analytics2Ops.asLong(col(Cdc.Position).cast("string")))
    val tie = col(Cdc.Position).cast("string")
    val w = Window.partitionBy(col(Cdc.Key)).orderBy(ord.asc, tie.asc)
    val meta = col(Cdc.Metadata)
    df.withColumn("_vf", ord)
      .withColumn("_vt", lead(col("_vf"), 1).over(w))
      .filter(col(Cdc.Operation) =!= lit(deleteOp))
      .withColumn(Cdc.Metadata,
        RefCols.metaSet(
          RefCols.metaSet(
            RefCols.metaSet(meta, "scd2.valid_from",
              coalesce(col("_vf").cast("string"), lit(""))),
            "scd2.valid_to",
            coalesce(col("_vt").cast("string"), lit(""))),
          "scd2.is_current", (col("_vt").isNull).cast("string")))
      .drop("_vf", "_vt")
  }
}

/** `privacy.kanon` — k-anonymity generalization ladder over payload
  * quasi-identifiers ([[graft.analytics.Privacy.kAnonymize]]): the
  * batch reshapes into one create record per surviving group (level,
  * generalized QIs, count), keyed by the generalized tuple. An
  * aggregate output, so it re-enters the CDC surface via
  * [[Cdc.wrap]] — run it as the last processor before a sink.
  */
case class KAnonProc(fields: Seq[Ref], minK: Long) extends Processor {
  require(fields.nonEmpty, "privacy.kanon: need fields")
  val plugin = "privacy.kanon"
  override def transform(df: DataFrame): DataFrame = {
    val names = fields.map(r => r.sub.lastOption.getOrElse("field"))
    val flat = df.select(fields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) }: _*)
    val out = graft.analytics.Privacy.kAnonymize(flat, names, minK)
    val keyed = out.withColumn("_k",
      concat_ws("|", (col("level") +: names.map(col)): _*))
    Cdc.wrap(keyed, "_k", "privacy.kanon")
  }
}

/** `privacy.noise` — seeded Laplace-mechanism noisy counts per
  * payload group ([[graft.analytics.Privacy.noisyCount]]): one create
  * record per group with (n, noise, noisy_n), keyed by the group
  * tuple. Aggregate output via [[Cdc.wrap]].
  */
case class NoisyCountProc(fields: Seq[Ref], epsilon: Double, seed: Long)
    extends Processor {
  require(fields.nonEmpty, "privacy.noise: need fields")
  val plugin = "privacy.noise"
  override def transform(df: DataFrame): DataFrame = {
    val names = fields.map(r => r.sub.lastOption.getOrElse("field"))
    val flat = df.select(fields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) }: _*)
    val out = graft.analytics.Privacy.noisyCount(flat, names, epsilon, seed)
    val keyed = out.withColumn("_k", concat_ws("|", names.map(col): _*))
    Cdc.wrap(keyed, "_k", "privacy.noise")
  }
}

/** `graph.pagerank` — PageRank over an edge stream: each record
  * supplies one (src, dst) edge from payload fields; the batch
  * reshapes into one create record per node with its rank
  * ([[graft.analytics.Graph.pageRank]], production mode, lazy tail —
  * no spill dir needed inside a pipeline). Aggregate output via
  * [[Cdc.wrap]].
  */
/** Per-batch cache hygiene for the iterative graph processors: the
  * lazy (`eager=false`) tails keep their final round's frames
  * persisted so the sink write doesn't recompute the loop — but in a
  * recurring pipeline each batch would strand those frames in the
  * CacheManager forever. Batch n's fences are released when batch n+1
  * arrives (n's sink write has materialized and consumed them by
  * then); a one-shot call retains at most one batch's worth, bounded.
  */
trait BatchFenceRelease {
  @transient private var lastFences: Seq[DataFrame] = Nil
  /** Release the previous batch's frames; returns the registrar to
    * pass as `onFences`.
    */
  protected def rotateFences(): Seq[DataFrame] => Unit = {
    lastFences.foreach(_.unpersist(false))
    lastFences = Nil
    f => lastFences = f
  }
}

case class PageRankProc(src: Ref, dst: Ref, iterations: Int,
                        damping: Double) extends Processor with BatchFenceRelease {
  val plugin = "graph.pagerank"
  override def transform(df: DataFrame): DataFrame = {
    val edges = df.select(Analytics2Ops.fieldCol(df, src).as("_src"),
        Analytics2Ops.fieldCol(df, dst).as("_dst"))
      .filter(col("_src").isNotNull && col("_dst").isNotNull)
    val ranks = graft.analytics.Graph.pageRank(edges, "_src", "_dst",
      iterations, damping, eager = false, onFences = rotateFences())
    Cdc.wrap(ranks, "node", "graph.pagerank")
  }
}

/** `dq.validate` — the declarative data-quality suite
  * ([[graft.analytics.DataQuality.validate]]) on the config surface:
  * `checks` is a `;`-separated list of `type:field[:args]` specs —
  * `not_null:REF[:maxFrac]`, `in_range:REF:lo:hi`,
  * `values_in:REF:a|b|c`, `unique:REF[+REF…]`,
  * `distinct_between:REF:lo:hi`. The batch reshapes into one create
  * record per verdict via [[Cdc.wrap]] — the contract gate a YAML
  * pipeline puts right before its sink.
  */
case class DqValidateProc(specs: Seq[String]) extends Processor {
  require(specs.nonEmpty, "dq.validate: need checks")
  val plugin = "dq.validate"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.DataQuality._
    // flatten every referenced field once, named by its spec position
    val parsed = specs.zipWithIndex.map { case (s, i) =>
      val parts = s.split(":").toSeq.map(_.trim)
      (parts.head, parts.tail, s"c$i")
    }
    // collision-free flattened names: one f_<index> per DISTINCT Ref
    // (a readable "f_" + sub.mkString("_") scheme collides — e.g.
    // refs ["a","b"] vs ["a_b"] — and would silently validate the
    // wrong field; the check_id in the output is the user-facing name)
    val refsByName = scala.collection.mutable.LinkedHashMap.empty[String, Ref]
    val nameByRef = scala.collection.mutable.LinkedHashMap.empty[Ref, String]
    def colName(refStr: String): String = {
      val r = Ref.parse(refStr)
      val n = nameByRef.getOrElseUpdate(r, s"f_${nameByRef.size}")
      refsByName.getOrElseUpdate(n, r)
      n
    }
    val checks = parsed.map {
      case ("not_null", args, id) =>
        NotNull(id, colName(args.head),
          args.lift(1).map(_.toDouble).getOrElse(0.0))
      case ("in_range", args, id) =>
        InRange(id, colName(args.head), args(1).toDouble, args(2).toDouble)
      case ("values_in", args, id) =>
        ValuesIn(id, colName(args.head), args(1).split("\\|").toSeq)
      case ("unique", args, id) =>
        Unique(id, args.head.split("\\+").toSeq.map(colName))
      case ("distinct_between", args, id) =>
        DistinctCountBetween(id, colName(args.head),
          args(1).toLong, args(2).toLong)
      case (other, _, _) =>
        throw new IllegalArgumentException(s"dq.validate: unknown check $other")
    }
    val flat = df.select(refsByName.toSeq.map { case (n, r) =>
      Analytics2Ops.fieldCol(df, r).as(n) }: _*)
    val out = validate(flat, checks)
    Cdc.wrap(out, "check_id", "dq.validate")
  }
}

/** `text.scripts` — script-composition annotation
  * ([[graft.analytics.Text.scriptProfile]]'s row-local core) written
  * into metadata: `script.dominant` and `script.latin_frac` — the
  * ingest-time wrong-script gate (pair with a `filter` condition on
  * the metadata key).
  */
case class TextScriptsProc(field: Ref) extends ColumnProcessor {
  val plugin = "text.scripts"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val t = Analytics2Ops.fieldCol(df, field)
    val n = length(t)
    def cnt(re: String) = regexp_count(t, lit(re))
    val latin = cnt("[A-Za-z]")
    val digit = cnt("[0-9]")
    val cyr = cnt("[Ѐ-ӿ]")
    val cjk = cnt("[一-鿿]")
    val ws = cnt("[ \\t\\n\\x0B\\f\\r]")
    val other = n - latin - digit - cyr - cjk - ws
    val dominant = greatest(
      struct(latin.as("_c"), lit("latin").as("_l")),
      struct(digit.as("_c"), lit("digit").as("_l")),
      struct(cyr.as("_c"), lit("cyrillic").as("_l")),
      struct(cjk.as("_c"), lit("cjk").as("_l")),
      struct(other.as("_c"), lit("other").as("_l"))).getField("_l")
    val frac = when(n > 0,
      latin.cast("double") / n.cast("double")).otherwise(lit(null))
    Map(Cdc.Metadata -> RefCols.metaSet(
      RefCols.metaSet(col(Cdc.Metadata), "script.dominant", dominant),
      "script.latin_frac", frac.cast("string")))
  }
}

/** `sketch.kmv` — KMV distinct-count sketch per payload group
  * ([[graft.analytics.Sketch.kmvState]] + `kmvEstimate`): one create
  * record per group with (n_state, estimate), keyed by the group
  * tuple. Aggregate output via [[Cdc.wrap]] — the config-surface
  * cardinality monitor a YAML pipeline puts before its sink.
  */
case class KmvProc(groupFields: Seq[Ref], valueField: Ref, k: Int,
                   seed: Long) extends Processor {
  require(groupFields.nonEmpty, "sketch.kmv: need groups")
  val plugin = "sketch.kmv"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.fnv1a_hash
    val names = groupFields.map(r => r.sub.lastOption.getOrElse("group"))
    // payload fields arrive as strings: pre-hash to a long (fnv1a,
    // injective w.h.p.) since the KMV chain hashes numerically
    val flat = df.select(groupFields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) } :+
      fnv1a_hash(Analytics2Ops.fieldCol(df, valueField).cast("string"))
        .as("_value"): _*)
    val st = graft.analytics.Sketch.kmvState(flat, names, "_value", k, seed)
    val out = graft.analytics.Sketch.kmvEstimate(st, names, k)
    val keyed = out.withColumn("_k", concat_ws("|", names.map(col): _*))
    Cdc.wrap(keyed, "_k", "sketch.kmv")
  }
}

/** `graph.hits` — HITS hubs-and-authorities over an edge stream
  * ([[graft.analytics.Graph.hits]], production mode, lazy tail — no
  * spill dir needed inside a pipeline): one create record per node
  * with (authority, hub). Aggregate output via [[Cdc.wrap]].
  */
case class HitsProc(src: Ref, dst: Ref, iterations: Int)
    extends Processor with BatchFenceRelease {
  val plugin = "graph.hits"
  override def transform(df: DataFrame): DataFrame = {
    val edges = df.select(Analytics2Ops.fieldCol(df, src).as("_src"),
        Analytics2Ops.fieldCol(df, dst).as("_dst"))
      .filter(col("_src").isNotNull && col("_dst").isNotNull)
    val out = graft.analytics.Graph.hits(edges, "_src", "_dst",
      iterations, eager = false, onFences = rotateFences())
    Cdc.wrap(out, "node", "graph.hits")
  }
}

/** `graph.kcore` — k-core membership over an edge stream
  * ([[graft.analytics.Graph.kCore]], bounded peel, lazy tail): one
  * create record per surviving node with its within-core degree.
  * Aggregate output via [[Cdc.wrap]].
  */
case class KCoreProc(src: Ref, dst: Ref, k: Int, maxRounds: Int)
    extends Processor with BatchFenceRelease {
  val plugin = "graph.kcore"
  override def transform(df: DataFrame): DataFrame = {
    val edges = df.select(Analytics2Ops.fieldCol(df, src).as("_src"),
        Analytics2Ops.fieldCol(df, dst).as("_dst"))
      .filter(col("_src").isNotNull && col("_dst").isNotNull)
    val out = graft.analytics.Graph.kCore(edges, "_src", "_dst",
      k, maxRounds, eager = false, onFences = rotateFences())
    Cdc.wrap(out, "node", "graph.kcore")
  }
}

/** `linkage.score` — Fellegi–Sunter self-linkage over the batch
  * ([[graft.analytics.Linkage.linkageScore]], `maxBlock`-capped
  * blocked join): `fields` is a `;`-separated list of `REF:m:u`
  * comparisons; one create record per surviving pair with
  * (n_agree, score), keyed by the pair. Aggregate output via
  * [[Cdc.wrap]].
  */
case class LinkageScoreProc(idField: Ref, blockField: Ref,
                            fields: Seq[(Ref, Double, Double)],
                            minScore: Double, maxBlock: Int)
    extends Processor {
  require(fields.nonEmpty, "linkage.score: need fields")
  val plugin = "linkage.score"
  override def transform(df: DataFrame): DataFrame = {
    val names = fields.indices.map(i => s"f_$i")
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id") +:
      Analytics2Ops.fieldCol(df, blockField).as("_block") +:
      fields.zip(names).map { case ((r, _, _), n) =>
        Analytics2Ops.fieldCol(df, r).as(n) }: _*)
    val scored = graft.analytics.Linkage.linkageScore(flat, flat,
      "_id", "_id", "_block",
      names.zip(fields).map { case (n, (_, m, u)) => (n, m, u) },
      minScore, selfPairs = true, maxBlock = maxBlock)
    val keyed = scored.withColumn("_k",
      concat_ws("|", col("id_a"), col("id_b")))
    Cdc.wrap(keyed, "_k", "linkage.score")
  }
}

/** `retrieval.keywords` — per-document TF-IDF keyword extraction
  * ([[graft.analytics.Retrieval.keywords]]): one create record per
  * (doc, rank) with the term and its weight, keyed by the pair.
  * Aggregate output via [[Cdc.wrap]].
  */
case class KeywordsProc(idField: Ref, textField: Ref, k: Int,
                        minDf: Long) extends Processor {
  val plugin = "retrieval.keywords"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_doc"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val out = graft.analytics.Retrieval.keywords(flat, "_doc", "_text",
      k, minDf)
    val keyed = out.withColumn("_k",
      concat_ws("|", col("doc_id"), col("kw_rank")))
    Cdc.wrap(keyed, "_k", "retrieval.keywords")
  }
}

/** `joins.skyline` — 2-D Pareto frontier over numeric payload fields
  * ([[graft.analytics.Joins.skyline2D]], the n log n class-max /
  * prefix-max shape): one create record per non-dominated row,
  * keyed by the (group, x, y) tuple. Aggregate output via
  * [[Cdc.wrap]].
  */
case class SkylineProc(groupFields: Seq[Ref], xField: Ref, yField: Ref)
    extends Processor {
  val plugin = "joins.skyline"
  override def transform(df: DataFrame): DataFrame = {
    val names = groupFields.map(r => r.sub.lastOption.getOrElse("group"))
    val flat = df.select(groupFields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) } ++ Seq(
      Analytics2Ops.asLong(Analytics2Ops.fieldCol(df, xField)).as("_x"),
      Analytics2Ops.asLong(Analytics2Ops.fieldCol(df, yField)).as("_y")): _*)
    val out = graft.analytics.Joins.skyline2D(flat, names, "_x", "_y")
    val keyed = out.withColumn("_k",
      concat_ws("|", (names.map(col) ++ Seq(col("_x"), col("_y"))): _*))
    Cdc.wrap(keyed, "_k", "joins.skyline")
  }
}

/** `dq.reconcile` — row-level reconciliation of the batch against a
  * REFERENCE parquet snapshot ([[graft.analytics.DataQuality
  * .reconcile]]): one create record per key with (status,
  * mismatch_cols) — the CDC convergence gate a YAML pipeline puts
  * after a sink it wants to audit. `table` is the reference path;
  * key/compare fields address the record payload, and the reference
  * columns are matched by each field's LAST path segment.
  */
case class ReconcileProc(keyFields: Seq[Ref], compareFields: Seq[Ref],
                         table: String) extends Processor {
  require(keyFields.nonEmpty && compareFields.nonEmpty,
    "dq.reconcile: need key and compare fields")
  val plugin = "dq.reconcile"
  override def transform(df: DataFrame): DataFrame = {
    def names(rs: Seq[Ref]) = rs.map(r => r.sub.lastOption.getOrElse("f"))
    val kn = names(keyFields); val cn = names(compareFields)
    val flat = df.select((keyFields ++ compareFields)
      .zip(kn ++ cn).map { case (r, n) =>
        Analytics2Ops.fieldCol(df, r).as(n) }: _*)
    val ref = df.sparkSession.read.parquet(table)
      .select((kn ++ cn).map(n => col(n).cast("string").as(n)): _*)
    val out = graft.analytics.DataQuality.reconcile(flat, ref, kn, cn)
    val keyed = out.withColumn("_k", concat_ws("|", kn.map(col): _*))
    Cdc.wrap(keyed, "_k", "dq.reconcile")
  }
}

/** `sample.fixed` — deterministic fixed-SIZE sampling: keep exactly
  * min(k, |group|) records per payload group by the seeded hash
  * order of the id field ([[graft.analytics.Sampling
  * .fixedSizeSample]]). A true FILTER — the CDC schema passes
  * through untouched, so it composes mid-chain like `sample.hash`,
  * but with a count guarantee a fraction cannot give.
  */
case class SampleFixedProc(groupFields: Seq[Ref], idField: Ref,
                           k: Int, seed: Long) extends Processor {
  require(groupFields.nonEmpty, "sample.fixed: need groups")
  val plugin = "sample.fixed"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.{fnv1a_hash, splitmix64_hash}
    // the fixedSizeSample rank inline on the CDC frame (string ids
    // hash through fnv1a, the KmvProc idiom) — no self-join, so it
    // works for sources whose positions are absent (wrapped batches)
    val id = Analytics2Ops.fieldCol(df, idField).cast("string")
    val h = splitmix64_hash(fnv1a_hash(id) + lit(seed))
    val w = Window
      .partitionBy(groupFields.map(r => Analytics2Ops.fieldCol(df, r)): _*)
      .orderBy(h, id)
    df.withColumn("_sfr", row_number().over(w))
      .filter(col("_sfr") <= k)
      .drop("_sfr")
  }
}

/** `text.hashing` — signed hashing-trick features per record
  * ([[graft.analytics.Text.hashingTrick]]): the batch reshapes into
  * one create record per non-zero (doc, bucket) with the signed
  * count. Aggregate output via [[Cdc.wrap]].
  */
case class HashingProc(idField: Ref, textField: Ref, dim: Int)
    extends Processor {
  val plugin = "text.hashing"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_doc"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val out = graft.analytics.Text.hashingTrick(flat, "_doc", "_text", dim)
    val keyed = out.withColumn("_k",
      concat_ws("|", col("doc_id"), col("bucket")))
    Cdc.wrap(keyed, "_k", "text.hashing")
  }
}

/** `graph.links` — common-neighbor link prediction over an edge
  * stream ([[graft.analytics.Graph.jaccardLinks]], hub-capped wedge
  * join): one create record per predicted pair above the Jaccard
  * threshold, keyed by the pair. Aggregate output via [[Cdc.wrap]].
  */
case class LinkPredictProc(src: Ref, dst: Ref, minJaccard: Double,
                           maxDegree: Int) extends Processor {
  val plugin = "graph.links"
  override def transform(df: DataFrame): DataFrame = {
    val edges = df.select(Analytics2Ops.fieldCol(df, src).as("_src"),
        Analytics2Ops.fieldCol(df, dst).as("_dst"))
      .filter(col("_src").isNotNull && col("_dst").isNotNull)
    val links = graft.analytics.Graph.jaccardLinks(edges, "_src", "_dst",
      minJaccard, maxDegree)
    val keyed = links.withColumn("_k",
      concat_ws("|", col("node_a"), col("node_b")))
    Cdc.wrap(keyed, "_k", "graph.links")
  }
}

/** `linkage.jw` — Jaro–Winkler fuzzy self-linkage over the batch
  * ([[graft.analytics.Linkage.fuzzyLinks]], `maxBlock`-capped blocked
  * join; kernel bit-matches DuckDB's rapidfuzz implementation): one
  * create record per pair at or above `minSim`, keyed by the pair.
  * Aggregate output via [[Cdc.wrap]].
  */
case class FuzzyLinksProc(idField: Ref, blockField: Ref, textField: Ref,
                          minSim: Double, maxBlock: Int)
    extends Processor {
  val plugin = "linkage.jw"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, blockField).as("_block"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val out = graft.analytics.Linkage.fuzzyLinks(flat, flat,
      "_id", "_id", "_block", "_text", minSim,
      selfPairs = true, maxBlock = maxBlock)
    val keyed = out.withColumn("_k",
      concat_ws("|", col("id_a"), col("id_b")))
    Cdc.wrap(keyed, "_k", "linkage.jw")
  }
}

/** `seq.ngrams` — frequent sequential n-grams of each entity's
  * time-ordered stream ([[graft.analytics.Sequences.frequentNgrams]]):
  * one create record per surviving gram with its support, keyed by
  * the gram. Aggregate output via [[Cdc.wrap]].
  */
case class SeqNgramsProc(entityField: Ref, orderField: Ref, tieField: Ref,
                         stateField: Ref, n: Int, minSupport: Long)
    extends Processor {
  val plugin = "seq.ngrams"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, entityField).as("_e"),
      Analytics2Ops.fieldCol(df, orderField).cast("long").as("_ord"),
      Analytics2Ops.fieldCol(df, tieField).as("_tie"),
      Analytics2Ops.fieldCol(df, stateField).as("_st"))
    val out = graft.analytics.Sequences.frequentNgrams(flat, Seq("_e"),
      col("_ord"), col("_tie"), col("_st"), n, minSupport)
    Cdc.wrap(out, "gram", "seq.ngrams")
  }
}

/** `sketch.bloom` — distributed Bloom word table over a payload field
  * ([[graft.analytics.Sketch.bloomWords]]; values pre-hashed through
  * fnv1a like the KMV promotion since payload fields arrive as
  * strings): one create record per set word, keyed by word_idx — the
  * mergeable membership state a YAML pipeline writes next to its
  * sink for cross-run "seen before?" probes. Aggregate output via
  * [[Cdc.wrap]].
  */
case class BloomProc(valueField: Ref, mBits: Int, kHashes: Int,
                     seed: Long) extends Processor {
  val plugin = "sketch.bloom"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.fnv1a_hash
    val flat = df.select(
      fnv1a_hash(Analytics2Ops.fieldCol(df, valueField).cast("string"))
        .as("_value"))
    val out = graft.analytics.Sketch.bloomWords(flat, "_value",
      mBits, kHashes, seed)
    Cdc.wrap(out, "word_idx", "sketch.bloom")
  }
}

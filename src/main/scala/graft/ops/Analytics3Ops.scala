package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructType}

import graft.model.{Cdc, Ref}

/** Round-14 registry promotions: the highest-value LLM-data-pipeline
  * families (near-dup detection, semantic dedup, similarity search,
  * text curation, sampling, sketches, outlier screens) exposed on the
  * pipeline/YAML surface with pure `Map[String,String]` settings — the
  * same first-class treatment the reference gives every builtin
  * (`pkg/plugin/processor/builtin/registry.go`); an operator only a
  * Scala caller can reach is not a product feature.
  *
  * The [[Analytics2Ops]] shape conventions carry over:
  *  - record-local ANNOTATORS (`text.quality`, `text.langid`,
  *    `text.fingerprint`, `text.tokens`) write metadata keys and keep
  *    the CDC schema — they compose mid-chain and pair with `filter`
  *    conditions on the metadata;
  *  - in-place REWRITES (`text.pii`) edit the payload field like
  *    [[PseudonymizeProc]];
  *  - true FILTERS (`sample.temperature`, `stats.outliers`) drop
  *    records and pass the CDC schema through untouched;
  *  - batch RESHAPES (`dedup.minhash`, `dedup.semantic`, `sim.topk`,
  *    `sketch.hll`, `sketch.topk`, `text.decontaminate`) compute an
  *    analytic table and re-enter the CDC surface via [[Cdc.wrap]].
  */
object Analytics3Ops {
  /** Parse a payload field as an embedding vector. Typed payloads cast
    * the array slot through its string rendering, JSON payloads carry
    * the array natively — `from_json` handles both. */
  private[ops] def vecCol(df: DataFrame, ref: Ref): Column =
    from_json(Analytics2Ops.fieldCol(df, ref), ArrayType(DoubleType))
}

/** `text.quality` — heuristic quality features
  * ([[graft.analytics.Text.qualityMetrics]], bit-identical to the
  * oracled `text_quality` gate row) written into metadata as
  * `quality.<name>`. Row-local, codegen'd, zero shuffle — pair with a
  * `filter` condition on e.g. `.Metadata.quality.stopword_ratio` for
  * the classic C4/Gopher quality gate.
  */
case class TextQualityProc(field: Ref) extends ColumnProcessor {
  val plugin = "text.quality"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val t = Analytics2Ops.fieldCol(df, field)
    val meta = graft.analytics.Text.qualityMetrics(t).foldLeft(col(Cdc.Metadata)) {
      case (m, (name, c)) => RefCols.metaSet(m, s"quality.$name", c.cast("string"))
    }
    Map(Cdc.Metadata -> meta)
  }
}

/** `text.langid` — heuristic language ID
  * ([[graft.analytics.Text.langBest]], the `text_langid` gate row's
  * core) written into metadata as `lang.pred` / `lang.score`.
  * Row-local; the wrong-language gate is a downstream `filter`
  * condition on `.Metadata.lang.pred`.
  */
case class TextLangidProc(field: Ref) extends ColumnProcessor {
  val plugin = "text.langid"
  // the best-profile struct is referenced by two rewrites — materialize
  // it once per row (the ColumnProcessor tempColumns contract)
  override def tempColumns(df: DataFrame): Map[String, Column] =
    Map("_lang_best" -> graft.analytics.Text.langBest(
      Analytics2Ops.fieldCol(df, field)))
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val best = col("_lang_best")
    val pred = when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
    Map(Cdc.Metadata -> RefCols.metaSet(
      RefCols.metaSet(col(Cdc.Metadata), "lang.pred", pred),
      "lang.score", best.getField("score").cast("string")))
  }
}

/** `text.fingerprint` — content-defined document identity
  * ([[graft.analytics.Text.fingerprintOf]], rolling hash over the
  * whitespace-normalized lowercase text) written into metadata as
  * `fingerprint`. Row-local; stable under formatting noise, so equal
  * fingerprints downstream mean near-identical content.
  */
case class TextFingerprintProc(field: Ref) extends ColumnProcessor {
  val plugin = "text.fingerprint"
  override def rewrites(df: DataFrame): Map[String, Column] =
    Map(Cdc.Metadata -> RefCols.metaSet(col(Cdc.Metadata), "fingerprint",
      graft.analytics.Text.fingerprintOf(
        Analytics2Ops.fieldCol(df, field)).cast("string")))
}

/** `text.tokens` — token/char accounting
  * ([[graft.analytics.Text.tokenCounts]]'s row-local expressions)
  * written into metadata as `tokens.ws` / `tokens.bpeish` / `tokens.chars`
  * — the budget columns every packing/pricing step needs. Row-local.
  */
case class TextTokensProc(field: Ref) extends ColumnProcessor {
  val plugin = "text.tokens"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    import graft.analytics.Text.{bpeishTokenCount, wsTokens}
    val t = Analytics2Ops.fieldCol(df, field)
    Map(Cdc.Metadata -> RefCols.metaSet(
      RefCols.metaSet(
        RefCols.metaSet(col(Cdc.Metadata),
          "tokens.ws", size(wsTokens(t)).cast("string")),
        "tokens.bpeish", bpeishTokenCount(t).cast("string")),
      "tokens.chars", length(t).cast("string")))
  }
}

/** `text.pii` — in-place PII redaction of the payload text field
  * ([[graft.analytics.Text.piiClean]]: email → ip → phone, the
  * documented order) plus per-category match counts from the ORIGINAL
  * text in metadata (`pii.n_emails` / `pii.n_ips` / `pii.n_phones`).
  * Row-local regex inside the scan's codegen stage.
  */
case class TextPiiProc(field: Ref) extends Processor {
  val plugin = "text.pii"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.Text.{piiClean, piiCounts}
    val slot = RefCols.column(field)
    val t = Analytics2Ops.fieldCol(df, field)
    val meta = piiCounts(t).foldLeft(col(Cdc.Metadata)) {
      case (m, (name, c)) => RefCols.metaSet(m, s"pii.$name", c.cast("string"))
    }
    val redacted = piiClean(t)
    // counts first (they read the original text), then the rewrite
    val annotated = df.withColumn(Cdc.Metadata, meta)
    annotated.schema(slot).dataType match {
      case st: StructType =>
        annotated.withColumn(slot, StructOps.set(col(slot), st, field.sub, redacted))
      case _ =>
        annotated.withColumn(slot, graft.functions.JsonExpressions.jsonSet(
          col(slot), field.sub, redacted))
    }
  }
}

/** `dedup.minhash` — MinHash-LSH near-duplicate candidate pairs over
  * the batch ([[graft.analytics.Dedup.minhashPairs]]: banded buckets,
  * `maxBucket`-bounded self-pairs, exact-Jaccard verify — never
  * all-pairs): one create record per surviving pair, keyed by the
  * pair. `charGrams=true` switches to character shingles (the
  * `dedup.ngram` n-gram-Jaccard mode). Aggregate output via
  * [[Cdc.wrap]].
  */
case class DedupMinhashProc(idField: Ref, textField: Ref, shingleSize: Int,
                            numHashes: Int, numBands: Int, threshold: Double,
                            charGrams: Boolean, maxBucket: Int)
    extends Processor {
  val plugin = "dedup.minhash"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val pairs = graft.analytics.Dedup.minhashPairs(flat, "_id", "_text",
      shingleSize, numHashes, numBands, threshold, charGrams, maxBucket)
    val keyed = pairs.withColumn("_k",
      concat_ws("|", col("id_a"), col("id_b")))
    Cdc.wrap(keyed, "_k", "dedup.minhash")
  }
}

/** `dedup.simhash` — SimHash near-duplicate pairs over the batch
  * ([[graft.analytics.Dedup.simhashPairs]]: one 64-bit signature per
  * doc, 4-band Hamming bucketing, `maxBucket`-bounded): one create
  * record per pair within `maxHamming` bits, keyed by the pair.
  * Aggregate output via [[Cdc.wrap]].
  */
case class DedupSimhashProc(idField: Ref, textField: Ref, maxHamming: Int,
                            maxBucket: Int) extends Processor {
  val plugin = "dedup.simhash"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val pairs = graft.analytics.Dedup.simhashPairs(flat, "_id", "_text",
      maxHamming, maxBucket)
    val keyed = pairs.withColumn("_k",
      concat_ws("|", col("id_a"), col("id_b")))
    Cdc.wrap(keyed, "_k", "dedup.simhash")
  }
}

/** `dedup.clusters` — near-duplicate cluster assignment over the batch
  * ([[graft.analytics.Dedup.clusters]]: SimHash pairs → connected
  * components → min-id representative): one create record per doc with
  * (doc_id, cluster_id, keep), keyed by doc — `keep` marks the
  * canonical member. Aggregate output via [[Cdc.wrap]].
  */
case class DedupClustersProc(idField: Ref, textField: Ref, maxHamming: Int)
    extends Processor {
  val plugin = "dedup.clusters"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val out = graft.analytics.Dedup.clusters(flat, "_id", "_text", maxHamming)
    Cdc.wrap(out, "doc_id", "dedup.clusters")
  }
}

/** `dedup.semantic` — SemDeDup-style embedding deduplication
  * ([[graft.analytics.Similarity.semanticDedup]]: seeded spherical
  * k-means partitioning, within-cluster bounded pairing, cosine
  * verify, min-id representative per component): one create record per
  * vector with (vec_id, cluster, rep_id, keep). The embedding arrives
  * as a JSON array in the payload field. Aggregate output via
  * [[Cdc.wrap]].
  */
case class SemanticDedupProc(idField: Ref, vecField: Ref, k: Int,
                             threshold: Double, maxBucket: Int)
    extends Processor {
  val plugin = "dedup.semantic"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics3Ops.vecCol(df, vecField).as("_vec"))
      .filter(col("_vec").isNotNull)
    val out = graft.analytics.Similarity.semanticDedup(flat, "_id", "_vec",
      k, threshold, maxBucket)
    Cdc.wrap(out, "vec_id", "dedup.semantic")
  }
}

/** `sim.topk` — k-nearest-neighbor similarity graph over the batch's
  * embeddings ([[graft.analytics.Similarity.knnGraph]]: IVF-bucketed
  * candidate pairs, never brute force): one create record per
  * (node, rank) edge with the neighbor and cosine, keyed by the pair.
  * Aggregate output via [[Cdc.wrap]].
  */
case class SimTopkProc(idField: Ref, vecField: Ref, k: Int, nlist: Int,
                       maxBucket: Int) extends Processor {
  val plugin = "sim.topk"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics3Ops.vecCol(df, vecField).as("_vec"))
      .filter(col("_vec").isNotNull)
    val out = graft.analytics.Similarity.knnGraph(flat, "_id", "_vec",
      k, nlist, maxBucket = maxBucket)
    val keyed = out.withColumn("_kk",
      concat_ws("|", col("node"), col("rank")))
    Cdc.wrap(keyed, "_kk", "sim.topk")
  }
}

/** `text.decontaminate` — eval-set contamination audit
  * ([[graft.analytics.Text.decontaminate]]: the eval set's n-gram set
  * broadcasts, the corpus side is one scan + broadcast join): one
  * create record per doc with (n_contaminated_grams, contaminated),
  * keyed by doc. `evalTable` is a parquet path whose `evalField`
  * column holds the held-out texts — the [[ReconcileProc]] convention
  * for reference data.
  */
case class DecontaminateProc(idField: Ref, textField: Ref, evalTable: String,
                             evalField: String, n: Int) extends Processor {
  val plugin = "text.decontaminate"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val evalSet = df.sparkSession.read.parquet(evalTable)
      .select(col(evalField).cast("string").as("_text"))
    val out = graft.analytics.Text.decontaminate(flat, evalSet, "_id", "_text", n)
    Cdc.wrap(out, "_id", "text.decontaminate")
  }
}

/** `sample.temperature` — temperature-based source rebalancing as a
  * true FILTER ([[graft.analytics.Sampling.temperatureSample]]'s
  * envelope: per-stratum counts driver-side, broadcast cut join,
  * row-local splitmix64 bucket filter — data rows never shuffle). The
  * CDC schema passes through untouched, so it composes mid-chain;
  * records with a null stratum drop (they could never match a cut
  * row, the operator's documented contract). String payload ids
  * pre-hash through fnv1a, the [[KmvProc]] idiom.
  */
case class SampleTemperatureProc(strataField: Ref, idField: Ref,
                                 temperature: Double, seed: Long)
    extends Processor {
  require(temperature >= 1.0,
    "sample.temperature: temperature < 1 would upsample; this is a filter")
  val plugin = "sample.temperature"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.fnv1a_hash
    val exp = 1.0 / temperature
    def w(c: Long): Double =
      if (exp == 0.5) math.sqrt(c.toDouble) else math.pow(c.toDouble, exp)
    val stratum = Analytics2Ops.fieldCol(df, strataField)
    val counts = df.select(stratum.as("_stratum"))
      .filter(col("_stratum").isNotNull)
      .groupBy(col("_stratum")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty) return df.filter(lit(false))
    val total = counts.iterator.map(_._2).sum
    val sumW = counts.foldLeft(0.0)((acc, kv) => acc + w(kv._2))
    val cuts = counts.map { case (k, c) =>
      val target = total.toDouble * w(c) / sumW
      (k, math.floor(math.min(1.0, target / c.toDouble) * 4096.0).toLong)
    }.toMap
    // few strata (languages/domains): the cut table rides as a literal
    // map expression — no join at all, the filter stays in the scan
    val cutExpr = cuts.foldLeft(lit(null).cast("long")) { case (acc, (k, cut)) =>
      when(col("_stratum") === lit(k), lit(cut)).otherwise(acc)
    }
    val id = fnv1a_hash(Analytics2Ops.fieldCol(df, idField).cast("string"))
    df.withColumn("_stratum", stratum)
      .withColumn("_cut", cutExpr)
      .filter(col("_cut").isNotNull &&
        graft.analytics.Sampling.bucketOf(id, seed) < col("_cut"))
      .drop("_stratum", "_cut")
  }
}

/** `stats.outliers` — z-score outlier FILTER over a numeric payload
  * field per group ([[graft.analytics.Stats.zscoreOutliers]]: the
  * decimal-integer algebra form, bit-stable under partitioning). KEEPS
  * the outliers (the anomaly-detection read); invert with a condition
  * on the surviving records if the goal is trimming. The CDC schema
  * passes through untouched.
  */
case class StatsOutliersProc(groupFields: Seq[Ref], valueField: Ref,
                             z: Int, scale: Int) extends Processor {
  require(groupFields.nonEmpty, "stats.outliers: need groups")
  val plugin = "stats.outliers"
  override def transform(df: DataFrame): DataFrame = {
    val gNames = groupFields.indices.map(i => s"_g$i")
    val withCols = groupFields.zip(gNames).foldLeft(
      df.withColumn("_val", Analytics2Ops.fieldCol(df, valueField)
        .cast("double"))) { case (d, (r, n)) =>
      d.withColumn(n, Analytics2Ops.fieldCol(d, r))
    }
    graft.analytics.Stats.zscoreOutliers(withCols, gNames, "_val", z, scale)
      .drop(gNames :+ "_val": _*)
  }
}

/** `sketch.hll` — HyperLogLog distinct count per payload group
  * ([[graft.analytics.Sketch.hllDistinct]]: one register-table shuffle
  * with map-side max combine): one create record per group with the
  * estimate, keyed by the group tuple. Values pre-hash through fnv1a
  * (the [[KmvProc]] idiom). Aggregate output via [[Cdc.wrap]].
  */
case class HllProc(groupFields: Seq[Ref], valueField: Ref, p: Int,
                   seed: Long) extends Processor {
  require(groupFields.nonEmpty, "sketch.hll: need groups")
  val plugin = "sketch.hll"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.fnv1a_hash
    val names = groupFields.map(r => r.sub.lastOption.getOrElse("group"))
    val flat = df.select(groupFields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) } :+
      fnv1a_hash(Analytics2Ops.fieldCol(df, valueField).cast("string"))
        .as("_value"): _*)
    val out = graft.analytics.Sketch.hllDistinct(flat, names, "_value", p, seed)
    val keyed = out.withColumn("_k", concat_ws("|", names.map(col): _*))
    Cdc.wrap(keyed, "_k", "sketch.hll")
  }
}

/** `privacy.ldiv` — l-diversity audit per quasi-identifier group
  * ([[graft.analytics.Privacy.lDiversity]]): one create record per QI
  * group with (n, diversity, ok) — the disclosure gate that catches
  * what k-anonymity misses (a large group whose sensitive value is
  * constant). Aggregate output via [[Cdc.wrap]].
  */
case class PrivacyLdivProc(qiFields: Seq[Ref], sensField: Ref, minL: Long)
    extends Processor {
  require(qiFields.nonEmpty, "privacy.ldiv: need fields")
  val plugin = "privacy.ldiv"
  override def transform(df: DataFrame): DataFrame = {
    val names = qiFields.map(r => r.sub.lastOption.getOrElse("qi"))
    val flat = df.select(qiFields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) } :+
      Analytics2Ops.fieldCol(df, sensField).as("_sens"): _*)
    val out = graft.analytics.Privacy.lDiversity(flat, names, "_sens", minL)
    val keyed = out.withColumn("_k", concat_ws("|", names.map(col): _*))
    Cdc.wrap(keyed, "_k", "privacy.ldiv")
  }
}

/** `privacy.tclose` — t-closeness audit per quasi-identifier group
  * ([[graft.analytics.Privacy.tCloseness]]): one create record per QI
  * group with its earth-mover's distance between the group's
  * sensitive distribution and the corpus-wide one. Aggregate output
  * via [[Cdc.wrap]].
  */
case class PrivacyTcloseProc(qiFields: Seq[Ref], sensField: Ref)
    extends Processor {
  require(qiFields.nonEmpty, "privacy.tclose: need fields")
  val plugin = "privacy.tclose"
  override def transform(df: DataFrame): DataFrame = {
    val names = qiFields.map(r => r.sub.lastOption.getOrElse("qi"))
    val flat = df.select(qiFields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) } :+
      Analytics2Ops.fieldCol(df, sensField).as("_sens"): _*)
    val out = graft.analytics.Privacy.tCloseness(flat, names, "_sens")
    val keyed = out.withColumn("_k", concat_ws("|", names.map(col): _*))
    Cdc.wrap(keyed, "_k", "privacy.tclose")
  }
}

/** `sketch.kll` — KLL quantile estimates per payload group
  * ([[graft.analytics.Sketch.kllState]] + `kllQuantiles`): one create
  * record per group with the requested basis-point quantiles.
  * `quantiles` is `name:bp` pairs (`p50:5000,p90:9000,p99:9900`).
  * Ids pre-hash through fnv1a (the [[KmvProc]] idiom); values read as
  * doubles. Aggregate output via [[Cdc.wrap]].
  */
case class KllProc(groupFields: Seq[Ref], valueField: Ref, idField: Ref,
                   k: Int, seed: Long, qs: Seq[(String, Int)])
    extends Processor {
  val plugin = "sketch.kll"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.fnv1a_hash
    val names = groupFields.map(r => r.sub.lastOption.getOrElse("group"))
    val flat = df.select(groupFields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) } ++ Seq(
      Analytics2Ops.fieldCol(df, valueField).cast("double").as("_value"),
      fnv1a_hash(Analytics2Ops.fieldCol(df, idField).cast("string"))
        .as("_rid")): _*)
    val st = graft.analytics.Sketch.kllState(flat, names, "_value", "_rid",
      k, seed)
    val out = graft.analytics.Sketch.kllQuantiles(st, names, qs)
    val keyed =
      if (names.isEmpty) out.withColumn("_k", lit("all"))
      else out.withColumn("_k", concat_ws("|", names.map(col): _*))
    Cdc.wrap(keyed, "_k", "sketch.kll")
  }
}

/** `sketch.hist` — fixed-geometry histogram quantiles per payload
  * group ([[graft.analytics.Sketch.histogramQuantiles]]: one
  * integer-count shuffle, ≤ groups × bins state): one create record
  * per group with the requested quantiles. Aggregate output via
  * [[Cdc.wrap]].
  */
case class HistProc(groupFields: Seq[Ref], valueField: Ref, lo: Double,
                    width: Double, bins: Int, qs: Seq[Double])
    extends Processor {
  require(groupFields.nonEmpty, "sketch.hist: need groups")
  val plugin = "sketch.hist"
  override def transform(df: DataFrame): DataFrame = {
    val names = groupFields.map(r => r.sub.lastOption.getOrElse("group"))
    val flat = df.select(groupFields.zip(names).map { case (r, n) =>
      Analytics2Ops.fieldCol(df, r).as(n) } :+
      Analytics2Ops.fieldCol(df, valueField).cast("double").as("_value"): _*)
    val out = graft.analytics.Sketch.histogramQuantiles(flat, names,
      "_value", lo, width, bins, qs)
    // one row per (group, quantile): the q is part of the identity
    val keyed = out.withColumn("_k",
      concat_ws("|", names.map(col) :+ col("q"): _*))
    Cdc.wrap(keyed, "_k", "sketch.hist")
  }
}

/** `text.normalize` — canonical text normalization in place
  * ([[graft.analytics.Text.normalizeText]]: NFC, lowercase, control
  * chars and whitespace runs to single spaces, trimmed) — the first
  * stage of every training-data pipeline, as a mid-chain rewrite.
  * Row-local, codegen'd.
  */
case class TextNormalizeProc(field: Ref) extends Processor {
  val plugin = "text.normalize"
  override def transform(df: DataFrame): DataFrame = {
    val slot = RefCols.column(field)
    val normed = graft.analytics.Text.normalizeText(
      Analytics2Ops.fieldCol(df, field))
    df.schema(slot).dataType match {
      case st: StructType =>
        df.withColumn(slot, StructOps.set(col(slot), st, field.sub, normed))
      case _ =>
        df.withColumn(slot, graft.functions.JsonExpressions.jsonSet(
          col(slot), field.sub, normed))
    }
  }
}

/** `text.repetition` — Gopher-style repetition features
  * ([[graft.analytics.Text.repetition]]): one create record per doc
  * with (frac_dup_words, top_bigram, frac_chars_top_bigram) — the
  * boilerplate/spam screen. Aggregate output via [[Cdc.wrap]].
  */
case class TextRepetitionProc(idField: Ref, textField: Ref)
    extends Processor {
  val plugin = "text.repetition"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    Cdc.wrap(graft.analytics.Text.repetition(flat, "_id", "_text"),
      "_id", "text.repetition")
  }
}

/** `text.novelty` — per-document n-gram novelty against the
  * id-ordered corpus ([[graft.analytics.Text.novelty]]): one create
  * record per doc with (n_grams, n_novel, novelty) — high = fresh
  * content, near-zero = recombination. Aggregate output via
  * [[Cdc.wrap]].
  */
case class TextNoveltyProc(idField: Ref, textField: Ref, n: Int)
    extends Processor {
  val plugin = "text.novelty"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    Cdc.wrap(graft.analytics.Text.novelty(flat, "_id", "_text", n),
      "doc_id", "text.novelty")
  }
}

/** `sample.mixture` — explicit-target data mixing as a true FILTER
  * ([[graft.analytics.Sampling.mixtureSample]]'s envelope: budget
  * B = min cₛ/pₛ, per-stratum cut fraction pₛ·B/cₛ, splitmix64
  * bucket membership — data rows never shuffle). `targets` is
  * `stratum:proportion` pairs summing to 1; strata not named drop
  * entirely. The CDC schema passes through untouched.
  */
case class SampleMixtureProc(strataField: Ref, idField: Ref,
                             targets: Seq[(String, Double)], seed: Long)
    extends Processor {
  require(targets.nonEmpty && targets.forall(_._2 > 0),
    "sample.mixture: targets must be non-empty with positive proportions")
  require(targets.map(_._1).distinct.size == targets.size,
    "sample.mixture: duplicate target stratum")
  require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
    "sample.mixture: target proportions must sum to 1")
  val plugin = "sample.mixture"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.fnv1a_hash
    val tmap = targets.toMap
    val stratum = Analytics2Ops.fieldCol(df, strataField)
    val counts = df.select(stratum.as("_stratum"))
      .filter(col("_stratum").isin(targets.map(_._1): _*))
      .groupBy(col("_stratum")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val missing = tmap.keySet -- counts.map(_._1)
    require(missing.isEmpty,
      s"sample.mixture: target strata with no rows: ${missing.toSeq.sorted.mkString(", ")}")
    val budget = counts.map { case (k, c) => c.toDouble / tmap(k) }.min
    val cuts = counts.map { case (k, c) =>
      (k, math.floor(math.min(1.0, tmap(k) * budget / c.toDouble) * 4096.0).toLong)
    }.toMap
    val cutExpr = cuts.foldLeft(lit(null).cast("long")) { case (acc, (k, cut)) =>
      when(col("_stratum") === lit(k), lit(cut)).otherwise(acc)
    }
    val id = fnv1a_hash(Analytics2Ops.fieldCol(df, idField).cast("string"))
    df.withColumn("_stratum", stratum)
      .withColumn("_cut", cutExpr)
      .filter(col("_cut").isNotNull &&
        graft.analytics.Sampling.bucketOf(id, seed) < col("_cut"))
      .drop("_stratum", "_cut")
  }
}

/** `retrieval.bm25` — BM25 top-k retrieval over the batch's documents
  * ([[graft.analytics.Retrieval.bm25]], single-scan shared-exchange
  * shape): `query` is the whitespace-tokenized search string; one
  * create record per (query, rank) hit. Aggregate output via
  * [[Cdc.wrap]].
  */
case class RetrievalBm25Proc(idField: Ref, textField: Ref, query: String,
                             k1: Double, b: Double, topK: Int)
    extends Processor {
  require(query.trim.nonEmpty, "retrieval.bm25: need query")
  val plugin = "retrieval.bm25"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val out = graft.analytics.Retrieval.bm25(flat, "_id", "_text",
      Seq("q" -> query.trim.toLowerCase.split("\\s+").toSeq), k1, b, topK)
    val keyed = out.withColumn("_k",
      concat_ws("|", col("query_id"), col("rank")))
    Cdc.wrap(keyed, "_k", "retrieval.bm25")
  }
}

/** `dedup.incremental` — cross-batch exact dedup against a PERSISTED
  * history ([[graft.analytics.Dedup.incremental]]: digest semi-join,
  * batch never shuffles its text): one create record per batch doc
  * with status kept / dup_batch / dup_history. `historyTable` is a
  * parquet path whose `historyField` column holds previously-ingested
  * texts — the ingest-time "seen before?" gate as pure config.
  */
case class DedupIncrementalProc(idField: Ref, textField: Ref,
                                historyTable: String, historyField: String)
    extends Processor {
  val plugin = "dedup.incremental"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val hist = df.sparkSession.read.parquet(historyTable)
      .select(col(historyField).cast("string").as("_text"))
    val out = graft.analytics.Dedup.incremental(flat, hist, "_id", "_text")
    Cdc.wrap(out, "doc_id", "dedup.incremental")
  }
}

/** `seq.transitions` — first-order Markov transition matrix of each
  * entity's time-ordered stream
  * ([[graft.analytics.Sequences.transitionMatrix]]): one create
  * record per (prev, next) with (cnt, prev_total, p), keyed by the
  * pair. Aggregate output via [[Cdc.wrap]].
  */
case class SeqTransitionsProc(entityField: Ref, orderField: Ref,
                              tieField: Ref, stateField: Ref)
    extends Processor {
  val plugin = "seq.transitions"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, entityField).as("_e"),
      Analytics2Ops.fieldCol(df, orderField).cast("long").as("_ord"),
      Analytics2Ops.fieldCol(df, tieField).as("_tie"),
      Analytics2Ops.fieldCol(df, stateField).as("_st"))
    val out = graft.analytics.Sequences.transitionMatrix(flat, Seq("_e"),
      col("_ord"), col("_tie"), col("_st"))
    val keyed = out.withColumn("_k",
      concat_ws("|", col("prev"), col("next")))
    Cdc.wrap(keyed, "_k", "seq.transitions")
  }
}

/** `retrieval.tfidf` — per-(doc, term) TF-IDF weights over the batch
  * ([[graft.analytics.Retrieval.tfidf]], shared-exchange single-scan
  * shape): one create record per weight row, keyed by the pair.
  * Aggregate output via [[Cdc.wrap]].
  */
case class RetrievalTfidfProc(idField: Ref, textField: Ref, minDf: Long)
    extends Processor {
  val plugin = "retrieval.tfidf"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val out = graft.analytics.Retrieval.tfidf(flat, "_id", "_text", minDf)
    val keyed = out.withColumn("_k",
      concat_ws("|", col("doc_id"), col("term")))
    Cdc.wrap(keyed, "_k", "retrieval.tfidf")
  }
}

/** `sketch.cms` — count-min counter table over a payload field
  * ([[graft.analytics.Sketch.cmsCounters]]: depth × width integer
  * cells, mergeable by addition): one create record per non-zero
  * cell, keyed by (row, idx) — the frequency state a pipeline writes
  * next to its sink for later [[graft.analytics.Sketch.cmsLookup]]
  * probes. Aggregate output via [[Cdc.wrap]].
  */
case class CmsProc(valueField: Ref, depth: Int, width: Int)
    extends Processor {
  val plugin = "sketch.cms"
  override def transform(df: DataFrame): DataFrame = {
    val counted = df.select(
        Analytics2Ops.fieldCol(df, valueField).cast("string").as("_item"))
      .filter(col("_item").isNotNull)
      .groupBy(col("_item")).agg(count(lit(1)).as("_wt"))
    val out = graft.analytics.Sketch.cmsCounters(counted, "_item", "_wt",
      depth, width)
    val keyed = out.withColumn("_k",
      concat_ws("|", col("_row"), col("_idx")))
    Cdc.wrap(keyed, "_k", "sketch.cms")
  }
}

/** `sample.weighted` — weighted top-k sampling without replacement
  * ([[graft.analytics.Sampling.weightedSample]]: exponential sort
  * keys from the seeded hash, one global LIMIT k): keeps exactly
  * min(k, n) records, CDC schema untouched. The weight reads a
  * numeric payload field (floored at 1 like the operator).
  */
case class SampleWeightedProc(idField: Ref, weightField: Ref, k: Int,
                              seed: Long) extends Processor {
  val plugin = "sample.weighted"
  override def transform(df: DataFrame): DataFrame = {
    import graft.analytics.HashFunctions.{fnv1a_hash, splitmix64_hash}
    import org.apache.spark.sql.functions.{shiftrightunsigned => shru}
    // the weightedSample key chain inline on the CDC frame (string ids
    // pre-hash through fnv1a, the SampleFixedProc idiom)
    val id = fnv1a_hash(Analytics2Ops.fieldCol(df, idField).cast("string"))
    val w = Analytics2Ops.fieldCol(df, weightField).cast("double")
    val u = (shru(splitmix64_hash(id + lit(seed)), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0)
    df.withColumn("_samp_key",
        graft.analytics.HashFunctions.java_ln(u) / greatest(w, lit(1.0)))
      .orderBy(col("_samp_key").desc, id.asc)
      .limit(k)
      .drop("_samp_key")
  }
}

/** `graph.components` — connected components over an edge stream
  * ([[graft.analytics.Dedup.components]]: count-gated hybrid —
  * driver union-find under the edge cap, distributed min-label
  * propagation above): one create record per node with its component
  * label, keyed by node. Aggregate output via [[Cdc.wrap]].
  */
case class GraphComponentsProc(src: Ref, dst: Ref, maxIter: Int)
    extends Processor {
  val plugin = "graph.components"
  override def transform(df: DataFrame): DataFrame = {
    val edges = df.select(Analytics2Ops.fieldCol(df, src).as("id_a"),
        Analytics2Ops.fieldCol(df, dst).as("id_b"))
      .filter(col("id_a").isNotNull && col("id_b").isNotNull)
    val out = graft.analytics.Dedup.components(edges, maxIter = maxIter)
    Cdc.wrap(out, "id", "graph.components")
  }
}

/** `link.clusters` — entity resolution end-to-end (the `link_clusters`
  * gate composition): Jaro–Winkler fuzzy pairs within blocks
  * ([[graft.analytics.Linkage.fuzzyLinks]], `maxBlock`-capped) feed
  * connected components; one create record per matched record with
  * its entity id. The match-then-cluster pipeline a real linkage
  * deployment runs, as pure config. Aggregate output via [[Cdc.wrap]].
  */
case class LinkClustersProc(idField: Ref, blockField: Ref, textField: Ref,
                            minSim: Double, maxBlock: Int)
    extends Processor {
  val plugin = "link.clusters"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, idField).as("_id"),
      Analytics2Ops.fieldCol(df, blockField).as("_block"),
      Analytics2Ops.fieldCol(df, textField).as("_text"))
    val pairs = graft.analytics.Linkage.fuzzyLinks(flat, flat,
      "_id", "_id", "_block", "_text", minSim,
      selfPairs = true, maxBlock = maxBlock)
    val out = graft.analytics.Dedup.components(pairs, "id_a", "id_b")
      .select(col("id").as("record"), col("label").as("entity"))
    Cdc.wrap(out, "record", "link.clusters")
  }
}

/** `sketch.topk` — Misra–Gries heavy hitters over a payload field
  * ([[graft.analytics.Sketch.heavyHitters]]: bounded per-partition
  * state, broadcast candidate verify): one create record per item at
  * or above `threshold` occurrences with its EXACT count, keyed by the
  * item. `capacity=0` (default) sizes the summary from the batch count
  * (one extra count action); set it explicitly to skip that pass.
  * Aggregate output via [[Cdc.wrap]].
  */
case class TopkProc(valueField: Ref, threshold: Long, capacity: Int)
    extends Processor {
  val plugin = "sketch.topk"
  override def transform(df: DataFrame): DataFrame = {
    val flat = df.select(
      Analytics2Ops.fieldCol(df, valueField).cast("string").as("_item"))
    val out = graft.analytics.Sketch.heavyHitters(flat, "_item",
      threshold, capacity)
    Cdc.wrap(out, "item", "sketch.topk")
  }
}

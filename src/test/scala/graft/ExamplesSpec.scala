package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Cdc
import graft.ops.Registry
import graft.pipeline.{Pipeline, Runner}

/** The shipped examples cannot rot: every YAML in examples/pipelines
  * must parse, every processor must instantiate from its settings, and
  * the parquet-only pipelines must execute end-to-end on the sf0.001
  * test tables.
  */
class ExamplesSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private val dir = new java.io.File("examples/pipelines")

  test("every example parses and its processors instantiate") {
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".yaml")).sortBy(_.getName)
    assert(files.length >= 6, s"examples missing at ${dir.getAbsolutePath}")
    files.foreach { f =>
      val cfgs = Pipeline.fromYaml(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      assert(cfgs.nonEmpty, f.getName)
      cfgs.foreach { cfg =>
        assert(cfg.sources.nonEmpty && cfg.destinations.nonEmpty, f.getName)
        cfg.processors.foreach { p =>
          assert(Registry.create(p.plugin, p.settings) != null,
            s"${f.getName}: ${p.plugin}")
        }
      }
    }
  }

  private def load(name: String) = Pipeline.fromYaml(new String(
    java.nio.file.Files.readAllBytes(new java.io.File(dir, name).toPath),
    "UTF-8"))

  private def clean(paths: String*): Unit = paths.foreach { p =>
    val f = new java.io.File(p)
    if (f.exists()) {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete()
      }
      rm(f)
    }
  }

  test("mixture-by-tokens hits the token-share targets on sf0.001") {
    clean("/tmp/graft-mixture")
    val cfg = load("mixture-by-tokens.yaml").head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val rows = out.select(col(Cdc.PayloadAfter), col(Cdc.Metadata)).collect()
    assert(rows.nonEmpty)
    val targets = Map("en" -> 0.5, "fr" -> 0.2, "es" -> 0.15,
      "zh" -> 0.1, "de" -> 0.05)
    val byLang = rows.groupBy { r =>
      graft.functions.JsonOps.parse(r.getString(0)).get("lang").asText
    }.map { case (lang, rs) =>
      lang -> rs.map(_.getMap[String, String](1)("tokens.ws").toLong).sum
    }
    assert(byLang.keySet.subsetOf(targets.keySet), byLang.keySet.toString())
    // downsample-only mixes can't exceed the largest-feasible budget,
    // but realized TOKEN shares must land near the targets (the 4096
    // hash buckets + doc-sized token quanta bound the error at this
    // corpus size)
    val total = byLang.values.sum.toDouble
    targets.foreach { case (lang, share) =>
      val realized = byLang.getOrElse(lang, 0L) / total
      assert(math.abs(realized - share) < 0.08,
        s"$lang: realized $realized vs target $share ($byLang)")
    }
  }

  test("overlap-monitor reads jaccard ~ 1.0 re-ingesting its own corpus") {
    clean("/tmp/graft-overlap")
    val cfg = load("overlap-monitor.yaml").head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val pay = out.select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    assert(pay.length == 1, pay.length.toString)
    val j = pay.head.get("jaccard_est").asDouble
    assert(j > 0.9, s"jaccard_est=$j")
    assert(pay.head.get("n_common").asLong > 0)
  }

  test("bpe-train-apply composes through the parquet merge table") {
    clean("/tmp/graft-bpe-merges", "/tmp/graft-bpe-segmented")
    val cfgs = load("bpe-train-apply.yaml")
    assert(cfgs.map(_.id) == Seq("bpe-train", "bpe-apply"))
    // pipeline 1 lands the CDC-shaped merge table...
    val counts = Runner.runBatch(spark, cfgs.head)
    assert(counts("ok") > 0 && counts("dlq") == 0, counts.toString())
    // ...and pipeline 2's text.bpe reads it back without flattening
    val out = Cdc.ok(Runner.build(spark, cfgs(1), streaming = false))
    val pay = out.select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    assert(pay.nonEmpty)
    assert(pay.forall(_.get("n_tokens").asLong > 0))
    // at least one trained merge actually fired: some doc has a token
    // with an internal space (merged symbols keep space-joined spelling)
    assert(pay.exists(_.get("tokens").asText.contains(" ")))
  }

  test("curate-documents runs end-to-end on sf0.001") {
    val cfg = Pipeline.fromYaml(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "curate-documents.yaml").toPath), "UTF-8")).head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val n = out.count()
    assert(n > 0)
    val metas = out.select(col(Cdc.Metadata)).limit(50).collect()
      .map(_.getMap[String, String](0))
    // every stage left its mark: quality + langid annotations AND the
    // pii stage's per-category counts (the redaction step cannot be
    // dropped from the YAML without this failing)
    assert(metas.forall(m => m.contains("quality.n_tokens")
      && m.contains("lang.pred") && m.contains("pii.n_emails")),
      metas.head.toString())
  }

  test("dedupe-and-weight runs end-to-end and weights sum per cluster") {
    val cfg = Pipeline.fromYaml(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "dedupe-and-weight.yaml").toPath), "UTF-8")).head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val pay = out.select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    assert(pay.nonEmpty)
    val perCluster = pay.groupBy(_.get("cluster_id").asLong)
      .map { case (_, rows) => rows.map(_.get("weight").asDouble).sum }
    assert(perCluster.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("nb-train-apply composes through the parquet model table") {
    clean("/tmp/graft-nb-model", "/tmp/graft-nb-scored")
    val cfgs = load("nb-train-apply.yaml")
    assert(cfgs.map(_.id) == Seq("nb-train", "nb-apply"))
    val counts = Runner.runBatch(spark, cfgs.head)
    assert(counts("ok") > 0 && counts("dlq") == 0, counts.toString())
    val out = Cdc.ok(Runner.build(spark, cfgs(1), streaming = false))
    val pay = out.select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    assert(pay.nonEmpty)
    // scores are finite and BOTH verdicts occur (an en-vs-rest model
    // over a mixed-language corpus must separate something)
    assert(pay.forall(p => !p.get("score").asText.matches("NaN|Infinity")))
    assert(pay.exists(_.get("pred_pos").asBoolean) &&
      pay.exists(!_.get("pred_pos").asBoolean))
  }

  test("datacard-report emits one card record and the datasheet files") {
    clean("/tmp/graft-datacard", "/tmp/graft-datacard-out")
    val cfgs = load("datacard-report.yaml")
    val counts = Runner.runBatch(spark, cfgs.head)
    assert(counts("ok") == 1 && counts("dlq") == 0, counts.toString())
    val pay = spark.read.parquet("/tmp/graft-datacard-out")
      .select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    assert(pay.length == 1)
    val card = pay.head
    val nDocs = card.get("n_docs").asLong
    assert(nDocs > 0 && card.get("n_tokens").asLong > nDocs)
    assert(card.get("zipf_slope").asDouble < 0, card.toString) // Zipfian head
    // the datasheet files carry the SAME card
    val md = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/tmp/graft-datacard/datacard.md"))
    assert(md.contains("# Corpus data card") && md.contains("n_docs"))
    val js = graft.functions.JsonOps.parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/tmp/graft-datacard/datacard.json")))
    assert(js.get("n_docs").asLong == nDocs)
  }

  test("winnow-excerpts lands df-capped pair candidates") {
    clean("/tmp/graft-winnow-pairs")
    val cfgs = load("winnow-excerpts.yaml")
    val counts = Runner.runBatch(spark, cfgs.head)
    assert(counts("ok") > 0 && counts("dlq") == 0, counts.toString())
    val pairs = spark.read.parquet("/tmp/graft-winnow-pairs")
      .select(
        get_json_object(col(Cdc.PayloadAfter), "$.doc_a"),
        get_json_object(col(Cdc.PayloadAfter), "$.doc_b"),
        get_json_object(col(Cdc.PayloadAfter), "$.n_shared").cast("long"))
      .collect()
    assert(pairs.nonEmpty)
    // untyped CDC ids are strings, so the pair canonicalization is
    // lexicographic — consistent either way, just not numeric
    assert(pairs.forall(r =>
      r.getString(0) < r.getString(1) && r.getLong(2) >= 2))
  }

  test("ccnet-fluency trains on the en slice and scores every doc") {
    clean("/tmp/graft-sbo-model", "/tmp/graft-sbo-scored")
    val cfgs = load("ccnet-fluency.yaml")
    assert(cfgs.map(_.id) == Seq("sbo-train", "sbo-apply"))
    val counts = Runner.runBatch(spark, cfgs.head)
    assert(counts("ok") > 0 && counts("dlq") == 0, counts.toString())
    // the landed model carries all four backoff orders
    val ords = spark.read.parquet("/tmp/graft-sbo-model")
      .select(get_json_object(col(Cdc.PayloadAfter), "$.ord").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ords == Set(0L, 1L, 2L, 3L))
    val out = Cdc.ok(Runner.build(spark, cfgs(1), streaming = false))
    val pay = out.select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    assert(pay.nonEmpty)
    assert(pay.forall(p =>
      !p.get("mean_neg_logprob_sbo").asText.matches("NaN|Infinity")))
    // fluency separation: docs from the reference language must score
    // lower (more probable) on average than the rest
    val scores = pay.map(p => p.get("doc_id").asLong ->
      p.get("mean_neg_logprob_sbo").asDouble).toMap
    val langs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, rest) = scores.partition { case (id, _) => langs(id) == "en" }
    assert(en.nonEmpty && rest.nonEmpty)
    val enAvg = en.values.sum / en.size
    val restAvg = rest.values.sum / rest.size
    assert(enAvg < restAvg,
      s"en-trained LM must prefer en docs: en=$enAvg rest=$restAvg")
  }

  test("gopher-epochs gates on the rules then replicates by epoch recipe") {
    clean("/tmp/graft-gopher-epochs")
    val cfg = load("gopher-epochs.yaml").head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val rows = out.select(col(Cdc.PayloadAfter), col(Cdc.Metadata)).collect()
    assert(rows.nonEmpty)
    val metas = rows.map(_.getMap[String, String](1))
    // the gate ran with drop=true: every surviving record passed
    assert(metas.forall(_.get("gopher.keep").contains("true")))
    // the upsample ran: every record carries its copy index, and the
    // 2.3-epoch English stratum actually contains second copies
    assert(metas.forall(_.contains("epoch.index")))
    assert(metas.exists(_.get("epoch.index").contains("1")))
    // per (doc, lang=en) multiplicity is 2 or 3 — never more (floor
    // 2.3 = 2 plus at most one hash-gated extra)
    val en = rows.filter(r => graft.functions.JsonOps.parse(r.getString(0))
      .get("lang").asText == "en")
    val perDoc = en.groupBy(r => graft.functions.JsonOps.parse(r.getString(0))
      .get("doc_id").asLong).map(_._2.length)
    assert(perDoc.nonEmpty && perDoc.forall(n => n == 2 || n == 3))
  }

  test("js-enrich filters, enriches, and annotates through Node") {
    clean("/tmp/graft-js-enrich")
    val cfg = load("js-enrich.yaml").head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val rows = out.select(col(Cdc.PayloadAfter), col(Cdc.Metadata)).collect()
    assert(rows.nonEmpty)
    val payloads = rows.map(r =>
      graft.functions.JsonOps.parse(r.getString(0)))
    assert(payloads.forall(_.get("lang").asText != "zh"),
      "null return filters the zh slice")
    assert(payloads.forall(_.get("word_count").asLong > 0L))
    assert(rows.map(_.getMap[String, String](1)).forall(
      _.get("enriched.by").contains("custom.javascript")))
  }

  test("crawl-trust scores the part-supplier graph from a seed table") {
    import spark.implicits._
    clean("/tmp/graft-crawl-trust", "/tmp/graft-crawl-proximity")
    // the curated seed list the YAML points at: parts ≡ 0 (mod 7)
    val parts = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey")).distinct()
      .filter(col("l_partkey") % 7 === 0)
    parts.write.mode("overwrite").parquet("/tmp/graft-trust-seeds")
    val cfgs = load("crawl-trust.yaml")
    assert(cfgs.length == 2)
    val trust = Cdc.ok(Runner.build(spark, cfgs.head, streaming = false))
      .select(get_json_object(col(Cdc.PayloadAfter), "$.node").cast("long"),
        get_json_object(col(Cdc.PayloadAfter), "$.rank").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(trust.nonEmpty)
    // seeds hold teleport mass; every rank is finite and non-negative
    val seedIds = parts.collect().map(_.getLong(0)).toSet
    assert(seedIds.exists(id => trust.getOrElse(id, 0.0) > 0.0),
      "no seed carries trust mass")
    assert(trust.values.forall(v => v >= 0.0 && !v.isNaN))
    val prox = Cdc.ok(Runner.build(spark, cfgs(1), streaming = false))
      .select(get_json_object(col(Cdc.PayloadAfter), "$.node").cast("long"),
        get_json_object(col(Cdc.PayloadAfter), "$.hops").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prox.nonEmpty)
    assert(seedIds.filter(prox.contains).forall(prox(_) == 0L),
      "reached seeds must sit at hop 0")
    assert(prox.values.forall(h => h >= 0L && h <= 3L))
  }

  test("wasm-transform shouts the staged key bytes through WebAssembly") {
    clean("/tmp/graft-wasm-transform")
    val cfg = load("wasm-transform.yaml").head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val rows = out.select(col(Cdc.Key), col(Cdc.PayloadAfter)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = graft.functions.JsonOps.parse(r.getString(1))
        .get("text").asText
      assert(r.getString(0) == text.toUpperCase,
        "key = wasm-uppercased document text")
    }
  }

  test("unimax-plan annotates, counts tokens, and emits a budget plan") {
    clean("/tmp/graft-unimax-plan")
    val cfg = load("unimax-plan.yaml").head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val rows = out.select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    // one plan record per language, each with a positive quota and
    // epochs bounded by the configured cap
    assert(rows.length >= 2, s"expected per-language plan rows, got ${rows.length}")
    val epochs = rows.map(_.get("epochs").asDouble)
    assert(epochs.forall(e => e > 0.0 && e <= 2.0 + 1e-9), epochs.toSeq)
    // the plan fills the budget unless every language is capped
    val quotas = rows.map(_.get("quota").asDouble)
    val allCapped = rows.forall(_.get("capped").asBoolean)
    if (!allCapped)
      assert(math.abs(quotas.sum - 20000.0) < 1e-6, quotas.toSeq)
    else assert(quotas.sum <= 20000.0)
  }
}

package graft.ops

import graft.model.Ref

/** Config-compatible processor factory: plugin name + string settings →
  * [[Processor]], mirroring the reference's builtin processor registry
  * (`pkg/plugin/processor/builtin/registry.go`). Parameter names and
  * defaults match the reference's exported specs
  * (`.../exampleutil/specs/` JSON files).
  *
  * Custom processors: the reference's escape hatch is an embedded JS
  * engine (`impl/custom/javascript.go:151`) — carried here as
  * `custom.javascript` ([[JsProcessor]]: the same `process(record)`
  * contract, run in a per-partition Node subprocess). The JVM-native
  * escape hatch is stronger still: [[register]] installs any user
  * `Processor` (or a plain `DataFrame => DataFrame`) under a plugin
  * name, after which YAML provisioning, the builder DSL, conditions,
  * and the schema middleware all treat it exactly like a builtin. A
  * declarative `Column`-level function stays inside codegen, which is
  * strictly faster than any per-record JS bridge; the `sql`
  * processor covers the no-compile case.
  */
object Registry {
  type Factory = Map[String, String] => Processor

  private val custom =
    new java.util.concurrent.ConcurrentHashMap[String, Factory]()

  /** Install a custom processor plugin (user extension point). */
  def register(plugin: String, factory: Factory): Unit =
    custom.put(plugin, factory)

  /** Install a custom stateless transform under a plugin name. */
  def registerTransform(name: String)
                       (fn: (org.apache.spark.sql.DataFrame, Map[String, String]) =>
                            org.apache.spark.sql.DataFrame): Unit =
    register(name, settings => new Processor {
      val plugin: String = name
      override def transform(df: org.apache.spark.sql.DataFrame) = fn(df, settings)
    })

  private def refs(settings: Map[String, String], key: String): Seq[Ref] =
    settings.getOrElse(key,
        throw new IllegalArgumentException(s"missing required setting: $key"))
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(Ref.parse)

  private def ref(settings: Map[String, String], default: String = null): Ref = {
    val f = settings.getOrElse("field",
      if (default != null) default
      else throw new IllegalArgumentException("missing required setting: field"))
    Ref.parse(f)
  }

  private val llmFactories: Map[String, Factory] = {
    val canonical = Seq("openai.embed", "openai.textgen", "cohere.command",
      "cohere.embed", "cohere.rerank", "ollama.request").map(p =>
      p -> ((s: Map[String, String]) => LlmProcessor(p, s): Processor)).toMap
    // the reference's own spec names as aliases (specs/*.json)
    canonical ++ Map(
      "openai.embeddings" -> canonical("openai.embed"),
      "ollama" -> canonical("ollama.request"))
  }

  val factories: Map[String, Factory] = llmFactories ++ Map[String, Factory](
    "field.set" -> (s => FieldSet(Ref.parse(s("field")), s("value"))),
    "field.rename" -> (s => FieldRename(
      s("mapping").split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { pair =>
        val Array(from, to) = pair.split(":", 2)
        (Ref.parse(from.trim), to.trim)
      })),
    "field.exclude" -> (s => FieldExclude(
      s("fields").split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(Ref.parse))),
    "field.convert" -> (s => FieldConvert(Ref.parse(s("field")), s("type"))),
    "json.decode" -> (s => JsonDecode(ref(s), s.get("schema"))),
    "json.encode" -> (s => JsonEncode(ref(s))),
    "base64.encode" -> (s => Base64Encode(ref(s))),
    "base64.decode" -> (s => Base64Decode(ref(s))),
    "filter" -> (_ => FilterProc()),
    "error" -> (s => ErrorProc(s.getOrElse("message", "error processor triggered"))),
    "clone" -> (s => CloneProc(s("count").trim.toInt)),
    "split" -> (s => SplitProc(ref(s))),
    "unwrap.debezium" -> (s => UnwrapDebezium(ref(s, ".Payload.After"))),
    "unwrap.kafkaconnect" -> (s => UnwrapKafkaConnect(ref(s, ".Payload.After"))),
    "unwrap.opencdc" -> (s => UnwrapOpencdc(ref(s, ".Payload.After"))),
    "webhook.http" -> (s => WebhookHttp(s)),
    "avro.encode" -> (s => s.get("schema.strategy") match {
      // reference default strategy: infer from payload + register
      case Some("autoRegister") => AvroEncodeAuto(ref(s, ".Payload.After"),
        s.getOrElse("schema.autoRegister.subject",
          throw new IllegalArgumentException(
            "avro.encode autoRegister: missing schema.autoRegister.subject")),
        s.getOrElse("schema.registry.url",
          throw new IllegalArgumentException(
            "avro.encode autoRegister: missing schema.registry.url")))
      case _ => AvroEncode(ref(s, ".Payload.After"), s("schema"),
        s.getOrElse("schema.id", "1").toInt)
    }),
    "avro.decode" -> (s => AvroDecode(ref(s, ".Payload.After"), s("schema"))),
    "sql" -> (s => SqlProc(s("query"), s.getOrElse("view", "records"))),
    "dedup.exact" -> (s => DedupExact(s.get("field").map(Ref.parse))),
    "text.metrics" -> (s => TextMetrics(Ref.parse(
      s.getOrElse("field", ".Payload.After")))),
    "sample.hash" -> (s => SampleHash(s.get("field").map(Ref.parse),
      s.getOrElse("fraction", "0.1").toDouble,
      s.getOrElse("seed", "0").toLong)),
    "quality.filter" -> (s => QualityFilter(ref(s, ".Payload.After"),
      s.getOrElse("minTokens", "1").toLong,
      s.getOrElse("minMeanTokenLen", "0").toDouble,
      s.getOrElse("maxMeanTokenLen", "1000000").toDouble)),
    "text.chunk" -> (s => TextChunk(ref(s, ".Payload.After"),
      s.getOrElse("chunkTokens", "100").toInt,
      s.getOrElse("overlap", "20").toInt)),
    // round-8 analytics families on the config surface (Analytics2Ops)
    "privacy.pseudonymize" -> (s => PseudonymizeProc(
      refs(s, "fields"), s.getOrElse("secret", "0").toLong)),
    "privacy.kanon" -> (s => KAnonProc(
      refs(s, "fields"), s.getOrElse("k", "2").toLong)),
    "privacy.noise" -> (s => NoisyCountProc(
      refs(s, "fields"),
      s.getOrElse("epsilon", "1.0").toDouble,
      s.getOrElse("seed", "0").toLong)),
    "layout.key" -> (s => LayoutKeyProc(
      refs(s, "fields"),
      s.getOrElse("bits", "16").toInt,
      s.getOrElse("kind", "zorder"))),
    "cdc.scd2" -> (s => Scd2Proc(
      s.get("order.field").map(Ref.parse),
      s.getOrElse("deleteOp", "delete"))),
    "graph.pagerank" -> (s => PageRankProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s.getOrElse("iterations", "5").toInt,
      s.getOrElse("damping", "0.85").toDouble)),
    "graph.links" -> (s => LinkPredictProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s.getOrElse("minJaccard", "0.5").toDouble,
      s.getOrElse("maxDegree", "100000").toInt)),
    "dq.validate" -> (s => DqValidateProc(
      s("checks").split(";").toSeq.map(_.trim).filter(_.nonEmpty))),
    "text.scripts" -> (s => TextScriptsProc(ref(s, ".Payload.After"))),
    // round-9 analytics families on the config surface (Analytics2Ops)
    "sketch.kmv" -> (s => KmvProc(
      refs(s, "groups"), Ref.parse(s("value")),
      s.getOrElse("k", "256").toInt,
      s.getOrElse("seed", "7").toLong)),
    "graph.hits" -> (s => HitsProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s.getOrElse("iterations", "3").toInt)),
    "graph.kcore" -> (s => KCoreProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s.getOrElse("k", "3").toInt,
      s.getOrElse("maxRounds", "10").toInt)),
    "linkage.score" -> (s => LinkageScoreProc(
      Ref.parse(s("id")), Ref.parse(s("block")),
      s("fields").split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
        val parts = spec.split(":")
        require(parts.length == 3,
          s"linkage.score: field spec must be REF:m:u, got $spec")
        (Ref.parse(parts(0)), parts(1).toDouble, parts(2).toDouble)
      },
      s.getOrElse("minScore", "0.0").toDouble,
      s.getOrElse("maxBlock", "10000").toInt)),
    "retrieval.keywords" -> (s => KeywordsProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("k", "10").toInt,
      s.getOrElse("minDf", "2").toLong)),
    "joins.skyline" -> (s => SkylineProc(
      refs(s, "groups"), Ref.parse(s("x")), Ref.parse(s("y")))),
    // round-10 families on the config surface
    "dq.reconcile" -> (s => ReconcileProc(
      refs(s, "key"), refs(s, "compare"), s("table"))),
    "sample.fixed" -> (s => SampleFixedProc(
      refs(s, "groups"), Ref.parse(s("id")),
      s.getOrElse("k", "1000").toInt,
      s.getOrElse("seed", "0").toLong)),
    "text.hashing" -> (s => HashingProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("dim", "1024").toInt)),
    // round-13 families on the config surface
    "linkage.jw" -> (s => FuzzyLinksProc(
      Ref.parse(s("id")), Ref.parse(s("block")), Ref.parse(s("field")),
      s.getOrElse("minSim", "0.9").toDouble,
      s.getOrElse("maxBlock", "10000").toInt)),
    "seq.ngrams" -> (s => SeqNgramsProc(
      Ref.parse(s("entity")), Ref.parse(s("order")), Ref.parse(s("tie")),
      Ref.parse(s("state")),
      s.getOrElse("n", "3").toInt,
      s.getOrElse("minSupport", "2").toLong)),
    "sketch.bloom" -> (s => BloomProc(
      s.get("value").map(Ref.parse).getOrElse(ref(s, ".Payload.After")),
      s.getOrElse("mBits", "65536").toInt,
      s.getOrElse("kHashes", "4").toInt,
      s.getOrElse("seed", "7").toLong)),
    // round-14 families on the config surface (Analytics3Ops)
    "text.quality" -> (s => TextQualityProc(ref(s, ".Payload.After"))),
    "text.langid" -> (s => TextLangidProc(ref(s, ".Payload.After"))),
    "text.fingerprint" -> (s => TextFingerprintProc(ref(s, ".Payload.After"))),
    "text.tokens" -> (s => TextTokensProc(ref(s, ".Payload.After"))),
    "text.pii" -> (s => TextPiiProc(ref(s, ".Payload.After"))),
    "dedup.minhash" -> (s => DedupMinhashProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("shingleSize", "3").toInt,
      s.getOrElse("numHashes", "128").toInt,
      s.getOrElse("numBands", "16").toInt,
      s.getOrElse("threshold", "0.8").toDouble,
      s.getOrElse("charGrams", "false").toBoolean,
      s.getOrElse("maxBucket", "4096").toInt)),
    "dedup.simhash" -> (s => DedupSimhashProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("maxHamming", "3").toInt,
      s.getOrElse("maxBucket", "4096").toInt)),
    "dedup.clusters" -> (s => DedupClustersProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("maxHamming", "3").toInt)),
    "dedup.semantic" -> (s => SemanticDedupProc(
      Ref.parse(s("id")), Ref.parse(s("vec")),
      s.getOrElse("k", "16").toInt,
      s.getOrElse("threshold", "0.95").toDouble,
      s.getOrElse("maxBucket", "4096").toInt)),
    "sim.topk" -> (s => SimTopkProc(
      Ref.parse(s("id")), Ref.parse(s("vec")),
      s.getOrElse("k", "10").toInt,
      s.getOrElse("nlist", "-1").toInt,
      s.getOrElse("maxBucket", "4096").toInt)),
    "text.decontaminate" -> (s => DecontaminateProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s("evalTable"), s.getOrElse("evalField", "text"),
      s.getOrElse("n", "8").toInt)),
    "sample.temperature" -> (s => SampleTemperatureProc(
      Ref.parse(s("stratum")), Ref.parse(s("id")),
      s.getOrElse("temperature", "2.0").toDouble,
      s.getOrElse("seed", "0").toLong)),
    "stats.outliers" -> (s => StatsOutliersProc(
      refs(s, "groups"), Ref.parse(s("value")),
      s.getOrElse("z", "3").toInt,
      s.getOrElse("scale", "2").toInt)),
    "sketch.hll" -> (s => HllProc(
      refs(s, "groups"), Ref.parse(s("value")),
      s.getOrElse("p", "12").toInt,
      s.getOrElse("seed", "7").toLong)),
    "sketch.topk" -> (s => TopkProc(
      s.get("value").map(Ref.parse).getOrElse(ref(s, ".Payload.After")),
      s.getOrElse("threshold", "2").toLong,
      s.getOrElse("capacity", "0").toInt)),
    "privacy.ldiv" -> (s => PrivacyLdivProc(
      refs(s, "fields"), Ref.parse(s("sensitive")),
      s.getOrElse("l", "2").toLong)),
    "privacy.tclose" -> (s => PrivacyTcloseProc(
      refs(s, "fields"), Ref.parse(s("sensitive")))),
    "sketch.kll" -> (s => KllProc(
      s.get("groups").map(_ => refs(s, "groups")).getOrElse(Nil),
      Ref.parse(s("value")), Ref.parse(s("id")),
      s.getOrElse("k", "256").toInt,
      s.getOrElse("seed", "7").toLong,
      s.getOrElse("quantiles", "p50:5000,p90:9000,p99:9900")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
          val Array(name, bp) = spec.split(":", 2)
          (name.trim, bp.trim.toInt)
        })),
    "sketch.hist" -> (s => HistProc(
      refs(s, "groups"), Ref.parse(s("value")),
      s.getOrElse("lo", "0").toDouble,
      s.getOrElse("width", "1").toDouble,
      s.getOrElse("bins", "64").toInt,
      s.getOrElse("quantiles", "0.5,0.9,0.99")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toDouble))),
    "text.normalize" -> (s => TextNormalizeProc(ref(s, ".Payload.After"))),
    "text.repetition" -> (s => TextRepetitionProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"))),
    "text.novelty" -> (s => TextNoveltyProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("n", "3").toInt)),
    "sample.mixture" -> (s => SampleMixtureProc(
      Ref.parse(s("stratum")), Ref.parse(s("id")),
      s("targets").split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
        val i = spec.lastIndexOf(':')
        require(i > 0, s"sample.mixture: target spec must be stratum:p, got $spec")
        (spec.substring(0, i).trim, spec.substring(i + 1).trim.toDouble)
      },
      s.getOrElse("seed", "0").toLong)),
    "retrieval.rm3" -> (s => RetrievalRm3Proc(
      Ref.parse(s("id")), ref(s, ".Payload.After"), s("query"),
      s.getOrElse("k1", "1.2").toDouble,
      s.getOrElse("b", "0.75").toDouble,
      s.getOrElse("fbDocs", "3").toInt,
      s.getOrElse("fbTerms", "5").toInt,
      s.getOrElse("alpha", "0.6").toDouble,
      s.getOrElse("topK", "10").toInt)),
    "retrieval.bm25" -> (s => RetrievalBm25Proc(
      Ref.parse(s("id")), ref(s, ".Payload.After"), s("query"),
      s.getOrElse("k1", "1.2").toDouble,
      s.getOrElse("b", "0.75").toDouble,
      s.getOrElse("topK", "10").toInt)),
    "dedup.incremental" -> (s => DedupIncrementalProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s("historyTable"), s.getOrElse("historyField", "text"))),
    "graph.components" -> (s => GraphComponentsProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s.getOrElse("maxIter", "25").toInt)),
    "graph.modularity" -> (s => ModularityProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s.getOrElse("iterations", "4").toInt)),
    "graph.labelprop" -> (s => LabelPropProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s.getOrElse("iterations", "4").toInt)),
    "graph.ppr" -> (s => PprProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s("seedsTable"), s.getOrElse("seedColumn", ""),
      s.getOrElse("iterations", "5").toInt,
      s.getOrElse("damping", "0.85").toDouble)),
    "ts.changepoint" -> (s => ChangepointProc(
      refs(s, "groups"), Ref.parse(s("order")), Ref.parse(s("value")))),
    "ts.hurst" -> (s => HurstProc(
      refs(s, "groups"), Ref.parse(s("order")), Ref.parse(s("value")))),
    "graph.seeddist" -> (s => SeedDistProc(
      Ref.parse(s("src")), Ref.parse(s("dst")),
      s("seedsTable"), s.getOrElse("seedColumn", ""),
      s.getOrElse("maxHops", "6").toInt)),
    "sim.pca" -> (s => SimPcaProc(
      Ref.parse(s("id")), Ref.parse(s("vec")),
      s.getOrElse("iterations", "3").toInt,
      s.getOrElse("output", "loadings"))),
    "link.clusters" -> (s => LinkClustersProc(
      Ref.parse(s("id")), Ref.parse(s("block")), Ref.parse(s("field")),
      s.getOrElse("minSim", "0.9").toDouble,
      s.getOrElse("maxBlock", "10000").toInt)),
    "seq.transitions" -> (s => SeqTransitionsProc(
      Ref.parse(s("entity")), Ref.parse(s("order")), Ref.parse(s("tie")),
      Ref.parse(s("state")))),
    "retrieval.tfidf" -> (s => RetrievalTfidfProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("minDf", "2").toLong)),
    "sketch.cms" -> (s => CmsProc(
      s.get("value").map(Ref.parse).getOrElse(ref(s, ".Payload.After")),
      s.getOrElse("depth", "4").toInt,
      s.getOrElse("width", "1024").toInt)),
    "sample.weighted" -> (s => SampleWeightedProc(
      Ref.parse(s("id")), Ref.parse(s("weight")),
      s.getOrElse("k", "1000").toInt,
      s.getOrElse("seed", "0").toLong)),
    "sample.kfold" -> (s => SampleKfoldProc(
      Ref.parse(s("id")),
      s.getOrElse("k", "5").toInt,
      s.getOrElse("seed", "0").toLong)),
    "text.classifier" -> (s => TextClassifierProc(
      ref(s, ".Payload.After"),
      s.getOrElse("seed", "42").toLong)),
    "text.oov" -> (s => TextOovProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s("trainTable"), s.getOrElse("trainField", "text"),
      s.getOrElse("minCount", "2").toLong)),
    "sample.pack" -> (s => SamplePackProc(
      Ref.parse(s("id")), Ref.parse(s("tokens")),
      s("budget").toLong,
      s.getOrElse("streams", "8").toInt,
      s.getOrElse("seed", "0").toLong)),
    "sample.negatives" -> (s => SampleNegativesProc(
      Ref.parse(s("id")),
      s.getOrElse("k", "2").toInt,
      s.getOrElse("bucketBits", "6").toInt,
      s.getOrElse("seed", "7").toLong)),
    "sim.quantize" -> (s => SimQuantizeProc(
      Ref.parse(s("id")), Ref.parse(s("vec")))),
    "sample.split" -> (s => SampleSplitProc(
      Ref.parse(s("group")),
      s("fractions").split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
        val i = spec.lastIndexOf(':')
        require(i > 0, s"sample.split: fraction spec must be name:f, got $spec")
        (spec.substring(0, i), spec.substring(i + 1).toDouble)
      },
      s.getOrElse("seed", "0").toLong)),
    "sample.interleave" -> (s => SampleInterleaveProc(
      Ref.parse(s("id")),
      s.getOrElse("seed", "0").toLong)),
    "text.dsir" -> (s => TextDsirProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s("targetTable"), s.getOrElse("targetField", "text"),
      s.getOrElse("buckets", "4096").toInt)),
    "sim.cluster" -> (s => SimClusterProc(
      Ref.parse(s("id")), Ref.parse(s("vec")),
      s.getOrElse("k", "8").toInt)),
    "dedup.url" -> (s => DedupUrlProc(ref(s, ".Payload.After"))),
    "text.bpe" -> (s => TextBpeProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"), s("mergesTable"))),
    "sample.token_mixture" -> (s => SampleTokenMixtureProc(
      Ref.parse(s("stratum")), Ref.parse(s("id")), Ref.parse(s("tokens")),
      s("targets").split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
        val i = spec.lastIndexOf(':')
        require(i > 0, s"sample.token_mixture: target spec must be stratum:p, got $spec")
        (spec.substring(0, i).trim, spec.substring(i + 1).trim.toDouble)
      },
      s.getOrElse("seed", "0").toLong)),
    "sketch.overlap" -> (s => SketchOverlapProc(
      ref(s, ".Payload.After"), s("historyTable"),
      s.getOrElse("historyField", "text"),
      s.getOrElse("k", "256").toInt)),
    "text.entropy" -> (s => TextEntropyProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"))),
    "text.strip_html" -> (s => TextStripHtmlProc(ref(s, ".Payload.After"))),
    "text.nb_train" -> (s => TextNbTrainProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      Ref.parse(s("label")), s("posValue"),
      s.getOrElse("alpha", "1.0").toDouble)),
    "text.nb" -> (s => TextNbProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s("modelTable"), s.getOrElse("prior", "0.0").toDouble)),
    "dedup.winnow" -> (s => DedupWinnowProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("k", "4").toInt, s.getOrElse("w", "8").toInt,
      s.getOrElse("minShared", "2").toInt,
      s.getOrElse("maxDf", "64").toInt)),
    "text.divergence" -> (s => TextDivergenceProc(
      Ref.parse(s("stratum")), ref(s, ".Payload.After"))),
    "text.sbo_train" -> (s => TextSboTrainProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"))),
    "text.sbo" -> (s => TextSboProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"), s("modelTable"))),
    "text.gopher" -> (s => TextGopherProc(
      ref(s, ".Payload.After"),
      s.getOrElse("drop", "false").toBoolean,
      s.getOrElse("minWords", "50").toLong,
      s.getOrElse("maxWords", "100000").toLong,
      s.getOrElse("minMeanWordLen", "3.0").toDouble,
      s.getOrElse("maxMeanWordLen", "10.0").toDouble,
      s.getOrElse("maxSymbolRatio", "0.1").toDouble,
      s.getOrElse("maxBulletFrac", "0.9").toDouble,
      s.getOrElse("maxEllipsisFrac", "0.3").toDouble,
      s.getOrElse("minAlphaFrac", "0.8").toDouble,
      s.getOrElse("minStopHits", "2").toLong)),
    "text.fineweb" -> (s => TextFinewebProc(
      ref(s, ".Payload.After"),
      s.getOrElse("drop", "false").toBoolean,
      s.getOrElse("minPunctLineFrac", "0.12").toDouble,
      s.getOrElse("maxDupLineCharFrac", "0.1").toDouble,
      s.getOrElse("maxShortLineFrac", "0.67").toDouble,
      s.getOrElse("shortLineChars", "30").toInt)),
    "sample.epochs" -> (s => SampleEpochsProc(
      Ref.parse(s("stratum")), Ref.parse(s("id")),
      s("epochs").split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
        val i = spec.lastIndexOf(':')
        require(i > 0, s"sample.epochs: epoch spec must be stratum:e, got $spec")
        (spec.substring(0, i).trim, spec.substring(i + 1).trim.toDouble)
      },
      s.getOrElse("seed", "0").toLong)),
    "text.bpe_train" -> (s => TextBpeTrainProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("rounds", "8").toInt)),
    "enrich.asof" -> (s => EnrichAsofProc(
      Ref.parse(s("key")), Ref.parse(s("time")), s("table"),
      s.getOrElse("tableKey", "key"), s.getOrElse("tableTime", "ts"),
      s("values").split(",").toSeq.map(_.trim).filter(_.nonEmpty))),
    "dedup.softweight" -> (s => DedupSoftweightProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("maxHamming", "3").toInt)),
    "text.zipf" -> (s => TextZipfProc(
      ref(s, ".Payload.After"),
      s.getOrElse("minCount", "2").toLong,
      s.getOrElse("topN", "4096").toInt)),
    "text.heaps" -> (s => TextHeapsProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      s.getOrElse("bucketWidth", "64").toLong)),
    "sample.unimax" -> (s => SampleUnimaxProc(
      Ref.parse(s("stratum")), Ref.parse(s("tokens")),
      s("budget").toLong,
      s.getOrElse("maxEpochs", "4.0").toDouble)),
    "sample.doremi" -> (s => SampleDoremiProc(
      Ref.parse(s("domain")), Ref.parse(s("step")),
      Ref.parse(s("loss")),
      s.getOrElse("eta", "1.0").toDouble)),
    "custom.javascript" -> (s => JsProcessor.fromSettings(s)),
    "custom.wasm" -> (s => WasmProcessor.fromSettings(s)),
    "sample.curriculum" -> (s => SampleCurriculumProc(
      Ref.parse(s("id")), Ref.parse(s("score")),
      s.getOrElse("phases", "4").toInt)),
    "sample.mixture_kl" -> (s => SampleMixtureKlProc(
      Ref.parse(s("stratum")), Ref.parse(s("tokens")),
      s("targets").split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
        val i = spec.lastIndexOf(':')
        require(i > 0, s"sample.mixture_kl: target spec must be stratum:p, got $spec")
        (spec.substring(0, i).trim, spec.substring(i + 1).trim.toDouble)
      })),
    "report.datacard" -> (s => ReportDataCardProc(
      Ref.parse(s("id")), ref(s, ".Payload.After"),
      Ref.parse(s("lang")), s.get("path"))),
    "text.c4" -> (s => TextC4Proc(
      ref(s, ".Payload.After"),
      s.getOrElse("drop", "false").toBoolean,
      s.getOrElse("minSentences", "5").toLong,
      s.getOrElse("minLineWords", "5").toLong,
      s.getOrElse("badWords", "").split(",").toSeq.map(_.trim)
        .filter(_.nonEmpty),
      s.getOrElse("clean", "false").toBoolean)),
    "sample.tiles" -> (s => SampleTilesProc(
      Ref.parse(s("stratum")), Ref.parse(s("score")), Ref.parse(s("id")),
      s.getOrElse("tiles", "3").toInt,
      s.getOrElse("binWidth", "0.01").toDouble)),
    "url.filter" -> (s => UrlFilterProc(
      ref(s, ".Payload.After.url"),
      s.getOrElse("drop", "false").toBoolean,
      s.getOrElse("maxUrlLen", "2048").toLong,
      s.getOrElse("maxHostDots", "4").toLong,
      s.getOrElse("maxHostDigitFrac", "0.4").toDouble,
      s.getOrElse("blockWords", "").split(",").toSeq.map(_.trim)
        .filter(_.nonEmpty)))
  )

  def create(plugin: String, settings: Map[String, String]): Processor = {
    val factory = Option(custom.get(plugin))
      .orElse(factories.get(plugin))
      .getOrElse(throw new IllegalArgumentException(
        s"unknown processor plugin: $plugin"))
    SchemaMiddleware.wrap(factory(settings), settings)
  }

  def plugins: Set[String] =
    factories.keySet ++ scala.jdk.CollectionConverters
      .SetHasAsScala(custom.keySet()).asScala
}

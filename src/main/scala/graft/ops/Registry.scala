package graft.ops

import graft.model.Ref

/** Config-compatible processor factory: plugin name + string settings →
  * [[Processor]], mirroring the reference's builtin processor registry
  * (`pkg/plugin/processor/builtin/registry.go`). Parameter names and
  * defaults match the reference's exported specs
  * (`.../exampleutil/specs/` JSON files).
  */
object Registry {
  type Factory = Map[String, String] => Processor

  private def ref(settings: Map[String, String], default: String = null): Ref = {
    val f = settings.getOrElse("field",
      if (default != null) default
      else throw new IllegalArgumentException("missing required setting: field"))
    Ref.parse(f)
  }

  private val llmFactories: Map[String, Factory] =
    Seq("openai.embed", "openai.textgen", "cohere.command", "cohere.embed",
      "cohere.rerank", "ollama.request").map(p =>
      p -> ((s: Map[String, String]) => LlmProcessor(p, s): Processor)).toMap

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
    "avro.encode" -> (s => AvroEncode(ref(s, ".Payload.After"), s("schema"),
      s.getOrElse("schema.id", "1").toInt)),
    "avro.decode" -> (s => AvroDecode(ref(s, ".Payload.After"), s("schema"))),
    "sql" -> (s => SqlProc(s("query"), s.getOrElse("view", "records"))),
    "dedup.exact" -> (s => DedupExact(s.get("field").map(Ref.parse))),
    "text.metrics" -> (s => TextMetrics(Ref.parse(
      s.getOrElse("field", ".Payload.After"))))
  )

  def create(plugin: String, settings: Map[String, String]): Processor = {
    val inner = factories.getOrElse(plugin,
      throw new IllegalArgumentException(s"unknown processor plugin: $plugin"))(settings)
    SchemaMiddleware.wrap(inner, settings)
  }

  def plugins: Set[String] = factories.keySet
}

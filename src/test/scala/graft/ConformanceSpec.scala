package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.model.Cdc
import graft.ops.{HttpTransport, LlmProcessor, Registry, SchemaMiddleware}

/** Shared-JVM request log for the LLM conformance mocks (local mode:
  * executors share the JVM, so the mapPartitions closures see it).
  */
object LlmMockLog {
  val requests = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.ConcurrentLinkedQueue[(String, Map[String, String], String)]]()
  def of(spec: String): java.util.concurrent.ConcurrentLinkedQueue[(String, Map[String, String], String)] =
    requests.computeIfAbsent(spec,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[(String, Map[String, String], String)]())
}

/** Emulates the per-plugin mock clients the reference's example specs
  * were generated against (`*_examples_test.go`), recording every
  * request for shape assertions. Top-level so the closure serializes.
  */
case class LlmMockTransport(spec: String) extends HttpTransport {
  override def send(method: String, url: String, headers: Map[String, String],
                    body: Array[Byte]): HttpTransport.Response = {
    val text = new String(body, "UTF-8")
    LlmMockLog.of(spec).add((url, headers, text))
    val req = JsonOps.parse(text)
    def ok(s: String) = HttpTransport.Response(200, s.getBytes("UTF-8"))
    spec match {
      case "openai.embeddings" =>
        val k = req.get("input").size()
        ok(s"""{"data":[${Seq.fill(k)(
          """{"embedding":[0.1,0.2,0.3,0.4,0.5]}""").mkString(",")}]}""")
      case "openai.textgen" =>
        // the example's mock model follows the developer_message: it
        // uppercases the user turn — so the assertion implicitly checks
        // the request carried the payload as the user message
        val msgs = req.get("messages")
        val user = msgs.get(msgs.size() - 1).get("content").asText()
        ok(s"""{"choices":[{"message":{"content":${JsonOps.render(
          JsonOps.mapper.getNodeFactory.textNode(user.toUpperCase))}}}]}""")
      case "cohere.command" =>
        ok("""{"message":{"content":[{"type":"text","text":"cohere command response content"}]}}""")
      case "cohere.embed" =>
        val k = req.get("texts").size()
        ok(s"""{"embeddings":{"float":[${Seq.fill(k)("[0.1,0.2,0.3]").mkString(",")}]}}""")
      case "cohere.rerank" =>
        // echo documents back, one result per document, by index
        val docs = scala.jdk.CollectionConverters
          .IteratorHasAsScala(req.get("documents").elements()).asScala.toSeq
        ok(s"""{"results":[${docs.zipWithIndex.map { case (d, i) =>
          s"""{"document":{"text":${JsonOps.render(d)}},"index":$i,"relevance_score":0.9}"""
        }.mkString(",")}]}""")
      case "ollama" =>
        ok("""{"response":"{\"test-field\": 124}","done":true}""")
      case other => HttpTransport.Response(500, s"no mock for $other".getBytes)
    }
  }
}

/** Replays the reference's golden processor examples (vendored from
  * `pkg/plugin/processor/builtin/internal/exampleutil/specs/` per
  * FIXTURES.md §2) through the Spark processors: config + `have` record
  * → expect `want` (SingleRecord / FilterRecord / ErrorRecord /
  * MultiRecord), comparing JSON payloads as parsed trees.
  */
class ConformanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spark.session

  private val specs = Seq("field.set", "field.rename", "field.exclude",
    "field.convert", "json.decode", "json.encode", "base64.encode",
    "base64.decode", "filter", "error", "clone", "split",
    "unwrap.debezium", "unwrap.kafkaconnect", "unwrap.opencdc",
    "webhook.http", "avro.decode", "avro.encode", "custom.javascript",
    "openai.embeddings", "openai.textgen", "cohere.command",
    "cohere.embed", "cohere.rerank", "ollama")

  /** spec name → canonical LlmProcessor plugin (these run against the
    * mock transport, like the reference's examples run against mocked
    * clients).
    */
  private val llmSpecs = Map(
    "openai.embeddings" -> "openai.embed", "openai.textgen" -> "openai.textgen",
    "cohere.command" -> "cohere.command", "cohere.embed" -> "cohere.embed",
    "cohere.rerank" -> "cohere.rerank", "ollama" -> "ollama.request")

  /** The avro examples fetch this schema from a registry (subject
    * `example-decode`/`example-preRegistered`); we run the
    * `preRegistered` strategy with it inlined (the schema text is
    * spelled out in each example's description).
    */
  private val avroExampleSchema =
    """{"type":"record","name":"record","fields":[
      |{"name":"myString","type":"string"},{"name":"myInt","type":"int"}]}""".stripMargin

  /** The webhook vectors call a live server on 127.0.0.1:54321 (the
    * reference's RunExample does the same): respond "hello, <body>"
    * at `/` and "hello, <path>!" elsewhere.
    */
  private lazy val webhookServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 54321), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val reply =
        if (ex.getRequestURI.getPath == "/") s"hello, $body"
        else s"hello, ${ex.getRequestURI.getPath.stripPrefix("/")}!"
      val bytes = reply.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.getResponseBody.close()
    })
    server.start()
    server
  }

  /** Documented deviations (plugin, example summary) we intentionally
    * do not replicate — keep this list SHORT and justified. (Currently
    * empty: every ported example runs.)
    */
  private val skips: Set[(String, String)] = Set.empty

  /** Mock Confluent registry for the autoRegister strategy: accepts
    * `POST /subjects/{subject}/versions`, records (path, body), returns
    * id 1 (the id the golden vector was generated with).
    */
  private val registryPosts =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  private lazy val registryServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 54322), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      registryPosts.add((ex.getRequestURI.getPath, body))
      val bytes = """{"id":1}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.getResponseBody.close()
    })
    server.start()
    server
  }

  private def loadSpec(name: String): JsonNode = {
    val in = getClass.getResourceAsStream(s"/conformance/$name.json")
    require(in != null, s"missing conformance spec $name")
    JsonOps.mapper.readTree(in)
  }

  private def slotToColumn(n: JsonNode): String = n match {
    case null => null
    case x if x.isNull => null
    case x if x.isTextual => x.asText() // raw data stored as-is
    case x => JsonOps.render(x) // structured data as canonical JSON
  }

  private def recordToRow(rec: JsonNode): Row = {
    val pos = Option(rec.get("position")).filterNot(_.isNull)
      .map(p => java.util.Base64.getDecoder.decode(p.asText())).orNull
    val metadata = Option(rec.get("metadata")).filterNot(_.isNull).map { m =>
      m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.orNull
    val payload = rec.get("payload")
    Row(pos,
      Option(rec.get("operation")).filterNot(_.isNull).map(_.asText()).orNull,
      metadata,
      null,
      slotToColumn(rec.get("key")),
      if (payload == null) null else slotToColumn(payload.get("before")),
      if (payload == null) null else slotToColumn(payload.get("after")))
  }

  private def haveToDf(rec: JsonNode): DataFrame =
    spark.createDataFrame(java.util.List.of(recordToRow(rec)), Cdc.schema)

  private def sameSlot(got: String, want: JsonNode, ctx: String): Unit = want match {
    case null => assert(got == null, s"$ctx: expected null, got $got")
    case w if w.isNull => assert(got == null, s"$ctx: expected null, got $got")
    case w if w.isTextual => assert(got == w.asText(), s"$ctx: got $got want ${w.asText()}")
    case w =>
      assert(got != null, s"$ctx: expected ${JsonOps.render(w)}, got null")
      val parsed = JsonOps.parseOrEmpty(got)
      assert(parsed == w, s"$ctx: got $got want ${JsonOps.render(w)}")
  }

  private def compareRecord(got: Row, want: JsonNode, ctx: String): Unit = {
    val wantPos = Option(want.get("position")).filterNot(_.isNull)
      .map(p => java.util.Base64.getDecoder.decode(p.asText()))
    (wantPos, Option(got.get(0))) match {
      case (Some(w), Some(g)) =>
        assert(java.util.Arrays.equals(w, g.asInstanceOf[Array[Byte]]), s"$ctx position")
      case (Some(_), None) => fail(s"$ctx position: expected bytes, got null")
      case (None, _) => // null expected; generated positions are free
    }
    val wantOp = Option(want.get("operation")).filterNot(_.isNull).map(_.asText())
    assert(Option(got.getString(1)) == wantOp, s"$ctx operation")
    val wantMeta = Option(want.get("metadata")).filterNot(_.isNull)
      .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)
    val gotMeta = Option(got.get(2)).map(_.asInstanceOf[Map[String, String]])
      .getOrElse(Map.empty)
    assert(gotMeta == wantMeta, s"$ctx metadata: got $gotMeta want $wantMeta")
    sameSlot(got.getString(4), want.get("key"), s"$ctx key")
    val wantPayload = want.get("payload")
    if (wantPayload != null && !wantPayload.isNull) {
      sameSlot(got.getString(5), wantPayload.get("before"), s"$ctx payload.before")
      sameSlot(got.getString(6), wantPayload.get("after"), s"$ctx payload.after")
    }
  }

  for (specName <- specs) {
    val spec = loadSpec(specName)
    val examples = Option(spec.get("examples")).map(_.elements().asScala.toSeq).getOrElse(Nil)
    for ((ex, i) <- examples.zipWithIndex) {
      val summary = Option(ex.get("summary")).map(_.asText()).getOrElse(s"example $i")
      test(s"$specName: $summary") {
        assume(!skips.contains((specName, summary)), "documented deviation")
        if (specName == "webhook.http") webhookServer
        val autoRegister = specName == "avro.encode" && summary == "Auto-register schema"
        if (autoRegister) { registryServer; graft.ops.SchemaRegistry.clearCache() }
        val config = Option(ex.get("config"))
          .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty)
        val cleaned = config.filterNot(_._1.startsWith("sdk."))
        val proc =
          if (llmSpecs.contains(specName)) {
            LlmMockLog.of(specName).clear()
            SchemaMiddleware.wrap(
              LlmProcessor(llmSpecs(specName), cleaned, LlmMockTransport(specName)),
              cleaned)
          } else Registry.create(specName,
            if (autoRegister)
              cleaned + ("schema.registry.url" -> "http://127.0.0.1:54322")
            else if (specName.startsWith("avro.")) cleaned + ("schema" -> avroExampleSchema)
            else cleaned)
        val in = haveToDf(ex.get("have"))
        val out = Cdc.withErrorChannel(proc(in))
        // sort driver-side (a handful of rows): a global orderBy would
        // range-sample the plan and evaluate the processor lineage twice,
        // which breaks the request-count assertions below
        val rows = out.collect().sortBy { r =>
          val m = Option(r.getAs[Map[String, String]](Cdc.Metadata)).getOrElse(Map.empty)
          (m.get("clone.index").map(_.toInt).getOrElse(0),
            m.get("split.index").map(_.toInt).getOrElse(0))
        }
        val want = ex.get("want")
        if (autoRegister) {
          // the exporter UTF-8-mangled the avro wire bytes >0x7F in this
          // fixture (each bad byte → one U+FFFD, so positions align):
          // compare every clean byte positionally, then prove the rest by
          // decoding with the schema the processor actually registered.
          assert(rows.length == 1, s"expected 1 record, got ${rows.length}")
          val row = rows.head
          assert(row.getAs[String](Cdc.Error) == null,
            s"unexpected error: ${row.getAs[String](Cdc.Error)}")
          assert(row.getString(1) == want.get("operation").asText(), "operation")
          val got = row.getString(6)
          val wantAfter = want.get("payload").get("after").asText()
          assert(got.length == wantAfter.length,
            s"wire length: got ${got.length} want ${wantAfter.length}")
          wantAfter.zipWithIndex.foreach { case (c, i) =>
            if (c != '�')
              assert(got(i) == c, s"wire byte $i: got ${got(i).toInt} want ${c.toInt}")
          }
          // exactly one registration, under the configured subject
          val posts = registryPosts.asScala.toSeq
          assert(posts.map(_._1).distinct ==
            Seq(s"/subjects/${config("schema.autoRegister.subject")}/versions"))
          val registered = JsonOps.parse(posts.last._2).get("schema").asText()
          val schema = graft.functions.AvroCodec.parseSchema(registered)
          assert(schema.getFields.asScala.map(_.name()).toSeq ==
            Seq("myFloat", "myInt", "myMap", "myString", "myStruct"),
            "inferred record fields, sorted")
          val bytes = got.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (id, json) = graft.functions.AvroCodec.decode(bytes, schema)
          assert(id == 1, "Confluent header carries the registered id")
          assert(json == JsonOps.render(ex.get("have").get("payload").get("after")),
            s"roundtrip: $json")
        } else if (specName == "cohere.embed") {
          // the reference's exporter UTF-8-mangled the zstd frame in this
          // fixture's want payload (the raw bytes aren't valid UTF-8), so
          // compare semantically: everything but the payload exactly, then
          // decompress the payload and match the embedding JSON.
          assert(rows.length == 1, s"expected 1 record, got ${rows.length}")
          val row = rows.head
          assert(row.getAs[String](Cdc.Error) == null)
          assert(row.getString(1) == want.get("operation").asText(), "operation")
          val wantMeta = want.get("metadata").properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
          assert(row.getAs[Map[String, String]](Cdc.Metadata) == wantMeta,
            "metadata must carry cohere.embed.model")
          val packed = java.util.Base64.getDecoder.decode(row.getString(6))
          val json = new String(com.github.luben.zstd.Zstd.decompress(
            packed, com.github.luben.zstd.Zstd.getFrameContentSize(packed).toInt), "UTF-8")
          assert(JsonOps.parse(json) == JsonOps.parse("[0.1,0.2,0.3]"),
            s"decompressed embedding: $json")
        } else if (want.isObject && want.properties().asScala.isEmpty) {
          // FilterRecord: dropped
          assert(rows.isEmpty, s"expected record dropped, got ${rows.length}")
        } else if (want.isObject && want.has("error")) {
          assert(rows.length == 1)
          val err = rows.head.getAs[String](Cdc.Error)
          assert(err != null && err == want.get("error").asText(),
            s"error: got $err want ${want.get("error").asText()}")
        } else if (want.isArray) {
          val wants = want.elements().asScala.toSeq
          assert(rows.length == wants.length,
            s"expected ${wants.length} records, got ${rows.length}")
          for ((w, j) <- wants.zipWithIndex) compareRecord(rows(j), w, s"record $j")
        } else {
          assert(rows.length == 1, s"expected 1 record, got ${rows.length}")
          assert(rows.head.getAs[String](Cdc.Error) == null,
            s"unexpected error: ${rows.head.getAs[String](Cdc.Error)}")
          compareRecord(rows.head, want, "record")
        }
        // request-shape assertions: the mock recorded every HTTP call
        if (llmSpecs.contains(specName)) {
          val reqs = LlmMockLog.of(specName).asScala.toSeq
          assert(reqs.length == 1, s"expected 1 request, got ${reqs.length}")
          val (url, headers, body) = reqs.head
          val req = JsonOps.parse(body)
          specName match {
            case "openai.embeddings" =>
              assert(headers.get("Authorization").contains(s"Bearer ${config("api_key")}"))
              assert(req.get("model").asText() == config("model"))
              assert(req.get("input").size() == 1)
              assert(req.get("input").get(0).asText() ==
                "This is a sample text to generate embeddings for.")
            case "openai.textgen" =>
              assert(req.get("model").asText() == config("model"))
              val msgs = req.get("messages")
              assert(msgs.size() == 2)
              assert(msgs.get(0).get("role").asText() == "developer")
              assert(msgs.get(0).get("content").asText() == config("developer_message"))
              assert(msgs.get(1).get("role").asText() == "user")
              assert(msgs.get(1).get("content").asText() == "hello world")
            case "cohere.command" =>
              assert(headers.get("Authorization").contains(s"Bearer ${config("apiKey")}"))
              assert(req.get("model").asText() == config("model"))
              // Go Sprintf("hello", input) — formatless prompt keeps the
              // EXTRA suffix (command.go:154)
              assert(req.get("messages").get(0).get("content").asText() ==
                "hello%!(EXTRA string=who are you?)")
            case "cohere.embed" =>
              assert(req.get("model").asText() == config("model"))
              assert(req.get("texts").size() == 1)
              assert(req.get("texts").get(0).asText() == "test input")
              assert(req.get("embedding_types").get(0).asText() == "float")
            case "cohere.rerank" =>
              assert(req.get("model").asText() == config("model"))
              assert(req.get("query").asText() == config("query"))
              assert(req.get("return_documents").asBoolean())
              assert(req.get("documents").size() == 1)
            case "ollama" =>
              assert(url == s"${config("url")}/api/generate")
              assert(req.get("model").asText() == config("model"))
              assert(req.get("format").asText() == "json")
              assert(!req.get("stream").asBoolean())
              val prompt = req.get("prompt").asText()
              assert(prompt.contains(config("prompt")), "instructions embedded")
              assert(prompt.contains("test-field"), "record embedded")
              assert(prompt.contains("Only send back records in the json format"))
            case _ =>
          }
        }
      }
    }
  }
}

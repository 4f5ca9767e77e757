package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.model.Cdc
import graft.ops.Registry

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
    "webhook.http", "avro.decode", "avro.encode")

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
    * do not replicate — keep this list SHORT and justified.
    */
  private val skips: Set[(String, String)] = Set(
    // autoRegister infers a schema by reflection and registers it on
    // the fly — we support the (recommended) preRegistered strategy;
    // SURVEY §2.6 documents the registry-client gap.
    ("avro.encode", "Auto-register schema"))

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
        val config = Option(ex.get("config"))
          .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty)
        val cleaned = config.filterNot(_._1.startsWith("sdk."))
        val proc = Registry.create(specName,
          if (specName.startsWith("avro.")) cleaned + ("schema" -> avroExampleSchema)
          else cleaned)
        val in = haveToDf(ex.get("have"))
        val out = Cdc.withErrorChannel(proc(in))
        val rows = out.orderBy(col(Cdc.Metadata).getItem("clone.index").cast("int"),
          col(Cdc.Metadata).getItem("split.index").cast("int")).collect()
        val want = ex.get("want")
        if (want.isObject && want.properties().asScala.isEmpty) {
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
      }
    }
  }
}

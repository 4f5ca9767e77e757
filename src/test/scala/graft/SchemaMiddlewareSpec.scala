package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AvroCodec, JsonOps}
import graft.model.Cdc
import graft.ops.Registry
import graft.pipeline.Runner

/** Schema middleware: an Avro-encoded payload is transparently decoded
  * before the processor and re-encoded after, so field processors see
  * structured data (reference registry.go:230-234 behavior).
  */
class SchemaMiddlewareSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private val schema =
    """{"type":"record","name":"E","fields":[
      |{"name":"id","type":"long"},
      |{"name":"dept","type":["null","string"],"default":null}
      |]}""".stripMargin

  test("field.set runs between transparent avro decode/encode") {
    val avroB64 = java.util.Base64.getEncoder.encodeToString(
      AvroCodec.encode("""{"id":7,"dept":null}""",
        AvroCodec.parseSchema(schema), 5))
    val recs = Runner.source(spark, graft.pipeline.ConnectorConfig("g",
      "builtin:generator", Map("format.options.id" -> "int", "recordCount" -> "1")),
      streaming = false)
      .withColumn(Cdc.PayloadAfter, lit(avroB64))
    val proc = Registry.create("field.set", Map(
      "field" -> ".Payload.After.dept", "value" -> "finance",
      "sdk.schema.avro" -> schema, "sdk.schema.id" -> "5",
      "sdk.schema.decode.key.enabled" -> "false",
      "sdk.schema.encode.key.enabled" -> "false"))
    val out = proc(recs).collect().head
    assert(out.getAs[String](Cdc.Error) == null)
    // the output payload is Avro again (raw wire string, latin-1);
    // decode it to check the edit
    val outWire = out.getAs[String](Cdc.PayloadAfter)
    val (id, json) = AvroCodec.decode(
      outWire.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      AvroCodec.parseSchema(schema))
    assert(id == 5)
    val node = JsonOps.parse(json)
    assert(node.get("id").asLong() == 7)
    assert(node.get("dept").asText() == "finance")
  }

  test("registry resolution: subject's latest schema drives decode/encode") {
    graft.ops.SchemaRegistry.clearCache()
    // stub Confluent registry: GET /subjects/emp/versions/latest
    val served = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/subjects/emp/versions/latest",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        served.incrementAndGet()
        val body = graft.functions.JsonOps.render(
          graft.functions.JsonOps.mapper.createObjectNode()
            .put("id", 9).put("version", 1).put("schema", schema))
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.getResponseBody.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val avroWire = new String(
        AvroCodec.encode("""{"id":3,"dept":null}""", AvroCodec.parseSchema(schema), 9),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val recs = Runner.source(spark, graft.pipeline.ConnectorConfig("g",
        "builtin:generator", Map("format.options.id" -> "int", "recordCount" -> "1")),
        streaming = false)
        .withColumn(Cdc.PayloadAfter, lit(avroWire))
      val proc = Registry.create("field.set", Map(
        "field" -> ".Payload.After.dept", "value" -> "ops",
        "sdk.schema.registry.url" -> url, "sdk.schema.subject" -> "emp",
        "sdk.schema.decode.key.enabled" -> "false",
        "sdk.schema.encode.key.enabled" -> "false"))
      val out = proc(recs).collect().head
      assert(out.getAs[String](Cdc.Error) == null)
      val outWire = out.getAs[String](Cdc.PayloadAfter)
      val (id, json) = AvroCodec.decode(
        outWire.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
        AvroCodec.parseSchema(schema))
      assert(id == 9, "re-encode carries the registry-resolved id")
      assert(JsonOps.parse(json).get("dept").asText() == "ops")
      assert(served.get() == 1, "schema resolved once, then cached")
      // a second processor build hits the cache, not the registry
      Registry.create("field.set", Map(
        "field" -> ".Payload.After.dept", "value" -> "x",
        "sdk.schema.registry.url" -> url, "sdk.schema.subject" -> "emp"))
      assert(served.get() == 1)
    } finally server.stop(0)
  }

  test("no schema settings → no wrapping (JSON payload untouched)") {
    val recs = Runner.source(spark, graft.pipeline.ConnectorConfig("g",
      "builtin:generator", Map("format.options.id" -> "int", "recordCount" -> "1")),
      streaming = false)
    val proc = Registry.create("field.set",
      Map("field" -> ".Payload.After.x", "value" -> "1"))
    val out = proc(recs).collect().head
    assert(JsonOps.parse(out.getAs[String](Cdc.PayloadAfter)).get("x").asText() == "1")
  }
}

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

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AvroCodec, JsonOps}
import graft.model.Cdc
import graft.ops.Registry
import graft.pipeline.Runner

/** avro.encode/decode round trips (Confluent wire framing). */
class AvroSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private val schema =
    """{"type":"record","name":"Employee","fields":[
      |{"name":"id","type":"long"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"scores","type":{"type":"array","items":"double"},"default":[]},
      |{"name":"tags","type":{"type":"map","values":"string"},"default":{}}
      |]}""".stripMargin

  test("codec round-trips JSON through Confluent-framed Avro") {
    val json = """{"id":42,"name":"alice","scores":[1.5,2.0],"tags":{"team":"data"}}"""
    val s = AvroCodec.parseSchema(schema)
    val bytes = AvroCodec.encode(json, s, schemaId = 7)
    assert(bytes(0) == 0, "magic byte")
    assert(bytes(4) == 7, "schema id")
    val (id, back) = AvroCodec.decode(bytes, s)
    assert(id == 7)
    assert(JsonOps.parse(back) == JsonOps.parse(json))
  }

  test("avro.encode → avro.decode processors round-trip a payload") {
    val recs = Runner.source(spark, graft.pipeline.ConnectorConfig("g", "builtin:generator",
      Map("format.options.id" -> "int", "recordCount" -> "10")), streaming = false)
      .withColumn(Cdc.PayloadAfter,
        lit("""{"id":5,"name":"bob","scores":[1.0],"tags":{}}"""))
    val enc = Registry.create("avro.encode",
      Map("field" -> ".Payload.After", "schema" -> schema, "schema.id" -> "3"))
    val dec = Registry.create("avro.decode",
      Map("field" -> ".Payload.After", "schema" -> schema))
    val encoded = enc(recs)
    val encVal = encoded.select(col(Cdc.PayloadAfter)).first().getString(0)
    assert(encVal.charAt(0) == '\u0000', "wire-framed raw string")
    assert(encVal.charAt(4) == '\u0003', "schema id in frame")
    val back = dec(encoded).select(col(Cdc.PayloadAfter)).first().getString(0)
    assert(JsonOps.parse(back) ==
      JsonOps.parse("""{"id":5,"name":"bob","scores":[1.0],"tags":{}}"""))
  }

  test("avro.decode of garbage routes to the error channel") {
    val recs = Runner.source(spark, graft.pipeline.ConnectorConfig("g", "builtin:generator",
      Map("format.options.id" -> "int", "recordCount" -> "1")), streaming = false)
      .withColumn(Cdc.PayloadAfter, lit("bm90LWF2cm8=")) // "not-avro" b64
    val dec = Registry.create("avro.decode",
      Map("field" -> ".Payload.After", "schema" -> schema))
    val out = Cdc.withErrorChannel(dec(recs)).collect().head
    assert(out.getAs[String](Cdc.Error) != null)
  }
}

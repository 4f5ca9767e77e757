package graft

import scala.jdk.CollectionConverters._

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

  test("inferSchema: records sorted, long/double/bool/null/array mapping") {
    val s = graft.functions.AvroCodec.inferSchema(JsonOps.parse(
      """{"z":1,"a":2.5,"m":{"y":true,"x":null},"arr":[1,2],"s":"hi"}"""))
    assert(s.getType == org.apache.avro.Schema.Type.RECORD)
    assert(s.getFields.asScala.map(_.name()).toSeq == Seq("a", "arr", "m", "s", "z"))
    assert(s.getField("z").schema().getType == org.apache.avro.Schema.Type.LONG)
    assert(s.getField("a").schema().getType == org.apache.avro.Schema.Type.DOUBLE)
    assert(s.getField("s").schema().getType == org.apache.avro.Schema.Type.STRING)
    assert(s.getField("arr").schema().getType == org.apache.avro.Schema.Type.ARRAY)
    assert(s.getField("arr").schema().getElementType.getType ==
      org.apache.avro.Schema.Type.LONG)
    val m = s.getField("m").schema()
    assert(m.getType == org.apache.avro.Schema.Type.RECORD, "objects become records")
    assert(m.getField("x").schema().getType == org.apache.avro.Schema.Type.UNION)
    assert(m.getField("y").schema().getType == org.apache.avro.Schema.Type.BOOLEAN)
    // a homogeneous stream re-registers nothing: encode 10 rows against a
    // counting transport and expect exactly one POST
    graft.ops.SchemaRegistry.clearCache()
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val t = new graft.ops.HttpTransport {
      override def send(method: String, url: String, headers: Map[String, String],
                        body: Array[Byte]) = {
        counter.incrementAndGet()
        graft.ops.HttpTransport.Response(200, """{"id":7}""".getBytes)
      }
    }
    val recs = Runner.source(spark, graft.pipeline.ConnectorConfig("g", "builtin:generator",
      Map("format.options.id" -> "int", "recordCount" -> "10")), streaming = false)
      .withColumn(Cdc.PayloadAfter, lit("""{"k":1,"v":"x"}"""))
    val out = graft.ops.AvroEncodeAuto(graft.model.Ref.parse(".Payload.After"),
      "subj", "http://registry.local", t)(recs).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getAs[String](Cdc.PayloadAfter).charAt(4) == '\u0007'),
      "registered id in every frame")
    assert(counter.get() == 1, "one registration for a homogeneous stream")
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

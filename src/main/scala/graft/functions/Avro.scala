package graft.functions

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Avro ⇄ canonical-JSON codec with Confluent wire framing (magic byte
  * 0x00 + 4-byte big-endian schema id + Avro binary — the format the
  * reference's avro processors speak, `impl/avro/encode.go:88-135` /
  * `decode.go:114`; framing documented publicly by Confluent).
  *
  * spark-avro's from_avro/to_avro is not on this classpath, so this is
  * built directly on avro-core — which also lets us strip/add the
  * 5-byte header in the same pass instead of substring gymnastics
  * (the "custom expression earns its keep" case from SURVEY §4).
  */
object AvroCodec {
  private val F = JsonNodeFactory.instance

  def parseSchema(json: String): Schema = new Schema.Parser().parse(json)

  // ---- JSON → Avro ---------------------------------------------------
  def jsonToAvro(node: JsonNode, schema: Schema): Any = schema.getType match {
    case Schema.Type.RECORD =>
      val rec = new GenericData.Record(schema)
      schema.getFields.asScala.foreach { f =>
        val v = if (node != null && node.has(f.name())) node.get(f.name()) else null
        rec.put(f.name(), jsonToAvro(v, f.schema()))
      }
      rec
    case Schema.Type.UNION =>
      val nonNull = schema.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      if (node == null || node.isNull) null
      else jsonToAvro(node, nonNull.head)
    case Schema.Type.STRING => if (node == null) null else node.asText()
    case Schema.Type.INT => if (node == null) null else Int.box(node.asInt())
    case Schema.Type.LONG => if (node == null) null else Long.box(node.asLong())
    case Schema.Type.FLOAT => if (node == null) null else Float.box(node.floatValue())
    case Schema.Type.DOUBLE => if (node == null) null else Double.box(node.asDouble())
    case Schema.Type.BOOLEAN => if (node == null) null else Boolean.box(node.asBoolean())
    case Schema.Type.BYTES =>
      if (node == null) null
      else java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(node.asText()))
    case Schema.Type.ARRAY =>
      if (node == null) null
      else node.elements().asScala.map(e => jsonToAvro(e, schema.getElementType))
        .toSeq.asJava
    case Schema.Type.MAP =>
      if (node == null) null
      else {
        val m = new java.util.LinkedHashMap[String, Any]()
        node.properties().asScala.foreach(e =>
          m.put(e.getKey, jsonToAvro(e.getValue, schema.getValueType)))
        m
      }
    case Schema.Type.ENUM =>
      if (node == null) null else new GenericData.EnumSymbol(schema, node.asText())
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  // ---- Avro → JSON ---------------------------------------------------
  def avroToJson(value: Any, schema: Schema): JsonNode = schema.getType match {
    case Schema.Type.RECORD =>
      val o = F.objectNode()
      val rec = value.asInstanceOf[GenericRecord]
      schema.getFields.asScala.foreach(f =>
        o.set[JsonNode](f.name(), avroToJson(rec.get(f.name()), f.schema())))
      o
    case Schema.Type.UNION =>
      if (value == null) F.nullNode()
      else {
        val nonNull = schema.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
        avroToJson(value, nonNull.head)
      }
    case Schema.Type.STRING =>
      if (value == null) F.nullNode() else F.textNode(value.toString)
    case Schema.Type.INT => F.numberNode(value.asInstanceOf[Int])
    case Schema.Type.LONG => F.numberNode(value.asInstanceOf[Long])
    case Schema.Type.FLOAT => F.numberNode(value.asInstanceOf[Float])
    case Schema.Type.DOUBLE => F.numberNode(value.asInstanceOf[Double])
    case Schema.Type.BOOLEAN => F.booleanNode(value.asInstanceOf[Boolean])
    case Schema.Type.BYTES =>
      val bb = value.asInstanceOf[java.nio.ByteBuffer]
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
      F.textNode(java.util.Base64.getEncoder.encodeToString(arr))
    case Schema.Type.ARRAY =>
      val a = F.arrayNode()
      value.asInstanceOf[java.util.Collection[Any]].asScala
        .foreach(e => a.add(avroToJson(e, schema.getElementType)))
      a
    case Schema.Type.MAP =>
      val o = F.objectNode()
      value.asInstanceOf[java.util.Map[Any, Any]].asScala
        .foreach { case (k, v) => o.set[JsonNode](k.toString, avroToJson(v, schema.getValueType)) }
      o
    case Schema.Type.ENUM => F.textNode(value.toString)
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  /** Infer an Avro schema from canonical JSON, mirroring the shape the
    * reference's autoRegister strategy extracts from structured data
    * (`impl/avro/internal/encoder.go:68-95`, verified against the
    * Auto-register golden vector): objects become records with fields
    * sorted alphabetically (heterogeneous maps are records, not avro
    * maps), booleans → boolean, non-integral numbers → double. JSON
    * numbers carry no width, so integral numbers infer as long (same
    * varint wire encoding as the reference's int). Nulls infer as
    * ["null","string"]; array element types come from the first
    * element. Nested record names take the field name with the parent's
    * fullname as namespace, keeping fullnames unique.
    */
  def inferSchema(node: JsonNode, name: String = "record",
                  namespace: String = null): Schema = {
    import Schema.Type
    if (node == null || node.isNull)
      Schema.createUnion(Schema.create(Type.NULL), Schema.create(Type.STRING))
    else if (node.isObject) {
      val rec = Schema.createRecord(name, null, namespace, false)
      val ns = Option(namespace).map(_ + "." + name).getOrElse(name)
      val fields = node.properties().asScala.toSeq.sortBy(_.getKey).map { e =>
        new Schema.Field(e.getKey, inferSchema(e.getValue, e.getKey, ns), null)
      }
      rec.setFields(fields.asJava)
      rec
    }
    else if (node.isTextual) Schema.create(Type.STRING)
    else if (node.isBoolean) Schema.create(Type.BOOLEAN)
    else if (node.isIntegralNumber) Schema.create(Type.LONG)
    else if (node.isNumber) Schema.create(Type.DOUBLE)
    else if (node.isArray) {
      val elem =
        if (node.size() == 0) Schema.create(Type.STRING)
        else inferSchema(node.get(0), name + "_item", namespace)
      Schema.createArray(elem)
    }
    else throw new IllegalArgumentException(s"cannot infer Avro type for $node")
  }

  /** canonical JSON text → Confluent-framed Avro bytes. */
  def encode(json: String, schema: Schema, schemaId: Int): Array[Byte] = {
    val datum = jsonToAvro(JsonOps.parse(json), schema)
    val out = new ByteArrayOutputStream()
    out.write(0) // magic byte
    out.write((schemaId >> 24) & 0xff); out.write((schemaId >> 16) & 0xff)
    out.write((schemaId >> 8) & 0xff); out.write(schemaId & 0xff)
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[Any](schema).write(datum, encoder)
    encoder.flush()
    out.toByteArray
  }

  /** Confluent-framed Avro bytes → (schemaId, canonical JSON text). */
  def decode(bytes: Array[Byte], schema: Schema): (Int, String) = {
    require(bytes.length > 5 && bytes(0) == 0, "not Confluent wire format")
    val schemaId = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    val datum = new GenericDatumReader[Any](schema).read(null, decoder)
    (schemaId, JsonOps.render(avroToJson(datum, schema)))
  }
}

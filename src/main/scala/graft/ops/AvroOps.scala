package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AvroCodec
import graft.model.{Cdc, Ref}

/** avro.encode / avro.decode (reference `impl/avro/encode.go:135`,
  * `impl/avro/decode.go:114`): structured data ⇄ Confluent-wire-format
  * Avro at a field ref. The reference fetches schemas from a registry;
  * we support the `preRegistered` strategy with the schema inline in
  * settings (`schema` = Avro JSON, `schema.id`) — a registry client is
  * a straightforward extension point on top of the same codec. Binary
  * Avro lives in the string slot as the reference renders RawData: the
  * wire bytes mapped 1:1 to chars (latin-1, lossless through
  * UTF8String); decode also accepts base64 for round-trips through
  * sinks that can't carry NUL bytes.
  */
object AvroExpressions {
  case class AvroEncodeExpr(child: Expression, schemaJson: String, schemaId: Int)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val schema = AvroCodec.parseSchema(schemaJson)
    override def dataType: DataType = StructType(Seq(
      StructField("value", StringType), StructField("error", StringType)))
    override def nullable: Boolean = false
    override def prettyName: String = "avro_encode"
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericInternalRow(Array[Any](null, null))
      try {
        val bytes = AvroCodec.encode(v.asInstanceOf[UTF8String].toString, schema, schemaId)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)),
          null))
      } catch {
        case e: Exception => new GenericInternalRow(Array[Any](v,
          UTF8String.fromString(s"avro.encode: ${e.getMessage}")))
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** `avro.encode` with the reference's default `autoRegister` strategy
    * (`impl/avro/internal/encoder.go:68-95`): infer the schema from each
    * record's structured payload, register it under the subject, encode
    * with the returned id. Inference + registration are cached per
    * schema text ([[SchemaRegistry.register]]), so a homogeneous stream
    * costs one registry call per executor JVM, then pure encoding.
    */
  case class AvroAutoEncodeExpr(child: Expression, subject: String,
                                registryUrl: String, transport: HttpTransport)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("value", StringType), StructField("error", StringType)))
    override def nullable: Boolean = false
    override def prettyName: String = "avro_encode_auto"
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericInternalRow(Array[Any](null, null))
      try {
        val json = v.asInstanceOf[UTF8String].toString
        val schema = AvroCodec.inferSchema(graft.functions.JsonOps.parse(json))
        val id = SchemaRegistry.register(registryUrl, subject, schema.toString, transport)
        val bytes = AvroCodec.encode(json, schema, id)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)),
          null))
      } catch {
        case e: Exception => new GenericInternalRow(Array[Any](v,
          UTF8String.fromString(s"avro.encode: ${e.getMessage}")))
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class AvroDecodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val schema = AvroCodec.parseSchema(schemaJson)
    override def dataType: DataType = StructType(Seq(
      StructField("value", StringType), StructField("error", StringType)))
    override def nullable: Boolean = false
    override def prettyName: String = "avro_decode"
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericInternalRow(Array[Any](null, null))
      try {
        val s = v.asInstanceOf[UTF8String].toString
        // Confluent framing always begins with magic byte 0x00: a
        // leading NUL char means raw wire bytes (latin-1), else base64
        val bytes =
          if (s.nonEmpty && s.charAt(0) == '\u0000')
            s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          else java.util.Base64.getDecoder.decode(s)
        val (_, json) = AvroCodec.decode(bytes, schema)
        new GenericInternalRow(Array[Any](UTF8String.fromString(json), null))
      } catch {
        case e: Exception => new GenericInternalRow(Array[Any](v,
          UTF8String.fromString(s"avro.decode: ${e.getMessage}")))
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }
}

case class AvroEncode(ref: Ref, schemaJson: String, schemaId: Int)
    extends ColumnProcessor {
  val plugin = "avro.encode"
  override def tempColumns(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val src = if (ref.sub.isEmpty) col(slot)
      else graft.functions.JsonExpressions.jsonGet(col(slot), ref.sub, raw = false)
    Map("_avro" -> Bridge.column(
      AvroExpressions.AvroEncodeExpr(Bridge.expression(src), schemaJson, schemaId)))
  }
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val value = col("_avro").getField("value")
    Map(
      slot -> (if (ref.sub.isEmpty) value
        else graft.functions.JsonExpressions.jsonSet(col(slot), ref.sub, value)),
      Cdc.Error -> coalesce(col(Cdc.Error), col("_avro").getField("error")))
  }
}

/** The autoRegister strategy as a processor: per-record schema
  * inference, subject registration, Confluent-framed encode.
  */
case class AvroEncodeAuto(ref: Ref, subject: String, registryUrl: String,
                          transport: HttpTransport = HttpTransport.Default)
    extends ColumnProcessor {
  val plugin = "avro.encode"
  override def tempColumns(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val src = if (ref.sub.isEmpty) col(slot)
      else graft.functions.JsonExpressions.jsonGet(col(slot), ref.sub, raw = true)
    Map("_avro" -> Bridge.column(
      AvroExpressions.AvroAutoEncodeExpr(Bridge.expression(src), subject,
        registryUrl, transport)))
  }
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val value = col("_avro").getField("value")
    Map(
      slot -> (if (ref.sub.isEmpty) value
        else graft.functions.JsonExpressions.jsonSet(col(slot), ref.sub, value)),
      Cdc.Error -> coalesce(col(Cdc.Error), col("_avro").getField("error")))
  }
}

case class AvroDecode(ref: Ref, schemaJson: String) extends ColumnProcessor {
  val plugin = "avro.decode"
  override def tempColumns(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val src = if (ref.sub.isEmpty) col(slot)
      else graft.functions.JsonExpressions.jsonGet(col(slot), ref.sub, raw = true)
    Map("_avro" -> Bridge.column(
      AvroExpressions.AvroDecodeExpr(Bridge.expression(src), schemaJson)))
  }
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val value = col("_avro").getField("value")
    Map(
      slot -> (if (ref.sub.isEmpty) value
        else graft.functions.JsonExpressions.jsonSet(col(slot), ref.sub, value, rawJson = true)),
      Cdc.Error -> coalesce(col(Cdc.Error), col("_avro").getField("error")))
  }
}

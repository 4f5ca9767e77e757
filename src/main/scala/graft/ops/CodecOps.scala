package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.model.{Cdc, Ref}
import graft.model.Ref._
import graft.functions.JsonExpressions._

/** `json.decode` — parse raw JSON text into structured data at a ref
  * (reference `impl/json/decode.go:78`). Whole-slot decode also folds
  * the raw binary sibling for `.Key`. Malformed JSON → `_error`.
  *
  * Typed fast path: on a struct slot the target field is parsed with
  * `from_json` against the `schema` setting (Spark DDL, e.g.
  * `"k INT, tags ARRAY<STRING>"`) — a schemaless decode cannot exist
  * inside a fixed-schema struct, so typed decode REQUIRES the schema;
  * everything stays codegen'd, no Jackson.
  */
case class JsonDecode(ref: Ref, schemaDdl: Option[String] = None)
    extends ColumnProcessor {
  val plugin = "json.decode"
  override def tempColumns(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    df.schema(slot).dataType match {
      case st: org.apache.spark.sql.types.StructType =>
        if (ref.sub.isEmpty) // whole slot is already structured: no-op
          Map("_decoded" -> struct(col(slot).as("value"),
            lit(null).cast(StringType).as("error")))
        else {
          val ddl = schemaDdl.getOrElse(throw new IllegalArgumentException(
            "json.decode on a typed payload requires the 'schema' setting (Spark DDL)"))
          val target = StructOps.get(col(slot), ref.sub)
          val parsed = from_json(target.cast(StringType),
            org.apache.spark.sql.types.StructType.fromDDL(ddl))
          Map("_decoded" -> struct(
            StructOps.set(col(slot), st, ref.sub, parsed).as("value"),
            when(target.isNotNull && parsed.isNull,
              lit("failed to decode JSON")).cast(StringType).as("error")))
        }
      case _ =>
        val source = ref match {
          case KeyRef(Seq()) =>
            coalesce(col(Cdc.Key), col(Cdc.KeyRaw).cast(StringType))
          case _ => col(slot)
        }
        Map("_decoded" -> jsonParse(source, ref.sub))
    }
  }
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val base = Map(
      slot -> col("_decoded").getField("value"),
      Cdc.Error -> coalesce(col(Cdc.Error), col("_decoded").getField("error")))
    if (ref == KeyRef(Nil) && !Cdc.isTypedSlot(df, Cdc.Key))
      base + (Cdc.KeyRaw -> lit(null).cast(BinaryType))
    else base
  }
}

/** `json.encode` — structured data at a ref → compact JSON text
  * (reference `impl/json/encode.go:77`). A sub-field becomes a JSON
  * string node; a whole slot canonicalizes to its compact rendering.
  */
case class JsonEncode(ref: Ref) extends ColumnProcessor {
  val plugin = "json.encode"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    df.schema(slot).dataType match {
      case st: org.apache.spark.sql.types.StructType =>
        // typed: one to_json at the requested node — the wire-edge
        // rendering. Complex fields serialize; scalars string-cast.
        ref.sub match {
          case Seq() => Map(slot -> to_json(col(slot)))
          case sub =>
            val field = StructOps.get(col(slot), sub)
            val encoded = StructOps.fieldType(st, sub) match {
              case Some(_: org.apache.spark.sql.types.StructType) |
                   Some(_: org.apache.spark.sql.types.ArrayType) |
                   Some(_: org.apache.spark.sql.types.MapType) => to_json(field)
              case _ => field.cast(StringType)
            }
            Map(slot -> StructOps.set(col(slot), st, sub, encoded))
        }
      case _ => ref.sub match {
        case Seq() => Map(slot -> jsonGet(col(slot), Nil, raw = false))
        case sub =>
          Map(slot -> jsonSet(col(slot), sub, jsonGet(col(slot), sub, raw = false)))
      }
    }
  }
}

/** `base64.encode` — field value → base64 text (reference
  * `impl/base64/encode.go:79`; Go `base64.StdEncoding` ≡ Spark
  * `base64`, same alphabet, no line wrapping).
  */
case class Base64Encode(ref: Ref) extends ColumnProcessor {
  val plugin = "base64.encode"
  override def rewrites(df: DataFrame): Map[String, Column] = ref match {
    case MetadataRef(Seq(k)) =>
      Map(Cdc.Metadata -> RefCols.metaSet(col(Cdc.Metadata), k,
        base64(col(Cdc.Metadata).getItem(k).cast(BinaryType))))
    case r =>
      val slot = RefCols.column(r)
      df.schema(slot).dataType match {
        case st: org.apache.spark.sql.types.StructType =>
          r.sub match {
            case Seq() => Map(slot -> base64(to_json(col(slot)).cast(BinaryType)))
            case sub => Map(slot -> StructOps.set(col(slot), st, sub,
              base64(StructOps.get(col(slot), sub).cast(StringType).cast(BinaryType))))
          }
        case _ => r.sub match {
          case Seq() => Map(slot -> base64(col(slot).cast(BinaryType)))
          case sub => Map(slot -> jsonSet(col(slot), sub,
            base64(jsonGet(col(slot), sub, raw = true).cast(BinaryType))))
        }
      }
  }
}

/** `base64.decode` — base64 text → raw string (reference
  * `impl/base64/decode.go:76`).
  */
case class Base64Decode(ref: Ref) extends ColumnProcessor {
  val plugin = "base64.decode"
  override def rewrites(df: DataFrame): Map[String, Column] = ref match {
    case MetadataRef(Seq(k)) =>
      Map(Cdc.Metadata -> RefCols.metaSet(col(Cdc.Metadata), k,
        unbase64(col(Cdc.Metadata).getItem(k)).cast(StringType)))
    case r =>
      val slot = RefCols.column(r)
      df.schema(slot).dataType match {
        case st: org.apache.spark.sql.types.StructType =>
          r.sub match {
            case Seq() => Map(slot -> unbase64(col(slot).cast(StringType)).cast(StringType))
            case sub => Map(slot -> StructOps.set(col(slot), st, sub,
              unbase64(StructOps.get(col(slot), sub).cast(StringType)).cast(StringType)))
          }
        case _ => r.sub match {
          case Seq() => Map(slot -> unbase64(col(slot)).cast(StringType))
          case sub => Map(slot -> jsonSet(col(slot), sub,
            unbase64(jsonGet(col(slot), sub, raw = true)).cast(StringType)))
        }
      }
  }
}

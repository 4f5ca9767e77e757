package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, LongType, MapType, StringType, StructType, TimestampType}

import graft.model.{Cdc, Ref}
import graft.model.Ref._
import graft.functions.JsonExpressions._

/** Shared slot addressing: which CDC column a [[Ref]] lives in. */
object RefCols {
  def column(ref: Ref): String = ref match {
    case OperationRef => Cdc.Operation
    case PositionRef => Cdc.Position
    case MetadataRef(_) => Cdc.Metadata
    case KeyRef(_) => Cdc.Key
    case PayloadBeforeRef(_) => Cdc.PayloadBefore
    case PayloadAfterRef(_) | PayloadRef => Cdc.PayloadAfter
  }

  /** Read a reference as a string Column (raw rendering for strings). */
  def get(ref: Ref): Column = ref match {
    case OperationRef => col(Cdc.Operation)
    case PositionRef => col(Cdc.Position).cast(StringType)
    case MetadataRef(Seq(k)) => col(Cdc.Metadata).getItem(k)
    case MetadataRef(_) => to_json(col(Cdc.Metadata))
    case KeyRef(Seq()) => col(Cdc.Key)
    case KeyRef(rest) => jsonGet(col(Cdc.Key), rest, raw = true)
    case PayloadBeforeRef(rest) => jsonGet(col(Cdc.PayloadBefore), rest, raw = rest.nonEmpty)
    case PayloadAfterRef(rest) => jsonGet(col(Cdc.PayloadAfter), rest, raw = rest.nonEmpty)
    case PayloadRef => col(Cdc.PayloadAfter)
  }

  /** Upsert a metadata key without relying on mapKeyDedupPolicy. */
  def metaSet(meta: Column, key: String, value: Column): Column =
    map_concat(
      map_filter(coalesce(meta, map()), (k, _) => k =!= lit(key)),
      map(lit(key), value))
}

/** `field.set` — set a field to a templated value
  * (reference `pkg/plugin/processor/builtin/impl/field/set.go:89`;
  * `.Position` is forbidden, `field/set.go:43-51`).
  */
case class FieldSet(ref: Ref, value: String) extends ColumnProcessor {
  require(ref != PositionRef, "field.set: .Position is forbidden")
  require(ref != PayloadRef, "field.set: use .Payload.Before or .Payload.After")
  val plugin = "field.set"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val v = Conditions.template(value, Conditions.typedSlots(df))
    // typed slot → withField (codegen'd struct op); JSON slot → Jackson
    def slotSet(slot: String, rest: Seq[String]): Map[String, Column] =
      df.schema(slot).dataType match {
        case st: StructType => Map(slot -> StructOps.set(col(slot), st, rest, v))
        case _ => Map(slot -> jsonSet(col(slot), rest, v))
      }
    ref match {
      case OperationRef => Map(Cdc.Operation -> v)
      case MetadataRef(Seq(k)) =>
        Map(Cdc.Metadata -> RefCols.metaSet(col(Cdc.Metadata), k, v))
      case MetadataRef(_) =>
        Map(Cdc.Metadata -> from_json(v, MapType(StringType, StringType)))
      case KeyRef(rest) => slotSet(Cdc.Key, rest)
      case PayloadBeforeRef(rest) => slotSet(Cdc.PayloadBefore, rest)
      case PayloadAfterRef(rest) => slotSet(Cdc.PayloadAfter, rest)
      case PositionRef | PayloadRef => Map.empty // rejected by require
    }
  }
}

/** `field.rename` — comma-separated `ref:newName` mapping
  * (reference `impl/field/rename.go:114`).
  */
case class FieldRename(mapping: Seq[(Ref, String)]) extends ColumnProcessor {
  val plugin = "field.rename"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val bySlot = mapping.groupBy { case (r, _) => RefCols.column(r) }
    bySlot.map {
      case (Cdc.Metadata, renames) =>
        var c = col(Cdc.Metadata)
        for ((MetadataRef(Seq(k)), newName) <- renames)
          c = transform_keys(c, (key, _) => when(key === lit(k), lit(newName)).otherwise(key))
        Cdc.Metadata -> c
      case (slot, renames) =>
        val pairs = renames.map { case (r, n) => (r.sub, n) }
        slot -> (df.schema(slot).dataType match {
          case st: StructType => StructOps.rename(col(slot), st, pairs)
          case _ => jsonRename(col(slot), pairs)
        })
    }
  }
}

/** `field.exclude` — drop fields (reference `impl/field/exclude.go:83`). */
case class FieldExclude(refs: Seq[Ref]) extends ColumnProcessor {
  val plugin = "field.exclude"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val expanded = refs.flatMap {
      case PayloadRef => Seq(PayloadBeforeRef(Nil), PayloadAfterRef(Nil))
      case r => Seq(r)
    }
    val bySlot = expanded.groupBy(RefCols.column)
    bySlot.map {
      case (Cdc.Metadata, rs) =>
        val keys = rs.collect { case MetadataRef(Seq(k)) => k }
        val whole = rs.exists(_.sub.isEmpty)
        Cdc.Metadata -> (
          if (whole) map().cast(MapType(StringType, StringType))
          else map_filter(col(Cdc.Metadata), (k, _) => !k.isin(keys.map(lit(_)): _*)))
      case (Cdc.Operation, _) => Cdc.Operation -> col(Cdc.Operation) // not excludable
      case (slot, rs) =>
        val whole = rs.exists(_.sub.isEmpty)
        val paths = rs.map(_.sub).filter(_.nonEmpty)
        slot -> (df.schema(slot).dataType match {
          case st: StructType =>
            if (whole) lit(null).cast(st) else StructOps.drop(col(slot), st, paths)
          case _ =>
            if (whole) lit(null).cast(StringType) else jsonDrop(col(slot), paths)
        })
    }
  }
}

/** `field.convert` — cast a Key/Payload field to string|int|float|bool|
  * time via the reference's string-intermediary rules
  * (`impl/field/convert.go:84-153`); parse failure → `_error`/DLQ.
  */
case class FieldConvert(ref: Ref, targetType: String) extends ColumnProcessor {
  // the reference restricts convert to Key/Payload refs
  // (validation regex `^.(Payload|Key).*`, `field/convert.go:49`)
  require(ref match {
    case KeyRef(_) | PayloadBeforeRef(_) | PayloadAfterRef(_) => true
    case _ => false
  }, s"field.convert: field must reference .Key or .Payload, got $ref")
  val plugin = "field.convert"
  override def tempColumns(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    Map("_convert" -> (df.schema(slot).dataType match {
      case st: StructType => typedConvert(col(slot), st)
      case _ => jsonConvert(col(slot), ref.sub, targetType)
    }))
  }
  override def rewrites(df: DataFrame): Map[String, Column] =
    Map(
      RefCols.column(ref) -> col("_convert").getField("value"),
      Cdc.Error -> coalesce(col(Cdc.Error), col("_convert").getField("error")))

  /** Typed path: a plain Catalyst cast inside codegen. Spark's casts
    * cover the reference's string-intermediary matrix (numbers↔strings,
    * bool words, epoch/ISO time); a failed cast yields null which flows
    * to `_error`/DLQ exactly like the Jackson path.
    */
  private def typedConvert(slot: Column, st: StructType): Column = {
    val target: DataType = targetType match {
      case "string" => StringType
      case "int" => LongType
      case "float" => DoubleType
      case "bool" => BooleanType
      case "time" => TimestampType
      case other =>
        throw new IllegalArgumentException(s"field.convert: unknown type $other")
    }
    if (ref.sub.nonEmpty && !StructOps.has(st, ref.sub))
      struct(slot.as("value"), lit(null).cast(StringType).as("error")) // absent → no-op
    else {
      val field = StructOps.get(slot, ref.sub)
      val converted = field.try_cast(target) // ANSI-safe: null, not throw
      struct(
        StructOps.set(slot, st, ref.sub, converted).as("value"),
        when(field.isNotNull && converted.isNull,
          lit(s"field.convert: cannot convert to $targetType"))
          .cast(StringType).as("error"))
    }
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType, MapType}

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
    val v = Conditions.template(value)
    ref match {
      case OperationRef => Map(Cdc.Operation -> v)
      case MetadataRef(Seq(k)) =>
        Map(Cdc.Metadata -> RefCols.metaSet(col(Cdc.Metadata), k, v))
      case MetadataRef(_) =>
        Map(Cdc.Metadata -> from_json(v, MapType(StringType, StringType)))
      case KeyRef(rest) => Map(Cdc.Key -> jsonSet(col(Cdc.Key), rest, v))
      case PayloadBeforeRef(rest) =>
        Map(Cdc.PayloadBefore -> jsonSet(col(Cdc.PayloadBefore), rest, v))
      case PayloadAfterRef(rest) =>
        Map(Cdc.PayloadAfter -> jsonSet(col(Cdc.PayloadAfter), rest, v))
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
        slot -> jsonRename(col(slot), renames.map { case (r, n) => (r.sub, n) })
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
        slot -> (
          if (whole) lit(null).cast(StringType)
          else jsonDrop(col(slot), rs.map(_.sub).filter(_.nonEmpty)))
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
  override def tempColumns(df: DataFrame): Map[String, Column] =
    Map("_convert" -> jsonConvert(col(RefCols.column(ref)), ref.sub, targetType))
  override def rewrites(df: DataFrame): Map[String, Column] =
    Map(
      RefCols.column(ref) -> col("_convert").getField("value"),
      Cdc.Error -> coalesce(col(Cdc.Error), col("_convert").getField("error")))
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Typed fast path for fixed-schema payloads.
  *
  * The reference's processors operate on dynamic payloads, which this
  * engine carries as canonical-JSON strings — every processor pays a
  * per-record Jackson parse (the dominant engine cost, PERF.md). When
  * the payload schema IS known (parquet tables via [[graft.model.Cdc
  * .wrapTyped]], avro-decoded records, schema-middleware pipelines),
  * the slot is a native struct column and the field processors compile
  * to Catalyst struct ops instead — `withField` / `dropFields` / casts
  * that stay inside WholeStageCodegen with zero per-record parsing.
  * `to_json` runs once at the wire edge if a sink needs JSON.
  *
  * Path resolution is schema-aware at PLAN time: what the JSON path
  * decides per record (absent path → no-op) the struct path decides
  * once against the StructType. Processors dispatch on the slot's
  * dtype, so typed and dynamic records flow through the same pipeline
  * definitions.
  */
object StructOps {
  private def q(s: String) = "`" + s.replace("`", "``") + "`"
  private def dotted(path: Seq[String]) = path.map(q).mkString(".")

  /** The DataType at `path` inside `schema`, if present. */
  def fieldType(schema: StructType, path: Seq[String]): Option[DataType] =
    path.foldLeft(Option(schema: DataType)) {
      case (Some(st: StructType), name) => st.fields.find(_.name == name).map(_.dataType)
      case _ => None
    }

  def has(schema: StructType, path: Seq[String]): Boolean =
    fieldType(schema, path).isDefined

  def get(slot: Column, path: Seq[String]): Column =
    path.foldLeft(slot)(_.getField(_))

  /** Set `path` to `value`, creating missing intermediate structs (the
    * JSON set semantics, reference `field/set.go:89-106`). Empty path =
    * whole-slot assignment: the value replaces the slot.
    */
  def set(slot: Column, schema: StructType, path: Seq[String], value: Column): Column =
    path match {
      case Seq() => value
      case Seq(head) => slot.withField(q(head), value)
      case Seq(head, rest @ _*) =>
        fieldType(schema, Seq(head)) match {
          case Some(st: StructType) =>
            slot.withField(q(head), set(slot.getField(head), st, rest, value))
          case _ => // absent or scalar intermediate: graft a fresh subtree
            slot.withField(q(head), freshStruct(rest, value))
        }
    }

  private def freshStruct(path: Seq[String], value: Column): Column =
    path.foldRight(value)((name, inner) => struct(inner.as(name)))

  /** Drop existing paths; absent paths no-op (reference
    * `field/exclude.go:83`).
    */
  def drop(slot: Column, schema: StructType, paths: Seq[Seq[String]]): Column =
    paths.filter(p => p.nonEmpty && has(schema, p))
      .foldLeft(slot)((c, p) => c.dropFields(dotted(p)))

  /** Rename fields; absent sources no-op. `withField` appends renamed
    * fields at the end of the parent struct — typed mode does not
    * preserve field order (only the JSON rendering cares, and typed
    * pipelines render at the edge).
    */
  def rename(slot: Column, schema: StructType, renames: Seq[(Seq[String], String)]): Column =
    renames.foldLeft(slot) { case (c, (path, newName)) =>
      if (path.isEmpty || !has(schema, path)) c
      else {
        val target = path.dropRight(1) :+ newName
        c.withField(dotted(target), get(c, path)).dropFields(dotted(path))
      }
    }
}

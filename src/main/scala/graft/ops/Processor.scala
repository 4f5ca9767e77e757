package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Cdc

/** A processor is a total transform over a CDC-shaped DataFrame.
  *
  * The reference's processor SDK returns one of SingleRecord /
  * FilterRecord / ErrorRecord / MultiRecord per input record
  * (dispatch at reference `pkg/lifecycle-poc/funnel/processor.go:147-161`).
  * In Spark these collapse into a declarative `DataFrame => DataFrame`
  * where: transforms are column rewrites, filters are `Filter` nodes,
  * errors set the `_error` column (routed to the DLQ by the runner),
  * and multi-records are `explode`s. Catalyst then fuses the whole
  * processor chain into one whole-stage-codegen'd pass — the reference
  * runs one goroutine per processor, we run zero extra passes.
  */
trait Processor extends Serializable {
  def plugin: String
  /** Unconditional transform. Must preserve the CDC schema (plus the
    * optional `_error` column) and never throw on bad data.
    */
  def transform(df: DataFrame): DataFrame

  /** Conditional application (reference per-processor `condition`,
    * `pkg/processor/processor_condition.go:29-63`): records failing the
    * condition bypass untouched. Default = split/union; column-rewrite
    * processors override with a cheaper `when(cond, new).otherwise(old)`.
    */
  def transformConditional(df: DataFrame, cond: Column): DataFrame = {
    val base = Cdc.withErrorChannel(df)
    val hit = transform(base.filter(coalesce(cond, lit(false))))
    val miss = base.filter(!coalesce(cond, lit(false)))
    Cdc.withErrorChannel(hit).unionByName(Cdc.withErrorChannel(miss))
  }

  final def apply(df: DataFrame, condition: Option[String] = None): DataFrame =
    condition match {
      case None => transform(df)
      case Some(c) =>
        transformConditional(df, Conditions.compile(c, Conditions.typedSlots(df)))
    }
}

/** Record-local column-rewrite processor (SingleRecord semantics). */
trait ColumnProcessor extends Processor {
  /** Column rewrites; key = CDC column name. */
  def rewrites(df: DataFrame): Map[String, Column]

  /** Expensive shared subexpressions, materialized in their own
    * projection before `rewrites` runs. A struct expression referenced
    * by two rewrites (value + `_error`) would otherwise be COPIED into
    * both trees and evaluated twice per row — multi-referenced
    * non-cheap aliases are exactly what CollapseProject refuses to
    * inline, so this splits the evaluation into one pass.
    */
  def tempColumns(df: DataFrame): Map[String, Column] = Map.empty

  override def transform(df: DataFrame): DataFrame = {
    val tmp = tempColumns(df)
    val rw = rewrites(df)
    val base0 = if (rw.contains(Cdc.Error)) Cdc.withErrorChannel(df) else df
    val base = if (tmp.isEmpty) base0 else base0.withColumns(tmp)
    base.withColumns(rw).drop(tmp.keys.toSeq: _*)
  }
  override def transformConditional(df: DataFrame, cond: Column): DataFrame = {
    val tmp = tempColumns(df)
    val rw = rewrites(df)
    val base0 = if (rw.contains(Cdc.Error)) Cdc.withErrorChannel(df) else df
    val base = if (tmp.isEmpty) base0 else base0.withColumns(tmp)
    val gated = rw.map { case (name, c) =>
      name -> when(coalesce(cond, lit(false)), c).otherwise(col(name))
    }
    base.withColumns(gated).drop(tmp.keys.toSeq: _*)
  }
}

/** Compiles reference-style condition / value templates to Columns.
  *
  * The reference evaluates Go `text/template` against the record
  * (`pkg/processor/processor_condition.go:29-63`). We deliberately do
  * not re-implement Go templates (SURVEY §1.5): the expression surface
  * is Spark SQL, with reference-style field tokens (`.Metadata.foo`,
  * `.Payload.After.x`, `.Operation`, `.Key.id`) rewritten to column
  * expressions, plus the two prefix comparators (`eq`/`ne`) the
  * reference's own examples use.
  */
object Conditions {
  private val token = """\.(?:Payload\.(?:After|Before)|Metadata|Key|Operation|Position)(?:\.[A-Za-z_][A-Za-z0-9_.]*)?""".r

  /** Slots of `df` carrying typed (struct) data, with their schemas —
    * their tokens compile to native struct field access instead of
    * `get_json_object`, which is both the typed fast path and required
    * for correctness (JSON functions reject struct inputs). The schema
    * lets the compiler resolve ABSENT paths to null at plan time, so a
    * condition on a missing field degrades to false per record (the
    * JSON path / reference template behavior) instead of failing
    * analysis.
    */
  def typedSlots(df: DataFrame): Map[String, org.apache.spark.sql.types.StructType] =
    Seq(Cdc.Key, Cdc.PayloadBefore, Cdc.PayloadAfter)
      .filter(s => Cdc.isTypedSlot(df, s))
      .map(s => s -> df.schema(s).dataType.asInstanceOf[org.apache.spark.sql.types.StructType])
      .toMap

  /** Rewrite reference field tokens into Spark SQL fragments. */
  def rewriteTokens(s: String,
      typed: Map[String, org.apache.spark.sql.types.StructType] = Map.empty): String =
    token.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(tokenToSql(m.matched, typed)))

  private def bt(parts: Seq[String]): String =
    parts.map(p => "`" + p.replace("`", "``") + "`").mkString(".")

  private def tokenToSql(t: String,
      typed: Map[String, org.apache.spark.sql.types.StructType]): String = {
    import graft.model.Ref._
    def slotPath(slot: String, rest: Seq[String]): String =
      if (rest.isEmpty) slot
      else typed.get(slot) match {
        case Some(schema) =>
          // absent path (or one through a scalar intermediate) → null,
          // so conditions degrade to false instead of AnalysisException
          if (StructOps.has(schema, rest)) s"$slot.${bt(rest)}"
          else "CAST(NULL AS STRING)"
        case None => s"get_json_object($slot, '$$.${rest.mkString(".")}')"
      }
    graft.model.Ref.parse(t) match {
      case OperationRef => "operation"
      case PositionRef => "position"
      case MetadataRef(Seq()) => "metadata"
      case MetadataRef(Seq(k)) => s"metadata['$k']"
      case MetadataRef(_) => "metadata"
      case KeyRef(rest) => slotPath("key", rest)
      case PayloadBeforeRef(rest) => slotPath("payload_before", rest)
      case PayloadAfterRef(rest) => slotPath("payload_after", rest)
      case PayloadRef => "payload_after" // token grammar never emits bare .Payload
    }
  }

  private val goPrefixCmp = """^\s*(eq|ne)\s+(\S+)\s+(.+?)\s*$""".r
  // Go template `index .Metadata "k"` — the reference kafka
  // destination's default topic template (metadata map lookup)
  private val goIndexMeta = """^\s*index\s+\.Metadata\s+"([^"]+)"\s*$""".r

  /** One `{{ ... }}` body (or bare SQL) to a SQL fragment. */
  private def bodyToSql(body: String,
      typed: Map[String, org.apache.spark.sql.types.StructType]): String = body.trim match {
    case goIndexMeta(k) => s"metadata['${k.replace("'", "''")}']"
    case goPrefixCmp(op, a, b) =>
      val sql = if (op == "eq") "=" else "<>"
      s"(${rewriteTokens(a, typed)} $sql ${rewriteTokens(b, typed)})"
    case other => rewriteTokens(other, typed)
  }

  /** Condition string → boolean Column. Accepts `{{ expr }}` (reference
    * style) or a bare Spark SQL boolean expression.
    */
  def compile(condition: String,
      typed: Map[String, org.apache.spark.sql.types.StructType] = Map.empty): Column = {
    val body = condition.trim match {
      case s if s.startsWith("{{") && s.endsWith("}}") => s.drop(2).dropRight(2)
      case s => s
    }
    expr(bodyToSql(body, typed)).cast("boolean")
  }

  private val tmpl = """\{\{(.*?)\}\}""".r

  /** Value template → string Column: literal text with embedded
    * `{{ expr }}` segments (reference `field/set.go:49-51`). Booleans
    * and numbers render via Spark's string cast ("true"/"false", etc.).
    */
  def template(value: String,
      typed: Map[String, org.apache.spark.sql.types.StructType] = Map.empty): Column = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- tmpl.findAllMatchIn(value)) {
      if (m.start > last) pieces += lit(value.substring(last, m.start))
      pieces += expr(bodyToSql(m.group(1), typed)).cast("string")
      last = m.end
    }
    if (last < value.length) pieces += lit(value.substring(last))
    if (pieces.isEmpty) lit("")
    else if (pieces.size == 1) pieces.head
    else concat_ws("", pieces.toSeq: _*)
  }
}

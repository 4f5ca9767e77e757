package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** as_of_pick(versions, t) → the version struct with the greatest
  * time ≤ t, or null if none: a binary search over a PACKED,
  * time-sorted array<struct<t, ...>> — the probe side of a broadcast
  * as-of join. [[Temporal.asOfJoin]] (union-sort) is the general
  * shuffle formulation; this expression is the small-right-side /
  * stream-static formulation, where the versions table collapses to
  * one array per key, rides a broadcast hash join, and each probe is
  * O(log v) with no shuffle of the probe side at all — the shape a
  * feature-store point-in-time lookup wants at 100 TB probe scale.
  *
  * The ordering field must be the struct's FIRST field (long); the
  * array must be sorted ascending on it (`sort_array` on a struct
  * sorts by first field first).
  */
case class AsOfPick(versions: Expression, probe: Expression)
    extends BinaryExpression {
  override def left: Expression = versions
  override def right: Expression = probe
  override def prettyName: String = "as_of_pick"

  private lazy val elemType: StructType = versions.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val nFields = elemType.size

  override def dataType: DataType = elemType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    versions.dataType match {
      case ArrayType(s: StructType, _)
          if s.nonEmpty && s.head.dataType == LongType &&
            probe.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"as_of_pick needs (array<struct<long, ...>>, long), got " +
            s"(${versions.dataType.simpleString}, ${probe.dataType.simpleString})")
    }

  /** Binary search: greatest index with t_idx ≤ probe. Called from
    * both eval and the generated code (reference-object pattern, as
    * in BloomMightContain) — the surrounding operator stays inside
    * whole-stage codegen.
    */
  def pick(a: ArrayData, t: Long): InternalRow = {
    var lo = 0
    var hi = a.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (a.getStruct(mid, nFields).getLong(0) <= t) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    // copy: an UnsafeArrayData element row aliases the array buffer
    if (ans < 0) null else a.getStruct(ans, nFields).copy()
  }

  override def nullSafeEval(a: Any, t: Any): Any =
    pick(a.asInstanceOf[ArrayData], t.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("asOfPick", this, classOf[AsOfPick].getName)
    nullSafeCodeGen(ctx, ev, (a, t) => s"""
       |${ev.value} = $ref.pick($a, $t);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(versions = l, probe = r)
}

object TemporalFunctions {
  def as_of_pick(versions: Column, probe: Column): Column =
    Bridge.column(AsOfPick(Bridge.expression(versions), Bridge.expression(probe)))
}

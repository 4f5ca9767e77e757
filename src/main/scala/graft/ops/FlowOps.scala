package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, MapType, StringType}

import graft.model.{Cdc, Ref}
import graft.model.Ref._
import graft.functions.JsonExpressions._

/** `filter` — drops every record it sees; selectivity comes from the
  * per-processor condition (reference `impl/filter.go:49` +
  * `pkg/processor/processor_condition.go:52-63`). With a condition the
  * two collapse into a single Catalyst `Filter` node — exactly the
  * "condition+filter collapse" called out in SURVEY §2.3.
  */
case class FilterProc() extends Processor {
  val plugin = "filter"
  override def transform(df: DataFrame): DataFrame = df.filter(lit(false))
  override def transformConditional(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))
}

/** `error` — every record seen becomes an error record with a templated
  * message (reference `impl/error.go:83`); routed to DLQ by the runner.
  */
case class ErrorProc(message: String) extends ColumnProcessor {
  val plugin = "error"
  override def rewrites(df: DataFrame): Map[String, Column] =
    Map(Cdc.Error -> Conditions.template(message, Conditions.typedSlots(df)))
}

/** `clone` — 1 record → `count`+1 copies with `clone.index` metadata
  * 0..count (reference `impl/clone.go:73-90`).
  */
case class CloneProc(count: Int) extends Processor {
  val plugin = "clone"
  override def transform(df: DataFrame): DataFrame = {
    val idx = explode(sequence(lit(0), lit(count)))
    df.withColumn("_clone_index", idx)
      .withColumn(Cdc.Metadata,
        RefCols.metaSet(col(Cdc.Metadata), "clone.index", col("_clone_index").cast(StringType)))
      .drop("_clone_index")
  }
}

/** `split` — the array at `field` yields one record per element, the
  * element replacing the array, with `split.index` metadata; a
  * non-array field is an error record (reference `impl/split.go:91-120`).
  */
case class SplitProc(ref: Ref) extends Processor {
  val plugin = "split"
  override def transform(df: DataFrame): DataFrame = {
    val slot = RefCols.column(ref)
    val base = Cdc.withErrorChannel(df)
    df.schema(slot).dataType match {
      case st: org.apache.spark.sql.types.StructType =>
        // typed: array-ness is a schema fact, so the error path is
        // decided at plan time and the explode stays fully codegen'd
        return (StructOps.fieldType(st, ref.sub) match {
          case Some(_: org.apache.spark.sql.types.ArrayType) =>
            base
              .select(col("*"), posexplode(StructOps.get(col(slot), ref.sub))
                .as(Seq("_split_idx", "_split_val")))
              .withColumn(slot, StructOps.set(col(slot), st, ref.sub, col("_split_val")))
              .withColumn(Cdc.Metadata,
                RefCols.metaSet(col(Cdc.Metadata), "split.index",
                  col("_split_idx").cast(StringType)))
              .drop("_split_idx", "_split_val")
          case _ =>
            base.withColumn(Cdc.Error, coalesce(col(Cdc.Error),
              lit(s"""split: field "$refString" is not an array""")))
        })
      case _ => ()
    }
    val withArr = base.withColumn("_split_arr", jsonSplit(col(slot), ref.sub))
    val isErr = col("_split_arr").isNull
    withArr
      .select(col("*"),
        posexplode(when(isErr, array(col(slot))).otherwise(col("_split_arr")))
          .as(Seq("_split_idx", "_split_val")))
      .withColumn(slot, when(isErr, col(slot)).otherwise(col("_split_val")))
      .withColumn(Cdc.Metadata,
        when(isErr, col(Cdc.Metadata)).otherwise(
          RefCols.metaSet(col(Cdc.Metadata), "split.index", col("_split_idx").cast(StringType))))
      .withColumn(Cdc.Error,
        when(isErr, coalesce(col(Cdc.Error),
          concat(lit(s"split: field ${'"'}"), lit(refString), lit(s"${'"'} is not an array"))))
          .otherwise(col(Cdc.Error)))
      .drop("_split_arr", "_split_idx", "_split_val")
  }
  private def refString: String = ref match {
    case PayloadAfterRef(rest) => (".Payload.After" +: rest).mkString(".")
    case PayloadBeforeRef(rest) => (".Payload.Before" +: rest).mkString(".")
    case KeyRef(rest) => (".Key" +: rest).mkString(".")
    case _ => ref.toString
  }
}

/** `unwrap.debezium` — replace the record with the Debezium envelope at
  * `field`: lift `payload.before`/`payload.after`, map op c/u/d/r →
  * create/update/delete/snapshot, merge flattened `source` into
  * metadata (source wins), `ts_ms` → `opencdc.readAt` (ns), key becomes
  * its `payload` field (reference `impl/unwrap/debezium.go:98+`,
  * op table `debezium.go:33-38`).
  */
case class UnwrapDebezium(ref: Ref) extends Processor {
  val plugin = "unwrap.debezium"
  override def transform(df: DataFrame): DataFrame = {
    val slot = RefCols.column(ref)
    val base = Cdc.withErrorChannel(df)
      // materialized in its own projection: DebeziumParts parses the
      // envelope ONCE; CollapseProject keeps it (multi-referenced,
      // non-cheap) instead of inlining six parses
      .withColumn("_dbz", debeziumParts(jsonGet(col(slot), ref.sub, raw = true)))
    val p = (f: String) => col("_dbz").getField(f)
    val op = p("op")
    val mappedOp = when(op === "c", "create").when(op === "u", "update")
      .when(op === "d", "delete").when(op === "r", "snapshot")
    val tsMs = p("ts_ms")
    base.withColumns(Map(
      Cdc.Operation -> coalesce(mappedOp, col(Cdc.Operation)),
      // one-pass merge: source_map comes out of the SAME envelope parse
      // (DebeziumParts), and the filter/concat/readAt logic runs as one
      // custom expression instead of five interpreted map HOFs + a
      // second from_json parse per record (~15 µs/record saved)
      Cdc.Metadata -> debeziumMetaMerge(col(Cdc.Metadata), p("source_map"), tsMs),
      Cdc.PayloadBefore -> p("before"),
      Cdc.PayloadAfter -> p("after"),
      Cdc.Key -> coalesce(jsonGet(col(Cdc.Key), Seq("payload"), raw = true), col(Cdc.Key)),
      Cdc.Error -> coalesce(col(Cdc.Error),
        when(col("_dbz").isNotNull && mappedOp.isNull,
          concat(lit("unwrap.debezium: unknown operation "), coalesce(op, lit("<nil>")))))))
      .drop("_dbz")
  }
}

/** `unwrap.kafkaconnect` — lift the Kafka-Connect envelope
  * (`{"payload": ..., "schema": ...}`) at `field` into the record; the
  * key's own `payload` replaces the key
  * (reference `impl/unwrap/kafka_connect.go:80`).
  */
case class UnwrapKafkaConnect(ref: Ref) extends ColumnProcessor {
  val plugin = "unwrap.kafkaconnect"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val env = jsonGet(col(slot), ref.sub, raw = true)
    Map(
      slot -> jsonGet(env, Seq("payload"), raw = false),
      Cdc.Key -> coalesce(jsonGet(col(Cdc.Key), Seq("payload"), raw = false), col(Cdc.Key)))
  }
}

/** `unwrap.opencdc` — the payload at `field` is itself a serialized
  * OpenCDC record; it replaces the record, keeping the outer position
  * (reference `impl/unwrap/opencdc.go:81`).
  */
case class UnwrapOpencdc(ref: Ref) extends ColumnProcessor {
  val plugin = "unwrap.opencdc"
  override def rewrites(df: DataFrame): Map[String, Column] = {
    val slot = RefCols.column(ref)
    val env = jsonGet(col(slot), ref.sub, raw = true)
    Map(
      Cdc.Operation -> coalesce(jsonGet(env, Seq("operation"), raw = true), col(Cdc.Operation)),
      Cdc.Metadata -> coalesce(
        from_json(jsonGet(env, Seq("metadata"), raw = false), MapType(StringType, StringType)),
        col(Cdc.Metadata)),
      Cdc.Key -> coalesce(jsonGet(env, Seq("key"), raw = true), col(Cdc.Key)),
      Cdc.PayloadBefore -> jsonGet(env, Seq("payload", "before"), raw = true),
      Cdc.PayloadAfter -> jsonGet(env, Seq("payload", "after"), raw = true),
      Cdc.Error -> coalesce(col(Cdc.Error),
        when(env.isNull, lit("unwrap.opencdc: field is empty"))))
  }
}

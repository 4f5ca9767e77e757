package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The OpenCDC record model re-expressed as a fixed Spark schema.
  *
  * The reference's unit of data is a self-describing CDC event (see
  * reference `docs/design-documents/20220309-opencdc.md:58-115` and the
  * proto `opencdc.v1.Record`): position, operation, string metadata,
  * key and before/after payloads that are either raw bytes or dynamic
  * structured data. Spark DataFrames need a fixed schema, so the dynamic
  * payloads are carried as canonical-JSON strings (`StringType`) with a
  * raw (`BinaryType`) sibling for the key, mirroring FIXTURES.md §1.
  *
  * An optional `_error` column (absent by default) carries the
  * error-as-data channel used for DLQ routing (reference nacks single
  * records mid-stream, `pkg/lifecycle/stream/dlq.go:41`; in Spark errors
  * must flow as data so every transform stays total).
  */
object Cdc {
  val Position = "position"
  val Operation = "operation"
  val Metadata = "metadata"
  val KeyRaw = "key_raw"
  val Key = "key"
  val PayloadBefore = "payload_before"
  val PayloadAfter = "payload_after"
  val Error = "_error"

  val columns: Seq[String] =
    Seq(Position, Operation, Metadata, KeyRaw, Key, PayloadBefore, PayloadAfter)

  val schema: StructType = StructType(Seq(
    StructField(Position, BinaryType),
    StructField(Operation, StringType), // create|update|delete|snapshot
    StructField(Metadata, MapType(StringType, StringType)),
    StructField(KeyRaw, BinaryType),
    StructField(Key, StringType),            // canonical JSON
    StructField(PayloadBefore, StringType),  // canonical JSON or null
    StructField(PayloadAfter, StringType)    // canonical JSON or null
  ))

  /** BATCH CDC-log compaction: the latest record per key under the
    * total order `orderCols` (descending), with keys whose latest
    * operation is `deleteOp` dropped — i.e. the consumer-side TABLE a
    * create/update/delete log describes. The streaming twin is
    * [[graft.streaming.StreamingOps.compactLatest]]; this is the shape
    * for backfills and log replays where the whole log is at rest.
    *
    * Scale: one key shuffle; the rn = 1 filter plans as a bounded
    * per-partition top-1 BELOW the exchange (Spark 4
    * InferWindowGroupLimit — the plan shape guarded in
    * AnalyticsSpec), so replaying a 100 TB log shuffles roughly one
    * row per key, not the log. `orderCols` must totally order each
    * key's records (position, then a unique tiebreak) or the winner
    * is ambiguous.
    */
  def materializeLatest(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= deleteOp)
      .drop("_rn")
  }

  /** Wrap an arbitrary (e.g. parquet) table into a stream of OpenCDC
    * records: every row becomes a `create` record whose payload_after is
    * the row as canonical JSON and whose key is the named key column.
    * This is how relational test data enters the Conduit-shaped surface.
    */
  def wrap(df: DataFrame, keyCol: String, collection: String,
           operation: String = "create"): DataFrame = {
    val payloadCols = df.columns.filterNot(_ == keyCol)
    df.select(
      lit(null).cast(BinaryType).as(Position),
      lit(operation).as(Operation),
      map(lit("opencdc.collection"), lit(collection)).as(Metadata),
      lit(null).cast(BinaryType).as(KeyRaw),
      to_json(struct(col(keyCol))).as(Key),
      lit(null).cast(StringType).as(PayloadBefore),
      to_json(struct(df.columns.map(col): _*)).as(PayloadAfter)
    )
  }

  /** Typed fast-path wrap: payload_after is the row as a NATIVE struct
    * column instead of canonical JSON. Field processors detect the
    * struct dtype ([[isTypedSlot]]) and compile to withField/dropFields
    * struct ops — no per-record JSON parse anywhere in the chain; call
    * [[graft.functions.JsonExpressions.cdcToJson]] (or `to_json`) once
    * at the edge when a sink needs wire JSON.
    */
  def wrapTyped(df: DataFrame, keyCol: String, collection: String,
                operation: String = "create"): DataFrame = {
    val payloadType = StructType(df.schema.fields)
    df.select(
      lit(null).cast(BinaryType).as(Position),
      lit(operation).as(Operation),
      map(lit("opencdc.collection"), lit(collection)).as(Metadata),
      lit(null).cast(BinaryType).as(KeyRaw),
      to_json(struct(col(keyCol))).as(Key),
      lit(null).cast(payloadType).as(PayloadBefore),
      struct(df.columns.map(col): _*).as(PayloadAfter)
    )
  }

  /** True when `slot` carries a typed (struct) payload. */
  def isTypedSlot(df: DataFrame, slot: String): Boolean =
    df.columns.contains(slot) && df.schema(slot).dataType.isInstanceOf[StructType]

  /** True when the frame carries the error-channel column. */
  def hasError(df: DataFrame): Boolean = df.columns.contains(Error)

  /** Ensure the `_error` column exists (null = healthy record). */
  def withErrorChannel(df: DataFrame): DataFrame =
    if (hasError(df)) df
    else df.withColumn(Error, lit(null).cast(StringType))

  /** Healthy / failed partitions of an error-channel frame. */
  def ok(df: DataFrame): DataFrame =
    if (hasError(df)) df.filter(col(Error).isNull).drop(Error) else df
  def failed(df: DataFrame): DataFrame =
    if (hasError(df)) df.filter(col(Error).isNotNull) else df.limit(0)
}

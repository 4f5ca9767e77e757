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

  /** SCD Type-2 history from a CDC log: every non-delete log row opens
    * a dimension version valid over `[posCol, next change's posCol)`;
    * the key's NEXT log row under the `orderCols` total order — deletes
    * included — closes it. A key's last row, when it is not a delete,
    * stays open (`valid_to` null, `is_current` true). This is the
    * warehouse dimension-history build (Kimball SCD2) expressed as
    * pure dataflow: the log itself becomes the versioned table.
    *
    * Scale: ONE key shuffle + one window pass (`lead` over the same
    * sort the shuffle produced) — no self-join of the log against
    * itself, no per-key iteration. At 100 TB of log the cost is the
    * sort within each key partition; `orderCols` must totally order
    * each key's records (position, then a unique tiebreak) or the
    * version chain is ambiguous.
    */
  def scd2(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      posCol: Column,
      opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.asc): _*)
    df.withColumn("valid_from", posCol)
      .withColumn("valid_to", lead(posCol, 1).over(w))
      .filter(col(opCol) =!= deleteOp)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental maintenance of a grouped COUNT/SUM view over a
    * CDC-materialized table (classic delta-processing IVM, Blakeley
    * et al. SIGMOD 1986 lineage): given the view state `prevAgg` as of
    * snapshot T0 and the delta log SINCE T0, produce the view as of
    * now WITHOUT re-aggregating the base table. Net change per record
    * key = remove the T0 row's contribution (if the key existed) + add
    * the key's final post-delta row (unless its last op is a delete);
    * intermediate delta states cancel out and never materialize.
    *
    * Scale shape — the whole point at 100 TB: the base table is
    * touched ONLY by a left-semi join against the (tiny) distinct
    * touched-key set — a broadcast semi-join prunes it without
    * shuffling a single base row, and on a storage-partitioned /
    * bucketed base even the scan prunes to matching files. The
    * re-aggregation work is O(|delta| + |groups touched|), never
    * O(|base|). Group membership may CHANGE across an update (the
    * old row leaves one group, the new row enters another) — both
    * sides are handled by the minus/plus union.
    *
    * `prevAgg` must be (groupCol, cnt: long, sumCol: decimal) as
    * produced by `groupBy(groupExpr).agg(count, sum(decimal))` on the
    * T0 materialization; `groupExpr` is re-evaluated on old and new
    * rows, so it must be a deterministic function of a row. Sums stay
    * in decimal end-to-end — partial-aggregation order can never
    * change the bits. Groups whose count reaches zero drop out.
    */
  def maintainGroupedAgg(
      prevAgg: DataFrame,
      baseT0: DataFrame,
      deltaLog: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      opCol: String,
      groupExpr: Column,
      valueExpr: Column,
      deleteOp: String = "delete"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    // final state of every touched key (tombstones kept — they still
    // remove the old contribution)
    val lastPerKey = deltaLog.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val touchedKeys = lastPerKey.select(keyCols.map(col): _*).distinct()
    // ONLY base access: semi-join prune (broadcast at real delta/base
    // ratios; partition-prunable on a bucketed base)
    val oldRows = baseT0.join(touchedKeys, keyCols, "left_semi")
    val minus = oldRows.select(groupExpr.as("_g"),
      lit(-1L).as("_dc"), (-valueExpr).as("_dv"))
    val plus = lastPerKey.filter(col(opCol) =!= deleteOp)
      .select(groupExpr.as("_g"), lit(1L).as("_dc"), valueExpr.as("_dv"))
    val changes = minus.unionByName(plus)
      .groupBy(col("_g"))
      .agg(sum(col("_dc")).as("_dc"), sum(col("_dv")).as("_dv"))
    val Seq(gName, cntName, sumName) = prevAgg.columns.toSeq
    val zero = lit(0).cast(prevAgg.schema(sumName).dataType)
    prevAgg.join(changes, prevAgg(gName) <=> changes("_g"), "full_outer")
      .select(
        coalesce(prevAgg(gName), changes("_g")).as(gName),
        (coalesce(prevAgg(cntName), lit(0L)) +
          coalesce(col("_dc"), lit(0L))).as(cntName),
        (coalesce(prevAgg(sumName), zero) +
          coalesce(col("_dv"), zero)).as(sumName))
      .filter(col(cntName) > 0L)
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

  /** Snapshot differ — the INVERSE of [[materializeLatest]]: given two
    * keyed table snapshots, emit the change log that turns `old` into
    * `new` (op ∈ insert/update/delete, with both value sides carried;
    * unchanged keys are dropped). This is how a pipeline bootstraps
    * CDC from systems that only expose periodic dumps, and how it
    * audits a CDC stream against a ground-truth snapshot.
    *
    * Scale shape: one full outer equi-join on the key (the canonical
    * two-big-sides shuffle — AQE broadcasts if a side collapses),
    * row-local op classification, and the unchanged filter drops the
    * (typically dominant) no-op mass before anything else consumes
    * it. Comparison columns are checked null-safely (`<=>`).
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val o = oldSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_in_old", lit(true))
    val n = newSnap.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"_new_$c")): _*)
      .withColumn("_in_new", lit(true))
    val j = o.join(n, keyCols, "full_outer")
    val changed = compareCols.map(c =>
      !(col(c) <=> col(s"_new_$c"))).reduce(_ || _)
    j.withColumn("op",
        when(col("_in_old").isNull, lit("insert"))
          .when(col("_in_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) :+ col("op") :++
        compareCols.map(c => col(c).as(s"old_$c")) :++
        compareCols.map(c => col(s"_new_$c").as(s"new_$c")): _*)
  }
}

package graft.sources

import java.sql.{Connection, DriverManager}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Cdc

/** Log-based CDC — the Spark-native shape of the reference's
  * `builtin:postgres` logical-replication mode (SURVEY §2.1; the
  * query-based [[JdbcSource]] covers the incrementing-column mode).
  *
  * Reads a CHANGE LOG, not the data table: every entry carries a
  * monotonic LSN, an operation, and before/after row images — so
  * deletes and updates to old rows are captured, the two change
  * classes query-based CDC is structurally blind to. Offsets are LSN
  * high-water marks → restart-safe from the checkpoint; an optional
  * initial snapshot phase reads the current table state first and
  * then replays the log past the snapshot watermark (redundant
  * replays are absorbed by idempotent keyed sinks — the reference's
  * snapshot+cdc contract).
  *
  * The log table stands for the replication-slot output: a pgoutput/
  * wal2json consumer, a trigger-maintained audit table, or a
  * Debezium-style outbox all materialize this shape. The pgoutput
  * BINARY protocol itself is implemented and golden-vector-tested
  * ([[PgOutputParser]]: message parsing, relation-schema tracking,
  * transaction framing, CDC mapping — everything after bytes arrive);
  * only the walsender TRANSPORT (attaching to a live replication
  * slot) still needs a running postgres, which this environment lacks.
  *
  * Options: `url`, `logTable`, `lsn.column`=lsn, `op.column`=op,
  * `key.column`=key, `before.column`=before, `after.column`=after,
  * `snapshot.table` (optional), `snapshot.key` (key column of the
  * snapshot table), `collection`, `maxRowsPerBatch`. LSNs must be
  * non-negative. Ops accept I/U/D or create/update/delete.
  */
class CdcLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "conduit-cdc-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Cdc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CdcLogTable(properties.asScala.toMap)
}

case class CdcLogConfig(url: String, logTable: String, lsnCol: String,
                        opCol: String, keyCol: String, beforeCol: String,
                        afterCol: String, snapshotTable: Option[String],
                        snapshotKey: String, collection: String, maxRows: Long) {
  def connect(): Connection = DriverManager.getConnection(url)
}

object CdcLogConfig {
  def apply(options: Map[String, String]): CdcLogConfig = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    val ck = graft.pipeline.JdbcWriter.checkIdent _ // identifiers → SQL
    CdcLogConfig(
      url = lower("url"),
      logTable = ck(lower.getOrElse("logtable", lower.getOrElse("log.table",
        throw new IllegalArgumentException("cdc-log: missing logTable"))), "logTable"),
      lsnCol = ck(lower.getOrElse("lsn.column", "lsn"), "lsn.column"),
      opCol = ck(lower.getOrElse("op.column", "op"), "op.column"),
      keyCol = ck(lower.getOrElse("key.column", "key"), "key.column"),
      beforeCol = ck(lower.getOrElse("before.column", "before"), "before.column"),
      afterCol = ck(lower.getOrElse("after.column", "after"), "after.column"),
      snapshotTable = lower.get("snapshot.table").map(ck(_, "snapshot.table")),
      snapshotKey = ck(lower.getOrElse("snapshot.key", "id"), "snapshot.key"),
      collection = lower.getOrElse("collection", "cdc"),
      maxRows = lower.getOrElse("maxrowsperbatch", "100000").toLong)
  }
}

class CdcLogTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"conduit-cdc-log:${options.getOrElse("logTable", "?")}"
  override def schema(): StructType = Cdc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Cdc.schema
        override def toMicroBatchStream(checkpoint: String): MicroBatchStream =
          new CdcLogStream(CdcLogConfig(options))
      }
    }
}

/** Log range (lsn ∈ (from, to]) or the initial snapshot phase. */
case class CdcLogPartition(fromExclusive: Long, toInclusive: Long,
                           snapshot: Boolean) extends InputPartition

class CdcLogReaderFactory(config: CdcLogConfig) extends PartitionReaderFactory {
  private val opMap = Map("i" -> "create", "c" -> "create", "insert" -> "create",
    "u" -> "update", "update" -> "update",
    "d" -> "delete", "delete" -> "delete",
    "r" -> "snapshot", "snapshot" -> "snapshot")

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[CdcLogPartition]
    if (part.snapshot) snapshotReader(part) else logReader(part)
  }

  private def logReader(part: CdcLogPartition) = new PartitionReader[InternalRow] {
    private lazy val conn = config.connect()
    private lazy val rs = {
      val st = conn.prepareStatement(
        s"SELECT ${config.lsnCol}, ${config.opCol}, ${config.keyCol}, " +
          s"${config.beforeCol}, ${config.afterCol} FROM ${config.logTable} " +
          s"WHERE ${config.lsnCol} > ? AND ${config.lsnCol} <= ? ORDER BY ${config.lsnCol}")
      st.setLong(1, part.fromExclusive)
      st.setLong(2, part.toInclusive)
      st.executeQuery()
    }
    override def next(): Boolean = rs.next()
    override def get(): InternalRow = {
      val lsn = rs.getLong(1)
      val op = Option(rs.getString(2)).map(_.trim.toLowerCase).getOrElse("")
      new GenericInternalRow(Array[Any](
        lsn.toString.getBytes("UTF-8"),
        UTF8String.fromString(opMap.getOrElse(op, "create")),
        ArrayBasedMapData(
          Array[Any](UTF8String.fromString("opencdc.collection")),
          Array[Any](UTF8String.fromString(config.collection))),
        null,
        Option(rs.getString(3)).map(UTF8String.fromString).orNull,
        Option(rs.getString(4)).map(UTF8String.fromString).orNull,
        Option(rs.getString(5)).map(UTF8String.fromString).orNull))
    }
    override def close(): Unit = conn.close()
  }

  /** Snapshot phase: current state of `snapshot.table` as `snapshot`
    * records positioned at the snapshot watermark.
    */
  private def snapshotReader(part: CdcLogPartition) = new PartitionReader[InternalRow] {
    private val snapCfg = JdbcConfig(
      url = config.url, table = config.snapshotTable.get,
      incCol = config.snapshotKey, keyCol = config.snapshotKey,
      collection = config.collection, maxRows = config.maxRows)
    private lazy val conn = config.connect()
    private lazy val rs = conn.createStatement()
      .executeQuery(s"SELECT * FROM ${config.snapshotTable.get}")
    override def next(): Boolean = rs.next()
    override def get(): InternalRow = JdbcRows.record(rs, snapCfg, snapshot = true)
    override def close(): Unit = conn.close()
  }
}

/** LSN-offset micro-batch stream. Offset -1 = nothing consumed: the
  * first batch is the snapshot (when configured) pinned at the
  * watermark S = max(lsn); later batches replay lsn ∈ (start, end].
  */
class CdcLogStream(config: CdcLogConfig) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  private def maxLsn(): Long = {
    val conn = config.connect()
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT MAX(${config.lsnCol}) FROM ${config.logTable}")
      if (rs.next()) math.max(0L, rs.getLong(1)) else 0L
    } finally conn.close()
  }
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(maxLsn())
  override def initialOffset(): Offset = CountOffset(-1)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val from = start.asInstanceOf[CountOffset].count
    val target = availableNowTarget.getOrElse(maxLsn())
    // snapshot batch consumes no log range beyond the watermark; log
    // batches advance at most maxRows worth of LSNs
    CountOffset(math.max(from, math.min(target, from + config.maxRows)))
  }
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = CountOffset(maxLsn())
  override def deserializeOffset(json: String): Offset = CountOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].count
    val e = end.asInstanceOf[CountOffset].count
    if (s < 0 && config.snapshotTable.isDefined)
      // snapshot pinned at watermark e; the log past e replays later
      Array(CdcLogPartition(Long.MinValue, e, snapshot = true))
    else if (e <= s) Array.empty
    else {
      val chunks = math.max(1L, math.min(32L, (e - s) / 10000L + 1))
      val step = math.max(1L, (e - s) / chunks)
      (s until e by step).map(b =>
        CdcLogPartition(b, math.min(e, b + step), snapshot = false)).toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcLogReaderFactory(config)
}

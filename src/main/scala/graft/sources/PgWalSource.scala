package graft.sources

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

/** Transport seam for a postgres logical-replication slot — the
  * HttpTransport pattern (ops/EnrichOps.scala): the protocol DECODING
  * is fully implemented and tested ([[PgOutputParser]]); the transport
  * trait isolates the one piece that needs a live server, so tests
  * drive the ENTIRE source path with a scripted transport and a
  * deployment only swaps in [[WalTransport.Jdbc]].
  *
  * Contract: every `pull` must return a SELF-DESCRIBING message run —
  * Relation messages re-delivered before the first DML that uses them.
  * That is the native behavior of both a fresh walsender session and
  * every `pg_logical_slot_peek_binary_changes` call (each call starts
  * its own decoding session), so the per-batch fresh
  * [[PgOutputParser.StreamDecoder]] below is correct, not a
  * workaround.
  */
trait WalTransport extends Serializable {
  /** The slot's current WAL high-water mark (byte LSN). */
  def currentLsn(): Long

  /** pgoutput messages up to `toInclusive`, replayed from the slot's
    * confirmed position, in stream order: (message LSN, raw bytes).
    * May include already-consumed transactions (at-least-once); the
    * reader filters emitted changes to (fromExclusive, toInclusive]
    * by COMMIT LSN.
    */
  def pull(toInclusive: Long): Iterator[(Long, Array[Byte])]

  /** Advance the slot's confirmed position after a checkpoint commit
    * (releases WAL server-side). Optional — peek-based replay stays
    * correct without it, just retains more WAL.
    */
  def advance(upToInclusive: Long): Unit = ()

  /** The slot's confirmed (already-consumed) position, used to seed a
    * FRESH checkpoint's initial offset. Without it a slot whose
    * confirmed LSN is already large starts at 0 and every early
    * micro-batch advances only maxBytes while pull() replays the whole
    * backlog — quadratic startup decode (correct, via the commit-LSN
    * filter, but wasteful). Default 0 keeps scripted transports and
    * embedded feeds unchanged.
    */
  def startLsn(): Long = 0L
}

object WalTransport {
  /** Live transport over PLAIN JDBC — no walsender socket, no COPY
    * protocol: postgres exposes logical decoding through the SQL
    * functions `pg_current_wal_lsn()`,
    * `pg_logical_slot_peek_binary_changes(slot, upto_lsn, NULL,
    * 'proto_version','1','publication_names',pub)` and
    * `pg_replication_slot_advance(slot, lsn)` — the same surface the
    * reference's connector uses for its test harness. Peek (not get)
    * + explicit advance-on-commit keeps at-least-once restart
    * semantics aligned with the checkpoint.
    *
    * Untestable in this sandbox (no postgres server); the decode and
    * source machinery it feeds is fully exercised by the scripted
    * transport in PgWalSourceSpec.
    */
  final case class Jdbc(url: String, slot: String, publication: String)
      extends WalTransport {
    private def connect() = java.sql.DriverManager.getConnection(url)
    override def currentLsn(): Long = {
      val c = connect()
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT pg_current_wal_lsn() - '0/0'")
        if (rs.next()) rs.getLong(1) else 0L
      } finally c.close()
    }
    override def pull(toInclusive: Long): Iterator[(Long, Array[Byte])] = {
      val c = connect()
      try {
        val st = c.prepareStatement(
          "SELECT lsn - '0/0', data FROM pg_logical_slot_peek_binary_changes(" +
            "?, ('0/0'::pg_lsn + ?), NULL, 'proto_version', '1', " +
            "'publication_names', ?)")
        st.setString(1, slot)
        st.setLong(2, toInclusive)
        st.setString(3, publication)
        val rs = st.executeQuery()
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
        while (rs.next()) buf += ((rs.getLong(1), rs.getBytes(2)))
        buf.iterator
      } finally c.close()
    }
    override def startLsn(): Long = {
      val c = connect()
      try {
        val st = c.prepareStatement(
          "SELECT confirmed_flush_lsn - '0/0' FROM pg_replication_slots " +
            "WHERE slot_name = ?")
        st.setString(1, slot)
        val rs = st.executeQuery()
        if (rs.next()) rs.getLong(1) else 0L
      } finally c.close()
    }
    override def advance(upToInclusive: Long): Unit = {
      val c = connect()
      try {
        val st = c.prepareStatement(
          "SELECT pg_replication_slot_advance(?, ('0/0'::pg_lsn + ?))")
        st.setString(1, slot)
        st.setLong(2, upToInclusive)
        st.execute()
      } finally c.close()
    }
  }

  /** Live transport over the `psql` CLI — the same four SQL calls as
    * [[Jdbc]] (peek-binary-changes / current-lsn / confirmed-flush /
    * advance), shelled through `psql -At` with base64-encoded message
    * bytes, for environments that have the postgres client binaries
    * but no JDBC driver jar on the classpath (this sandbox, minimal
    * containers). Serializable; `connOpts` are passed to psql verbatim
    * (`-h /sock/dir -U user -d db`). Identifier-only slot/publication
    * names are enforced up front — they are interpolated into SQL.
    */
  final case class PsqlCli(connOpts: Seq[String], slot: String,
                           publication: String) extends WalTransport {
    require(slot.matches("[a-z0-9_]+") && publication.matches("[a-z0-9_]+"),
      s"slot/publication must be plain identifiers: $slot / $publication")
    private def q(sql: String): Seq[String] = {
      val cmd = Seq("psql", "-X", "-A", "-t") ++ connOpts ++ Seq("-c", sql)
      val p = new ProcessBuilder(cmd: _*).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
        .getLines().toList
      val err = scala.io.Source.fromInputStream(p.getErrorStream, "UTF-8")
        .mkString
      require(p.waitFor() == 0, s"psql failed: $err")
      out.filter(_.nonEmpty)
    }
    override def currentLsn(): Long =
      q("SELECT pg_current_wal_lsn() - '0/0'").head.trim.toLong
    override def pull(toInclusive: Long): Iterator[(Long, Array[Byte])] =
      q("SELECT (lsn - '0/0')::text || ':' || encode(data, 'base64') " +
        s"FROM pg_logical_slot_peek_binary_changes('$slot', " +
        s"'0/0'::pg_lsn + $toInclusive, NULL, 'proto_version', '1', " +
        s"'publication_names', '$publication')")
        .iterator.map { line =>
          val i = line.indexOf(':')
          (line.substring(0, i).toLong,
            java.util.Base64.getDecoder.decode(line.substring(i + 1)))
        }
    override def startLsn(): Long =
      q("SELECT coalesce(confirmed_flush_lsn - '0/0', 0) " +
        s"FROM pg_replication_slots WHERE slot_name = '$slot'")
        .headOption.map(_.trim.toLong).getOrElse(0L)
    override def advance(upToInclusive: Long): Unit = {
      // advance refuses to move backwards; guard like a fresh slot
      if (upToInclusive > startLsn())
        q(s"SELECT pg_replication_slot_advance('$slot', " +
          s"'0/0'::pg_lsn + $upToInclusive)")
    }
  }

  /** Named transports for tests and embedded feeds. JVM-local by
    * design (the registry cannot ship to executors); with a registered
    * transport the source plans its single reader task driver-locally
    * only under local[*] — production uses the config-constructed,
    * serializable [[Jdbc]] transport.
    */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, WalTransport]()
  def register(name: String, t: WalTransport): Unit = registry.put(name, t)
  def unregister(name: String): Unit = registry.remove(name)
  def lookup(name: String): Option[WalTransport] = Option(registry.get(name))
}

/** `conduit-pgoutput` — logical-replication CDC source: a micro-batch
  * DSv2 stream whose offsets are WAL byte LSNs and whose records are
  * [[PgOutputParser.StreamDecoder]] output in the engine's CDC shape.
  * This closes the loop CdcLogSource documents: binary parser →
  * full source path, with only the socket behind [[WalTransport]].
  *
  * Options: `transport` (registered name) OR `url` + `slot` +
  * `publication` (JDBC transport); `maxBytesPerBatch` caps how much
  * WAL one micro-batch admits (default 64 MiB of LSN range).
  *
  * Single reader per batch — the [[PgOutputParser.toCdc]] rationale:
  * a slot is one ordered walsender stream, one reader's worth of I/O;
  * scale-out is per-slot and downstream of the decode.
  */
class PgWalSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "conduit-pgoutput"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Cdc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PgWalTable(properties.asScala.toMap)
}

case class PgWalConfig(transportName: Option[String], url: Option[String],
                       psqlOpts: Option[String],
                       slot: String, publication: String, maxBytes: Long) {
  def transport(): WalTransport = (transportName, psqlOpts) match {
    case (Some(name), _) => WalTransport.lookup(name).getOrElse(
      throw new IllegalStateException(s"conduit-pgoutput: no registered transport '$name'"))
    case (None, Some(opts)) => WalTransport.PsqlCli(
      opts.trim.split("\\s+").toSeq, slot, publication)
    case (None, None) => WalTransport.Jdbc(url.getOrElse(
      throw new IllegalArgumentException(
        "conduit-pgoutput: url, psql.opts, or transport required")),
      slot, publication)
  }
}

object PgWalConfig {
  def apply(options: Map[String, String]): PgWalConfig = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    PgWalConfig(
      transportName = lower.get("transport"),
      url = lower.get("url"),
      psqlOpts = lower.get("psql.opts"),
      slot = lower.getOrElse("slot", "graft"),
      publication = lower.getOrElse("publication", "graft"),
      maxBytes = lower.getOrElse("maxbytesperbatch", (64L << 20).toString).toLong)
  }
}

class PgWalTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"conduit-pgoutput:${options.getOrElse("slot", "graft")}"
  override def schema(): StructType = Cdc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Cdc.schema
        override def toMicroBatchStream(checkpoint: String): MicroBatchStream =
          new PgWalStream(PgWalConfig(options))
      }
    }
}

case class PgWalPartition(fromExclusive: Long, toInclusive: Long,
                          config: PgWalConfig) extends InputPartition

class PgWalStream(config: PgWalConfig) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  @transient private lazy val transport = config.transport()
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(transport.currentLsn())
  // only consulted for a FRESH checkpoint; seeded from the slot's
  // confirmed position so startup doesn't quadratically re-decode an
  // already-consumed backlog (restart uses the checkpointed offset)
  private lazy val initial: Long = transport.startLsn()
  override def initialOffset(): Offset = CountOffset(initial)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val from = start.asInstanceOf[CountOffset].count
    val target = availableNowTarget.getOrElse(transport.currentLsn())
    CountOffset(math.max(from, math.min(target, from + config.maxBytes)))
  }
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = CountOffset(transport.currentLsn())
  override def deserializeOffset(json: String): Offset = CountOffset(json.toLong)
  // checkpoint committed → safe to let the server release WAL
  override def commit(end: Offset): Unit =
    transport.advance(end.asInstanceOf[CountOffset].count)
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].count
    val e = end.asInstanceOf[CountOffset].count
    if (e <= s) Array.empty
    else Array(PgWalPartition(s, e, config)) // single ordered reader
  }
  override def createReaderFactory(): PartitionReaderFactory = new PgWalReaderFactory
}

class PgWalReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PgWalPartition]
    new PartitionReader[InternalRow] {
      // fresh decoder per batch: each pull is a self-describing
      // decoding session (see WalTransport contract)
      private lazy val it: Iterator[PgOutputParser.Change] = {
        val dec = new PgOutputParser.StreamDecoder
        part.config.transport().pull(part.toInclusive)
          .flatMap { case (_, bytes) => dec.decode(bytes) }
          // at-least-once replay absorbed here: emit only transactions
          // committed inside this batch's LSN window
          .filter { c =>
            val txLsn = java.lang.Long.parseUnsignedLong(c.metadata("postgres.lsn"))
            txLsn > part.fromExclusive && txLsn <= part.toInclusive
          }
      }
      private var cur: PgOutputParser.Change = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        cur.position.getBytes("UTF-8"),
        UTF8String.fromString(cur.operation),
        ArrayBasedMapData(
          cur.metadata.keys.map(k => UTF8String.fromString(k): Any).toArray,
          cur.metadata.values.map(v => UTF8String.fromString(v): Any).toArray),
        null,
        UTF8String.fromString(cur.key),
        cur.before.map(UTF8String.fromString).orNull,
        cur.after.map(UTF8String.fromString).orNull))
      override def close(): Unit = ()
    }
  }
}

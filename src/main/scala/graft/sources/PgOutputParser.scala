package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** The pgoutput logical-replication binary protocol (the wire format
  * the reference's `builtin:postgres` log mode consumes — reference
  * conduit-connector-postgres logrepl mode; format per the public
  * PostgreSQL documentation, "Logical Streaming Replication Protocol →
  * Message Formats", protocol version 1).
  *
  * This is the DECODE layer only: everything after bytes arrive.
  * Attaching to a live replication slot (CREATE_REPLICATION_SLOT /
  * START_REPLICATION over a walsender connection) needs a running
  * postgres, which this environment does not have — the transport
  * remains the documented gap, while the parsing, relation-schema
  * tracking, transaction framing, and CDC mapping below are real and
  * golden-vector-tested (PgOutputSpec builds messages byte-by-byte
  * from the published format and asserts the decoded records).
  *
  * Message grammar (big-endian):
  *  - 'B' Begin:    finalLsn i64, commitTs i64 (µs since 2000-01-01), xid i32
  *  - 'C' Commit:   flags i8, commitLsn i64, endLsn i64, commitTs i64
  *  - 'O' Origin:   lsn i64, name cstring
  *  - 'R' Relation: oid i32, namespace cstring, name cstring,
  *                  replicaIdentity i8, ncols i16,
  *                  ncols × (flags i8, name cstring, typeOid i32, typeMod i32)
  *  - 'Y' Type:     oid i32, namespace cstring, name cstring
  *  - 'I' Insert:   relOid i32, 'N', TupleData
  *  - 'U' Update:   relOid i32, [('K'|'O') TupleData], 'N', TupleData
  *  - 'D' Delete:   relOid i32, ('K'|'O'), TupleData
  *  - 'T' Truncate: nrels i32, options i8, nrels × relOid i32
  *  - TupleData:    ncols i16, ncols × ('n' | 'u' | 't' len i32 bytes
  *                  | 'b' len i32 bytes)
  */
object PgOutputParser {

  sealed trait TupleValue
  case object NullValue extends TupleValue
  /** Unchanged TOASTed value — not present in the message. */
  case object UnchangedToast extends TupleValue
  final case class TextValue(s: String) extends TupleValue
  final case class BinaryValue(bytes: Array[Byte]) extends TupleValue

  final case class RelationColumn(flags: Int, name: String, typeOid: Int, typeMod: Int) {
    def isKey: Boolean = (flags & 1) == 1
  }

  sealed trait Message
  final case class Begin(finalLsn: Long, commitTsMicros: Long, xid: Int) extends Message
  final case class Commit(flags: Int, commitLsn: Long, endLsn: Long,
                          commitTsMicros: Long) extends Message
  final case class Origin(lsn: Long, name: String) extends Message
  final case class Relation(oid: Int, namespace: String, name: String,
                            replicaIdentity: Char,
                            columns: IndexedSeq[RelationColumn]) extends Message
  final case class TypeMessage(oid: Int, namespace: String, name: String) extends Message
  final case class Insert(relationOid: Int, tuple: IndexedSeq[TupleValue]) extends Message
  final case class Update(relationOid: Int, oldKind: Option[Char],
                          old: Option[IndexedSeq[TupleValue]],
                          tuple: IndexedSeq[TupleValue]) extends Message
  final case class Delete(relationOid: Int, oldKind: Char,
                          old: IndexedSeq[TupleValue]) extends Message
  final case class Truncate(options: Int, relationOids: Seq[Int]) extends Message

  private def cstring(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { sb.write(b.toInt); b = buf.get() }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }

  private def tupleData(buf: ByteBuffer): IndexedSeq[TupleValue] = {
    val n = buf.getShort().toInt
    (0 until n).map { _ =>
      (buf.get().toChar: @unchecked) match {
        case 'n' => NullValue
        case 'u' => UnchangedToast
        case 't' =>
          val len = buf.getInt()
          val bytes = new Array[Byte](len); buf.get(bytes)
          TextValue(new String(bytes, StandardCharsets.UTF_8))
        case 'b' =>
          val len = buf.getInt()
          val bytes = new Array[Byte](len); buf.get(bytes)
          BinaryValue(bytes)
        case other =>
          throw new IllegalArgumentException(s"pgoutput: unknown tuple tag '$other'")
      }
    }
  }

  /** One replication message → typed AST. */
  def parse(msg: Array[Byte]): Message = {
    val buf = ByteBuffer.wrap(msg) // big-endian by default
    buf.get().toChar match {
      case 'B' => Begin(buf.getLong(), buf.getLong(), buf.getInt())
      case 'C' => Commit(buf.get().toInt, buf.getLong(), buf.getLong(), buf.getLong())
      case 'O' => Origin(buf.getLong(), cstring(buf))
      case 'R' =>
        val oid = buf.getInt()
        val ns = cstring(buf); val name = cstring(buf)
        val ri = buf.get().toChar
        val ncols = buf.getShort().toInt
        val cols = (0 until ncols).map { _ =>
          RelationColumn(buf.get().toInt, cstring(buf), buf.getInt(), buf.getInt())
        }
        Relation(oid, ns, name, ri, cols)
      case 'Y' => TypeMessage(buf.getInt(), cstring(buf), cstring(buf))
      case 'I' =>
        val oid = buf.getInt()
        val tag = buf.get().toChar
        require(tag == 'N', s"pgoutput: insert expects 'N' tuple, got '$tag'")
        Insert(oid, tupleData(buf))
      case 'U' =>
        val oid = buf.getInt()
        var kind = buf.get().toChar
        var old: Option[IndexedSeq[TupleValue]] = None
        var oldKind: Option[Char] = None
        if (kind == 'K' || kind == 'O') {
          oldKind = Some(kind); old = Some(tupleData(buf)); kind = buf.get().toChar
        }
        require(kind == 'N', s"pgoutput: update expects 'N' tuple, got '$kind'")
        Update(oid, oldKind, old, tupleData(buf))
      case 'D' =>
        val oid = buf.getInt()
        val kind = buf.get().toChar
        require(kind == 'K' || kind == 'O',
          s"pgoutput: delete expects 'K'|'O' tuple, got '$kind'")
        Delete(oid, kind, tupleData(buf))
      case 'T' =>
        val n = buf.getInt()
        val opts = buf.get().toInt
        Truncate(opts, (0 until n).map(_ => buf.getInt()))
      case other =>
        throw new IllegalArgumentException(s"pgoutput: unknown message type '$other'")
    }
  }

  /** Postgres epoch (2000-01-01) → unix epoch offset in microseconds. */
  val PgEpochOffsetMicros: Long = 946684800000000L

  // Type OIDs whose text form is already a JSON literal (numbers /
  // booleans); everything else renders as a JSON string.
  private val numericOids = Set(20, 21, 23, 700, 701, 1700, 26) // int8/2/4, float4/8, numeric, oid
  private val boolOid = 16

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def jsonValue(v: TupleValue, typeOid: Int): Option[String] = v match {
    case NullValue => Some("null")
    case UnchangedToast => None // omitted: value not in the message
    case BinaryValue(b) =>
      Some("\"" + java.util.Base64.getEncoder.encodeToString(b) + "\"")
    case TextValue(s) =>
      if (typeOid == boolOid) Some(if (s == "t") "true" else "false")
      else if (numericOids(typeOid)) Some(s)
      else Some("\"" + jsonEscape(s) + "\"")
  }

  private def tupleJson(rel: Relation, tuple: IndexedSeq[TupleValue],
                        keyOnly: Boolean): String =
    rel.columns.zip(tuple).flatMap { case (c, v) =>
      if (keyOnly && !c.isKey) None
      else jsonValue(v, c.typeOid).map(j => "\"" + jsonEscape(c.name) + "\":" + j)
    }.mkString("{", ",", "}")

  /** A decoded change in the engine's CDC shape (canonical-JSON
    * payloads, string metadata, LSN-derived position).
    */
  final case class Change(position: String, operation: String,
                          collection: String, key: String,
                          before: Option[String], after: Option[String],
                          metadata: Map[String, String])

  /** Stateful stream decoder: relation schemas and transaction framing
    * (Begin/Commit) are stream state, exactly as a replication-slot
    * consumer maintains them. Positions are `commitLsn/seq` — the LSN
    * orders transactions, the sequence orders changes within one.
    *
    * A pgoutput stream is inherently a single ordered byte stream (one
    * walsender per slot), so decoding happens in the single ingest
    * task; records fan out to partitions afterwards. NOT thread-safe —
    * one decoder per stream.
    */
  final class StreamDecoder {
    private val relations = scala.collection.mutable.Map.empty[Int, Relation]
    private var txLsn: Long = -1L
    private var txTsMicros: Long = 0L
    private var txXid: Int = 0
    private var seq: Int = 0

    private def meta(rel: Relation): Map[String, String] = Map(
      "opencdc.collection" -> s"${rel.namespace}.${rel.name}",
      "opencdc.readAt" -> ((txTsMicros + PgEpochOffsetMicros) * 1000L).toString,
      "postgres.xid" -> txXid.toString,
      "postgres.lsn" -> java.lang.Long.toUnsignedString(txLsn))

    private def nextPosition(): String = {
      val p = s"${java.lang.Long.toUnsignedString(txLsn)}/$seq"
      seq += 1; p
    }

    private def rel(oid: Int): Relation = relations.getOrElse(oid,
      throw new IllegalStateException(
        s"pgoutput: DML for unknown relation $oid (no Relation message seen)"))

    /** Decode one message; DML yields one Change, framing yields none. */
    def decode(msg: Array[Byte]): Seq[Change] = parse(msg) match {
      case r: Relation => relations(r.oid) = r; Nil
      case Begin(finalLsn, ts, xid) =>
        txLsn = finalLsn; txTsMicros = ts; txXid = xid; seq = 0; Nil
      case _: Commit | _: Origin | _: TypeMessage => Nil
      case Insert(oid, tuple) =>
        val r = rel(oid)
        Seq(Change(nextPosition(), "create", s"${r.namespace}.${r.name}",
          tupleJson(r, tuple, keyOnly = true), None,
          Some(tupleJson(r, tuple, keyOnly = false)), meta(r)))
      case Update(oid, oldKind, old, tuple) =>
        val r = rel(oid)
        // 'O' = full old row (REPLICA IDENTITY FULL); 'K' = key only
        val before = old.map(t => tupleJson(r, t, keyOnly = oldKind.contains('K')))
        Seq(Change(nextPosition(), "update", s"${r.namespace}.${r.name}",
          tupleJson(r, tuple, keyOnly = true), before,
          Some(tupleJson(r, tuple, keyOnly = false)), meta(r)))
      case Delete(oid, kind, old) =>
        val r = rel(oid)
        Seq(Change(nextPosition(), "delete", s"${r.namespace}.${r.name}",
          tupleJson(r, old, keyOnly = true),
          Some(tupleJson(r, old, keyOnly = kind == 'K')), None, meta(r)))
      case Truncate(_, oids) =>
        // the reference surfaces truncate as per-relation deletes with
        // no key (snapshot consumers re-read); we emit a marker record
        oids.map { oid =>
          val r = rel(oid)
          Change(nextPosition(), "delete", s"${r.namespace}.${r.name}",
            "{}", None, None, meta(r) + ("postgres.truncate" -> "true"))
        }
    }
  }

  /** Ordered pgoutput byte-message frame → CDC records. The stream is
    * decoded in ONE task (a replication slot is a single ordered
    * walsender stream — parallel decode would need the relation cache
    * and transaction framing replicated anyway); downstream processors
    * repartition freely afterwards. This is the decode seam
    * `CdcLogSource` documents: a live-slot transport would feed these
    * same bytes.
    *
    * Why `coalesce(1)` is correct AT SCALE (the FileTailSource
    * rationale): the work is inherently ONE READER'S WORTH OF I/O.
    * Postgres serializes a slot's WAL into a single ordered byte
    * stream; Decoding it is bounded by the walsender's own send rate,
    * not by cluster parallelism, and the StreamDecoder is stateful
    * across messages (Relation cache, Begin/Commit framing, LSN
    * ordering) — sharding mid-stream would replicate that state and
    * still have to re-serialize for ordering. Scale-out happens at the
    * SLOT level (one pipeline per slot/publication, each its own
    * single-reader stream) and immediately downstream, where the
    * decoded records fan out across the cluster.
    */
  def toCdc(df: org.apache.spark.sql.DataFrame, dataCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.functions._
    val session = df.sparkSession
    val changes = df.select(col(dataCol)).coalesce(1)
      .mapPartitions { it =>
        val dec = new StreamDecoder
        it.flatMap(r => dec.decode(r.getAs[Array[Byte]](0)))
      }(Encoders.product[Change])
    changes.select(
      to_binary(col("position"), lit("utf-8")).as(graft.model.Cdc.Position),
      col("operation").as(graft.model.Cdc.Operation),
      col("metadata").as(graft.model.Cdc.Metadata),
      lit(null).cast("binary").as(graft.model.Cdc.KeyRaw),
      col("key").as(graft.model.Cdc.Key),
      col("before").as(graft.model.Cdc.PayloadBefore),
      col("after").as(graft.model.Cdc.PayloadAfter))
  }
}

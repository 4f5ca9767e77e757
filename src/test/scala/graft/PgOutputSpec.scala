package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Cdc
import graft.sources.PgOutputParser
import graft.sources.PgOutputParser._

/** pgoutput wire-format golden vectors, built byte-by-byte from the
  * published PostgreSQL message formats (Logical Streaming Replication
  * Protocol, protocol version 1) — the encoder below is written from
  * the documentation, independently of the parser, so these are
  * conformance vectors, not a round-trip of the implementation.
  */
class PgOutputSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  // --- documentation-derived encoder helpers ---
  private def buf(n: Int = 1024) = ByteBuffer.allocate(n)
  private def fin(b: ByteBuffer): Array[Byte] = {
    val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
  }
  private def cstr(b: ByteBuffer, s: String): ByteBuffer = {
    b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte); b
  }
  private def beginMsg(finalLsn: Long, tsMicros: Long, xid: Int) =
    fin(buf().put('B'.toByte).putLong(finalLsn).putLong(tsMicros).putInt(xid))
  private def commitMsg(lsn: Long, endLsn: Long, tsMicros: Long) =
    fin(buf().put('C'.toByte).put(0.toByte).putLong(lsn).putLong(endLsn).putLong(tsMicros))
  /** cols: (flags, name, typeOid, typeMod) */
  private def relationMsg(oid: Int, ns: String, name: String, ri: Char,
                          cols: (Int, String, Int, Int)*) = {
    val b = buf(); b.put('R'.toByte).putInt(oid)
    cstr(b, ns); cstr(b, name)
    b.put(ri.toByte).putShort(cols.size.toShort)
    cols.foreach { case (f, n, t, m) =>
      b.put(f.toByte); cstr(b, n); b.putInt(t); b.putInt(m)
    }
    fin(b)
  }
  private def tuple(b: ByteBuffer, vals: Seq[Any]): ByteBuffer = {
    b.putShort(vals.size.toShort)
    vals.foreach {
      case null => b.put('n'.toByte)
      case 'u' => b.put('u'.toByte)
      case bytes: Array[Byte] =>
        b.put('b'.toByte).putInt(bytes.length).put(bytes)
      case s: String =>
        val raw = s.getBytes(StandardCharsets.UTF_8)
        b.put('t'.toByte).putInt(raw.length).put(raw)
    }
    b
  }
  private def insertMsg(oid: Int, vals: Any*) =
    fin(tuple(buf().put('I'.toByte).putInt(oid).put('N'.toByte), vals))
  private def updateMsg(oid: Int, oldKind: Option[Char], old: Seq[Any], vals: Seq[Any]) = {
    val b = buf().put('U'.toByte).putInt(oid)
    oldKind.foreach { k => b.put(k.toByte); tuple(b, old) }
    fin(tuple(b.put('N'.toByte), vals))
  }
  private def deleteMsg(oid: Int, kind: Char, old: Any*) =
    fin(tuple(buf().put('D'.toByte).putInt(oid).put(kind.toByte), old))
  private def truncateMsg(oids: Int*) = {
    val b = buf().put('T'.toByte).putInt(oids.size).put(0.toByte)
    oids.foreach(b.putInt); fin(b)
  }

  // users(id int8 KEY, name text, active bool, score float8)
  private val usersRel = relationMsg(16385, "public", "users", 'd',
    (1, "id", 20, -1), (0, "name", 25, -1), (0, "active", 16, -1), (0, "score", 701, -1))

  test("message parsing matches the documented format") {
    parse(beginMsg(0x01000000ABL, 1000000L, 777)) match {
      case Begin(lsn, ts, xid) =>
        assert(lsn == 0x01000000ABL && ts == 1000000L && xid == 777)
      case m => fail(s"$m")
    }
    parse(usersRel) match {
      case Relation(oid, ns, name, ri, cols) =>
        assert(oid == 16385 && ns == "public" && name == "users" && ri == 'd')
        assert(cols.map(_.name) == Seq("id", "name", "active", "score"))
        assert(cols.head.isKey && !cols(1).isKey)
        assert(cols.head.typeOid == 20 && cols(3).typeOid == 701)
      case m => fail(s"$m")
    }
    parse(insertMsg(16385, "7", "ada", "t", "9.5")) match {
      case Insert(oid, t) =>
        assert(oid == 16385)
        assert(t == IndexedSeq(TextValue("7"), TextValue("ada"),
          TextValue("t"), TextValue("9.5")))
      case m => fail(s"$m")
    }
  }

  test("transaction stream decodes to CDC changes with LSN positions") {
    val dec = new StreamDecoder
    assert(dec.decode(usersRel).isEmpty)
    assert(dec.decode(beginMsg(1000L, 1000000L, 42)).isEmpty)
    val ins = dec.decode(insertMsg(16385, "7", "ada", "t", "9.5"))
    val upd = dec.decode(updateMsg(16385, Some('O'),
      Seq("7", "ada", "t", "9.5"), Seq("7", "ada lovelace", "f", null)))
    val del = dec.decode(deleteMsg(16385, 'K', "7", null, null, null))
    assert(dec.decode(commitMsg(1000L, 1001L, 1000000L)).isEmpty)

    assert(ins.map(_.position) == Seq("1000/0"))
    assert(upd.map(_.position) == Seq("1000/1"))
    assert(del.map(_.position) == Seq("1000/2"))

    val i = ins.head
    assert(i.operation == "create" && i.collection == "public.users")
    assert(i.key == """{"id":7}""")
    assert(i.after.contains("""{"id":7,"name":"ada","active":true,"score":9.5}"""))
    assert(i.before.isEmpty)
    // commit ts: 1 s after the 2000-01-01 postgres epoch, as unix ns
    assert(i.metadata("opencdc.readAt") == "946684801000000000")
    assert(i.metadata("postgres.xid") == "42")
    assert(i.metadata("opencdc.collection") == "public.users")

    val u = upd.head
    assert(u.operation == "update")
    // REPLICA IDENTITY FULL old row → full before image
    assert(u.before.contains("""{"id":7,"name":"ada","active":true,"score":9.5}"""))
    assert(u.after.contains("""{"id":7,"name":"ada lovelace","active":false,"score":null}"""))

    val d = del.head
    assert(d.operation == "delete" && d.after.isEmpty)
    // 'K' old tuple → key columns only in the before image
    assert(d.before.contains("""{"id":7}"""))
    assert(d.key == """{"id":7}""")
  }

  test("unchanged TOAST values are omitted; binary values render base64") {
    val dec = new StreamDecoder
    dec.decode(relationMsg(99, "public", "blobs", 'd',
      (1, "id", 23, -1), (0, "body", 17, -1), (0, "big", 25, -1)))
    dec.decode(beginMsg(5L, 0L, 1))
    val out = dec.decode(updateMsg(99, None, Nil,
      Seq("3", Array[Byte](1, 2, 255.toByte), 'u')))
    val after = out.head.after.get
    assert(after == """{"id":3,"body":"AQL/"}""") // toast column absent
    assert(out.head.before.isEmpty) // no old tuple in the message
  }

  test("truncate emits per-relation markers; unknown relation fails fast") {
    val dec = new StreamDecoder
    dec.decode(usersRel)
    dec.decode(beginMsg(7L, 0L, 9))
    val t = dec.decode(truncateMsg(16385))
    assert(t.map(_.metadata("postgres.truncate")) == Seq("true"))
    assert(t.head.operation == "delete")
    intercept[IllegalStateException] {
      dec.decode(insertMsg(55555, "1"))
    }
  }

  test("property: random tuples survive encode → parse for all DML shapes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val value: Gen[Any] = Gen.oneOf(
      Gen.const(null),
      Gen.const('u'),
      Gen.asciiPrintableStr.map(_.take(40): Any),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray: Any))
    val tupleGen = Gen.nonEmptyListOf(value).map(_.take(8))
    def expect(vals: Seq[Any]): IndexedSeq[TupleValue] = vals.map {
      case null => NullValue
      case 'u' => UnchangedToast
      case s: String => TextValue(s)
      case b: Array[Byte] => BinaryValue(b)
    }.toIndexedSeq
    def tvEq(a: IndexedSeq[TupleValue], b: IndexedSeq[TupleValue]): Boolean =
      a.length == b.length && a.zip(b).forall {
        case (BinaryValue(x), BinaryValue(y)) => x.sameElements(y)
        case (x, y) => x == y
      }
    val prop = Prop.forAll(tupleGen, Gen.chooseNum(1, Int.MaxValue)) { (vals, oid) =>
      val ins = parse(insertMsg(oid, vals: _*)) match {
        case Insert(o, t) => o == oid && tvEq(t, expect(vals))
        case _ => false
      }
      val updNoOld = parse(updateMsg(oid, None, Nil, vals)) match {
        case Update(o, None, None, t) => o == oid && tvEq(t, expect(vals))
        case _ => false
      }
      val updOld = parse(updateMsg(oid, Some('O'), vals, vals)) match {
        case Update(o, Some('O'), Some(old), t) =>
          o == oid && tvEq(old, expect(vals)) && tvEq(t, expect(vals))
        case _ => false
      }
      val del = parse(deleteMsg(oid, 'K', vals: _*)) match {
        case Delete(o, 'K', old) => o == oid && tvEq(old, expect(vals))
        case _ => false
      }
      ins && updNoOld && updOld && del
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: random relation schemas survive encode → parse") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val name = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(12))
    val colGen = for {
      f <- Gen.oneOf(0, 1)
      n <- name
      t <- Gen.chooseNum(16, 1700)
      m <- Gen.chooseNum(-1, 100)
    } yield (f, n, t, m)
    val prop = Prop.forAll(Gen.chooseNum(1, Int.MaxValue), name, name,
      Gen.nonEmptyListOf(colGen).map(_.take(10))) { (oid, ns, rn, cols) =>
      parse(relationMsg(oid, ns, rn, 'd', cols: _*)) match {
        case Relation(o, n1, n2, 'd', parsed) =>
          o == oid && n1 == ns && n2 == rn &&
            parsed.map(c => (c.flags, c.name, c.typeOid, c.typeMod)) == cols.toIndexedSeq
        case _ => false
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("toCdc bridges an ordered message frame into the CDC schema") {
    val msgs: Seq[Array[Byte]] = Seq(
      usersRel,
      beginMsg(2000L, 2000000L, 8),
      insertMsg(16385, "1", "grace", "t", "1.0"),
      insertMsg(16385, "2", "edsger", "f", null),
      commitMsg(2000L, 2001L, 2000000L))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      msgs.map(m => org.apache.spark.sql.Row(m: Array[Byte])).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.BinaryType))))
    val cdc = PgOutputParser.toCdc(df, "data").orderBy("key")
    assert(cdc.schema.fieldNames.toSeq == Cdc.columns)
    val rows = cdc.collect()
    assert(rows.length == 2)
    assert(new String(rows.head.getAs[Array[Byte]](Cdc.Position), "UTF-8") == "2000/0")
    assert(rows.head.getAs[String](Cdc.Key) == """{"id":1}""")
    assert(rows.head.getAs[String](Cdc.PayloadAfter) ==
      """{"id":1,"name":"grace","active":true,"score":1.0}""")
    assert(rows(1).getAs[String](Cdc.PayloadAfter) ==
      """{"id":2,"name":"edsger","active":false,"score":null}""")
    assert(rows.head.getAs[Map[String, String]](Cdc.Metadata)("opencdc.collection")
      == "public.users")
  }
}

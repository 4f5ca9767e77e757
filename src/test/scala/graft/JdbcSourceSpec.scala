package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.model.Cdc

/** Query-based CDC JDBC source against embedded Derby: snapshot read,
  * then streaming change capture as rows are inserted.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  private val url = "jdbc:derby:memory:cdcdb;create=true"

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def setup(table: String): Unit = withConn { c =>
    try c.createStatement().execute(s"DROP TABLE $table") catch { case _: Exception => () }
    c.createStatement().execute(
      s"CREATE TABLE $table (id BIGINT PRIMARY KEY, name VARCHAR(64), amount DOUBLE, active BOOLEAN)")
  }

  private def insert(table: String, id: Long, name: String, amount: Double,
                     active: Boolean): Unit = withConn { c =>
    val st = c.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?, ?)")
    st.setLong(1, id); st.setString(2, name); st.setDouble(3, amount)
    st.setBoolean(4, active); st.execute()
  }

  test("non-identifier payload field names nack to the DLQ, not the task") {
    withConn { c =>
      try c.createStatement().execute("DROP TABLE dlq_sink") catch { case _: Exception => () }
      c.createStatement().execute(
        "CREATE TABLE dlq_sink (id BIGINT PRIMARY KEY, name VARCHAR(64))")
    }
    val s = spark
    import s.implicits._
    val cdc = Seq(
      ("""{"id":1}""", """{"id":1,"name":"ok"}"""),
      ("""{"id":2}""", """{"id":2,"first-name":"bad column"}"""), // data, not config
      ("""{"id":3}""", """{"id":3,"name":"also ok"}""")
    ).toDF("key", "payload_after").select(
      org.apache.spark.sql.functions.lit(null).cast("binary").as(Cdc.Position),
      org.apache.spark.sql.functions.lit("create").as(Cdc.Operation),
      org.apache.spark.sql.functions.map().cast("map<string,string>").as(Cdc.Metadata),
      org.apache.spark.sql.functions.lit(null).cast("binary").as(Cdc.KeyRaw),
      col("key"),
      org.apache.spark.sql.functions.lit(null).cast("string").as(Cdc.PayloadBefore),
      col("payload_after"))
    val failed = graft.pipeline.Runner.writeBatch(cdc,
      graft.pipeline.ConnectorConfig("db", "jdbc",
        Map("url" -> url, "table" -> "dlq_sink", "key" -> "id")))
    assert(failed.count() == 1, "exactly the bad-field record nacks")
    assert(failed.collect().head.getAs[String](Cdc.Error).contains("first-name"))
    val written = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT id FROM dlq_sink ORDER BY id")
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (rs.next()) ids += rs.getLong(1)
      ids.toSeq
    }
    assert(written == Seq(1L, 3L), s"healthy records still land, got $written")
  }

  test("snapshot batch read produces OpenCDC snapshot records") {
    setup("emp")
    insert("emp", 1, "alice", 10.5, true)
    insert("emp", 2, "bob", 20.0, false)
    val df = spark.read.format("conduit-jdbc")
      .option("url", url).option("table", "emp")
      .option("incrementing.column", "id").option("key", "id").load()
    val rows = df.orderBy(col(Cdc.Key)).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String](Cdc.Operation) == "snapshot"))
    val p = JsonOps.parse(rows.head.getAs[String](Cdc.PayloadAfter))
    assert(p.get("id").asLong() == 1 && p.get("name").asText() == "alice")
    assert(p.get("amount").asDouble() == 10.5 && p.get("active").asBoolean())
    assert(rows.head.getAs[String](Cdc.Key) == """{"id":1}""")
  }

  test("streaming capture picks up inserts after the initial batch") {
    setup("orders_cdc")
    insert("orders_cdc", 1, "first", 1.0, true)
    insert("orders_cdc", 2, "second", 2.0, true)

    val stream = spark.readStream.format("conduit-jdbc")
      .option("url", url).option("table", "orders_cdc")
      .option("incrementing.column", "id").option("key", "id").load()
    val q = stream.writeStream.format("memory").queryName("cdc_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds")).start()
    try {
      // initial catch-up: offsets -1 → max(id)=2
      var waited = 0
      while (spark.table("cdc_out").count() < 2 && waited < 100) {
        Thread.sleep(100); waited += 1
      }
      assert(spark.table("cdc_out").count() == 2)

      // change capture: new rows arrive in later micro-batches
      insert("orders_cdc", 3, "third", 3.0, false)
      insert("orders_cdc", 4, "fourth", 4.0, true)
      waited = 0
      while (spark.table("cdc_out").count() < 4 && waited < 100) {
        Thread.sleep(100); waited += 1
      }
      val rows = spark.table("cdc_out").collect()
      assert(rows.length == 4)
      val byKey = rows.map(r => r.getAs[String](Cdc.Key) ->
        r.getAs[String](Cdc.Operation)).toMap
      assert(byKey("""{"id":3}""") == "create") // post-snapshot = change
      assert(new String(rows.map(_.getAs[Array[Byte]](Cdc.Position))
        .map(new String(_, "UTF-8")).max) == "4")
    } finally q.stop()
  }

  test("jdbc → transform → jdbc: full database pipeline with upsert") {
    setup("src_tbl")
    withConn { c =>
      try c.createStatement().execute("DROP TABLE dst_tbl") catch { case _: Exception => () }
      c.createStatement().execute(
        "CREATE TABLE dst_tbl (id BIGINT PRIMARY KEY, name VARCHAR(64), amount DOUBLE, active BOOLEAN, tagged VARCHAR(16))")
    }
    insert("src_tbl", 1, "alice", 10.0, true)
    insert("src_tbl", 2, "bob", 20.0, false)

    val p = graft.pipeline.Pipeline("db2db")
      .source("src", "jdbc", "url" -> url, "table" -> "src_tbl",
        "incrementing.column" -> "id", "key" -> "id")
      .processor("tag", "field.set",
        "field" -> ".Payload.After.tagged", "value" -> "yes")
      .destination("dst", "jdbc", "url" -> url, "table" -> "dst_tbl", "key" -> "id")
    val counts = graft.pipeline.Runner.runBatch(spark, p)
    assert(counts("ok") == 2)

    val out = withConn { c =>
      val rs = c.createStatement().executeQuery(
        "SELECT id, name, tagged FROM dst_tbl ORDER BY id")
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getString(3)))
      buf.toSeq
    }
    assert(out == Seq((1L, "alice", "yes"), (2L, "bob", "yes")))

    // idempotence: re-running upserts, no duplicates
    graft.pipeline.Runner.runBatch(spark, p)
    val n = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM dst_tbl")
      rs.next(); rs.getLong(1)
    }
    assert(n == 2)
  }
}

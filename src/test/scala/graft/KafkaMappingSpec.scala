package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Cdc
import graft.pipeline.KafkaMapping

/** builtin:kafka — the record projections, unit-tested over hand-built
  * frames with Spark's kafka source/sink schemas (no broker exists in
  * this sandbox; the format plumbing is Spark's own, the mapping is
  * ours and is what a wrong column name would silently break).
  */
class KafkaMappingSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  /** Spark kafka source schema (what `format("kafka").load()` yields). */
  private def kafkaFrame = {
    val schema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val rows = Seq(
      Row("k1".getBytes("UTF-8"), """{"a":1}""".getBytes("UTF-8"),
        "orders", 0, 42L, new java.sql.Timestamp(1674061777225L), 0),
      Row(null, """{"a":2}""".getBytes("UTF-8"),
        "events", 3, 7L, new java.sql.Timestamp(1674061777226L), 0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  test("source projection: position encodes topic-partition@offset") {
    val recs = KafkaMapping.fromKafka(kafkaFrame).orderBy(col(Cdc.Key).desc_nulls_last)
    val rows = recs.collect()
    assert(rows.length == 2)
    val r1 = rows.head
    assert(new String(r1.getAs[Array[Byte]](Cdc.Position), "UTF-8") == "orders-0@42")
    assert(r1.getAs[String](Cdc.Operation) == "create")
    assert(r1.getAs[Map[String, String]](Cdc.Metadata)("opencdc.collection") == "orders")
    assert(new String(r1.getAs[Array[Byte]](Cdc.KeyRaw), "UTF-8") == "k1")
    assert(r1.getAs[String](Cdc.Key) == "k1")
    assert(r1.getAs[String](Cdc.PayloadAfter) == """{"a":1}""")
    val r2 = rows(1)
    assert(new String(r2.getAs[Array[Byte]](Cdc.Position), "UTF-8") == "events-3@7")
    assert(r2.getAs[String](Cdc.Key) == null)
    assert(r2.getAs[Map[String, String]](Cdc.Metadata)("opencdc.collection") == "events")
  }

  test("destination projection: default topic template reads opencdc.collection") {
    val recs = Cdc.wrap(
      spark.range(2).select(col("id"), concat(lit("n"), col("id")).as("name")),
      "id", "things")
    val out = KafkaMapping.toKafka(recs).collect()
    assert(out.forall(_.getAs[String]("topic") == "things"))
    val v = new String(out.head.getAs[Array[Byte]]("value"), "UTF-8")
    assert(v.contains(""""operation":"create""""))
    assert(v.contains(""""name":"n0"""") || v.contains(""""name":"n1""""))
    // key falls back to the canonical JSON key (key_raw is null here)
    val k = new String(out.head.getAs[Array[Byte]]("key"), "UTF-8")
    assert(k.startsWith("""{"id":"""))
  }

  test("destination projection: custom Go-template topic per record") {
    val recs = Cdc.wrap(
      spark.range(2).selectExpr("id", "CASE WHEN id = 0 THEN 'a' ELSE 'b' END AS t"),
      "id", "things")
    val out = KafkaMapping.toKafka(recs,
      topicTemplate = "pre-{{ .Payload.After.t }}").collect()
    assert(out.map(_.getAs[String]("topic")).toSet == Set("pre-a", "pre-b"))
  }

  test("round-trip: source records re-produce with their original key and topic") {
    val recs = KafkaMapping.fromKafka(kafkaFrame)
    val out = KafkaMapping.toKafka(recs)
      .orderBy(col("topic")).collect()
    // topic resolved from opencdc.collection == the original topic
    assert(out.map(_.getAs[String]("topic")).toSeq == Seq("events", "orders"))
    val orders = out(1)
    assert(new String(orders.getAs[Array[Byte]]("key"), "UTF-8") == "k1")
    val v = new String(orders.getAs[Array[Byte]]("value"), "UTF-8")
    // opencdc/json renders the byte position base64-encoded
    val b64 = java.util.Base64.getEncoder.encodeToString("orders-0@42".getBytes("UTF-8"))
    assert(v.contains(s""""position":"$b64""""))
  }

  test("reference settings map to Spark kafka options") {
    val src = KafkaMapping.sourceOptions(Map(
      "servers" -> "broker:9092", "topics" -> "t1,t2",
      "readFromBeginning" -> "true", "kafka.security.protocol" -> "SSL"))
    assert(src("kafka.bootstrap.servers") == "broker:9092")
    assert(src("subscribe") == "t1,t2")
    assert(src("startingOffsets") == "earliest")
    assert(src("kafka.security.protocol") == "SSL")
    val dst = KafkaMapping.sinkOptions(Map(
      "servers" -> "broker:9092", "topic" -> "out", "acks" -> "all"))
    assert(dst == Map("kafka.bootstrap.servers" -> "broker:9092"))
  }
}

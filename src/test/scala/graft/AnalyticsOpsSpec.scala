package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.model.Cdc
import graft.ops.Registry
import graft.pipeline.{Pipeline, Runner}

/** The sql / dedup.exact / text.metrics pipeline processors. */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private def gen(n: Int) =
    Runner.source(spark, graft.pipeline.ConnectorConfig("g", "builtin:generator",
      Map("format.options.id" -> "int", "recordCount" -> n.toString)),
      streaming = false)

  test("sql processor reshapes the stream with arbitrary Spark SQL") {
    val proc = Registry.create("sql", Map("query" ->
      """SELECT position, operation, metadata, key_raw, key,
         payload_before, payload_after
         FROM records
         WHERE CAST(get_json_object(payload_after, '$.id') AS LONG) % 2 = 0"""))
    val out = proc(gen(100))
    val n = out.count()
    assert(n > 0 && n < 100)
    assert(out.columns.toSeq == Cdc.columns)
  }

  test("dedup.exact drops payload duplicates within a batch") {
    val base = gen(50).withColumn(Cdc.PayloadAfter,
      when(col(Cdc.Key).contains("1"), lit("""{"dup":true}"""))
        .otherwise(col(Cdc.PayloadAfter)))
    val out = Registry.create("dedup.exact", Map.empty)(base)
    val dupCount = out.filter(col(Cdc.PayloadAfter) === """{"dup":true}""").count()
    assert(dupCount == 1, s"expected duplicates collapsed to 1, got $dupCount")
  }

  test("text.metrics annotates the payload with counts + fingerprint") {
    val base = gen(3).withColumn(Cdc.PayloadAfter,
      lit("""{"text":"hello  world again"}"""))
    val proc = Registry.create("text.metrics", Map("field" -> ".Payload.After.text"))
    val out = proc(base).collect().head
    val payload = JsonOps.parse(out.getAs[String](Cdc.PayloadAfter))
    val m = payload.get("text_metrics")
    assert(m.get("n_tokens").asLong() == 3)
    assert(m.get("n_chars").asLong() == 18)
    assert(m.get("fingerprint").asLong() ==
      graft.analytics.Hashing.rollingHash("hello world again"))
  }

  test("sample.hash keeps a deterministic fraction of records") {
    val recs = gen(4000)
    val proc = Registry.create("sample.hash",
      Map("fraction" -> "0.25", "seed" -> "5"))
    val a = proc(recs).select(col(Cdc.Key)).collect().map(_.getString(0)).toSet
    val b = proc(recs.repartition(7)).select(col(Cdc.Key)).collect()
      .map(_.getString(0)).toSet
    assert(a == b, "same records regardless of partitioning")
    val frac = a.size.toDouble / 4000
    assert(math.abs(frac - 0.25) < 0.05, s"fraction $frac")
    // a different seed samples a different subset
    val c = Registry.create("sample.hash",
      Map("fraction" -> "0.25", "seed" -> "6"))(recs)
      .select(col(Cdc.Key)).collect().map(_.getString(0)).toSet
    assert(a != c)
  }

  test("quality.filter drops records whose text fails the thresholds") {
    import spark.implicits._
    val base = Cdc.wrap(Seq(
      (1L, "no"), (2L, "a solid document with enough words to keep here"),
      (3L, "x y z"), (4L, "five ok words right here")).toDF("id", "text"),
      "id", "docs")
    val proc = Registry.create("quality.filter",
      Map("field" -> ".Payload.After.text", "minTokens" -> "5"))
    val out = proc(base).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[String](Cdc.PayloadAfter).contains("solid") ||
      r.getAs[String](Cdc.PayloadAfter).contains("five")))
  }

  test("text.chunk fans each record out into overlapping windows") {
    val base = gen(1).withColumn(Cdc.PayloadAfter,
      lit(s"""{"text":"${(1 to 25).map(i => s"w$i").mkString(" ")}","id":7}"""))
    val proc = Registry.create("text.chunk",
      Map("field" -> ".Payload.After.text",
        "chunkTokens" -> "10", "overlap" -> "3"))
    val rows = proc(base).orderBy(col(Cdc.Metadata).getItem("chunk.index"))
      .collect()
    assert(rows.length == 4) // stride 7: starts 0,7,14,21
    val first = JsonOps.parse(rows.head.getAs[String](Cdc.PayloadAfter))
    assert(first.get("text").asText().startsWith("w1 w2"))
    assert(first.get("id").asInt() == 7) // other payload fields survive
    val idxs = rows.map(_.getAs[Map[String, String]](Cdc.Metadata)("chunk.index"))
    assert(idxs.toSeq == Seq("0", "1", "2", "3"))
  }

  test("sql processor works inside a YAML pipeline") {
    Runner.memorySinks.clear()
    val p = Pipeline("sqlp")
      .source("gen", "builtin:generator",
        "format.options.id" -> "int", "recordCount" -> "60")
      .processor("only-even", "sql",
        "query" -> ("SELECT * FROM records WHERE " +
          "CAST(get_json_object(payload_after, '$.id') AS LONG) % 3 = 0"))
      .destination("out", "memory")
    val counts = Runner.runBatch(spark, p)
    assert(counts("ok") > 0 && counts("ok") < 60)
  }
}

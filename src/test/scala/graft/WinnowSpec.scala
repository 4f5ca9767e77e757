package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Dedup
import graft.model.Cdc
import graft.ops.Registry

/** Winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003): the
  * shared-run guarantee, rightmost-min tie-breaking, short-document
  * windows, the posting cap, and the plugin's batch-only guard.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("guarantee: a shared run of w+k-1 tokens yields a shared fingerprint") {
    // k=4, w=8: any common 11-token run must share >= 1 fingerprint
    val run = (1 to 11).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon zeta"),
      (2L, s"one two three four five $run six seven")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", minShared = 1)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getLong(2) >= 1L)
  }

  test("ties select the rightmost position; short docs winnow as one window") {
    // 12 identical tokens, k=4 -> m=9 identical gram hashes; w=8 ->
    // windows s=1,2 select rightmost i = 8, 9
    val fps = Dedup.winnowFingerprints(
        Seq((1L, Seq.fill(12)("a").mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(1)).sorted
    assert(fps.toSeq == Seq(8L, 9L))
    // 5 tokens -> m=2 grams < w: ONE window over the whole doc
    val short = Dedup.winnowFingerprints(
        Seq((1L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(short.length == 1)
  }

  test("the density is ~2/(w+1) and every doc is covered") {
    val docs = (1 to 50).map(i =>
      (i.toLong, (1 to 100).map(j => s"t${(i * 37 + j * 11) % 97}")
        .mkString(" "))).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text")
    val perDoc = fps.groupBy("doc_id").count().collect()
    assert(perDoc.length == 50)
    // m = 97 grams, w = 8: expected ~2/(w+1)*m ≈ 22, never above m
    assert(perDoc.forall(r => r.getLong(1) >= 97 / 8 && r.getLong(1) <= 97))
  }

  test("the posting cap excludes boilerplate fingerprints") {
    // the same 11-token run in THREE docs: with maxDf=2 the shared
    // fingerprints are boilerplate-capped away -> no pairs at all
    val run = (1 to 11).map(i => s"b$i").mkString(" ")
    val docs = (1 to 3).map(i => (i.toLong, s"u${i}a u${i}b $run u${i}c"))
      .toDF("doc_id", "text")
    assert(Dedup.winnowPairs(docs, "doc_id", "text",
      minShared = 1, maxDf = 2).collect().isEmpty)
    assert(Dedup.winnowPairs(docs, "doc_id", "text",
      minShared = 1, maxDf = 3).count() == 3L) // all three pairs back
  }

  test("winnowSpans localizes the shared run on both sides") {
    val run = (1 to 11).map(i => s"s$i").mkString(" ")
    // doc 1 carries the run at token offset 3; doc 2 at offset 5
    val docs = Seq(
      (1L, s"p1 p2 p3 $run p4"),
      (2L, s"q1 q2 q3 q4 q5 $run q6")).toDF("doc_id", "text")
    val spans = Dedup.winnowSpans(docs, "doc_id", "text").collect()
    assert(spans.nonEmpty)
    // every matched position pair points at the SAME shared gram text,
    // so the offsets differ by exactly the two prefixes' difference
    assert(spans.forall(r => r.getLong(3) - r.getLong(2) == 2L),
      spans.mkString(", "))
  }

  test("dedup.winnow plugin: CDC pairs out, batch-only guard") {
    val run = (1 to 11).map(i => s"r$i").mkString(" ")
    val docs = Cdc.wrapTyped(Seq(
      (1L, s"x1 x2 x3 $run x4"), (2L, s"y1 y2 $run y3 y4 y5"))
      .toDF("doc_id", "text"), "doc_id", "docs")
    val out = Registry.create("dedup.winnow",
        Map("id" -> ".Payload.After.doc_id",
          "field" -> ".Payload.After.text", "minShared" -> "1"))
      .transform(docs)
    val row = out.select(
      get_json_object(col(Cdc.PayloadAfter), "$.doc_a").cast("long"),
      get_json_object(col(Cdc.PayloadAfter), "$.doc_b").cast("long"))
      .collect()(0)
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streamDf = Cdc.wrap(in.toDF().toDF("doc_id", "text"), "doc_id", "docs")
    val e = intercept[IllegalArgumentException] {
      Registry.create("dedup.winnow",
        Map("id" -> ".Payload.After.doc_id")).transform(streamDf)
    }
    assert(e.getMessage.contains("dedup.winnow is batch-only"))
  }

  test("winnowSpans survives a hostile maxDf on a boilerplate-heavy corpus") {
    // 300 docs share one 20-token boilerplate prefix and maxDf is set
    // absurdly high, so every shared fingerprint's posting list holds
    // all 300 docs — past boundedSelfPairs' cap of 256, forcing the
    // chunked hot path. The discipline under test: a hostile user
    // setting cannot put a quadratic bucket into ONE task, and the
    // chunked pair set equals the direct join-back's.
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val docs = (1 to 300).map(i =>
      (i.toLong, s"$boiler tailA$i tailB$i tailC$i tailD$i"))
      .toDF("doc_id", "text")
    val spans = Dedup.winnowSpans(docs, "doc_id", "text", maxDf = 100000)
    // every unordered doc pair shares the boilerplate fingerprints
    assert(spans.select("doc_a", "doc_b").distinct().count() ==
      300L * 299 / 2)
    assert(spans.filter(col("doc_a") >= col("doc_b")).count() == 0)
    // spot-check one pair against the direct (uncapped-join) form on a
    // small slice: same (pos_a, pos_b, h) rows
    val slice = docs.filter(col("doc_id") <= 3)
    val viaBounded = Dedup.winnowSpans(slice, "doc_id", "text",
        maxDf = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val fps = Dedup.winnowFingerprints(slice, "doc_id", "text")
    val direct = fps.select(col("h"), col("doc_id").as("doc_a"),
        col("pos").as("pos_a"))
      .join(fps.select(col("h"), col("doc_id").as("doc_b"),
        col("pos").as("pos_b")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"),
        col("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(viaBounded == direct)
  }

  test("crossWinnowPairs: batch splits union to the one-shot run") {
    // history: 12 distinct 24-token docs; batch: each with the last
    // token dropped (id+100) — every batch doc must match its source,
    // and per-doc decomposability must make any batch split union to
    // the one-shot run (the dedup_winnow_stream gate row's law)
    val hist = (1 to 12).map(i =>
      (i.toLong, (1 to 24).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val batch = (1 to 12).map(i =>
      (i.toLong + 100, (1 to 23).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val postings = Dedup.winnowHistoryPostings(hist, "doc_id", "text")
    val oneShot = Dedup.crossWinnowPairs(batch, postings,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every batch doc matched its source
    assert(oneShot.map(p => (p._1, p._2)).filter(p => p._1 - 100 == p._2)
      .size == 12)
    val half1 = Dedup.crossWinnowPairs(
      batch.filter(col("doc_id") % 2 === 0), postings, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val half2 = Dedup.crossWinnowPairs(
      batch.filter(col("doc_id") % 2 =!= 0), postings, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert((half1 ++ half2) == oneShot)
    assert(half1.intersect(half2).isEmpty)
  }
}

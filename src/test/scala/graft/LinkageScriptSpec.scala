package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Linkage, Text, Temporal => TOps}

/** Round-9 wave-F semantics: Fellegi-Sunter linkage scoring, script
  * profiling, local peaks.
  */
class LinkageScriptSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("linkage: agreement pattern -> exact weight sum, blocking cuts pairs") {
    val a = Seq((1L, 10L, "x", "p"), (2L, 10L, "x", "q"),
      (3L, 10L, "y", "p"), (4L, 99L, "x", "p")) // different block
      .toDF("id", "blk", "f1", "f2")
    val out = Linkage.linkageScore(a, a, "id", "id", "blk",
        Seq(("f1", 0.9, 0.3), ("f2", 0.8, 0.4)),
        minScore = -100.0, selfPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // block 10: pairs (1,2), (1,3), (2,3); node 4 isolated by blocking
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val wa1 = StrictMath.log(0.9 / 0.3); val wd1 = StrictMath.log((1 - 0.9) / (1 - 0.3))
    val wa2 = StrictMath.log(0.8 / 0.4); val wd2 = StrictMath.log((1 - 0.8) / (1 - 0.4))
    assert(out((1L, 2L)) == (1L, wa1 + wd2)) // f1 agrees, f2 not
    assert(out((1L, 3L)) == (1L, wd1 + wa2))
    assert(out((2L, 3L)) == (0L, wd1 + wd2))
    // threshold drops low scores: only (1,2) (~0) survives -0.5;
    // (1,3) ~ -1.25 and (2,3) ~ -3.0 drop
    val cut = Linkage.linkageScore(a, a, "id", "id", "blk",
      Seq(("f1", 0.9, 0.3), ("f2", 0.8, 0.4)),
      minScore = -0.5, selfPairs = true).count()
    assert(cut == 1L)
    // null-safe agreement: null vs null agrees
    val n = Seq((1L, 5L, null.asInstanceOf[String]),
      (2L, 5L, null.asInstanceOf[String])).toDF("id", "blk", "f1")
    val nOut = Linkage.linkageScore(n, n, "id", "id", "blk",
      Seq(("f1", 0.9, 0.3)), minScore = -100, selfPairs = true)
      .collect().head
    assert(nOut.getLong(2) == 1L)
  }

  test("linkage: maxBlock chunk-join bounds per-task pairs, results identical") {
    // degenerate corpus: ONE block of 120 rows (the 10^12-pair failure
    // mode scaled down) — with the cap the block must be grid-chunked
    // so no join key group exceeds maxBlock^2 pairs, while the scored
    // output stays IDENTICAL to the uncapped run
    val rows = (1 to 120).map(i =>
      (i.toLong, 1L, s"v${i % 7}", s"w${i % 3}"))
    val df = rows.toDF("id", "blk", "f1", "f2")
    val fields = Seq(("f1", 0.9, 0.3), ("f2", 0.8, 0.4))
    def run(cap: Int) = Linkage.linkageScore(df, df, "id", "id", "blk",
        fields, minScore = -100.0, selfPairs = true, maxBlock = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val uncapped = run(100000)
    val capped = run(25)
    assert(uncapped.size == 120 * 119 / 2)
    assert(capped == uncapped)
    // the internal chunked join never holds more than cap^2 pairs per
    // (block, chunk-block) key group
    def side(p: String, idAs: String) = df.select(
      col("id").as(idAs), col("blk").as("_blk"),
      col("f1").as(s"${p}f1"), col("f2").as(s"${p}f2"))
    val joined = Linkage.boundedBlockedJoin(
      side("_a_", "_id_a"), side("_b_", "_id_b"),
      selfPairs = true, maxBlock = 25)
    val perKey = joined.groupBy(col("_blk"), col("_ci"), col("_cj"))
      .agg(count(lit(1)).as("n")).collect()
    assert(perKey.forall(r => !r.isNullAt(1)), "hot block must chunk")
    // chunks are hash-assigned: sizes center on cap with binomial
    // jitter, so the per-key bound is O(cap^2), not exactly cap^2 —
    // assert within 4x of the nominal bound and far below the
    // unchunked block's 120^2 single-task pair count
    assert(perKey.length >= 15, "5 chunks -> >= 15 triangular blocks")
    assert(perKey.forall(_.getAs[Long]("n") <= 4L * 25L * 25L),
      s"per-key pair bound violated: ${perKey.mkString(",")}")
    // cross-table (selfPairs = false) linkage under the cap is also
    // unchanged, and ids keep their table sides
    val b = rows.map { case (id, blk, f1, f2) => (id + 1000L, blk, f1, f2) }
      .toDF("id", "blk", "f1", "f2")
    def runX(cap: Int) = Linkage.linkageScore(df, b, "id", "id", "blk",
        fields, minScore = -100.0, maxBlock = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val x = runX(25)
    assert(x == runX(100000))
    assert(x.keys.forall { case (ia, ib) => ia <= 120L && ib > 1000L })
  }

  test("script profile: mixed-script doc counts and dominant label") {
    val docs = Seq(
      (1L, "hello world 42"),
      (2L, "привет мир"),
      (3L, "你好世界"),
      (4L, ""),
      (5L, "a1 привет 你")).toDF("doc_id", "text")
    val out = Text.scriptProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_latin") == 10L)
    assert(d1.getAs[Long]("n_digit") == 2L)
    assert(d1.getAs[Long]("n_space") == 2L)
    assert(d1.getAs[String]("dominant_script") == "latin")
    assert(out(2L).getAs[Long]("n_cyrillic") == 9L)
    assert(out(2L).getAs[String]("dominant_script") == "cyrillic")
    assert(out(3L).getAs[Long]("n_cjk") == 4L)
    assert(out(3L).getAs[String]("dominant_script") == "cjk")
    assert(out(4L).getAs[Long]("n_chars") == 0L)
    assert(out(4L).isNullAt(out(4L).fieldIndex("latin_frac")))
    // counts partition the text
    val d5 = out(5L)
    assert(d5.getAs[Long]("n_latin") + d5.getAs[Long]("n_digit") +
      d5.getAs[Long]("n_cyrillic") + d5.getAs[Long]("n_cjk") +
      d5.getAs[Long]("n_space") + d5.getAs[Long]("n_other") ==
      d5.getAs[Long]("n_chars"))
  }

  test("local peaks: strict maxima only, plateaus and boundaries excluded") {
    // series: 1 3 2 5 5 4 7 (per key k): peaks at t=1 (3>1,3>2);
    // plateau 5,5 -> not peaks (not strict); 7 at boundary -> no
    val df = Seq((1L, 0L, 1.0), (1L, 1L, 3.0), (1L, 2L, 2.0),
      (1L, 3L, 5.0), (1L, 4L, 5.0), (1L, 5L, 4.0), (1L, 6L, 7.0))
      .map { case (k, t, v) => (k, t, t, v) }.toDF("k", "ts", "id", "v")
    val out = TOps.localPeaks(df, Seq("k"), "ts", "id", "v")
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1L), out.toString)
  }
}

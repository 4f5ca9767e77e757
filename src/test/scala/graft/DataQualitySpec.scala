package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.DataQuality._
import graft.analytics.Retrieval

/** Data-quality suite + keyword extraction semantics. */
class DataQualitySpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("dq checks: every type, pass and fail, exact metrics") {
    val df = Seq(
      (1L, Some("a"), 5.0, "X"),
      (2L, None, 15.0, "Y"),
      (2L, Some("c"), 25.0, "X"),  // dup id
      (4L, Some("d"), 35.0, "Z"))
      .toDF("id", "name", "v", "cat")
    val out = validate(df, Seq(
      NotNull("name_strict", "name"),              // fails: 1/4 null
      NotNull("name_loose", "name", 0.3),          // passes: 0.25 <= 0.3
      Unique("id_pk", Seq("id")),                  // fails: one dup
      InRange("v_range", "v", 0.0, 30.0),          // fails: 35 out
      ValuesIn("cat_domain", "cat", Seq("X", "Y")),// fails: Z
      DistinctCountBetween("cat_card", "cat", 2L, 3L))) // passes: 3
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("metric"), r.getAs[Boolean]("passed"))).toMap
    assert(out("name_strict") == (1L, false))
    assert(out("name_loose") == (1L, true))
    assert(out("id_pk") == (1L, false))
    assert(out("v_range") == (1L, false))
    assert(out("cat_domain") == (1L, false))
    assert(out("cat_card") == (3L, true))
    // n_rows consistent everywhere
    val ns = validate(df, Seq(NotNull("a", "name"), Unique("b", Seq("id"))))
      .select("n_rows").collect().map(_.getLong(0)).toSet
    assert(ns == Set(4L))
  }

  test("dq exact boundary: ppm cross-multiply, no float compare") {
    // 1 null out of 3 = 333333.33 ppm; threshold 1/3 rounds to 333333
    // ppm -> cross-multiply says 1e6 * 1 > 333333 * 3 -> fails (strict
    // integer semantics, not a float epsilon accident)
    val df = Seq(Some("a"), Some("b"), None).toDF("x")
    val strict = validate(df, Seq(NotNull("c", "x", 1.0 / 3.0)))
      .collect().head.getAs[Boolean]("passed")
    assert(!strict)
    // 333334 ppm passes
    val loose = validate(df, Seq(NotNull("c", "x", 0.333334)))
      .collect().head.getAs[Boolean]("passed")
    assert(loose)
  }

  test("keywords: rare repeated term outranks common ones, k cuts") {
    // 'zebra' appears twice in doc 1 and is corpus-rare; 'the' is in
    // every doc (idf ~ 0) — zebra must rank 1 for doc 1
    val docs = Seq(
      (1L, "the zebra saw the zebra cross"),
      (2L, "the dog saw the cat"),
      (3L, "the cat saw the dog cross"),
      (4L, "the dog saw the cat cross"))
      .toDF("doc_id", "text")
    val out = Retrieval.keywords(docs, "doc_id", "text", k = 2, minDf = 1)
      .filter(col("doc_id") === 1L).orderBy("kw_rank").collect()
    assert(out.length == 2)
    assert(out.head.getAs[String]("term") == "zebra")
    assert(out.head.getAs[Long]("kw_rank") == 1L)
    // every doc emits at most k rows
    val counts = Retrieval.keywords(docs, "doc_id", "text", 2, 1)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 2))
  }
}

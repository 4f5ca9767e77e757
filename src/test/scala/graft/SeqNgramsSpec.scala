package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Sequences

/** Frequent sequential n-grams (round 13): determinism under
  * partitioning, the n = 2 ≡ transitionMatrix counts identity, and
  * boundary behavior (short sequences, support pruning).
  */
class SeqNgramsSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private val rows = Seq(
    // user 1: a b a b a  → trigrams aba, bab, aba
    (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
    (1L, 4L, 4L, "b"), (1L, 5L, 5L, "a"),
    // user 2: a b a  → trigram aba
    (2L, 1L, 6L, "a"), (2L, 2L, 7L, "b"), (2L, 3L, 8L, "a"),
    // user 3: two events only — no trigram
    (3L, 1L, 9L, "x"), (3L, 2L, 10L, "y"))

  private def grams(df: org.apache.spark.sql.DataFrame, min: Long = 1L) =
    Sequences.frequentNgrams(df, Seq("u"), col("t"), col("id"), col("s"),
      n = 3, minSupport = min)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("counts windows per entity in time order; short sequences drop out") {
    val df = rows.toDF("u", "t", "id", "s")
    val g = grams(df)
    assert(g == Map("a>b>a" -> 3L, "b>a>b" -> 1L))
    // support pruning
    assert(grams(df, min = 2L) == Map("a>b>a" -> 3L))
  }

  test("deterministic under repartitioning (tie-broken ordering)") {
    val df = rows.toDF("u", "t", "id", "s")
    assert(grams(df) == grams(df.repartition(7)))
  }

  test("states containing the separator cannot collide (escaped rendering)") {
    // without escaping, ["a>b","c"] and ["a","b>c"] would both render
    // "a>b>c" and count as ONE bigram-of-two... two distinct grams
    val df = Seq(
      (1L, 1L, 1L, "a>b"), (1L, 2L, 2L, "c"),
      (2L, 1L, 3L, "a"), (2L, 2L, 4L, "b>c"))
      .toDF("u", "t", "id", "s")
    val bi = Sequences.frequentNgrams(df, Seq("u"), col("t"), col("id"),
      col("s"), n = 2, minSupport = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi == Map("a\\>b>c" -> 1L, "a>b\\>c" -> 1L), bi.toString)
    // the escape itself cannot be forged: a literal backslash escapes
    val df2 = Seq((1L, 1L, 1L, "a\\>b"), (1L, 2L, 2L, "c"))
      .toDF("u", "t", "id", "s")
    val bi2 = Sequences.frequentNgrams(df2, Seq("u"), col("t"), col("id"),
      col("s"), n = 2, minSupport = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi2 == Map("a\\\\\\>b>c" -> 1L), bi2.toString)
  }

  test("n = 2 recovers transitionMatrix counts") {
    val df = rows.toDF("u", "t", "id", "s")
    val bi = Sequences.frequentNgrams(df, Seq("u"), col("t"), col("id"),
      col("s"), n = 2, minSupport = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tm = Sequences.transitionMatrix(df, Seq("u"), col("t"), col("id"),
      col("s"))
      .collect().map(r => s"${r.getString(0)}>${r.getString(1)}" ->
        r.getLong(2)).toMap
    assert(bi == tm)
  }
}

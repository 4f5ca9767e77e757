package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Privacy, Stats, Text}

/** Semantics of the round-8 fourth continuation: Gini, autocorrelation,
  * Theil–Sen, k-anonymity, BPE apply.
  */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("gini: equality -> 0, concentration -> (n-1)/n, invariance") {
    val eq = Seq.fill(8)(("g", 25L)).toDF("g", "v")
    val r0 = Stats.gini(eq, Seq("g"), "v").collect().head
    assert(r0.getAs[Long]("gini_num") == 0L && r0.getAs[Double]("gini") == 0.0)
    val conc = (Seq.fill(7)(("g", 0L)) :+ (("g", 100L))).toDF("g", "v")
    val r1 = Stats.gini(conc, Seq("g"), "v").collect().head
    assert(r1.getAs[Double]("gini") == 7.0 / 8.0)
    // rank ties make the sum invariant under repartition
    val mixed = Seq(1L, 5L, 5L, 5L, 9L, 9L, 30L).map(("g", _)).toDF("g", "v")
    val a = Stats.gini(mixed, Seq("g"), "v").collect().head.getAs[Long]("gini_num")
    val b = Stats.gini(mixed.repartition(7), Seq("g"), "v")
      .collect().head.getAs[Long]("gini_num")
    assert(a == b)
  }

  test("autocorr: linear series -> r = 1, alternating -> r = -1") {
    val lin = (0L to 20L).map(t => ("g", t, 10L + 3L * t)).toDF("g", "t", "x")
    val r1 = Stats.autocorr(lin, Seq("g"), "t", "x", lag = 1L).collect().head
    assert(math.abs(r1.getAs[Double]("r") - 1.0) < 1e-12)
    assert(r1.getAs[Long]("n_pairs") == 20L)
    val alt = (0L to 20L).map(t => ("g", t, if (t % 2 == 0) 10L else 20L))
      .toDF("g", "t", "x")
    val r2 = Stats.autocorr(alt, Seq("g"), "t", "x", lag = 1L).collect().head
    assert(math.abs(r2.getAs[Double]("r") + 1.0) < 1e-2)
  }

  test("autocorr: a gap drops the pair instead of misaligning it") {
    // t = 0,1,2,4,5 — lag-1 pairs: (0,1),(1,2),(4,5) = 3 pairs
    val df = Seq(0L, 1L, 2L, 4L, 5L).map(t => ("g", t, t * t)).toDF("g", "t", "x")
    val r = Stats.autocorr(df, Seq("g"), "t", "x", lag = 1L).collect().head
    assert(r.getAs[Long]("n_pairs") == 3L)
  }

  test("theil-sen: outlier cannot move the median slope") {
    // perfect slope-2 line with one wild point
    val pts = (0L to 10L).map(t => ("g", t, 2L * t)) :+ (("g", 11L, 1000L))
    val r = Stats.theilSen(pts.toDF("g", "t", "x"), Seq("g"), "t", "x")
      .collect().head
    assert(r.getAs[Double]("slope") == 2.0,
      s"median slope ${r.getAs[Double]("slope")}")
    assert(r.getAs[Long]("n_slopes") == 66L) // C(12,2)
  }

  test("theil-sen: exact rational pair matches the double slope") {
    val pts = Seq(("g", 0L, 0L), ("g", 3L, 1L), ("g", 6L, 2L))
    val r = Stats.theilSen(pts.toDF("g", "t", "x"), Seq("g"), "t", "x")
      .collect().head
    assert(r.getAs[Double]("slope") ==
      r.getAs[Long]("med_num").toDouble / r.getAs[Long]("med_den").toDouble)
    assert(r.getAs[Double]("slope") == 1.0 / 3.0)
  }

  test("k-anonymize: ladder levels, exact counts, total preserved") {
    // (a, 1): 12 rows -> level 0. (a, 2): 7 rows and (a, 3): 5 rows
    // fail alone but total 12 at level 1. (b, 9): 4 rows -> falls
    // through level 1 (only 4) to the suppressed remainder.
    val rows = Seq.fill(12)(("a", 1L)) ++ Seq.fill(7)(("a", 2L)) ++
      Seq.fill(5)(("a", 3L)) ++ Seq.fill(4)(("b", 9L))
    val out = Privacy.kAnonymize(rows.toDF("t", "b"), Seq("t", "b"), 10L)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString).orNull,
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getAs[Long]("n"))).toSet
    assert(out == Set((0L, "a", 1L, 12L), (1L, "a", -1L, 12L),
      (2L, null, -1L, 4L)))
    assert(out.toSeq.map(_._4).sum == rows.size)
  }

  test("bpe apply: merged symbols spell out, non-overlap semantics") {
    val docs = Seq((1L, "x y x y z"), (2L, "x y q")).toDF("id", "text")
    val out = Text.bpeApply(docs, "id", "text", Seq(("x", "y")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x y" -> 3L, "z" -> 1L, "q" -> 1L))
    // second merge consumes the first's output symbol
    val out2 = Text.bpeApply(docs, "id", "text",
      Seq(("x", "y"), ("x y", "z")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 == Map("x y" -> 2L, "x y z" -> 1L, "q" -> 1L))
  }
}

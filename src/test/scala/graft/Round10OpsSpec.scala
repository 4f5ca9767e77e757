package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{DataQuality, Graph, Privacy, Sampling, Stats, Text, Temporal => TOps}

/** Round-10 operator semantics, hand-verified: clustering coefficient,
  * assortativity, Holt smoothing, cross-correlation, OHLC, Kendall,
  * ANOVA, Kruskal–Wallis, t-closeness, reconciliation, hashing trick.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("clustering coefficient: triangle node 1, pendant 0") {
    // triangle 1-2-3 plus pendant 3-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val cc = Graph.clusteringCoefficient(e, "u", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cc(1L) == (2L, 1L, 1.0))
    assert(cc(2L) == (2L, 1L, 1.0))
    // node 3: degree 3, one triangle -> 2/(3*2) = 1/3
    assert(cc(3L)._1 == 3L && cc(3L)._2 == 1L)
    assert(math.abs(cc(3L)._3 - 1.0 / 3.0) < 1e-15)
    assert(cc(4L) == (1L, 0L, 0.0))
  }

  test("assortativity: star graph is exactly -1") {
    val star = (1 to 6).map(i => (0L, i.toLong)).toDF("u", "v")
    val r = Graph.assortativity(star, "u", "v").collect().head
    assert(r.getLong(0) == 12L) // 6 undirected edges, both directions
    assert(r.getDouble(1) == -1.0)
  }

  test("holt: hand recursion, zero-initial-trend variant") {
    val s = Seq(("a", 0L, 10.0), ("a", 1L, 12.0), ("a", 2L, 14.0))
      .toDF("g", "day", "y")
    val out = TOps.holt(s, Seq("g"), "day", "y",
      alpha = 0.5, beta = 0.25).collect().head
    // l1=10 b1=0; l2=0.5*12+0.5*10=11, b2=0.25*1=0.25;
    // l3=0.5*14+0.5*11.25=12.625, b3=0.25*1.625+0.75*0.25=0.59375
    assert(out.getAs[Long]("n_points") == 3L)
    assert(out.getAs[Double]("level") == 12.625)
    assert(out.getAs[Double]("trend") == 0.59375)
    assert(out.getAs[Double]("forecast") == 13.21875)
    // single-point series: level = y, trend 0
    val one = TOps.holt(Seq(("b", 5L, 7.0)).toDF("g", "day", "y"),
      Seq("g"), "day", "y", 0.5, 0.25).collect().head
    assert(one.getAs[Double]("level") == 7.0 &&
      one.getAs[Double]("trend") == 0.0)
  }

  test("cross-correlation: a shifted copy correlates 1.0 at its lag") {
    val a = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("day", "n")
    val b = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("day", "n")
    val r = TOps.crossCorrelation(a, b, "day", "n", maxLag = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), Option(x.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(r(1L)._1 == 4L && r(1L)._2.contains(1.0))
    // at lag -1 the overlap [2..3]x[1..2] is also perfectly linear
    assert(r(-1L)._2.exists(v => math.abs(v - 1.0) < 1e-15))
  }

  test("ohlc: open/close by (ts,id) order with timestamp ties") {
    val e = Seq(
      ("t", 100L, 1L, 5.0), ("t", 100L, 2L, 9.0), // tie: id orders
      ("t", 200L, 3L, 1.0), ("t", 150L, 4L, 7.0))
      .toDF("g", "ts", "id", "v")
    val out = TOps.ohlc(e, Seq("g"), "ts", "id", "v", 86400L)
      .collect().head
    assert(out.getAs[Long]("n_events") == 4L)
    assert(out.getAs[Double]("open") == 5.0)   // ts 100, id 1
    assert(out.getAs[Double]("close") == 1.0)  // ts 200
    assert(out.getAs[Double]("high") == 9.0)
    assert(out.getAs[Double]("low") == 1.0)
  }

  test("kendall tau-b: hand case with an x-tie") {
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 3.0), ("g", 2L, 2.0),
      ("g", 3L, 4.0)).toDF("g", "x", "y")
    val r = Stats.kendallTau(df, Seq("g"), "x", "y").collect().head
    // C=5 D=0 tx=1 ty=0; tau = 5/sqrt(5*6)
    assert(r.getAs[Long]("concordant") == 5L)
    assert(r.getAs[Long]("discordant") == 0L)
    assert(r.getAs[Long]("ties_x") == 1L)
    assert(r.getAs[Long]("ties_y") == 0L)
    assert(math.abs(r.getAs[Double]("kendall_tau") -
      5.0 / math.sqrt(30.0)) < 1e-15)
    // perfect inverse order -> -1
    val inv = Stats.kendallTau(
      (1 to 5).map(i => ("h", i.toLong, -i.toDouble)).toDF("g", "x", "y"),
      Seq("g"), "x", "y").collect().head
    assert(inv.getAs[Double]("kendall_tau") == -1.0)
  }

  test("anova F: two separated groups, exact hand value") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.anovaF(df, "g", "v").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    // cents: SSB=4e8? no — cents 100,200,300,400: SSB=40000*100^0...
    // sums in cents: SSB = 290000*10^4? assert via the exact ratio: 8
    assert(r.getAs[Double]("f_stat") == 8.0)
  }

  test("kruskal-wallis: no-tie hand case H = 2.4") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = Stats.kruskalWallis(df, "g", "v").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("tie_term") == 0L)
    assert(math.abs(r.getAs[Double]("h_stat") - 2.4) < 1e-12)
    // all-equal values: every pair tied -> correction hits 0, H null
    val tied = Stats.kruskalWallis(
      Seq(("a", 1.0), ("b", 1.0), ("a", 1.0)).toDF("g", "v"),
      "g", "v").collect().head
    assert(tied.isNullAt(tied.fieldIndex("h_stat")))
  }

  test("t-closeness: skewed groups get the hand EMD") {
    // group A holds bucket 0 twice, B bucket 1 twice: global {0:2,1:2}
    val df = Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L))
      .toDF("seg", "b")
    val r = Privacy.tCloseness(df, Seq("seg"), "b")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    // |cumA(0)-cumAll(0)| = |1 - 0.5| = 0.5, m-1 = 1
    assert(r("A") == 0.5 && r("B") == 0.5)
    // identical distributions -> 0
    val same = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L))
      .toDF("seg", "b")
    val r2 = Privacy.tCloseness(same, Seq("seg"), "b")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r2("A") == 0.0 && r2("B") == 0.0)
  }

  test("reconcile: four statuses and named mismatch columns") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "s", "p")
    val b = Seq((1L, "x", 10.0), (2L, "Y", 21.0), (4L, "w", 40.0))
      .toDF("k", "s", "p")
    val r = DataQuality.reconcile(a, b, Seq("k"), Seq("s", "p"))
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getString(2))).toMap
    assert(r(1L) == ("match", ""))
    assert(r(2L) == ("mismatch", "p,s"))
    assert(r(3L) == ("only_a", ""))
    assert(r(4L) == ("only_b", ""))
  }

  test("reciprocity: hand graph, self-loops and duplicates ignored") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L),
      (5L, 5L), (1L, 2L)).toDF("s", "d")
    val r = Graph.reciprocity(e, "s", "d").collect().head
    // distinct non-loop edges: 1→2,2→1,1→3,3→4,4→3 = 5; mutual: 4
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.8)
  }

  test("brown-forsythe: equal-spread groups give F exactly 0") {
    // both groups have deviations {1,0,1} around their medians
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", "v").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("ss_between") == 0.0)
    // unequal spreads: {1,2,3} vs {1,100,199} (even-size medians too)
    val df2 = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 199.0))
      .toDF("g", "v")
    val r2 = Stats.brownForsythe(df2, "g", "v").collect().head
    // doubled medians: a=400 cents, b=20000; deviations a: {200,200},
    // b: {19800,19800} -> within-group SS = 0 -> F undefined (null)
    assert(r2.isNullAt(r2.fieldIndex("f_stat")))
    assert(r2.getAs[Double]("ss_within") == 0.0)
  }

  test("fixed-size sample: exact k per group, deterministic, seed-sensitive") {
    val df = (1 to 500).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("id", "g")
    val s1 = Sampling.fixedSizeSample(df, Seq("g"), "id", k = 20, seed = 1L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(s1.groupBy(_._1).forall(_._2.size == 20))
    val s1b = Sampling.fixedSizeSample(df, Seq("g"), "id", k = 20, seed = 1L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(s1 == s1b, "same seed must reproduce")
    val s2 = Sampling.fixedSizeSample(df, Seq("g"), "id", k = 20, seed = 2L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(s1 != s2, "a new seed draws a different sample")
    // k above the group size returns the whole group
    val tiny = Sampling.fixedSizeSample(
      Seq((1L, "x"), (2L, "x")).toDF("id", "g"), Seq("g"), "id", 10)
    assert(tiny.count() == 2L)
  }

  test("rank eval: hand P@k and MRR, zero-hit convention") {
    val ranked = Seq(("q1", 1L, 10L), ("q1", 2L, 11L), ("q1", 3L, 12L),
      ("q2", 1L, 20L), ("q2", 2L, 21L)).toDF("query_id", "rank", "doc_id")
    val qrels = Seq(("q1", 11L), ("q1", 12L), ("q2", 99L))
      .toDF("query_id", "doc_id")
    val r = graft.analytics.Retrieval.rankEval(ranked, qrels,
        "query_id", "rank", "doc_id", k = 3)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("q1").getAs[Long]("n_relevant") == 2L)
    assert(r("q1").getAs[Double]("precision_at_k") == 2.0 / 3.0)
    assert(r("q1").getAs[Double]("reciprocal_rank") == 0.5)
    assert(r("q2").getAs[Long]("n_relevant") == 0L)
    assert(r("q2").getAs[Double]("reciprocal_rank") == 0.0)
    assert(r("q2").isNullAt(r("q2").fieldIndex("first_rel_rank")))
  }

  test("bollinger: hand window, exact mean/sd, bands symmetric") {
    val s = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0))
      .toDF("g", "x", "v")
    val out = TOps.bollinger(s, Seq("g"), "x", "v", window = 2, k = 2.0)
      .collect().map(r => r.getAs[Long]("x") -> r).toMap
    // at x=2: window {10,20}: mean 15, pop sd 5 -> bands 25/5
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_window") == 2L)
    assert(r2.getAs[Double]("mean") == 15.0)
    assert(r2.getAs[Double]("stddev") == 5.0)
    assert(r2.getAs[Double]("upper") == 25.0)
    assert(r2.getAs[Double]("lower") == 5.0)
    // first row: window of one -> sd 0, bands collapse to the value
    assert(out(1L).getAs[Double]("stddev") == 0.0)
    assert(out(1L).getAs[Double]("upper") == 10.0)
  }

  test("degree histogram: star graph = one hub row + n leaf rows") {
    val star = (1 to 6).map(i => (0L, i.toLong)).toDF("u", "v")
    val h = Graph.degreeHistogram(star, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(6L -> 1L, 1L -> 6L), h.toString)
  }

  test("hashing trick: signed counts, fixed dimension, repeat doubling") {
    val docs = Seq((1L, "alpha"), (2L, "alpha alpha"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val f = Text.hashingTrick(docs, "doc_id", "text", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val one = f.collect { case ((1L, b), v) => (b, v) }.toSeq
    assert(one.size == 1 && math.abs(one.head._2._1) == 1L)
    val (bucket, (feat, _)) = ((b: Long) => (b, f((1L, b))))(one.head._1)
    // same token twice -> same bucket, doubled signed count
    assert(f((2L, bucket)) == (feat * 2, 2L))
    assert(f.keys.forall { case (_, b) => b >= 0 && b < 64 })
    // doc 3 has two distinct tokens -> at most 2 buckets, 2 tokens
    assert(f.collect { case ((3L, _), v) => v._2 }.sum == 2L)
  }
}

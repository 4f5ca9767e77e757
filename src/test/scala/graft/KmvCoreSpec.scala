package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Baskets, Graph, Sketch, Stats}

/** Round-9 wave-D semantics: KMV sketch, association rules, k-core,
  * categorical entropy.
  */
class KmvCoreSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("kmv: exact below k, merge law, partition invariance") {
    val df = (1 to 40).map(i => ("g", i.toLong)).toDF("g", "v")
    val st = Sketch.kmvState(df, Seq("g"), "v", k = 64)
    val est = Sketch.kmvEstimate(st, Seq("g"), k = 64).collect().head
    // 40 < k: the state IS the distinct set, estimate exact
    assert(est.getAs[Long]("n_state") == 40L)
    assert(est.getAs[Double]("estimate") == 40.0)
    // duplicates collapse
    val dup = ((1 to 40) ++ (1 to 40)).map(i => ("g", i.toLong)).toDF("g", "v")
    assert(Sketch.kmvEstimate(Sketch.kmvState(dup, Seq("g"), "v", 64),
      Seq("g"), 64).collect().head.getAs[Long]("n_state") == 40L)
    // merge law: state(A ∪ B) == merge(state(A), state(B))
    val big = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "v")
    val (a, b) = ((1 to 2500).map(i => ("g", i.toLong)).toDF("g", "v"),
      (2000 to 5000).map(i => ("g", i.toLong)).toDF("g", "v"))
    val direct = Sketch.kmvState(big, Seq("g"), "v", 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val merged = Sketch.kmvMerge(Seq(
        Sketch.kmvState(a, Seq("g"), "v", 64),
        Sketch.kmvState(b, Seq("g"), "v", 64)), Seq("g"), 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(direct == merged, "KMV merge law broken")
    // estimate within 30% at k=64 on 5000 distinct
    val e = Sketch.kmvEstimate(Sketch.kmvState(big, Seq("g"), "v", 64),
      Seq("g"), 64).collect().head.getAs[Double]("estimate")
    assert(e > 3500 && e < 6500, s"estimate $e")
    // partition invariance
    val rep = Sketch.kmvState(big.repartition(9), Seq("g"), "v", 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rep == direct)
  }

  test("association rules: confidence direction asymmetry, lift") {
    // baskets: {1,2} x3, {1} x1  -> supp(1)=4, supp(2)=3, pair=3
    // rule 2->1: conf 3/3 = 1.0 (passes 0.9); 1->2: 3/4 (fails 0.9)
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (13L, 1L))
    val df = rows.toDF("b", "i")
    val out = Baskets.associationRules(df, "b", "i", minSupport = 2L,
        minConfidence = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    assert(out.keySet == Set((2L, 1L)), out.toString)
    assert(out((2L, 1L))._1 == 1.0)
    // lift = pair*N/(suppA*suppB) = 3*4/(3*4) = 1.0
    assert(out((2L, 1L))._2 == 1.0)
    // threshold 0.7 admits 1->2 with conf 0.75
    val loose = Baskets.associationRules(df, "b", "i", 2L, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 2L), (2L, 1L)))
  }

  test("k-core: triangle survives 2-core, tail pruned, cascade peel") {
    // triangle 1-2-3 plus tail 3-4-5 (path). 2-core = the triangle:
    // 5 (deg 1) peels, then 4, then 3 keeps degree 2 in-core.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val out = Graph.kCore(e, "u", "v", k = 2, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), out.toString)
    // k=3: a triangle has degree 2 everywhere -> empty
    assert(Graph.kCore(e, "u", "v", k = 3).count() == 0)
  }

  test("skyline: frontier membership, tie semantics, duplicates survive") {
    import graft.analytics.Joins
    // (5,1) and (1,5) on frontier; (3,3) on frontier; (2,2) dominated
    // by (3,3); (5,0) dominated by (5,1) (tied x, lower y);
    // duplicate (3,3) both survive
    val df = Seq((1, "g", 5L, 1.0), (2, "g", 1L, 5.0), (3, "g", 3L, 3.0),
      (4, "g", 2L, 2.0), (5, "g", 5L, 0.0), (6, "g", 3L, 3.0))
      .toDF("id", "g", "x", "y")
    val out = Joins.skyline2D(df, Seq("g"), "x", "y")
      .collect().map(_.getAs[Int]("id")).toSet
    assert(out == Set(1, 2, 3, 6), out.toString)
    // matches brute force on a randomized instance
    val rnd = new scala.util.Random(7)
    val pts = (0 until 200).map(i =>
      (i, "r", rnd.nextInt(30).toLong, rnd.nextInt(30).toDouble))
    val rdf = pts.toDF("id", "g", "x", "y")
    val got = Joins.skyline2D(rdf, Seq("g"), "x", "y")
      .collect().map(_.getAs[Int]("id")).toSet
    val want = pts.filter { case (_, _, x, y) =>
      !pts.exists { case (_, _, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) } }.map(_._1).toSet
    assert(got == want)
  }

  test("sequence likelihood: deterministic chain scores 0 nll") {
    import graft.analytics.Sequences
    // user 1: a->b->a->b (deterministic transitions, p=1, nll=0)
    // user 2: a->b->b (b->b and a->b split b-successors)
    val df = Seq((1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"),
      (1L, 3L, 12L, "a"), (1L, 4L, 13L, "b"),
      (2L, 5L, 10L, "a"), (2L, 6L, 11L, "b"), (2L, 7L, 12L, "b"))
      .toDF("u", "id", "ts", "st")
    val out = Sequences.sequenceLikelihood(df, Seq("u"), col("ts"),
        col("id"), col("st"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("nll_total")))
      .toMap
    // transitions: a->b x3 (p=1), b->a x1, b->b x1 (p=1/2 each)
    assert(out(1L)._1 == 3L)
    // user1: a->b,b->a,a->b = 0 + ln2 + 0
    assert(math.abs(out(1L)._2 - math.log(2.0)) < 1e-12, out.toString)
    // user2: a->b,b->b = 0 + ln2
    assert(math.abs(out(2L)._2 - math.log(2.0)) < 1e-12)
  }

  test("categorical entropy: uniform=ln k, single category=0, fold stable") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("c"))
      .map(("g1", _)) ++ Seq.fill(7)(("g2", "only"))
    val out = Stats.categoricalEntropy(df.toDF("g", "c"), Seq("g"), "c")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_categories"),
          r.getAs[Double]("entropy"), r.getAs[Any]("normalized"))).toMap
    assert(out("g1")._1 == 30L && out("g1")._2 == 3L)
    assert(math.abs(out("g1")._3 - math.log(3.0)) < 1e-12)
    assert(math.abs(out("g1")._4.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(out("g2")._3 == 0.0 && out("g2")._4 == null)
    // bit-stable under repartition
    val rep = Stats.categoricalEntropy(
        df.toDF("g", "c").repartition(11), Seq("g"), "c")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("entropy")).toMap
    assert(rep("g1") == out("g1")._3)
  }
}

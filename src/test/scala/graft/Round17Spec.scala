package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Graph, Similarity}

/** Round-17 additions: label-propagation communities, multi-source
  * BFS seed distance, and the exact-arithmetic PCA power iteration.
  */
class Round17Spec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  // two 4-cliques bridged by one edge — LPA must keep them as two
  // communities labeled by each clique's minimum id
  private def twoCliques() = {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L))).toDF("a", "b")
  }

  test("labelPropagation separates bridged cliques with min-label communities") {
    val got = Graph.labelPropagation(twoCliques(), "a", "b", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L), s"left clique: $got")
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L), s"right clique: $got")
  }

  test("labelPropagation early exit equals the full budget") {
    // the clique pair converges in ~3 rounds; a much larger budget
    // must return the identical table (F(L) = L fixed-point argument)
    val a = Graph.labelPropagation(twoCliques(), "a", "b", iterations = 4)
      .collect().toSet
    val b = Graph.labelPropagation(twoCliques(), "a", "b", iterations = 20)
      .collect().toSet
    assert(a == b)
  }

  test("seedDistance computes multi-source min hops and drops the unreached") {
    // path 1-2-3-4-5, seed {1}; isolated pair 100-101 unreached
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (100L, 101L))
      .toDF("a", "b")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.seedDistance(edges, "a", "b", seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"got $got")                       // 5 is beyond maxHops, absent
  }

  test("seedDistance takes the nearest of several seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L, 5L).toDF("id")
    val got = Graph.seedDistance(edges, "a", "b", seeds, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("seedDistance ignores seeds absent from the graph") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val got = Graph.seedDistance(edges, "a", "b", Seq(99L).toDF("id"))
    assert(got.isEmpty)
  }

  // an elongated cloud: x-axis spread 10x the y-axis spread — the top
  // component must align with x
  private def cloud() = {
    val rows = (0 until 40).map { i =>
      val x = (i % 20).toFloat - 9.5f
      val y = ((i * 7) % 4).toFloat * 0.1f - 0.15f
      (i.toLong, Array(x, y, 0.0f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pcaTopComponent finds the dominant axis as a unit vector") {
    val l = Similarity.pcaTopComponent(cloud(), "vec_id", "embedding",
      iterations = 5).orderBy("dim").collect()
    assert(l.length == 3)
    val loadings = l.map(_.getDouble(2))
    val norm = math.sqrt(loadings.map(v => v * v).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"norm=$norm")
    assert(math.abs(math.abs(loadings(0)) - 1.0) < 1e-3,
      s"x loading: ${loadings(0)}")
    assert(math.abs(loadings(1)) < 0.05 && math.abs(loadings(2)) < 1e-6,
      s"off-axis loadings: ${loadings.toSeq}")
  }

  test("pcaProject is the centered dot with the final iterate, run-stable") {
    val p1 = Similarity.pcaProject(cloud(), "vec_id", "embedding",
      iterations = 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p2 = Similarity.pcaProject(cloud(), "vec_id", "embedding",
      iterations = 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p1 == p2)                     // bit-stable across runs
    // projections of the widest-x points have the largest magnitude
    val byAbs = p1.toSeq.sortBy { case (_, v) => -math.abs(v) }.map(_._1).take(4)
    assert(byAbs.forall(id => { val x = math.abs((id % 20) - 9.5); x > 8 }),
      s"extreme projections not at the cloud ends: $byAbs")
  }

  test("modularity scores the clique partition with the exact rational") {
    // two 4-cliques + bridge: m = 13, e_c = 6 each, d_c = 13 each ->
    // Q = 2*(4*13*6 - 169)/(4*169) = 286/676 exactly
    val comm = Graph.labelPropagation(twoCliques(), "a", "b", iterations = 8)
    val row = Graph.modularity(twoCliques(), "a", "b", comm).head()
    assert(row.getLong(0) == 13L && row.getLong(1) == 2L, row.toString)
    assert(row.getDouble(2) == 286.0 / 676.0, s"Q=${row.getDouble(2)}")
  }

  test("personalizedPageRank: mass concentrates at and downstream of seeds") {
    // star out of seed 1 (1->2, 2->3) plus an island 10->11: the
    // island gets ZERO mass (no teleport restarts there), and rank
    // decays along the seed's chain
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d")
    val got = Graph.personalizedPageRank(edges, "s", "d",
      Seq(1L).toDF("id"), iterations = 10, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(10L) == 0.0 && got(11L) == 0.0, s"island leaked mass: $got")
    assert(got(1L) > got(2L) && got(2L) > got(3L), s"no decay: $got")
    assert(got(1L) == 1.0 - 0.85, "seed rank = teleport at the fixed point")
  }

  test("personalizedPageRank fails loudly when no seed is in the graph") {
    val edges = Seq((1L, 2L)).toDF("s", "d")
    val e = intercept[Exception] {
      Graph.personalizedPageRank(edges, "s", "d", Seq(99L).toDF("id"))
    }
    assert(e.getMessage.contains("seed"))
  }

  test("changepoint finds the level shift at the exact split") {
    // group A: 5 days at 100 then 5 days at 900 — split after day 5;
    // group B: constant series — score 0 at every k, tie -> k = 1
    val rows =
      (1L to 5L).map(d => ("A", d, 100L)) ++
        (6L to 10L).map(d => ("A", d, 900L)) ++
        (1L to 4L).map(d => ("B", d, 50L))
    val got = graft.analytics.Temporal.changepoint(
      rows.toDF("g", "day", "cents"), Seq("g"), "day", "cents")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    val (nA, kA, splitA, mlA, mrA) = got("A")
    assert((nA, kA, splitA) == (10L, 5L, 5L), s"A: ${got("A")}")
    assert(mlA == 100.0 && mrA == 900.0)
    val (nB, kB, _, mlB, mrB) = got("B")
    assert((nB, kB) == (4L, 1L), s"constant series ties to k=1: ${got("B")}")
    assert(mlB == 50.0 && mrB == 50.0)
  }

  test("changepoint: single-point series have no split and are absent") {
    val got = graft.analytics.Temporal.changepoint(
      Seq(("solo", 1L, 5L)).toDF("g", "day", "cents"),
      Seq("g"), "day", "cents")
    assert(got.isEmpty)
  }

  test("pcaResidual removes the common direction (residual ⊥ loading)") {
    val loadings = Similarity.pcaTopComponent(cloud(), "vec_id", "embedding",
      iterations = 3).orderBy("dim").collect().map(_.getDouble(2))
    val res = Similarity.pcaResidual(cloud(), "vec_id", "embedding",
      iterations = 3).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    assert(res.size == 40 && res.head._2.length == 3)
    // every residual is orthogonal to the removed direction (up to
    // the 1e-9 iterate + 12-dp output quantization)
    res.values.foreach { r =>
      val dot = r.zip(loadings).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-6, s"residual not orthogonal: $dot")
    }
    // the dominant x-axis spread is gone: max |x-residual| is tiny
    // relative to the original half-range (9.5)
    val maxX = res.values.map(r => math.abs(r(0))).max
    assert(maxX < 1.0, s"common direction survived: $maxX")
  }

  test("hurstRs: a pure trend is persistent, an alternating series is not") {
    // 64 points per group: 'trend' ramps (H -> 1), 'flip' alternates
    // around its mean (anti-persistent, H well below the trend's)
    val rows =
      (0L until 64L).map(i => ("trend", i, i * 100L)) ++
        (0L until 64L).map(i => ("flip", i, if (i % 2 == 0) 100L else 900L))
    val got = graft.analytics.Temporal.hurstRs(
      rows.toDF("g", "day", "cents"), Seq("g"), "day", "cents")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (scalesT, blocksT, hT) = got("trend")
    assert(scalesT == 3L && blocksT == (8L + 4L + 2L), got("trend"))
    assert(hT > 0.9, s"trend hurst $hT")
    val hF = got("flip")._3
    assert(hF < hT - 0.4, s"alternating series not anti-persistent: $hF vs $hT")
  }

  test("hurstRs: constant and too-short series are absent") {
    val rows =
      (0L until 64L).map(i => ("const", i, 500L)) ++   // zero variance
        (0L until 10L).map(i => ("short", i, i * 10L)) // only m=8 usable
    val got = graft.analytics.Temporal.hurstRs(
      rows.toDF("g", "day", "cents"), Seq("g"), "day", "cents")
      .collect()
    assert(got.isEmpty, got.mkString(", "))
  }

  test("pca guards: ragged vectors and wild magnitudes fail loudly") {
    val ragged = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Similarity.pcaTopComponent(ragged, "vec_id", "embedding")
    }
    assert(e1.getMessage.contains("ragged"))
    val wild = Seq((1L, Array(1e9f, 0f)), (2L, Array(-1e9f, 0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Similarity.pcaTopComponent(wild, "vec_id", "embedding")
    }
    assert(e2.getMessage.contains("lower xScale"))
  }
}

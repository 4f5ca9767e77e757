package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Stats, Text, Temporal => TOps}

/** Semantics of the round-8 seventh continuation: LTTB downsampling,
  * n-gram novelty, exact mode.
  */
class DownsampleSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("lttb: endpoints kept, spike survives, output deterministic") {
    // flat series with one spike at t=50
    val pts = (0L to 100L).map(t => ("g", t, if (t == 50L) 1000L else 10L))
    val df = pts.toDF("g", "t", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      TOps.lttb(d, Seq("g"), "t", "v", buckets = 6)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val got = run(df)
    assert(got.contains((0L, 10L)) && got.contains((100L, 10L)),
      s"endpoints missing: $got")
    assert(got.contains((50L, 1000L)), s"spike dropped: $got")
    // 2 endpoints + 4 interior buckets
    assert(got.size == 6, s"size ${got.size}: $got")
    assert(got == run(df.repartition(7)))
  }

  test("lttb: tiny series emits endpoints plus whatever buckets exist") {
    val df = Seq(("g", 1L, 5L), ("g", 9L, 7L)).toDF("g", "t", "v")
    val got = TOps.lttb(df, Seq("g"), "t", "v", buckets = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 5L), (9L, 7L)))
  }

  test("novelty: first doc is 1.0, verbatim copy is 0.0, mix in between") {
    val df = Seq(
      (1L, "a b c d e"),          // all 3 grams novel
      (2L, "a b c d e"),          // verbatim copy: zero novel
      (3L, "a b c x y z")         // 'a b c' seen; 3 of 4 novel
    ).toDF("doc_id", "text")
    val got = Text.novelty(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (3L, 3L, 1.0))
    assert(got(2L) == (3L, 0L, 0.0))
    assert(got(3L) == (4L, 3L, 0.75))
  }

  test("pit join: deletes null out, same-second chains pick the later version") {
    import graft.model.Cdc
    // user 1: v@10(id 100), delete@20(id 101), then a same-second
    // chain at 30: v(id 102) immediately superseded by v(id 103)
    val log = Seq((1L, 100L, 10L, "update", "a"),
      (1L, 101L, 20L, "delete", null),
      (1L, 102L, 30L, "update", "b"),
      (1L, 103L, 30L, "update", "c")).toDF("k", "id", "pos", "op", "v")
    val hist = Cdc.scd2(log, Seq("k"), Seq(col("pos"), col("id")),
        col("pos"), "op")
      .select(col("k").as("h_k"), col("id").as("v_id"),
        col("valid_from"), col("valid_to"), col("v").as("v_val"))
    val facts = Seq((1L, 1L, 5L), (1L, 2L, 15L), (1L, 3L, 25L),
      (1L, 4L, 30L), (1L, 5L, 99L)).toDF("k", "f_id", "f_ts")
    val got = TOps.pitJoin(facts, hist, "k", "h_k", "f_ts",
        "valid_from", "valid_to", Seq("v_id", "v_val"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3),
          Option(r.getString(4)).orNull)).toMap
    assert(got == Map(1L -> (-1L, null), 2L -> (100L, "a"),
      3L -> (-1L, null), 4L -> (103L, "c"), 5L -> (103L, "c")), got.toString)
  }

  test("knn graph: high recall vs the exact graph; deterministic edges") {
    val rnd = new scala.util.Random(99)
    // 3 well-separated gaussian blobs in 8-d
    val centers = Seq.fill(3)(Array.fill(8)(rnd.nextGaussian() * 5))
    val vecs = (0 until 120).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.analytics.Similarity.knnGraph(df, "vec_id",
        "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact graph by brute force
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def n(v: Seq[Float]) = math.sqrt(v.map(x => x * x.toDouble).sum)
      v2dot(a, b) / (n(a) * n(b))
    }
    def v2dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val exact = vecs.flatMap { case (i, v) =>
      vecs.filter(_._1 != i).map { case (j, w) => (i, j, cos(v, w)) }
        .sortBy { case (_, j, c) => (-c, j) }.take(3).map(t => (i, t._2))
    }.toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    assert(got.size == exact.size) // k edges per node
  }

  test("oov rate: unseen and sub-minCount tokens count as OOV") {
    val train = Seq((2L, "a a b b c")).toDF("doc_id", "text") // c freq 1
    val eval_ = Seq((1L, "a b c z"), (3L, "a a")).toDF("doc_id", "text")
    val got = graft.analytics.Text.oovRate(train, eval_, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (4L, 2L, 0.5)) // c (freq 1) and z are OOV
    assert(got(3L) == (2L, 0L, 0.0))
  }

  test("forecast backtest: hand errors, gaps drop forecasts") {
    // days 0..13 except 8: day t forecast = x(t-7)
    val rows = (0L to 13L).filter(_ != 8L).map(d => ("g", d, 100L + d))
    val r = graft.analytics.Stats.forecastBacktest(rows.toDF("g", "d", "x"),
      Seq("g"), "d", "x", period = 7L).collect().head
    // forecastable days: 7,9..13 minus day 9 NOT dropped (day 2 exists)
    // -> days 7,9,10,11,12,13 = 6 forecasts, each error exactly 7
    assert(r.getAs[Long]("n_forecasts") == 6L)
    assert(r.getAs[Long]("sum_abs_err") == 42L)
    assert(r.getAs[Double]("mae") == 7.0)
  }

  test("hilbert key: bijective, consecutive cells 4-adjacent (z-order is not)") {
    import graft.analytics.Layout
    val order = 4 // 16x16 grid
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)
    val keyed = Layout.hilbertKey(col("x"), col("y"), bits = order)
    val got = cells.toDF("x", "y").withColumn("k", keyed)
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // bijection onto 0..255
    assert(got.map(_._1).toSeq == (0L until 256L))
    // the defining curve property: every consecutive pair of keys is
    // Manhattan-distance 1 apart
    val steps = got.map(_._2).toSeq.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.toSeq
    assert(steps.forall(_ == 1L), s"max step ${steps.max}")
    // contrast: the Morton order takes cross-quadrant jumps
    val zgot = cells.toDF("x", "y")
      .withColumn("k", Layout.zorderKey(col("x"), col("y"), bits = order))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val zsteps = zgot.map(_._2).toSeq.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.toSeq
    assert(zsteps.max > 1L, "expected Z-jumps in the Morton order")
  }

  test("exact mode: max count wins, ties to smallest value") {
    val df = Seq(("g", 5L), ("g", 5L), ("g", 3L), ("g", 3L), ("g", 9L))
      .toDF("g", "v")
    val r = Stats.exactMode(df, Seq("g"), "v").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L) // tie 3 vs 5 -> 3
  }
}

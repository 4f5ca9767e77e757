package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Joins, Sketch, Temporal}

/** As-of join, binned range join, and the HLL sketch: semantics on
  * hand-built frames (incl. the tie/boundary/atomic-match edges) plus
  * plan-shape guards — the as-of must be ONE key shuffle + a window
  * (no join operator at all), the range join must plan as an
  * equi-hash/merge join on the bucket (never a nested loop).
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def asof(strict: Boolean) = {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("rk", "rt", "v")
    Temporal.asOfJoin(l, r, "k", "rk", "t", "rt", Seq("v", "rt"), strict)
      .select(col("tag"), col("v"), col("rt"))
      .collect().map(x => x.getString(0) -> ((Option(x.get(1)), Option(x.get(2))))).toMap
  }

  test("asOfJoin: inclusive picks the row AT the probe time, left-outer keeps misses") {
    val m = asof(strict = false)
    assert(m("a") == ((Some(100.0), Some(10L)))) // tie: rt = t visible
    assert(m("b") == ((Some(150.0), Some(15L)))) // latest of the two
    assert(m("c") == ((None, None)))             // before first right row
    assert(m("d") == ((None, None)))             // key with no right rows
  }

  test("asOfJoin: strict excludes the tied right row") {
    val m = asof(strict = true)
    assert(m("a") == ((None, None)))             // rt = 10 no longer visible
    assert(m("b") == ((Some(150.0), Some(15L))))
  }

  test("asOfJoin: a null INSIDE the matched right row does not inherit from an older row") {
    val l = Seq((1L, 30L)).toDF("k", "t")
    val r = Seq((1L, 10L, Some(7.0)), (1L, 20L, None))
      .toDF("rk", "rt", "v")
    val row = Temporal.asOfJoin(l, r, "k", "rk", "t", "rt", Seq("v", "rt"))
      .select(col("v"), col("rt")).collect().head
    assert(row.isNullAt(0), "v must be the rt=20 row's null, not 7.0 from rt=10")
    assert(row.getLong(1) == 20L)
  }

  test("asOfJoin plans as one key shuffle + window — no join operator") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
    val plan = Temporal.asOfJoin(l, r, "k", "rk", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in as-of plan:\n$plan")
    assert(plan.contains("Window"), s"expected window in as-of plan:\n$plan")
  }

  test("asOfJoinBroadcast: same results as the union-sort formulation, broadcast plan, unsorted probe side") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("rk", "rt", "v")
    val viaBroadcast = Temporal.asOfJoinBroadcast(l, r, "k", "rk", "t", "rt", Seq("v", "rt"))
    val viaShuffle = Temporal.asOfJoin(l, r, "k", "rk", "t", "rt", Seq("v", "rt"))
    val bc = viaBroadcast.collect().map(_.toSeq).toSet
    val sh = viaShuffle.collect().map(_.toSeq).toSet
    assert(bc == sh, s"broadcast and shuffle formulations disagree: $bc vs $sh")
    val plan = viaBroadcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"probe side must not be sorted/windowed:\n$plan")
  }

  test("asOfJoin dedupRight: duplicate right timestamps resolve to the max-struct winner, identically in both formulations and under repartition") {
    val l = Seq((1L, 10L, "a"), (1L, 25L, "b")).toDF("k", "t", "tag")
    // three right rows tied at (k=1, rt=10) with different values, plus
    // a later unique row — without dedup the tie winner is
    // partitioning-dependent; with dedupRight it is the struct max
    // (v=300.0 at rt=10), a pure function of the value multiset
    val r = Seq((1L, 10L, 100.0, "x"), (1L, 10L, 300.0, "z"),
      (1L, 10L, 200.0, "y"), (1L, 20L, 150.0, "w"))
      .toDF("rk", "rt", "v", "src")
    def run(right: org.apache.spark.sql.DataFrame) = {
      val viaShuffle = Temporal.asOfJoin(l, right, "k", "rk", "t", "rt",
        Seq("v", "src"), dedupRight = true)
      val viaBroadcast = Temporal.asOfJoinBroadcast(l, right, "k", "rk", "t", "rt",
        Seq("v", "src"), dedupRight = true)
      (viaShuffle.select(col("tag"), col("v"), col("src")).collect()
         .map(x => (x.getString(0), x.getDouble(1), x.getString(2))).toSet,
       viaBroadcast.select(col("tag"), col("v"), col("src")).collect()
         .map(x => (x.getString(0), x.getDouble(1), x.getString(2))).toSet)
    }
    val want = Set(("a", 300.0, "z"), ("b", 150.0, "w"))
    val (s1, b1) = run(r)
    assert(s1 == want && b1 == want, s"got shuffle=$s1 broadcast=$b1")
    // partitioning cannot change the winner
    val (s2, b2) = run(r.repartition(7))
    assert(s2 == want && b2 == want, s"repartition changed the winner: $s2 $b2")
  }

  test("AsOfPick: empty version arrays and pre-first probes yield null, not a crash") {
    val l = Seq((1L, 3L), (2L, 100L)).toDF("k", "t")
    val r = Seq((2L, 50L, 1.5)).toDF("rk", "rt", "v") // key 1 absent entirely
    val got = Temporal.asOfJoinBroadcast(l, r, "k", "rk", "t", "rt", Seq("v"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(got == Map(1L -> None, 2L -> Some(1.5)))
    // probe before the first version of an existing key
    val l2 = Seq((2L, 10L)).toDF("k", "t")
    val got2 = Temporal.asOfJoinBroadcast(l2, r, "k", "rk", "t", "rt", Seq("v"))
      .collect().head
    assert(got2.isNullAt(2))
  }

  test("asOfJoinBroadcast enriches a stream (point-in-time lookup per micro-batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, 10L, "v1"), (1L, 20L, "v2")).toDF("rk", "rt", "ver")
    val in = MemoryStream[(Long, Long)]
    val enriched = Temporal.asOfJoinBroadcast(
      in.toDF().toDF("k", "t"), dim, "k", "rk", "t", "rt", Seq("ver"))
    val q = enriched.writeStream.format("memory").queryName("pit_test")
      .outputMode("append").start()
    try {
      in.addData((1L, 15L), (1L, 25L), (1L, 5L))
      q.processAllAvailable()
      val rows = spark.table("pit_test")
        .collect().map(x => x.getLong(1) -> Option(x.getString(2))).toMap
      assert(rows == Map(15L -> Some("v1"), 25L -> Some("v2"), 5L -> None))
    } finally q.stop()
  }

  test("sessionize assigns deterministic per-key ordinals across gap boundaries") {
    val df = Seq(
      (1L, 100L, 1L), (1L, 200L, 2L), (1L, 5000L, 3L), (1L, 5100L, 4L),
      (2L, 100L, 5L)).toDF("k", "ts", "id")
    val got = Temporal.sessionize(df, "k", "ts", "id", gapSeconds = 1800L)
      .select(col("id"), col("session_seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("rangeJoinBinned matches brute force incl. bucket-spanning intervals and end-exclusive boundary") {
    // intervals deliberately span 1-3 buckets of width 10; points sit on
    // starts, ends, and bucket edges
    val iv = Seq((1L, 5L, 25L), (2L, 10L, 20L), (3L, 17L, 18L), (4L, 90L, 95L))
      .toDF("iid", "s", "e")
    val pts = Seq.range(0L, 40L).toDF("pt")
    val got = Temporal.rangeJoinBinned(pts.toDF("pt"), "pt", iv, "s", "e", 10L)
      .select(col("iid"), col("pt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (iid, s, e) <- Seq((1L, 5L, 25L), (2L, 10L, 20L), (3L, 17L, 18L), (4L, 90L, 95L))
      p <- 0L until 40L if p >= s && p < e
    } yield (iid, p)).toSet
    assert(got == want)
    // no duplicate pairs despite interval replication across buckets
    val raw = Temporal.rangeJoinBinned(pts.toDF("pt"), "pt", iv, "s", "e", 10L)
      .select(col("iid"), col("pt")).collect()
    assert(raw.length == want.size)
  }

  test("rangeJoinBinned plans as an equi-join on the bucket, not a nested loop") {
    val iv = Seq((1L, 5L, 25L)).toDF("iid", "s", "e")
    val pts = Seq(1L).toDF("pt")
    val plan = Temporal.rangeJoinBinned(pts, "pt", iv, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a non-equi plan:\n$plan")
  }

  test("intervalOverlapJoin matches brute force; touching endpoints do not overlap; pairs emitted once") {
    val a = Seq((1L, 0L, 10L), (2L, 5L, 35L), (3L, 90L, 95L)).toDF("aid", "as", "ae")
    val b = Seq((10L, 10L, 20L), (11L, 8L, 9L), (12L, 30L, 100L)).toDF("bid", "bs", "be")
    val got = Temporal.intervalOverlapJoin(a, b, "as", "ae", "bs", "be", bucketWidth = 10L)
      .select(col("aid"), col("bid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (aid, as_, ae) <- Seq((1L, 0L, 10L), (2L, 5L, 35L), (3L, 90L, 95L))
      (bid, bs, be) <- Seq((10L, 10L, 20L), (11L, 8L, 9L), (12L, 30L, 100L))
      if as_ < be && bs < ae
    } yield (aid, bid)
    assert(got.sorted.toSeq == want.sorted.toSeq,
      s"got ${got.toSeq.sorted}, want ${want.sorted}")
    assert(got.length == got.toSet.size, "a pair must be emitted exactly once")
    // [0,10) vs [10,20) touch: not a pair
    assert(!got.contains((1L, 10L)))
  }

  test("saltedJoin returns exactly the plain join's multiset") {
    val l = Seq((1L, 1L, "x"), (1L, 2L, "y"), (2L, 1L, "z"), (3L, 1L, "w"))
      .toDF("k", "line", "payload")
    val r = Seq((1L, "dim1"), (2L, "dim2"), (4L, "dim4")).toDF("rk", "dim")
    val salted = Joins.saltedJoin(l, r, "k", "rk", "line", salt = 4)
      .select(col("k"), col("line"), col("dim"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val plain = l.join(r, col("k") === col("rk"))
      .select(col("k"), col("line"), col("dim"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("bloomSemiJoin equals the plain left-semi join; null keys dropped like IN") {
    val fact = Seq((Some(1L), "a"), (Some(1L), "b"), (Some(2L), "c"),
      (Some(9L), "d"), (None, "e")).toDF("k", "payload")
    val dim = Seq(1L, 3L).toDF("dk")
    val got = Joins.bloomSemiJoin(fact, dim, "k", "dk")
      .select(col("k"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (1L, "b")))
  }

  test("bloomSemiJoin plan: probe filter sits below the confirming join") {
    val fact = spark.range(0, 1000).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val plan = Joins.bloomSemiJoin(fact, dim, "k", "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from plan:\n$plan")
  }

  test("heavyHitters plan: confirming count joins candidates via broadcast") {
    val df = (Seq.fill(100)("hot") ++ (0 until 50).map(i => s"t$i")).toDF("item")
    val plan = Sketch.heavyHitters(df, "item", threshold = 50L, capacity = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate join is not broadcast:\n$plan")
  }

  test("heavyHitters is exact vs brute force on skewed multi-partition data, any capacity") {
    // 1 item × 500, 3 × 60, tail of 200 singletons, spread over 7 partitions
    val rows = Seq.fill(500)("hot") ++
      Seq("warm1", "warm2", "warm3").flatMap(w => Seq.fill(60)(w)) ++
      (0 until 200).map(i => s"tail$i")
    val df = rows.toDF("item").repartition(7)
    val brute = df.groupBy("item").count().filter(col("count") >= 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    for (cap <- Seq(0, 64)) { // 0 = self-sized
      val got = Sketch.heavyHitters(df, "item", threshold = 50L, capacity = cap)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == brute, s"capacity=$cap: got $got, want $brute")
    }
  }

  test("hllIntersect: inclusion-exclusion is exact over the estimates and near the true overlap") {
    val a = spark.range(0, 1000).toDF("id")
    val b = spark.range(500, 1500).toDF("id")
    val row = Sketch.hllIntersect(a, b, "id").collect().head
    val (ea, eb, eu, ei) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(ei == ea + eb - eu, "intersection must be exactly the composed estimate")
    assert(math.abs(ei - 500.0) < 100.0, s"est_intersect=$ei far from true 500")
    assert(math.abs(eu - 1500.0) < 75.0, s"est_union=$eu far from true 1500")
  }

  test("mergeIntervals: overlap and touch merge, gaps split, duplicates harmless, keys isolated") {
    val iv = Seq(
      ("u1", 0L, 10L), ("u1", 5L, 12L),   // overlap → [0, 12)
      ("u1", 12L, 20L),                    // touches → extends to [0, 20)
      ("u1", 25L, 30L), ("u1", 25L, 30L),  // gap, duplicated → [25, 30)
      ("u2", 0L, 5L)                       // other key untouched
    ).toDF("k", "s", "e")
    val got = Temporal.mergeIntervals(iv, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == Seq(("u1", 0L, 20L), ("u1", 25L, 30L), ("u2", 0L, 5L)))
  }

  test("resampleLocf: grid inside span, forward fill, on-grid obs wins, empty span drops key") {
    val obs = Seq(
      ("u1", 5L, 1.0), ("u1", 25L, 2.0),   // grid 10, 20 → fill 1.0, 1.0
      ("u2", 20L, 9.0), ("u2", 31L, 8.0),  // grid 20, 30 → 9.0 (on-grid), 9.0
      ("u3", 11L, 7.0)                     // span [11, 11]: no multiple of 10
    ).toDF("k", "t", "v")
    val got = Temporal.resampleLocf(obs, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(got == Seq(("u1", 10L, 1.0), ("u1", 20L, 1.0),
      ("u2", 20L, 9.0), ("u2", 30L, 9.0)))
  }

  test("resample grids floor correctly on negative (pre-1970) epochs") {
    // span [-25, -5], step 10: floor semantics give grid {-20, -10};
    // truncate-toward-zero `div` would give {-10, 0} — 0 is OUTSIDE
    // the span (extrapolation, and divergent from the DuckDB // oracle)
    val obs = Seq(("k", -25L, 1.0), ("k", -5L, 2.0)).toDF("k", "t", "v")
    val locf = Temporal.resampleLocf(obs, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(locf == Seq((-20L, 1.0), (-10L, 1.0)), s"got $locf")
    val interp = Temporal.resampleInterpolate(obs, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    // linear between (-25, 1.0) and (-5, 2.0): v(-20)=1.25, v(-10)=1.75
    assert(interp == Seq((-20L, 1.25), (-10L, 1.75)), s"got $interp")
    // span straddling zero keeps every step multiple inside it
    val straddle = Seq(("k", -15L, 1.0), ("k", 15L, 4.0)).toDF("k", "t", "v")
    val g = Temporal.resampleLocf(straddle, "k", "t", "v", step = 10L)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(g == Seq(-10L, 0L, 10L), s"got $g")
  }

  test("mergeIntervals: 300 random keyed interval sets match the sweep-line brute force") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      k <- 0 until 300
      _ <- 0 until (1 + rnd.nextInt(8))
    } yield {
      val s = rnd.nextInt(50).toLong
      (s"k$k", s, s + 1 + rnd.nextInt(10).toLong)
    }
    val got = Temporal.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (k, a) =>
        k -> a.map(x => (x._2, x._3)).sorted.toSeq }
    val want = rows.groupBy(_._1).map { case (k, ivs0) =>
      val ivs = ivs0.map(x => (x._2, x._3)).sorted
      val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      for ((s, e) <- ivs) {
        if (merged.nonEmpty && s <= merged.last._2)
          merged(merged.size - 1) =
            (merged.last._1, math.max(merged.last._2, e))
        else merged += ((s, e))
      }
      k -> merged.toSeq
    }
    assert(got == want)
  }

  test("absentWithin: tie at the probe instant counts as present; random sets match brute force") {
    import spark.implicits._
    val probe = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val events = Seq((1L, 10L), (1L, 35L)).toDF("ek", "et")
    val got = Temporal.absentWithin(probe, events, "k", "ek", "t", "et", window = 10L)
      .collect().map(_.getString(2)).toSet
    // "a": event AT t=10 → present; "b": next event 35 ≥ 30 → absent;
    // "c": key with no events → absent
    assert(got == Set("b", "c"), got.toString)

    val rnd = new scala.util.Random(23)
    val ps = for (k <- 0 until 150; _ <- 0 until (1 + rnd.nextInt(4)))
      yield (k.toLong, rnd.nextInt(100).toLong)
    val es = for (k <- 0 until 150; _ <- 0 until rnd.nextInt(5))
      yield (k.toLong, rnd.nextInt(100).toLong)
    val w = 7L
    val out = Temporal.absentWithin(
        ps.toDF("k", "t"), es.toDF("ek", "et"), "k", "ek", "t", "et", w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = ps.filter { case (k, t) =>
      !es.exists { case (ek, et) => ek == k && et >= t && et < t + w }
    }.toSet
    assert(out == want,
      s"missing=${(want -- out).take(5)} extra=${(out -- want).take(5)}")
  }

  test("intervalSubtract: 200 random keyed sets match point-wise brute force, output canonical") {
    val rnd = new scala.util.Random(17)
    def ivs(n: Int) = (0 until n).map { _ =>
      val s = rnd.nextInt(50).toLong; (s, s + 1 + rnd.nextInt(12).toLong)
    }
    val data = (0 until 200).map { k =>
      (s"k$k", ivs(1 + rnd.nextInt(5)), ivs(rnd.nextInt(5)))
    }
    val avail = data.flatMap { case (k, as, _) => as.map(iv => (k, iv._1, iv._2)) }
      .toDF("k", "s", "e")
    val block = data.flatMap { case (k, _, bs) => bs.map(iv => (k, iv._1, iv._2)) }
      .toDF("k", "s", "e")
    val got = Temporal.intervalSubtract(avail, block, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq).toMap
    data.foreach { case (k, as, bs) =>
      val out = got.getOrElse(k, Seq.empty)
      // exact point-wise semantics on the integer grid
      (0L until 70L).foreach { p =>
        val want = as.exists(iv => p >= iv._1 && p < iv._2) &&
          !bs.exists(iv => p >= iv._1 && p < iv._2)
        val have = out.exists(iv => p >= iv._1 && p < iv._2)
        assert(have == want, s"key $k point $p: have=$have want=$want out=$out")
      }
      // canonical form: disjoint, non-touching, non-empty
      out.foreach { case (s, e) => assert(s < e) }
      out.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 > e1, s"touching segments in $out")
        case _ =>
      }
    }
  }

  test("resampleLocf: 200 random series match brute force") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      k <- 0 until 200
      _ <- 0 until (1 + rnd.nextInt(6))
    } yield (s"k$k", rnd.nextInt(100).toLong, rnd.nextInt(1000).toDouble)
    val uniq = rows.groupBy(r => (r._1, r._2))
      .map { case ((k, t), g) => (k, t, g.map(_._3).max) }.toSeq
    val step = 7L
    val got = Temporal.resampleLocf(uniq.toDF("k", "t", "v"), "k", "t", "v", step)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = uniq.groupBy(_._1).flatMap { case (k, obs0) =>
      val obs = obs0.map(o => (o._2, o._3)).sortBy(_._1)
      val gi0 = (obs.head._1 + step - 1) / step
      val gi1 = obs.last._1 / step
      (gi0 to gi1).map { gi =>
        val t = gi * step
        (k, t, obs.takeWhile(_._1 <= t).last._2)
      }
    }.toSet
    assert(got == want)
  }

  test("funnelSteps: cascade semantics on hand-built edges") {
    import spark.implicits._
    val ev = Seq(
      // u1: full funnel in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      // u2: click BEFORE the first view never counts; the later one does
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
      // u3: same-instant tie advances both steps (>= semantics)
      (3L, "view", 10L), (3L, "click", 10L), (3L, "buy", 10L),
      // u4: never views — 0 steps even with clicks/buys
      (4L, "click", 1L), (4L, "buy", 2L),
      // u5: noise types ignored; duplicate views keep the FIRST time
      (5L, "noise", 1L), (5L, "view", 8L), (5L, "view", 3L)
    ).toDF("u", "ty", "t")
    val got = Temporal.funnelSteps(ev, "u", "ty", "t", Seq("view", "click", "buy"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Long](2).toList))).toMap
    assert(got(1L) == ((3, List(10L, 20L, 30L))))
    assert(got(2L) == ((2, List(10L, 15L))))
    assert(got(3L) == ((3, List(10L, 10L, 10L))))
    assert(got(4L) == ((0, Nil)))
    assert(got(5L) == ((1, List(3L))))
  }

  test("funnelSteps: 300 random event streams match the min-cascade reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val types = Vector("a", "b", "c", "x") // x = noise
    val rows = for {
      u <- 0 until 300
      _ <- 0 until (1 + rnd.nextInt(12))
    } yield (u.toLong, types(rnd.nextInt(types.length)), rnd.nextInt(40).toLong)
    val steps = Seq("a", "b", "c")
    val got = Temporal.funnelSteps(rows.toDF("u", "ty", "t"), "u", "ty", "t", steps)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Long](2).toList))).toMap
    val want = rows.filter(r => steps.contains(r._2)).groupBy(_._1)
      .map { case (u, evs) =>
        val ts = scala.collection.mutable.ArrayBuffer[Long]()
        var prev = Long.MinValue
        var ok = true
        for (st <- steps if ok) {
          val cand = evs.collect { case (_, `st`, t) if t >= prev => t }
          if (cand.isEmpty) ok = false
          else { prev = cand.min; ts += prev }
        }
        u -> ((ts.size, ts.toList))
      }
    assert(got == want)
  }

  test("resampleInterpolate: midpoint math, on-grid obs exact, series-end grid point") {
    import spark.implicits._
    // obs at t=5 (v=10) and t=15 (v=30): grid t=10 is the midpoint;
    // obs at t=20 (v=100) sits ON the last grid point
    val obs = Seq(("k", 5L, 10.0), ("k", 15L, 30.0), ("k", 20L, 100.0))
      .toDF("k", "t", "v")
    val got = Temporal.resampleInterpolate(obs, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(10L -> 20.0, 20L -> 100.0))
  }

  test("resampleInterpolate: 200 random series match the brute-force reference bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = for {
      k <- 0 until 200
      _ <- 0 until (1 + rnd.nextInt(6))
    } yield (s"k$k", rnd.nextInt(100).toLong, rnd.nextInt(1000).toDouble)
    val uniq = rows.groupBy(r => (r._1, r._2))
      .map { case ((k, t), g) => (k, t, g.map(_._3).max) }.toSeq
    val step = 7L
    val got = Temporal.resampleInterpolate(uniq.toDF("k", "t", "v"), "k", "t", "v", step)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = uniq.groupBy(_._1).flatMap { case (k, obs0) =>
      val obs = obs0.map(o => (o._2, o._3)).sortBy(_._1)
      val gi0 = (obs.head._1 + step - 1) / step
      val gi1 = obs.last._1 / step
      (gi0 to gi1).map { gi =>
        val t = gi * step
        val (pt, pv) = obs.takeWhile(_._1 <= t).last
        val v = if (pt == t) pv else {
          val (nt, nv) = obs.dropWhile(_._1 < t).head
          pv + (nv - pv) * ((t - pt).toDouble / (nt - pt).toDouble)
        }
        (k, t, v)
      }
    }.toSet
    assert(got == want)
  }

  test("hllIntersect final plan: each input's register table is computed once") {
    // r18: the register tables are FENCED (eager localCheckpoint), so
    // each input's register aggregation runs exactly once at fence
    // build and the final plan reads the materialized RDD per consumer
    // — stronger than the pre-r18 ReusedExchange assertion (which only
    // deduped canonically identical subtrees inside one plan). The
    // final plan must carry NO register-building aggregation at all:
    // no scan of the inputs (spark.range) and no pmod register-index
    // hashing — only scans of the checkpointed register RDDs.
    val a = spark.range(0, 2000).toDF("id")
    val b = spark.range(1000, 3000).toDF("id")
    val df = Sketch.hllIntersect(a, b, "id")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        ad.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Range ("),
      s"final plan must read fenced register tables, not re-scan the inputs:\n$plan")
    assert("Scan ExistingRDD".r.findAllIn(plan).length >= 3,
      s"expected the three estimate branches to read materialized register RDDs:\n$plan")
  }

  test("hllDistinct estimates within theoretical error on both correction branches") {
    // small-range branch: 1k distinct out of m = 4096 registers
    val small = spark.range(0, 1000).toDF("id")
    val e1 = Sketch.hllDistinct(small, Seq.empty, "id")
      .select(col("estimate")).collect().head.getDouble(0)
    assert(math.abs(e1 - 1000) / 1000.0 < 0.05, s"small-range estimate $e1")
    // raw harmonic branch: 100k distinct >> 2.5m
    val big = spark.range(0, 100000).toDF("id")
    val e2 = Sketch.hllDistinct(big, Seq.empty, "id")
      .select(col("estimate")).collect().head.getDouble(0)
    assert(math.abs(e2 - 100000) / 100000.0 < 0.05, s"raw-branch estimate $e2")
    // duplicates do not move the estimate: multiset vs set identical
    val dup = small.union(small).union(small)
    val e3 = Sketch.hllDistinct(dup, Seq.empty, "id")
      .select(col("estimate")).collect().head.getDouble(0)
    assert(e3 == e1)
  }

  test("hllMerge obeys the union law: merge(sketch A, sketch B) == sketch(A ∪ B) exactly") {
    val a = spark.range(0, 5000).toDF("id")
    val b = spark.range(3000, 9000).toDF("id")
    val merged = Sketch.hllEstimate(
      Sketch.hllMerge(Seq(
        Sketch.hllRegisters(a, Seq.empty, "id"),
        Sketch.hllRegisters(b, Seq.empty, "id")), Seq.empty), Seq.empty)
      .select(col("n_registers"), col("estimate")).collect().head
    val direct = Sketch.hllDistinct(a.union(b), Seq.empty, "id")
      .select(col("n_registers"), col("estimate")).collect().head
    assert(merged.getLong(0) == direct.getLong(0))
    assert(merged.getDouble(1) == direct.getDouble(1), "merge must be bit-identical")
  }

  test("CMS never underestimates and is exact without collisions") {
    val counts = Seq(("alpha", 10L), ("beta", 3L), ("gamma", 7L))
      .toDF("item", "n")
    // wide sketch: no collisions plausible with 3 items × 4 rows
    val wide = Sketch.cmsCounters(counts, "item", "n", depth = 4, width = 1024)
    val exact = Sketch.cmsLookup(wide, counts.select(col("item")), "item",
      depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("alpha" -> 10L, "beta" -> 3L, "gamma" -> 7L))
    // degenerate width 2: collisions certain; estimates only inflate
    val narrow = Sketch.cmsCounters(counts, "item", "n", depth = 2, width = 2)
    val est = Sketch.cmsLookup(narrow, counts.select(col("item")), "item",
      depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 10L && est("beta") >= 3L && est("gamma") >= 7L)
    assert(est.values.sum > 20L, "width 2 must collide somewhere")
  }

  test("bitLen: exact on powers of two and their neighbours (the floor(log2) trap)") {
    val edges = Seq(0L, 1L, 2L, 3L, 4L, (1L << 52) - 1, 1L << 51, (1L << 51) - 1, 255L, 256L)
    val got = edges.toDF("w")
      .select(col("w"), Sketch.bitLen(col("w")).as("bl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    edges.foreach { w =>
      val want = 64 - java.lang.Long.numberOfLeadingZeros(w)
      assert(got(w) == want.toLong, s"bitLen($w) = ${got(w)}, want $want")
    }
  }
}

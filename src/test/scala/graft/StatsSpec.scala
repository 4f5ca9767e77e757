package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Layout, Sketch, Stats}

/** Integer-exact z-score screen, histogram quantiles, Morton layout
  * key: semantics on hand-built frames with known answers, plus the
  * degenerate edges (zero variance, out-of-range clamp, multiset
  * preservation under re-layout).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("zscoreOutliers flags exactly the far point; zero-variance group flags nothing") {
    // n = 11, mean = 10, popvar = (10·81 + 8100)/11 = 810, σ ≈ 28.46:
    // the 100 sits 3.16σ out, the 1s at 0.32σ. (A single extreme point
    // can reach at most √(n−1) population σs, so n must be ≥ 10 for a
    // 3σ flag to be possible at all.)
    val df = (Seq.fill(10)(("a", 1.0)) ++ Seq(("a", 100.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0))).toDF("g", "v")
    val got = Stats.zscoreOutliers(df, Seq("g"), "v", z = 3, scale = 2)
      .select(col("g"), col("v")).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("a", 100.0)), s"got ${got.toSeq}")
  }

  test("zscoreOutliers matches the double-arithmetic definition on random-ish data") {
    val vals = (1 to 400).map(i => ("g", ((i * 7919) % 100).toDouble)) ++
      Seq(("g", 5000.0), ("g", -4000.0))
    val df = vals.toDF("g", "v")
    val got = Stats.zscoreOutliers(df, Seq("g"), "v", z = 3, scale = 2)
      .select(col("v")).collect().map(_.getDouble(0)).sorted.toSeq
    // brute force in doubles (population variance)
    val xs = vals.map(_._2)
    val n = xs.size.toDouble
    val mean = xs.sum / n
    val varp = xs.map(x => (x - mean) * (x - mean)).sum / n
    val brute = xs.filter(x => math.abs(x - mean) > 3 * math.sqrt(varp)).sorted
    assert(got == brute, s"got $got, want $brute")
  }

  test("madOutliers: hand-computed median/MAD, robust to the wild point itself") {
    // vi = 100·v: median (rank 5 of 10) = 5.0, deviations sorted
    // 0,1,1,2,2,3,3,4,4,95 → MAD (rank 5) = 2.0; flag |v−5| > 6 ⇒ only 100
    val df = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 100.0)).toDF("g", "v")
    val got = Stats.madOutliers(df, Seq("g"), "v", k = 3, scale = 2)
      .select(col("v")).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(100.0), s"got $got")
    // degenerate group: >half identical ⇒ MAD 0 ⇒ any differing row flags
    val dg = (Seq.fill(5)(("d", 7.0)) ++ Seq(("d", 7.5))).toDF("g", "v")
    val flagged = Stats.madOutliers(dg, Seq("g"), "v").select(col("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(flagged == Seq(7.5))
  }

  test("rollingZOutliers: spike vs stable history flags; cold start, constants, and recovery don't") {
    val rows = ((1 to 8).map(i => (1L, i.toLong, 10.0)) :+ ((1L, 9L, 100.0)) :+
      ((1L, 10L, 10.0))) ++                       // spike at t=9, recovery at t=10
      (1 to 10).map(i => (2L, i.toLong, 50.0)) ++ // constant series
      (1 to 4).map(i => (3L, i.toLong, if (i % 2 == 0) 100.0 else 0.0)) // cold start
    val flagged = Stats.rollingZOutliers(rows.toDF("u", "t", "v"),
        Seq("u"), Seq("t"), "v", windowRows = 10, k = 3, scale = 2, minObs = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // t=9 scores against 8 stable rows (zero variance → any departure
    // flags); t=10's history now CONTAINS the spike, variance inflated,
    // return-to-normal correctly not flagged; u3 never reaches minObs
    assert(flagged == Set((1L, 9L)), s"got $flagged")
  }

  test("rollingZOutliers: large magnitudes don't wrap (128-bit test), out-of-bound values fail loudly") {
    // |value| ~ 1e9 at scale 2: the squared terms reach ~6.4e23, far
    // past Long — the old 64-bit formulation silently inverted flags
    // above |value| ≈ 1e7
    val rows = (1 to 8).map(i => (1L, i.toLong, 1.0e9)) :+ ((1L, 9L, 2.0e9))
    val flagged = Stats.rollingZOutliers(rows.toDF("u", "t", "v"),
        Seq("u"), Seq("t"), "v", windowRows = 10, k = 3, scale = 2, minObs = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((1L, 9L)), s"got $flagged")
    // beyond the documented 128-bit-safe bound (but inside the
    // decimal(18,2) scaling cast, which guards even larger values
    // itself under ANSI): loud failure, never a silent wrong answer
    val huge = (1 to 6).map(i => (1L, i.toLong, 5.0e15)).toDF("u", "t", "v")
    val ex = intercept[Exception] {
      Stats.rollingZOutliers(huge, Seq("u"), Seq("t"), "v",
        windowRows = 10, k = 3, scale = 2, minObs = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("128-bit-safe bound")), ex.toString)
  }

  test("winsorize: exact rank cuts, tails clipped, interior untouched, groups isolated") {
    val df = ((1 to 20).map(i => ("a", i.toLong, i.toDouble)) ++
      Seq(("b", 100L, 5.0), ("b", 101L, 500.0))).toDF("g", "id", "v")
    val out = Stats.winsorize(df, Seq("g"), "v", loQ = 0.1, hiQ = 0.9)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("v_clipped")).toMap
    // group a: n=20 → lo = 2nd smallest (2.0), hi = 18th (18.0)
    assert(out(1L) == 2.0 && out(2L) == 2.0, "low tail clips to p10")
    assert(out(19L) == 18.0 && out(20L) == 18.0, "high tail clips to p90")
    assert(out(10L) == 10.0, "interior value untouched")
    // group b: n=2 → lo = hi-rank ceil(.1*2)=1 → lo=5.0, hi rank 2 → 500.0
    assert(out(100L) == 5.0 && out(101L) == 500.0)
  }

  test("groupSplit: rows of one group never straddle splits; partitioning-independent") {
    val rows = (0 until 2000).map(i => (i.toLong % 97, i.toLong))
    val df = rows.toDF("gk", "row_id")
    val s1 = graft.analytics.Sampling
      .groupSplit(df, "gk", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 7)
    val perGroup = s1.groupBy("gk").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(perGroup == 0, "a group straddled two splits")
    val a = s1.select("row_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.analytics.Sampling
      .groupSplit(df.repartition(13), "gk",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 7)
      .select("row_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split changed under repartition")
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("histogramQuantiles: known uniform ladder, clamp of out-of-range values") {
    val df = ((1 to 100).map(_.toDouble) ++ Seq(-50.0, 1e9)).toDF("v")
      .withColumn("g", lit("all"))
    val got = Sketch.histogramQuantiles(df, Seq("g"), "v",
        lo = 0.0, width = 1.0, bins = 200, qs = Seq(0.5, 1.0))
      .select(col("q"), col("est")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toMap
    // n = 102; ceil(.5·102) = 51 ⇒ ranks 1..51: bin 0 (the clamped −50)
    // then values 1..50 in bins 1..50 ⇒ quantile bin 50, midpoint 50.5
    assert(got(0.5) == 50.5, s"p50 ${got(0.5)}")
    // q = 1.0 ⇒ last occupied bin = 199 (clamped 1e9), midpoint 199.5
    assert(got(1.0) == 199.5, s"p100 ${got(1.0)}")
  }

  test("decayedCount: dyadic half-life weights, future and beyond-horizon rows dropped, exact sum") {
    val ref = 1000000L; val hl = 100L
    val rows = Seq(
      ("a", ref),            // bucket 0 → 1.0
      ("a", ref - hl),       // bucket 1 → 0.5
      ("a", ref - 250L),     // bucket 2 → 0.25
      ("a", ref + 5L),       // future → dropped
      ("a", ref - 61L * hl), // beyond maxBuckets=60 → dropped
      ("b", ref - 99L)       // bucket 0 → 1.0
    ).toDF("g", "ts")
    val got = Stats.decayedCount(rows, Seq("g"), "ts", ref, hl)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 1.75, "b" -> 1.0), got.toString) // exact ==
    // order-independence is structural (dyadic weights): repartition
    val again = Stats.decayedCount(rows.repartition(7), Seq("g"), "ts", ref, hl)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("histogram sketch merge law: merged disjoint-slice sketches equal the direct sketch") {
    val df = (1 to 500).map(i => (s"g${i % 3}", (i % 97).toDouble, i))
      .toDF("g", "v", "i")
    val direct = Sketch.histogramQuantiles(df, Seq("g"), "v",
        lo = 0.0, width = 1.0, bins = 100, qs = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    def half(p: org.apache.spark.sql.Column) = Sketch.histogramBins(
      df.filter(p), Seq("g"), "v", lo = 0.0, width = 1.0, bins = 100)
    val merged = Sketch.histogramQuantilesFromBins(
        Sketch.histogramMerge(Seq(half(col("i") <= 250), half(col("i") > 250)),
          Seq("g")),
        Seq("g"), lo = 0.0, width = 1.0, qs = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(merged == direct, s"merge law violated: $merged vs $direct")
  }

  test("compactionPlan: quota packing bounds, keeps, contiguous bins") {
    val target = 100L
    val files = (0 until 60).map { i =>
      (s"p${i % 3}", f"f$i%03d", 20L + (i * 37) % 130) // sizes 20..149
    }.toDF("part", "path", "size")
    val plan = Layout.compactionPlan(files, "path", "size", target, Seq("part"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(plan.length == 60, "listing multiset preserved")
    // files >= target are singleton keeps
    plan.filter(_._3 >= target).foreach { case (_, p, sz, bin, bb, bf) =>
      assert(bin == -1L && bb == sz && bf == 1L, s"keep row wrong for $p")
    }
    plan.groupBy(_._1).foreach { case (part, rows) =>
      val small = rows.filter(_._3 < target).sortBy(_._2)
      if (small.nonEmpty) {
        val bins = small.map(_._4)
        // contiguous from 0, nondecreasing in path order (cum steps < target)
        assert(bins.head == 0L && bins.distinct.sorted.sameElements(
          0L to bins.max), s"$part bins not contiguous: ${bins.toSeq}")
        assert(bins.sameElements(bins.sorted), s"$part bins not monotone")
        val maxSmall = small.map(_._3).max
        small.groupBy(_._4).foreach { case (bin, members) =>
          val bytes = members.map(_._3).sum
          assert(members.forall(m => m._5 == bytes && m._6 == members.length),
            s"$part bin $bin stats wrong")
          assert(bytes < target + maxSmall,
            s"$part bin $bin overflows: $bytes")
        }
      }
    }
  }

  test("zorderKey interleaves bits exactly; layout preserves the multiset") {
    val df = Seq((5L, 3L)).toDF("x", "y")
    val k = df.select(Layout.zorderKey(col("x"), col("y"), 3).as("z"))
      .collect().head.getLong(0)
    // x=101, y=011 → z bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    assert(k == 27L, s"zorder(5,3)=$k")

    val rows = (0 until 1000).map(i => ((i * 37) % 256L, (i * 91) % 256L, i))
    val src = rows.toDF("x", "y", "id")
    val laid = Layout.zorderLayout(src, "x", "y", bits = 8, numPartitions = 4)
    assert(laid.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      src.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // within each partition the morton key must be nondecreasing
    val perPart = laid
      .withColumn("z", Layout.zorderKey(col("x"), col("y"), 8))
      .withColumn("p", spark_partition_id())
      .collect().groupBy(_.getAs[Int]("p"))
    perPart.values.foreach { rs =>
      val zs = rs.map(_.getAs[Long]("z")).toSeq
      assert(zs == zs.sorted, "rows not z-sorted within partition")
    }
  }

  test("fileStats + pruneFiles: never skips a matching row, and z-layout actually prunes") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 4000).map(i =>
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong, i.toLong))
    // zkey-range pseudo-files: the deterministic stand-in for what a
    // zorderLayout write produces (tight z-ranges per file)
    val laid = rows.toDF("x", "y", "id")
      .withColumn("zkey", Layout.zorderKey(col("x"), col("y"), 8))
      .withColumn("file_id", expr("zkey div 4096"))
    val stats = Layout.fileStats(laid, "file_id", Seq("x", "y"))
    for (_ <- 0 until 20) {
      val (xl, yl) = (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)
      val (xh, yh) = (xl + rnd.nextInt(56), yl + rnd.nextInt(56))
      val pruned = Layout.pruneFiles(stats, Seq(("x", xl, xh), ("y", yl, yh)))
        .collect().map(r => r.getAs[Long]("file_id") -> r.getAs[Boolean]("must_read"))
        .toMap
      // soundness: every matching row's file is marked must_read
      val matches = rows.filter(r =>
        r._1 >= xl && r._1 <= xh && r._2 >= yl && r._2 <= yh)
      val fileOf = laid.collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("file_id")).toMap
      matches.foreach { r =>
        assert(pruned(fileOf(r._3)), s"file of matching row $r was skipped")
      }
      // effectiveness: a small box must not force reading every file
      assert(pruned.values.count(!_) > 0,
        s"box ($xl-$xh, $yl-$yh) pruned nothing out of ${pruned.size} files")
    }
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Baskets, Sampling, Sketch, Stats}
import graft.model.Cdc

/** Semantics of the round-8 additions: SCD2 history, basket pairs,
  * sliding HLL, PSI drift, PR operating points — each against a
  * hand-computed or independently-derived reference.
  */
class AffinitySpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("scd2: versions chain, deletes close, last survivor open") {
    // key 1: v@10, v@20, delete@30, v@40  -> [10,20), [20,30), [40,null)
    // key 2: delete@5 only                -> no versions
    val log = Seq(
      (1L, 100L, 10L, "update", "a"),
      (1L, 101L, 20L, "update", "b"),
      (1L, 102L, 30L, "delete", null),
      (1L, 103L, 40L, "update", "c"),
      (2L, 200L, 5L, "delete", null)
    ).toDF("k", "id", "pos", "op", "v")
    val out = Cdc.scd2(log, Seq("k"), Seq(col("pos"), col("id")),
        col("pos"), "op")
      .select("k", "id", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 100L, 10L, 20L, false),
      (1L, 101L, 20L, 30L, false),
      (1L, 103L, 40L, -1L, true)))
  }

  test("scd2: a key ending in delete has no current version") {
    val log = Seq((7L, 1L, 10L, "update"), (7L, 2L, 20L, "delete"))
      .toDF("k", "id", "pos", "op")
    val out = Cdc.scd2(log, Seq("k"), Seq(col("pos"), col("id")),
      col("pos"), "op")
    assert(out.filter(col("is_current")).count() == 0L)
    assert(out.count() == 1L) // the closed [10,20) version survives
  }

  test("basket pairs: apriori prune drops rare items before the join") {
    // baskets: {a,b,c}, {a,b}, {a,b,d}, {c,d} — with minSupport=2:
    // supports a=3 b=3 c=2 d=2; pairs (a,b)=3, (a,c)=1, (b,c)=1,
    // (a,d)=1, (b,d)=1, (c,d)=1 -> only (a,b) survives pair_cnt>=2
    val items = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "b"), (3, "d"),
      (4, "c"), (4, "d")
    ).toDF("basket", "item")
    val out = Baskets.frequentPairs(items, "basket", "item", 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("item_a") == "a" &&
      r.getAs[String]("item_b") == "b" &&
      r.getAs[Long]("pair_cnt") == 3L &&
      r.getAs[Long]("supp_a") == 3L && r.getAs[Long]("supp_b") == 3L)
  }

  test("basket pairs: late support attach equals the inline-carry shape") {
    // r18 restructure: supports are attached AFTER the pair_cnt filter
    // (semi-join prune + two output joins) instead of riding the
    // self-join — this pins the equivalence edge: a below-threshold
    // item (z, supp=1) pairs only below minSupport and never surfaces,
    // while a surviving pair reports the FULL unpruned supports of its
    // items, including support earned in baskets whose other items
    // were pruned
    val items = Seq(
      (1, "a"), (1, "b"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "z"), // z rare: supp(z)=1, but supp(a) counts basket 3
      (4, "b")
    ).toDF("basket", "item")
    val out = Baskets.frequentPairs(items, "basket", "item", 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("item_a") == "a" &&
      r.getAs[String]("item_b") == "b" &&
      r.getAs[Long]("pair_cnt") == 2L &&
      r.getAs[Long]("supp_a") == 3L && r.getAs[Long]("supp_b") == 3L)
  }

  test("basket pairs: duplicate item rows in one basket count once") {
    val items = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y"))
      .toDF("b", "i")
    val out = Baskets.frequentPairs(items, "b", "i", 2L).collect()
    assert(out.length == 1 && out.head.getAs[Long]("pair_cnt") == 2L)
  }

  test("sliding HLL == direct HLL of each trailing window's rows") {
    // independent reference: re-sketch the union of each 3-day window
    // directly from the raw rows — the register-algebra slide must
    // produce identical estimates (same hash, same registers)
    val rows = (0 until 500).map { i =>
      (i.toLong % 7L, (i * 37 % 211).toLong) // (day, user)
    }
    val df = rows.toDF("day", "u")
    val slid = Sketch.hllSlidingDistinct(df, "day", "u", windowDays = 3)
      .select("day", "estimate").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val days = rows.map(_._1).distinct.sorted
    for (d <- days) {
      val direct = Sketch.hllDistinct(
        df.filter(col("day") >= d - 2 && col("day") <= d), Seq.empty, "u")
        .select("estimate").head().getDouble(0)
      assert(slid(d) == direct, s"day $d: slide ${slid(d)} != direct $direct")
    }
  }

  test("psi: identical halves score ~0, shifted halves score high") {
    val same = (1 to 2000).map(i => ("t", (i % 100).toDouble, i <= 1000))
      .toDF("g", "v", "isref")
    val psiSame = Stats.psiDrift(same, Seq("g"), "v", col("isref"),
      lo = 0.0, width = 10.0, bins = 10)
      .select("psi").head().getDouble(0)
    assert(math.abs(psiSame) < 0.01, s"identical halves psi=$psiSame")

    val shifted = (1 to 2000).map { i =>
      val v = if (i <= 1000) (i % 50).toDouble else 50.0 + (i % 50)
      ("t", v, i <= 1000)
    }.toDF("g", "v", "isref")
    val psiShift = Stats.psiDrift(shifted, Seq("g"), "v", col("isref"),
      lo = 0.0, width = 10.0, bins = 10)
      .select("psi").head().getDouble(0)
    assert(psiShift > 1.0, s"disjoint supports psi=$psiShift")
  }

  test("psi is invariant under repartitioning (deterministic fold)") {
    val d = (1 to 997).map(i => ("g", (i % 37).toDouble * 3, i % 3 == 0))
      .toDF("g", "v", "isref")
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.psiDrift(df, Seq("g"), "v", col("isref"), 0.0, 12.5, 8)
        .select("psi").head().getDouble(0)
    assert(run(d) == run(d.repartition(13)))
  }

  test("pr curve counts match a direct filter per threshold") {
    val d = (1 to 300).map(i => (i.toDouble, i % 3 == 0))
      .toDF("score", "y")
    val out = Stats.prCurve(d, "score", col("y"), Seq(100.0, 200.0))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def ref(th: Double) = {
      val tp = (1 to 300).count(i => i >= th && i % 3 == 0).toLong
      val fp = (1 to 300).count(i => i >= th && i % 3 != 0).toLong
      val fn = (1 to 300).count(i => i < th && i % 3 == 0).toLong
      val tn = (1 to 300).count(i => i < th && i % 3 != 0).toLong
      (tp, fp, fn, tn)
    }
    assert(out(100.0) == ref(100.0) && out(200.0) == ref(200.0))
  }

  test("url canonicalize: every RFC-3986 noise dimension inverts") {
    val cases = Seq(
      // case + default port + utm + param order + fragment
      ("HTTP://WWW.Ex.COM:80/a?b=2&utm_source=x&a=1#f",
        "http://www.ex.com/a?a=1&b=2"),
      // https default port; only utm params -> query dropped
      ("https://Ex.com:443/p?utm_a=1&utm_b=2", "https://ex.com/p"),
      // non-default port kept; empty path -> /
      ("http://ex.com:8080?z=1", "http://ex.com:8080/?z=1"),
      // no query, trailing fragment only
      ("http://EX.com/path#x", "http://ex.com/path"),
      // malformed (no scheme) passes through untouched
      ("not a url", "not a url"))
    val df = cases.toDF("u", "want")
      .withColumn("got", graft.analytics.Urls.canonicalize(col("u")))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.map(r => s"${r.getString(0)}: got ${r.getString(2)}").mkString("; "))
  }

  test("rrf fusion: agreement ranks above either single system") {
    // doc 1 is rank 1 in both systems; doc 2 top in A only, doc 3 top
    // in B only -> fused order must put 1 first
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq(("q", 1L, 1L), ("q", 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = graft.analytics.Retrieval.rrfFuse(
      Seq("a" -> a, "b" -> b), "query_id", "doc_id", "rank")
      .orderBy("fused_rank").collect()
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Long]("n_systems") == 2L)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    // 2 and 3 have identical scores (same single rank) -> doc_id tiebreak
  }

  test("pagerank: a sink-pointing chain ranks the sink highest") {
    // star 1->3, 2->3 plus chain 3->4: 4 collects through 3
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val r = graft.analytics.Graph.pageRank(e, "s", "d",
      iterations = 10, deterministic = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(3) > r(1) && r(3) > r(2))
    assert(r(4) > r(3), s"sink 4 must outrank its feeder: $r")
    assert(r(1) == r(2)) // symmetric sources
    // teleport floor: every node holds at least (1-d)/N
    assert(r.values.forall(_ >= 0.15 / 4 - 1e-15))
  }

  test("pagerank deterministic early exit equals the full budget") {
    // the chain graph reaches its exact fixed point at round 3:
    // budgets at or past it must return bit-identical tables (the r18
    // early exit), while pre-convergence budgets must still differ —
    // no premature exit
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    def run(k: Int) = graft.analytics.Graph.pageRank(e, "s", "d",
      iterations = k, deterministic = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val r2 = run(2); val r3 = run(3); val r10 = run(10)
    assert(r2 != r3, "round 3 still moves mass — exit must not fire early")
    assert(r3 == r10, "converged budgets must agree bit-for-bit")
    def runP(k: Int) = graft.analytics.Graph.personalizedPageRank(e, "s",
      "d", Seq(1L).toDF("id"), iterations = k, deterministic = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(runP(2) != runP(3) && runP(3) == runP(10))
  }

  test("pagerank deterministic mode is repartition-invariant and " +
    "agrees with the production sum to float noise") {
    val edges = (1 to 400).map(i =>
      ((i % 57).toLong, ((i * 13) % 31).toLong + 100L)).toDF("s", "d")
    def run(df: org.apache.spark.sql.DataFrame, det: Boolean) =
      graft.analytics.Graph.pageRank(df, "s", "d", iterations = 3,
        deterministic = det)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val a = run(edges, det = true)
    val b = run(edges.repartition(17), det = true)
    assert(a == b, "deterministic fold must not depend on partitioning")
    val c = run(edges, det = false)
    assert(a.keySet == c.keySet)
    a.foreach { case (k, v) =>
      assert(math.abs(v - c(k)) < 1e-12, s"node $k: $v vs ${c(k)}") }
  }

  test("ks test: hand-computed D on a tiny two-sample case") {
    // ref = {1,2,3}, cur = {3,4,5}: ECDF gap peaks at x=2 or 3:
    // at v=2: |2*3 - 0*3| = 6; at v=3: |3*3-1*3|=6 -> d_num=6, d=6/9
    val d = Seq(("g", 1.0, true), ("g", 2.0, true), ("g", 3.0, true),
      ("g", 3.0, false), ("g", 4.0, false), ("g", 5.0, false))
      .toDF("g", "v", "isref")
    val r = Stats.ksTest(d, Seq("g"), "v", col("isref")).collect().head
    assert(r.getAs[java.math.BigDecimal]("d_num").longValueExact == 6L)
    assert(r.getAs[Long]("n_ref") == 3L && r.getAs[Long]("n_cur") == 3L)
    assert(r.getAs[Double]("d") == 6.0 / 9.0)
  }

  test("ks test: identical samples give D = 0; disjoint give D = 1") {
    // i 1..50 and 51..100 produce the same value multiset mod 10
    val same = (1 to 100).map(i => ("g", (i % 10).toDouble, i <= 50))
      .toDF("g", "v", "isref")
    val r0 = Stats.ksTest(same, Seq("g"), "v", col("isref")).collect().head
    assert(r0.getAs[Double]("d") == 0.0)
    val disj = ((1 to 50).map(i => ("g", i.toDouble, true)) ++
      (1 to 50).map(i => ("g", 100.0 + i, false))).toDF("g", "v", "isref")
    val r1 = Stats.ksTest(disj, Seq("g"), "v", col("isref")).collect().head
    assert(r1.getAs[Double]("d") == 1.0)
  }

  test("nearest join: direction choice, tie to prev, gap exclusion") {
    val l = Seq((1L, 10L, 100L), (1L, 11L, 205L), (1L, 12L, 900L),
      (2L, 20L, 50L)).toDF("k", "id", "t")
    val r = Seq((1L, 90L, 95.0, 1L), (1L, 210L, 96.0, 2L),
      (1L, 300L, 97.0, 3L)).toDF("rk", "rt", "rv", "rid")
    val out = graft.analytics.Temporal.nearestJoin(
      l, r, "k", "rk", "t", "rt", Seq("rv", "rid"), maxGap = 100L)
      .collect().map(x => x.getAs[Long]("id") ->
        (Option(x.getAs[Any]("near_rt")), x.getAs[String]("direction"))).toMap
    // id 10 @100: prev 90 (d=10) vs next 210 (d=110, over gap) -> prev
    assert(out(10L) == (Some(90L), "prev"))
    // id 11 @205: prev 90 (d=115 > gap), next 210 (d=5) -> next
    assert(out(11L) == (Some(210L), "next"))
    // id 12 @900: nothing within 100 -> null
    assert(out(12L) == ((None, null)))
    // key 2 has no right rows at all
    assert(out(20L) == ((None, null)))
  }

  test("nearest join: equidistant tie prefers the backward row") {
    val l = Seq((1L, 1L, 100L)).toDF("k", "id", "t")
    val r = Seq((1L, 90L, 1.0), (1L, 110L, 2.0)).toDF("rk", "rt", "rv")
    val out = graft.analytics.Temporal.nearestJoin(
      l, r, "k", "rk", "t", "rt", Seq("rv"), maxGap = 50L).collect().head
    assert(out.getAs[Long]("near_rt") == 90L &&
      out.getAs[String]("direction") == "prev")
  }

  test("poisson bootstrap: replicates track the true total and are " +
    "repartition-invariant") {
    val d = (1 to 5000).map(i => (i.toLong, 10.0)).toDF("id", "v")
    val out = Sampling.poissonBootstrap(d, "id", "v", replicates = 3)
      .collect().map(r => (r.getAs[Int]("replicate"),
        r.getAs[Long]("n_resampled"), r.getAs[Double]("sum_value")))
    assert(out.length == 3)
    out.foreach { case (_, n, sv) =>
      // Poisson(1) weights: resampled count within ~4 sigma of n
      assert(math.abs(n - 5000L) < 300, s"resampled $n")
      assert(sv == n * 10.0)
    }
    val again = Sampling.poissonBootstrap(d.repartition(13), "id", "v",
      replicates = 3).collect().map(r => (r.getAs[Int]("replicate"),
        r.getAs[Long]("n_resampled"), r.getAs[Double]("sum_value")))
    assert(out.toSet == again.toSet)
    // distinct replicates draw distinct weights
    assert(out.map(_._2).distinct.length > 1)
  }

  test("cusum window identity == the recursive max(0, prev + x - k)") {
    val xs = Seq(5L, 7L, 6L, 20L, 22L, 21L, 4L, 5L, 30L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("g", "t", "x")
    val got = Stats.cusum(df, Seq("g"), "t", "x", k = 8L, h = 15L)
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm")))
    var c = 0L
    val want = xs.map { x =>
      c = math.max(0L, c + x - 8L); (c, c > 15L)
    }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }

  test("kaplan-meier: hand-computed curve with censoring") {
    // t=1: 1 churn of 5 at risk -> S=0.8; t=2: censor only -> S=0.8
    // t=3: 1 churn of 3 at risk -> S=0.8*(2/3); t=4: censor -> same
    val subj = Seq((1L, true), (2L, false), (3L, true), (4L, false),
      (4L, false)).toDF("t", "obs")
    val out = Stats.kaplanMeier(subj, Seq.empty, "t", col("obs"))
      .orderBy("t_days").collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Double]("survival")))
    assert(out(0) == ((1L, 5L, 1.0 - 1.0 / 5.0)))
    assert(out(1) == ((2L, 4L, (1.0 - 1.0 / 5.0) * (1.0 - 0.0 / 4.0))))
    assert(out(2)._2 == 3L)
    assert(math.abs(out(2)._3 - 0.8 * 2.0 / 3.0) < 1e-15)
    assert(out(3)._3 == out(2)._3) // censor-only time: curve flat
  }

  test("sorted-neighborhood: adjacent-sorting dup found, prefix-broken missed") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "alpha beta gamma delta epsilon v2", "en"), // tail edit: sorts adjacent
      (3L, "zzz alpha beta gamma delta epsilon", "en"), // prefix edit: sorts away
      (4L, "totally different words here now", "en"))
      .toDF("doc_id", "text", "lang")
    val pairs = graft.analytics.Dedup.sortedNeighborhoodPairs(
      docs, "doc_id", "text", "lang", keyLen = 16, windowSize = 2,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"adjacent dup not found: $pairs")
    // the documented recall limit: 3 is a true near-dup of 1 but its
    // key starts with 'zzz' — a w=2 window cannot see it
    assert(!pairs.contains((1L, 3L)))
  }

  test("containment join equals brute force on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 120).map(i => s"w$i")
    val docs = (0 until 60).map { i =>
      val n = 5 + rnd.nextInt(20)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // add explicit excerpts: doc i+1000 = first 4 tokens of doc i
    val quotes = (0 until 60 by 7).map { i =>
      (i + 1000L, docs(i)._2.split(" ").take(4).mkString(" ")) }
    val df = (docs ++ quotes).toDF("doc_id", "text")
    val got = graft.analytics.Dedup.containmentJoin(df, "doc_id", "text", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference in Scala
    def toks(s: String) = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet
    val all = (docs ++ quotes).map { case (id, s) => id -> toks(s) }
    val want = (for {
      (a, ta) <- all; (b, tb) <- all if a != b
      if ta.intersect(tb).size.toDouble / ta.size >= 0.7
    } yield (a, b)).toSet
    assert(got == want,
      s"missed ${(want -- got).take(5)}, extra ${(got -- want).take(5)}")
    assert(want.exists(_._1 >= 1000L), "corpus must contain quote pairs")
  }

  test("ab test: integer decision matches the float z-test on random cells") {
    val rnd = new scala.util.Random(7)
    val cells = (0 until 40).map { i =>
      val n1 = 50 + rnd.nextInt(500); val n2 = 50 + rnd.nextInt(500)
      val x1 = rnd.nextInt(n1 + 1); val x2 = rnd.nextInt(n2 + 1)
      (s"g$i", n1, x1, n2, x2)
    }
    val rows = cells.flatMap { case (gg, n1, x1, n2, x2) =>
      (0 until n1).map(j => (gg, 0L, j < x1)) ++
        (0 until n2).map(j => (gg, 1L, j < x2))
    }
    val df = rows.toDF("g", "variant", "succ")
    val got = Stats.abTest(df, Seq("g"), col("variant") === 0L, col("succ"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("significant"))
      .toMap
    cells.foreach { case (gg, n1, x1, n2, x2) =>
      val n = (n1 + n2).toDouble; val x = (x1 + x2).toDouble
      val want =
        if (x == 0 || x == n) false
        else {
          val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
          val p = x / n
          val z2 = (p1 - p2) * (p1 - p2) / (p * (1 - p) * (1.0 / n1 + 1.0 / n2))
          z2 >= 3.8416 - 1e-9 // float ref; exact test is the arbiter at the boundary
        }
      // allow disagreement only within float noise of the boundary
      if (got(gg) != want) {
        val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2; val p = x / n
        val z2 = (p1 - p2) * (p1 - p2) / (p * (1 - p) * (1.0 / n1 + 1.0 / n2))
        assert(math.abs(z2 - 3.8416) < 1e-6,
          s"$gg: exact=${got(gg)} float=$want z2=$z2")
      }
    }
  }

  test("bpe train: hand-checked merges, repeated patterns fuse greedily") {
    // "a b" occurs 4x (incl. twice in doc 3's "a b a b"), "b c" 2x
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b a b"), (4L, "x y"))
      .toDF("doc_id", "text")
    val m = graft.analytics.Text.bpeTrain(docs, "doc_id", "text", 2)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getString(1), r.getString(2),
        r.getAs[Long]("pair_count")))
    assert(m(0) == ((1, "a", "b", 4L)), s"round 1: ${m(0)}")
    // after fusing: docs are ["a b","c"], ["a b","c"], ["a b","a b"], [x,y]
    // pairs now: ("a b","c")=2, ("a b","a b") excluded (self), ("x","y")=1
    assert(m(1) == ((2, "a b", "c", 2L)), s"round 2: ${m(1)}")
  }

  test("pq top-k: reasonable recall vs brute force; codes within range") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val pq = graft.analytics.Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", k = 10, m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = graft.analytics.Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      pq.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / 10.0 }
    val mean = recalls.sum / recalls.length
    // 16 seeded (unrefined) centroids per subspace: coarse but must
    // beat random by a wide margin (random ~ k/n = 10/600)
    assert(mean >= 0.25, s"PQ mean recall@10 too low: $mean")
  }

  test("bloom file skipping is SOUND: a containing file is never skipped") {
    val rows = (1 to 4000).map(i => ((i % 23).toLong, (i * 37 % 500).toLong))
      .toDF("file_id", "key")
    val stats = graft.analytics.Layout.bloomFileStats(rows, "file_id", "key")
    val probes = (0L until 500L by 7L).toDF("key")
    val pruned = graft.analytics.Layout.bloomPrune(stats, probes, "key")
      .select("file_id", "key", "might_contain").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    val truth = rows.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness: every true (file, key) must say might_contain
    probes.collect().map(_.getLong(0)).foreach { k =>
      (0L until 23L).foreach { f =>
        if (truth.contains((f, k)))
          assert(pruned((f, k)), s"skipped a containing file ($f, $k)")
      }
    }
    // usefulness: some absent keys actually get skipped somewhere
    val skips = pruned.count { case ((f, k), mc) => !mc && !truth.contains((f, k)) }
    assert(skips > 0, "bloom never skipped anything — vacuous")
  }

  test("concurrency sweep: hand case with half-open touch and peak") {
    // [0,10) [5,15) [10,20): at t=5 two open; at t=10 the first ends
    // as the third starts -> still 2 (half-open), never 3
    val iv = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 10L, 20L))
      .toDF("g", "s", "e")
    val out = graft.analytics.Temporal.concurrency(iv, "g", "s", "e")
      .orderBy("at_time").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L), (5L, 2L), (10L, 2L),
      (15L, 1L), (20L, 0L)), out.toSeq.toString)
  }

  test("linear trend recovers an exact synthetic slope") {
    // y = 3.5 + 0.25 * day (exactly representable in cents)
    val d = (0 to 20).map(i => ("g", (100L + i), 3.5 + 0.25 * i))
      .toDF("g", "day", "v")
    val r = Stats.linearTrend(d, Seq("g"), "day", "v").collect().head
    assert(r.getAs[Double]("slope") == 0.25, r.toString)
    assert(math.abs(r.getAs[Double]("intercept") - 3.5) < 1e-12)
    // exact rational: slope_num/slope_den = 25 cents/day
    assert(r.getAs[Long]("slope_num") * 4 == r.getAs[Long]("slope_den") * 100)
  }

  test("pr curve composes with the text classifier scores") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = graft.analytics.Text.classifierScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val curve = Stats.prCurve(scored, "margin", col("lang") === "en",
      Seq(-0.1, 0.0, 0.1))
    val rows = curve.collect()
    assert(rows.length == 3)
    val n = docs.count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == n)
    }
  }
}

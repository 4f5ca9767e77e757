package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Privacy, Sequences, Stats, Temporal => TOps}
import graft.model.Cdc

/** Randomized cross-formulation equivalence for the round-8 operators:
  * each distributed dataflow is checked against an independent
  * brute-force replay of its definition on random inputs — the same
  * evidence class as the batch-vs-streaming equivalence sweeps.
  */
class RandomizedEquivSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("pitJoin equals brute interval containment on random CDC logs") {
    val rnd = new scala.util.Random(314)
    for (trial <- 1 to 3) {
      val log = (1 to 200).map { i =>
        (rnd.nextInt(20).toLong + 1, i.toLong, rnd.nextInt(500).toLong,
          if (rnd.nextInt(5) == 0) "delete" else "update",
          rnd.nextInt(1000).toDouble)
      } // (k, id, pos, op, v) — pos ties across ops happen by design
      val hist = Cdc.scd2(log.toDF("k", "id", "pos", "op", "v"),
          Seq("k"), Seq(col("pos"), col("id")), col("pos"), "op")
        .select(col("k").as("h_k"), col("id").as("v_id"),
          col("valid_from"), col("valid_to"))
      val facts = (1 to 100).map(i =>
        (rnd.nextInt(20).toLong + 1, 1000L + i, rnd.nextInt(600).toLong))
      val got = TOps.pitJoin(facts.toDF("k", "f_id", "f_ts"), hist,
          "k", "h_k", "f_ts", "valid_from", "valid_to", Seq("v_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      // brute: rebuild versions in Scala, containment scan
      val versions = log.groupBy(_._1).flatMap { case (k, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._2))
        sorted.zipWithIndex.collect {
          case ((_, id, pos, op, _), i) if op != "delete" =>
            val to = if (i + 1 < sorted.size) Some(sorted(i + 1)._3) else None
            (k, id, pos, to)
        }
      }.toSeq
      val want = facts.map { case (k, fid, fts) =>
        val v = versions.filter(v => v._1 == k && v._3 <= fts &&
          v._4.forall(fts < _))
        assert(v.size <= 1, s"overlapping versions: $v")
        (k, fid) -> v.headOption.map(_._2).getOrElse(-1L)
      }.toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("twa equals brute per-key replay on random gauges") {
    val rnd = new scala.util.Random(1591)
    val obs = (1 to 300).map(_ => (rnd.nextInt(10).toLong,
      rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong + 1))
    val endTs = 100L
    val got = TOps.twa(obs.toDF("k", "t", "v"), Seq("k"), "t", "v", endTs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = obs.groupBy(_._1).map { case (k, rows) =>
      val dedup = rows.groupBy(_._2).map { case (t, rs) =>
        (t, rs.map(_._3).max) }.toSeq.sortBy(_._1)
      val span = endTs - dedup.head._1
      val wsum = dedup.zipWithIndex.map { case ((t, v), i) =>
        val nxt = if (i + 1 < dedup.size) dedup(i + 1)._1 else endTs
        v * (nxt - t)
      }.sum
      k -> (span, wsum)
    }
    assert(got == want)
  }

  test("kAnonymize on random data: totals preserved, released groups >= k") {
    val rnd = new scala.util.Random(27)
    for (trial <- 1 to 3) {
      val rows = (1 to 500).map(_ => (s"t${rnd.nextInt(3)}",
        rnd.nextInt(15).toLong, rnd.nextInt(6).toLong))
      val out = Privacy.kAnonymize(rows.toDF("a", "b", "c"),
        Seq("a", "b", "c"), minK = 12L).collect()
      assert(out.map(_.getAs[Long]("n")).sum == rows.size, s"trial $trial")
      val maxLevel = 3L
      assert(out.forall(r => r.getLong(0) == maxLevel ||
        r.getAs[Long]("n") >= 12L), s"trial $trial: undersized release")
      // rows released at level L agree with a brute re-aggregation
      val l0 = out.filter(_.getLong(0) == 0L)
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)) ->
          r.getAs[Long]("n")).toMap
      val brute0 = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= 12L).toMap
      assert(l0 == brute0, s"trial $trial")
    }
  }

  test("transitionMatrix equals brute pair counting on random streams") {
    val rnd = new scala.util.Random(4444)
    val evs = (1 to 400).map(i => (rnd.nextInt(25).toLong, i.toLong,
      i.toLong, s"s${rnd.nextInt(5)}"))
    val got = Sequences.transitionMatrix(evs.toDF("u", "ts", "id", "st"),
        Seq("u"), col("ts"), col("id"), col("st"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val pairs = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = cnt.map { case ((p, n), c) => (p, n) -> (c, tot(p)) }
    assert(got == want)
  }

  test("runsTest counts equal a brute scan on random binary sequences") {
    val rnd = new scala.util.Random(808)
    val xs = (1 to 500).map(i => (s"g${i % 3}", i.toLong,
      rnd.nextBoolean()))
    val got = Stats.runsTest(xs.toDF("g", "t", "x"), Seq("g"),
        col("t"), col("t"), col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = xs.groupBy(_._1).map { case (g, rows) =>
      val s = rows.sortBy(_._2).map(_._3)
      g -> (s.count(identity).toLong, s.count(!_).toLong,
        1L + s.zip(s.drop(1)).count { case (a, b) => a != b })
    }
    assert(got == want)
  }

  test("lttb invariants on random series: endpoints, bucket membership, size") {
    val rnd = new scala.util.Random(6006)
    for (trial <- 1 to 3) {
      val n = 50 + rnd.nextInt(100)
      val pts = (0 until n).map(i => ("g", i.toLong * (1 + rnd.nextInt(3)),
        rnd.nextInt(10000).toLong))
        .groupBy(_._2).map(_._2.head).toSeq // unique t
      val buckets = 4 + rnd.nextInt(5)
      val df = pts.toDF("g", "t", "v")
      val got = TOps.lttb(df, Seq("g"), "t", "v", buckets)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val ts = pts.map(_._2)
      val (tmin, tmax) = (ts.min, ts.max)
      assert(got.exists(_._1 == tmin) && got.exists(_._1 == tmax),
        s"trial $trial endpoints")
      // one selected point per non-empty interior bucket, inside it
      val kInner = buckets - 2
      val interior = pts.filter(p => p._2 > tmin && p._2 < tmax)
        .map(p => ((p._2 - tmin) * kInner) / (tmax - tmin + 1))
      val gotInterior = got.filter(p => p._1 > tmin && p._1 < tmax)
        .map(p => ((p._1 - tmin) * kInner) / (tmax - tmin + 1))
      assert(gotInterior.sorted.toSeq == interior.distinct.sorted.toSeq,
        s"trial $trial buckets")
      assert(got.length == 2 + interior.distinct.size, s"trial $trial size")
    }
  }
}

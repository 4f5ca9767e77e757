package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Privacy, Stats, Temporal => TOps}
import graft.streaming.StreamingOps

/** Semantics of the round-8 sixth continuation: time-weighted average,
  * Tukey fences, l-diversity, and the sessionizeStream event-time TTL.
  */
class TwaTtlSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("twa: step weighting, duplicate-ts max, beyond-end excluded") {
    val df = Seq((1L, 0L, 100L), (1L, 10L, 200L), (1L, 10L, 150L),
      (1L, 99L, 999L), // beyond endTs: excluded
      (2L, 30L, 50L)).toDF("k", "t", "v")
    val out = TOps.twa(df, Seq("k"), "t", "v", endTs = 30L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Any]("twa"))).toMap
    // k1: 100*10 + 200*20 = 5000 over span 30
    assert(out(1L)._1 == 30L && out(1L)._2 == 5000L)
    assert(out(1L)._3.asInstanceOf[Double] == 5000.0 / 30.0)
    // k2: single obs exactly at end -> span 0, twa null
    assert(out(2L)._1 == 0L && out(2L)._3 == null)
  }

  test("tukey: hand quartiles, one planted outlier") {
    val vals = (1 to 11).map(_.toDouble) :+ 100.0
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Stats.tukeyFences(df, Seq("g"), "v").collect().head
    // n=12: q1 = value at rank 3 = 3, q3 at rank 9 = 9
    assert(r.getAs[Double]("q1") == 3.0 && r.getAs[Double]("q3") == 9.0)
    assert(r.getAs[Double]("fence_lo") == -6.0 &&
      r.getAs[Double]("fence_hi") == 18.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("l-diversity: same-sensitive group fails, diverse group passes") {
    val rows = Seq.fill(10)(("a", 1L, 7L)) ++ // 10 rows, 1 sensitive value
      Seq(("b", 1L, 1L), ("b", 1L, 2L), ("b", 1L, 3L), ("b", 1L, 1L))
    val out = Privacy.lDiversity(rows.toDF("t", "b", "s"),
        Seq("t", "b"), "s", minL = 3L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("a") == (10L, 1L, false))
    assert(out("b") == (4L, 3L, true))
  }

  test("time split: embargo rows dropped from both sides, boundaries half-open") {
    import graft.analytics.Sampling
    val df = Seq(99L, 100L, 149L, 150L, 199L, 200L, 201L)
      .map(("e", _)).toDF("g", "t")
    val got = Sampling.timeSplit(df, "t", splitAt = 200L, embargo = 50L)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == Map(99L -> "train", 100L -> "train", 149L -> "train",
      150L -> "embargo", 199L -> "embargo", 200L -> "test", 201L -> "test"))
  }

  test("pseudonymize: consistent across tables (joins survive), secret-sensitive") {
    import graft.analytics.Privacy
    val a = Seq((1L, "x"), (2L, "y")).toDF("uid", "pa")
    val b = Seq((1L, "m"), (3L, "n")).toDF("uid", "pb")
    val pa = Privacy.pseudonymize(a, Seq("uid"), secret = 5L)
    val pb = Privacy.pseudonymize(b, Seq("uid"), secret = 5L)
    val j = pa.join(pb, "uid").collect()
    assert(j.length == 1 && j.head.getString(1) == "x" &&
      j.head.getString(2) == "m") // uid 1 still joins
    // pseudonyms differ from raw ids and across secrets
    val raw = pa.select("uid").collect().map(_.getLong(0)).toSet
    assert(!raw.contains(1L) && !raw.contains(2L))
    val pa2 = Privacy.pseudonymize(a, Seq("uid"), secret = 6L)
      .select("uid").collect().map(_.getLong(0)).toSet
    assert((raw & pa2).isEmpty)
  }

  test("noisy count: reproducible under reruns/repartition, seed-sensitive") {
    val df = (1 to 300).map(i => (s"g${i % 4}", i)).toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame, seed: Long) =
      graft.analytics.Privacy.noisyCount(d, Seq("g"), epsilon = 0.5, seed)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val a = run(df, 7L)
    assert(a == run(df.repartition(5), 7L), "not partition-stable")
    assert(a.values.forall { case (n, noise, noisy) =>
      noisy == n.toDouble + noise })
    // a different seed must actually change the draw
    val b = run(df, 8L)
    assert(a.exists { case (k, (_, noise, _)) => b(k)._2 != noise })
    // Laplace(2) draws are overwhelmingly within |noise| < 50
    assert(a.values.forall { case (_, noise, _) => math.abs(noise) < 50 })
  }

  test("sessionizeStream TTL: continuity inside horizon, idle keys evicted, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, java.sql.Timestamp)]
    val out = StreamingOps.sessionizeStream(
      in.toDF().toDF("user", "ts_s", "id", "ts"),
      "user", "ts_s", "id", gapSeconds = 300L,
      eventTimeCol = Some("ts"), ttl = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess_ttl_out")
      .outputMode("append").start()
    def stateRows: Long = {
      val p = q.lastProgress
      if (p == null || p.stateOperators.isEmpty) -1L
      else p.stateOperators.map(_.numRowsTotal).sum
    }
    try {
      // b1: u1 opens session 1 with two events
      in.addData((1L, 36000L, 1L, ts("2026-01-01 10:00:00")),
        (1L, 36060L, 2L, ts("2026-01-01 10:01:00")))
      q.processAllAvailable()
      // b2 inside gap AND ttl: same session continues across batches
      in.addData((1L, 36240L, 3L, ts("2026-01-01 10:04:00")))
      q.processAllAvailable()
      // b3: u2 an hour later pushes the watermark past u1's timeout
      in.addData((2L, 39600L, 4L, ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      val afterEvict = stateRows
      // b4: u1 returns after eviction — new session, ordinal restarts
      in.addData((1L, 39900L, 5L, ts("2026-01-01 11:05:00")))
      q.processAllAvailable()
      val got = spark.table("sess_ttl_out").collect()
        .map(r => r.getLong(2) -> r.getLong(3)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L),
        got.toString)
      assert(afterEvict == 1L,
        s"u1 should be evicted after the watermark passed: $afterEvict")
    } finally q.stop()
  }

  test("sessionizeStream without TTL matches the TTL path inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, java.sql.Timestamp)]
    val out = StreamingOps.sessionizeStream(
      in.toDF().toDF("user", "ts_s", "id", "ts"),
      "user", "ts_s", "id", gapSeconds = 300L)
    val q = out.writeStream.format("memory").queryName("sess_nottl_out")
      .outputMode("append").start()
    try {
      in.addData((1L, 36000L, 1L, ts("2026-01-01 10:00:00")),
        (1L, 36060L, 2L, ts("2026-01-01 10:01:00")))
      q.processAllAvailable()
      in.addData((1L, 36240L, 3L, ts("2026-01-01 10:04:00")))
      q.processAllAvailable()
      val got = spark.table("sess_nottl_out").collect()
        .map(r => r.getLong(2) -> r.getLong(3)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    } finally q.stop()
  }

  test("funnelStepsStream TTL: in-horizon funnel unchanged, idle keys evicted, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, java.sql.Timestamp)]
    val out = StreamingOps.funnelStepsStream(
      in.toDF().toDF("user", "etype", "ts_s", "ts"),
      "user", "etype", "ts_s", Seq("view", "cart", "buy"),
      eventTimeCol = Some("ts"), ttl = "10 minutes")
    val q = out.writeStream.format("memory").queryName("funnel_ttl_out")
      .outputMode("update").start()
    def stateRows: Long = {
      val p = q.lastProgress
      if (p == null || p.stateOperators.isEmpty) -1L
      else p.stateOperators.map(_.numRowsTotal).sum
    }
    try {
      // b1: u1 views+carts — funnel advances to 2 within the batch
      in.addData((1L, "view", 36000L, ts("2026-01-01 10:00:00")),
        (1L, "cart", 36060L, ts("2026-01-01 10:01:00")))
      q.processAllAvailable()
      // b2 inside the horizon: buy completes the funnel ACROSS batches
      in.addData((1L, "buy", 36240L, ts("2026-01-01 10:04:00")))
      q.processAllAvailable()
      // b3: u2 an hour later pushes the watermark past u1's timeout
      in.addData((2L, "view", 39600L, ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      val afterEvict = stateRows
      // b4: u1 returns after eviction — progress forgotten, restarts
      // at step 1 (the documented TTL trade)
      in.addData((1L, "view", 39900L, ts("2026-01-01 11:05:00")))
      q.processAllAvailable()
      val rows = spark.table("funnel_ttl_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
      // in-horizon emissions are exactly the no-TTL fold: u1 reaches
      // 2 in b1 then 3 in b2 with the reached-step times preserved
      assert(rows.contains((1L, 2, Seq(36000L, 36060L))), rows.mkString(";"))
      assert(rows.contains((1L, 3, Seq(36000L, 36060L, 36240L))),
        rows.mkString(";"))
      assert(afterEvict == 1L,
        s"u1 should be evicted after the watermark passed: $afterEvict")
      assert(rows.contains((1L, 1, Seq(39900L))),
        s"post-eviction u1 must restart at step 1: ${rows.mkString(";")}")
    } finally q.stop()
  }

  test("funnelStepsStream without TTL matches the TTL path inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, java.sql.Timestamp)]
    val out = StreamingOps.funnelStepsStream(
      in.toDF().toDF("user", "etype", "ts_s", "ts"),
      "user", "etype", "ts_s", Seq("view", "cart", "buy"))
    val q = out.writeStream.format("memory").queryName("funnel_nottl_out")
      .outputMode("update").start()
    try {
      in.addData((1L, "view", 36000L, ts("2026-01-01 10:00:00")),
        (1L, "cart", 36060L, ts("2026-01-01 10:01:00")))
      q.processAllAvailable()
      in.addData((1L, "buy", 36240L, ts("2026-01-01 10:04:00")))
      q.processAllAvailable()
      val rows = spark.table("funnel_nottl_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).toSet
      assert(rows == Set((1L, 2, Seq(36000L, 36060L)),
        (1L, 3, Seq(36000L, 36060L, 36240L))), rows.mkString(";"))
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Sampling
import graft.model.Cdc
import graft.ops.Registry

/** UniMax budget allocation (Chung et al. 2023): the ascending-count
  * waterfilling closed form, its boundary cases, and the
  * `sample.unimax` plugin surface.
  */
class UnimaxSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  // (stratum, per-row tokens) rows summing to a=10, b=100, c=1000
  private def corpus = Seq(
    ("a", 4L), ("a", 6L), ("b", 100L), ("c", 400L), ("c", 600L))
    .toDF("lang", "n_toks")

  private def alloc(budget: Long, maxEpochs: Double) =
    Sampling.unimaxAllocation(corpus, "lang", "n_toks", budget, maxEpochs)
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap

  test("mixed regime: capped prefix takes its cap, the rest share equally") {
    // caps at 2 epochs: a=20, b=200, c=2000; budget 1000 →
    // a and b capped (20+200=220), c gets the remaining 780
    val out = alloc(1000L, 2.0)
    assert(out("a").getAs[Boolean]("capped"))
    assert(out("a").getAs[Double]("quota") == 20.0)
    assert(out("a").getAs[Double]("epochs") == 2.0)
    assert(out("b").getAs[Boolean]("capped"))
    assert(out("b").getAs[Double]("quota") == 200.0)
    assert(!out("c").getAs[Boolean]("capped"))
    assert(out("c").getAs[Double]("quota") == 780.0)
    assert(out("c").getAs[Double]("epochs") == 0.78)
  }

  test("oversized budget: every stratum capped at maxEpochs") {
    val out = alloc(1000000L, 3.0)
    assert(out.values.forall(_.getAs[Boolean]("capped")))
    assert(out("c").getAs[Double]("quota") == 3000.0)
    assert(out.values.forall(_.getAs[Double]("epochs") == 3.0))
  }

  test("tight budget: nobody capped, uniform split consumes it exactly") {
    // smallest cap is 20 but 20·3 = 60 > 30, so even 'a' is uncapped
    val out = alloc(30L, 2.0)
    assert(out.values.forall(!_.getAs[Boolean]("capped")))
    assert(out.values.forall(_.getAs[Double]("quota") == 10.0))
    assert(out("a").getAs[Double]("epochs") == 1.0)
    assert(out("c").getAs[Double]("epochs") == 0.01)
  }

  test("allocation never exceeds budget or caps, and fills when it can") {
    for (budget <- Seq(50L, 220L, 500L, 2220L, 9999L)) {
      val rows = alloc(budget, 2.0).values.toSeq
      val quotas = rows.map(_.getAs[Double]("quota"))
      val caps = rows.map(r => r.getAs[Long]("n_tokens") * 2.0)
      assert(quotas.zip(caps).forall { case (q, c) => q <= c + 1e-9 })
      val total = quotas.sum
      val allCapped = rows.forall(_.getAs[Boolean]("capped"))
      if (allCapped) assert(total <= budget.toDouble)
      else assert(math.abs(total - budget.toDouble) < 1e-6,
        s"budget=$budget total=$total")
    }
  }

  test("sum-merged split state plans identically to the one-shot (stream law)") {
    val rows = (0L until 60L).map(i =>
      (i, Seq("a", "b", "c")(i.toInt % 3), 10L + i % 7))
      .toDF("id", "lang", "n_toks")
    val oneShot = Sampling.unimaxAllocation(rows, "lang", "n_toks",
      budget = 500L, maxEpochs = 2.0).collect().sortBy(_.getString(0))
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("lang").cast("string").as("stratum"))
        .agg(sum(col("n_toks")).cast("long").as("n_tokens"))
    val merged = sums(rows.filter(col("id") % 2 === 0))
      .unionByName(sums(rows.filter(col("id") % 2 === 1)))
      .groupBy("stratum")
      .agg(sum(col("n_tokens")).cast("long").as("n_tokens"))
    val fromState = Sampling.unimaxFromCounts(merged,
      budget = 500L, maxEpochs = 2.0).collect().sortBy(_.getString(0))
    assert(oneShot.toSeq == fromState.toSeq)
  }

  test("sample.unimax plugin plans per-stratum records (batch-only guard)") {
    val recs = Cdc.wrap(
      Seq((1L, "a", 4L), (2L, "a", 6L), (3L, "b", 100L),
        (4L, "c", 400L), (5L, "c", 600L))
        .toDF("id", "lang", "n_toks"), "id", "docs")
    val out = Registry.create("sample.unimax",
        Map("stratum" -> ".Payload.After.lang",
          "tokens" -> ".Payload.After.n_toks",
          "budget" -> "1000", "maxEpochs" -> "2.0"))
      .transform(recs)
    assert(out.count() == 3L)
    val c = out.filter(
      get_json_object(col(Cdc.PayloadAfter), "$.stratum") === "c")
      .select(get_json_object(col(Cdc.PayloadAfter), "$.quota")).head()
    assert(c.getString(0).toDouble == 780.0)
    val streaming = spark.readStream
      .format("rate").option("rowsPerSecond", 1).load()
    val e = intercept[IllegalArgumentException] {
      Registry.create("sample.unimax",
        Map("stratum" -> ".Payload.After.lang",
          "tokens" -> ".Payload.After.n_toks",
          "budget" -> "1000")).transform(streaming)
    }
    assert(e.getMessage.contains("batch-only"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Sampling
import graft.model.Cdc
import graft.ops.Registry

/** DoReMi mixture weights (Xie et al. 2023, the c=0 EG closed form):
  * the softmax-of-cumsum law, grid completion, stability, the
  * stream/batch merge law, and the `sample.doremi` plugin surface.
  */
class DoremiSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("weights follow softmax(eta*cumsum) averaged over steps") {
    // domain A carries excess loss 1.0 every step, B none:
    // step0 gA=1 gB=0, step1 gA=2 gB=0
    val df = Seq(
      ("A", 0L, 1.0), ("A", 1L, 1.0), ("B", 0L, 0.0), ("B", 1L, 0.0))
      .toDF("domain", "step", "loss")
    val out = Sampling.doremiWeights(df, "domain", "step", "loss",
        eta = 1.0)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    val a0 = math.exp(1.0) / (math.exp(1.0) + 1.0)
    val a1 = math.exp(2.0) / (math.exp(2.0) + 1.0)
    assert(math.abs(out("A").getAs[Double]("weight") - (a0 + a1) / 2) < 1e-6)
    assert(math.abs(out("B").getAs[Double]("weight") -
      ((1 - a0) + (1 - a1)) / 2) < 1e-6)
    assert(out("A").getAs[Long]("n_steps") == 2L)
    assert(out("A").getAs[Double]("mean_excess") == 1.0)
    // per-step softmax sums to 1, so the averaged weights do too
    val total = out.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - 1.0) < 1e-5)
  }

  test("zero excess everywhere gives the uniform mixture") {
    val df = Seq(("A", 0L, 0.0), ("B", 0L, 0.0), ("C", 0L, 0.0), ("A", 1L, 0.0))
      .toDF("domain", "step", "loss")
    val out = Sampling.doremiWeights(df, "domain", "step", "loss")
      .collect()
    assert(out.forall(r => math.abs(
      r.getAs[Double]("weight") - 1.0 / 3) < 1e-6))
  }

  test("a domain missing from a step takes no update (grid completion)") {
    val explicit = Seq(
      ("A", 0L, 1.0), ("A", 1L, 0.5), ("B", 0L, 0.2), ("B", 1L, 0.0))
      .toDF("domain", "step", "loss")
    val sparse = Seq(("A", 0L, 1.0), ("A", 1L, 0.5), ("B", 0L, 0.2))
      .toDF("domain", "step", "loss")
    val a = Sampling.doremiWeights(explicit, "domain", "step", "loss")
      .collect().map(r => (r.getString(0), r.getAs[Double]("weight"))).toMap
    val b = Sampling.doremiWeights(sparse, "domain", "step", "loss")
      .collect().map(r => (r.getString(0), r.getAs[Double]("weight"))).toMap
    assert(a == b)
  }

  test("max-stabilized softmax survives long high-loss histories") {
    // 500 steps of excess 10 at eta 1: raw exp(5000) overflows;
    // the stabilized form must stay finite and favor the hot domain
    val df = (0L until 500L).flatMap(s =>
      Seq(("hot", s, 10.0), ("cold", s, 0.0))).toDF("domain", "step", "loss")
    val out = Sampling.doremiWeights(df, "domain", "step", "loss")
      .collect().map(r => (r.getString(0), r.getAs[Double]("weight"))).toMap
    assert(!out("hot").isNaN && !out("cold").isNaN)
    assert(out("hot") > 0.99 && out("cold") < 0.01)
  }

  test("sum/count-merged split state plans identically (stream law)") {
    val rows = (0L until 200L).map(i =>
      (i, Seq("a", "b", "c")(i.toInt % 3), i / 50L, (i % 9).toDouble / 4.0))
      .toDF("id", "domain", "step", "loss")
    val batch = Sampling.doremiWeights(rows, "domain", "step", "loss",
      eta = 0.7).collect().sortBy(_.getString(0))
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("domain"), col("step"))
        .agg(sum(col("loss")).as("s"), count(lit(1)).cast("long").as("n"))
    val merged = sums(rows.filter(col("id") % 2 === 0))
      .unionByName(sums(rows.filter(col("id") % 2 === 1)))
      .groupBy(col("domain"), col("step"))
      .agg(sum(col("s")).as("s"), sum(col("n")).cast("long").as("n"))
    val fromState = Sampling.doremiFromLosses(
      merged.select(col("domain"), col("step"),
        (col("s") / col("n").cast("double")).as("loss")), eta = 0.7)
      .collect().sortBy(_.getString(0))
    assert(batch.toSeq == fromState.toSeq)
  }

  test("sample.doremi plugin plans per-domain records (batch-only guard)") {
    val recs = Cdc.wrap(Seq(
      (1L, "A", 0L, 1.0), (2L, "A", 1L, 1.0),
      (3L, "B", 0L, 0.0), (4L, "B", 1L, 0.0))
      .toDF("id", "lang", "step", "loss"), "id", "docs")
    val out = Registry.create("sample.doremi",
        Map("domain" -> ".Payload.After.lang",
          "step" -> ".Payload.After.step",
          "loss" -> ".Payload.After.loss", "eta" -> "1.0"))
      .transform(recs)
    assert(out.count() == 2L)
    val w = out.select(
      get_json_object(col(Cdc.PayloadAfter), "$.domain").as("d"),
      get_json_object(col(Cdc.PayloadAfter), "$.weight").as("w"))
      .collect().map(r => r.getString(0) -> r.getString(1).toDouble).toMap
    assert(w("A") > w("B") && math.abs(w.values.sum - 1.0) < 1e-5)
    val streaming = spark.readStream
      .format("rate").option("rowsPerSecond", 1).load()
    val e = intercept[IllegalArgumentException] {
      Registry.create("sample.doremi",
        Map("domain" -> ".Payload.After.lang",
          "step" -> ".Payload.After.step",
          "loss" -> ".Payload.After.loss")).transform(streaming)
    }
    assert(e.getMessage.contains("batch-only"))
  }
}

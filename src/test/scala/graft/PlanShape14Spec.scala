package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Cdc
import graft.ops.Registry

/** Plan-shape guards for the round-14 registry promotions: the
  * Scaladoc scale claims asserted against executed plans — annotators
  * must stay inside the scan's stage (zero exchanges), sampling
  * filters must never shuffle data rows, and the outlier screen's
  * only exchange is its group window.
  */
class PlanShape14Spec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def base = Cdc.wrap(
    (1 to 500).map(i => (i.toLong, s"g${i % 3}",
      s"some document text number $i with words", i * 1.5))
      .toDF("id", "lang", "text", "v"), "id", "t")

  test("text annotators add zero exchanges — pure scan-stage rewrites") {
    for (plugin <- Seq("text.quality", "text.langid", "text.fingerprint",
      "text.tokens", "text.pii", "text.normalize")) {
      val settings = Map("field" -> ".Payload.After.text")
      val plan = executed(Registry.create(plugin, settings)(base))
      assert(!plan.contains("Exchange"),
        s"$plugin shuffles a row-local rewrite:\n$plan")
      assert(!plan.contains("CartesianProduct"), plugin)
    }
  }

  test("sampling filters never shuffle data rows") {
    // the stratum counts are a separate driver-side action; the FILTER
    // plan itself must be scan → local filter, no exchange and no join
    for ((plugin, settings) <- Seq(
      "sample.temperature" -> Map("stratum" -> ".Payload.After.lang",
        "id" -> ".Payload.After.id", "temperature" -> "2.0"),
      "sample.mixture" -> Map("stratum" -> ".Payload.After.lang",
        "id" -> ".Payload.After.id", "targets" -> "g0:0.4,g1:0.3,g2:0.3"))) {
      val plan = executed(Registry.create(plugin, settings)(base))
      assert(!plan.contains("Exchange"),
        s"$plugin shuffles its data rows:\n$plan")
      assert(!plan.contains("Join"),
        s"$plugin joins where a literal cut map suffices:\n$plan")
    }
  }

  test("stats.outliers' only exchange is the group window") {
    val plan = executed(Registry.create("stats.outliers",
      Map("groups" -> ".Payload.After.lang", "value" -> ".Payload.After.v",
        "z" -> "1"))(base))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(plan.contains("Window"), s"expected the group window:\n$plan")
    assert(exchanges <= 2, // hashpartitioning for the window (+AQE read)
      s"stats.outliers plans $exchanges exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup.semantic never plans an all-pairs product") {
    val vecs = Cdc.wrap((1 to 60).map(i =>
      (i.toLong, Seq(math.cos(i * 0.1), math.sin(i * 0.1), 0.25)))
      .toDF("id", "vec"), "id", "t")
    val plan = executed(Registry.create("dedup.semantic",
      Map("id" -> ".Payload.After.id", "vec" -> ".Payload.After.vec",
        "k" -> "4", "threshold" -> "0.99"))(vecs))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"dedup.semantic plans a product join:\n$plan")
  }
}

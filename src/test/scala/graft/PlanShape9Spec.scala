package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Joins, Retrieval, Sketch}

/** Plan-shape guards for the round-9 operators: the Scaladoc scale
  * claims asserted against executed plans.
  */
class PlanShape9Spec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("kmv state plans a partial group-limit below the exchange") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
    val plan = executed(Sketch.kmvState(df, Seq("g"), "v", k = 64))
    // two WindowGroupLimit nodes (Partial below the shuffle, Final
    // above) = the map-side k-min combine the Scaladoc claims
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"no partial group-limit:\n$plan")
  }

  test("skyline joins back by broadcast/hash — no product join") {
    val df = (1 to 2000).map(i =>
      (i, s"g${i % 5}", (i % 40).toLong, (i % 29).toDouble)).toDF("id", "g", "x", "y")
    val plan = executed(Joins.skyline2D(df, Seq("g"), "x", "y"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"skyline plans a product join:\n$plan")
  }

  test("keywords keeps tfidf's partial top-k below the exchange") {
    val docs = (1 to 300).map(i =>
      (i.toLong, s"w${i % 50} w${i % 7} w${i % 7} common words here"))
      .toDF("id", "text")
    val plan = executed(Retrieval.keywords(docs, "id", "text", 3, 1))
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"no partial group-limit:\n$plan")
  }

  test("linkage score is one equi-join: no product join on the block key") {
    val a = (1 to 500).map(i => (i.toLong, (i % 20).toLong, s"f${i % 9}"))
      .toDF("id", "blk", "f1")
    val plan = executed(graft.analytics.Linkage.linkageScore(
      a, a, "id", "id", "blk", Seq(("f1", 0.9, 0.2)),
      minScore = -10, selfPairs = true))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"linkage plans a product join:\n$plan")
  }
}

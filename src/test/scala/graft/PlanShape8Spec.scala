package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Baskets, Graph, Profiling, Retrieval, Stats}

/** Plan-shape guards for the round-8 continuation operators: the scale
  * claims in their Scaladoc are asserted against the executed plan, not
  * just eyeballed. Semantics specs for the quantile/RFM pair ride along.
  */
class PlanShape8Spec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("triangles and jaccardLinks never plan a nested-loop or cartesian join") {
    val edges = (1 to 200).flatMap(i =>
      Seq((i.toLong, (i % 37).toLong + 1000L),
        (i.toLong, (i % 23).toLong + 2000L))).toDF("u", "v")
    for ((what, df) <- Seq(
        "triangles" -> Graph.triangles(edges, "u", "v"),
        "links" -> Graph.jaccardLinks(edges, "u", "v", 0.2))) {
      val plan = executed(df)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$what plans a product join:\n$plan")
    }
  }

  test("phraseCount is shuffle-free: zero exchanges in the executed plan") {
    val docs = (1 to 100).map(i => (i.toLong, s"a b c d e f g $i"))
      .toDF("id", "text")
    val plan = executed(Retrieval.phraseCount(docs, "id", "text",
      Seq("c", "d")))
    assert(!plan.contains("Exchange"),
      s"row-local operator shuffles:\n$plan")
  }

  test("columnProfile: the data-sized aggregate is hash, not sort") {
    val df = (1 to 500).map(i => (i.toLong, i * 0.5, s"s${i % 7}"))
      .toDF("a", "b", "c")
    val plan = executed(Profiling.columnProfile(df, Seq("a", "b"), Seq("c")))
    // the (tag, value) distinct over the exploded DATA rows must be a
    // HashAggregate; a SortAggregate keyed by the value columns would
    // be the measured-6x-slower multi-distinct shape. The per-tag
    // rollup above it may sort — string min/max has a var-length
    // buffer — but it runs on the collapsed distinct-value table.
    assert(plan.contains("HashAggregate(keys=[_tag"),
      s"no hash aggregate over (tag, value):\n$plan")
    val badSort = plan.linesIterator.exists { l =>
      val i = l.indexOf("SortAggregate(key")
      i >= 0 && {
        val keys = l.substring(l.indexOf("[", i) + 1, l.indexOf("]", i))
        keys.contains("_nv") || keys.contains("_sv")
      }
    }
    assert(!badSort, s"sort aggregate keyed by data values:\n$plan")
  }

  test("quantilesExact: ceil-rank selection on hand data") {
    // 10 values 1..10: p50 -> rank 5 -> 5.0; p90 -> rank 9; p99 -> 10
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = Stats.quantilesExact(df, Seq("g"), "v", Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(got == Map(0.5 -> 5.0, 0.9 -> 9.0, 0.99 -> 10.0))
  }

  test("quantilesExact: always returns a real data value (n=1, n=3)") {
    val df = Seq(("a", 7.5), ("b", 1.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val got = Stats.quantilesExact(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got == Map("a" -> 7.5, "b" -> 2.0))
  }

  test("rfm: tiles deterministic, cell arithmetic, orientation") {
    // 10 entities, one segment; metrics constructed so entity 1 is
    // best on all three axes
    val now = 1000000L * 86400L
    val rows = (1 to 10).flatMap { e =>
      (1 to e).map(i => ("s", e.toLong,
        now - e * 86400L - i, e.toLong * 100L))
    }
    val df = rows.toDF("seg", "cust", "ts", "cents")
    val out = Stats.rfm(df, Seq("seg"), Seq("cust"), "ts", "cents", now)
      .collect().map(r => r.getLong(1) ->
        (r.getInt(5), r.getInt(6), r.getInt(7))).toMap
    // entity 10: most events and spend (f=m=1) but oldest (r=5)
    assert(out(10L)._2 == 1 && out(10L)._3 == 1 && out(10L)._1 == 5)
    // entity 1: most recent but least active
    assert(out(1L)._1 == 1 && out(1L)._2 == 5 && out(1L)._3 == 5)
    // repartition invariance
    val out2 = Stats.rfm(df.repartition(7), Seq("seg"), Seq("cust"),
      "ts", "cents", now).collect().map(r => r.getLong(1) ->
        (r.getInt(5), r.getInt(6), r.getInt(7))).toMap
    assert(out == out2)
  }
}

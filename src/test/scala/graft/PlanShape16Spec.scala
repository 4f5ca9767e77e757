package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Sampling, Text}

/** Plan-shape guards for the round-16 operators: the Scaladoc scale
  * claims asserted against executed plans — the Zipf head selection
  * must stay a partial top-k (never a global sort of the vocabulary),
  * and the curriculum's rank windows must always carry a partition
  * spec (the whole point of the histogram + refinement design is that
  * no single-task global window exists anywhere).
  */
class PlanShape16Spec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def docs = (1 to 400).map(i =>
    (i.toLong, s"alpha beta gamma delta epsilon token$i words number $i"))
    .toDF("doc_id", "text")

  test("zipfFit selects the head via TakeOrderedAndProject, not a global sort") {
    val plan = executed(Text.zipfFit(docs, "text", minCount = 1, topN = 64))
    assert(plan.contains("TakeOrderedAndProject"),
      s"head selection must be a partial top-k:\n$plan")
    // the only Sort allowed is inside the bounded (≤ topN rows) rank
    // window; the vocabulary itself must never globally sort — i.e.
    // no Sort directly above the vocab aggregation's exchange
    val sorts = "(?m)^\\s*\\+?-? ?\\*?\\(?\\d*\\)? ?Sort ".r.findAllIn(plan).size
    assert(sorts <= 1, s"unexpected global sorts:\n$plan")
  }

  test("curriculum windows always carry a partition spec") {
    val df = (1 to 300).map(i => (i.toLong, (i % 4).toLong)).toDF("id", "s")
    for (maxTask <- Seq(Long.MaxValue, 10L)) {
      val plan = executed(Sampling.curriculum(df, "id", "s", 4, maxTask))
      // every Window node must partition by _s (naive) or (_s, _bkt)
      // (refined) — a Window with an empty partition spec would be the
      // single-task global-window trap
      val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
      assert(windows.nonEmpty, plan)
      assert(windows.forall(_.contains("_s")),
        s"window without the score partition (maxTask=$maxTask):\n$plan")
    }
  }

  test("mixtureKl is one aggregation over a broadcast target join") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i.toLong)).toDF("lang", "tk")
    val plan = executed(Sampling.mixtureKl(df, "lang", "tk",
      Seq(("g0", 0.4), ("g1", 0.3), ("g2", 0.3))))
    assert(plan.contains("BroadcastExchange"),
      s"targets must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a 3-row target table must never sort-merge:\n$plan")
  }

  test("sboTrain count aggregates are map-side combined") {
    val plan = executed(Text.sboTrain(docs, "doc_id", "text"))
    // each n-gram order's count must have a partial (map-side) phase —
    // occurrences never shuffle, only distinct n-grams do
    val partials = "partial_count".r.findAllIn(plan).size
    assert(partials >= 3, s"expected 3 map-side-combined counts:\n$plan")
  }

  test("sboScore explodes the trigrams exactly once") {
    val model = Text.sboTrain(docs, "doc_id", "text")
    val plan = executed(Text.sboScore(docs, model, "doc_id", "text"))
    // three backoff joins must share ONE Generate — an inlined
    // re-explosion per join would re-pay the split per candidate.
    // (AQE's toString appends the pre-adaptive tree after
    // "== Initial Plan ==" — count the FINAL section only.)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val gens = "Generate posexplode".r.findAllIn(finalPlan).size
    assert(gens == 1, s"expected exactly one Generate:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the ord-0 floor must broadcast, never cartesian:\n$plan")
  }

  test("jsDivergence broadcasts the pair grid, never cartesians the corpus") {
    val df = (1 to 200).map(i =>
      (s"s${i % 3}", s"alpha beta tok$i gamma")).toDF("lang", "text")
    val plan = executed(Text.jsDivergence(df, "lang", "text"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"the stratum-pair grid must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian anywhere in the divergence plan:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Dedup, Graph}

/** Round-10 enforcement fixes: the exact-join candidate guard and the
  * hits empty-graph contract.
  */
class Round10FixSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("exact joins fail loudly on a small-vocab adversarial corpus") {
    // 120 docs of 12 tokens from a FIVE-word pool: every doc's prefix
    // hits the same handful of postings, so the candidate bound is
    // ~n^2 — the quadratic regime the guard must refuse to enter
    val vocab = Array("aa", "bb", "cc", "dd", "ee")
    val docs = (1 to 120).map(i =>
      (i.toLong, (0 until 12).map(j => vocab((i * 7 + j) % 5)).mkString(" ")))
      .toDF("doc_id", "text")
    val exJ = intercept[IllegalStateException] {
      Dedup.jaccardPrefixJoin(docs, "doc_id", "text",
        threshold = 0.6, maxCandidates = 500L)
    }
    assert(exJ.getMessage.contains("minhashPairs"), exJ.getMessage)
    assert(exJ.getMessage.contains("maxCandidates=500"), exJ.getMessage)
    val exC = intercept[IllegalStateException] {
      Dedup.containmentJoin(docs, "doc_id", "text",
        threshold = 0.8, maxCandidates = 500L)
    }
    assert(exC.getMessage.contains("minhashPairs"), exC.getMessage)
    // an explicitly raised cap re-enters the documented bounded-corpus
    // contract and the exact join still answers
    val ok = Dedup.jaccardPrefixJoin(docs, "doc_id", "text",
      threshold = 0.999, maxCandidates = Long.MaxValue)
    assert(ok.columns.toSeq == Seq("id_a", "id_b", "jaccard"))
    // a Zipf-ish corpus passes under the default cap
    val zipf = (1 to 100).map(i =>
      (i.toLong, s"common the of doc$i unique$i token$i"))
      .toDF("doc_id", "text")
    assert(Dedup.jaccardPrefixJoin(zipf, "doc_id", "text", 0.6)
      .count() == 0L)
  }

  test("kendall and holt enforce their per-group bounds loudly") {
    val big = (1 to 300).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "x", "y")
    val exK = intercept[IllegalStateException] {
      graft.analytics.Stats.kendallTau(big, Seq("g"), "x", "y",
        maxGroupRows = 100L)
    }
    assert(exK.getMessage.contains("SAMPLE"), exK.getMessage)
    // under the cap the same frame answers
    assert(graft.analytics.Stats.kendallTau(big, Seq("g"), "x", "y")
      .collect().head.getAs[Double]("kendall_tau") == 1.0)
    val exH = intercept[IllegalArgumentException] {
      graft.analytics.Temporal.holt(big.withColumnRenamed("y", "v"),
        Seq("g"), "x", "v", 0.5, 0.25, maxPoints = 100L)
    }
    assert(exH.getMessage.contains("maxPoints"), exH.getMessage)
  }

  test("hits refuses an empty edge set with a clear message") {
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    val ex = intercept[IllegalArgumentException] {
      Graph.hits(empty, "s", "d", iterations = 1)
    }
    assert(ex.getMessage.contains("empty edge set"), ex.getMessage)
    // null-only edges are an empty graph too
    val nulls = Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
      .toDF("s", "d")
    val ex2 = intercept[IllegalArgumentException] {
      Graph.hits(nulls, "s", "d", iterations = 1)
    }
    assert(ex2.getMessage.contains("empty edge set"), ex2.getMessage)
  }
}

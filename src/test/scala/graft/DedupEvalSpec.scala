package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.DedupEval

/** The LSH banding-recall harness: verified MinHash against the exact
  * prefix-join ground truth — full recall on the natural corpus's
  * j≈1 duplicates, and the graded corpus's measured recall must
  * BRACKET the banding S-curve (near-zero far below the threshold
  * knee, one above it).
  */
class DedupEvalSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  test("natural corpus: verified minhash finds every exact pair at t=0.9") {
    val r = DedupEval.eval(spark, "/root/testdata/sf0.001", 0.9, 128, 16)
    assert(r.exact > 0, "corpus must contain near-dup pairs")
    assert(r.recall == 1.0, r.toString)
    // verified pipeline: nothing below threshold is emitted
    assert(r.got == r.hit, r.toString)
  }

  test("graded corpus: recall brackets the banding S-curve") {
    val rows = DedupEval.gradedEval(spark, "/root/testdata/sf0.001", 128, 32)
    val byBucket = rows.map(r => r._1 -> r).toMap
    // far below the knee (j≈0.2, theory ~0.12): recall must be low
    for (r <- byBucket.get(0.2)) assert(r._4 <= 0.6, r.toString)
    // above the knee (j ≥ 0.7, theory ≈ 1): every pair found
    rows.filter(_._1 >= 0.7).foreach { r =>
      assert(r._4 == 1.0, r.toString)
    }
    // the trace spans the range — the graded corpus does its job
    assert(rows.map(_._1).min <= 0.3 && rows.map(_._1).max >= 0.8)
  }
}

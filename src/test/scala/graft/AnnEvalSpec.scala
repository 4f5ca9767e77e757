package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.AnnEval

/** The IVF recall harness: probing every cell must recover the exact
  * brute-force result, and recall must be monotone in nprobe.
  */
class AnnEvalSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  test("ivf recall is monotone in nprobe and exact at nprobe = nlist") {
    val recalls = Seq(1, 4, 16).map(np =>
      AnnEval.eval(spark, "/root/testdata/sf0.001", 10, 16, np,
        nQueries = 32)._1)
    assert(recalls == recalls.sorted, recalls.toString)
    assert(recalls.last == 1.0, recalls.toString)
    assert(recalls.head < 1.0,
      "1-probe recall at 1.0 would mean the sweep is not discriminating")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Sketch

/** Distributed Bloom word table (round 13): partition invariance,
  * the OR union law, no false negatives, bounded false positives,
  * and probe behavior on an empty filter.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def words(df: org.apache.spark.sql.DataFrame) =
    Sketch.bloomWords(df, "id", mBits = 1 << 14, kHashes = 4)

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("word table is partition-invariant and bounded by m/64 rows") {
    val df = (1L to 20000L).toDF("id")
    val w1 = words(df)
    val w2 = words(df.repartition(13))
    assert(key(w1) == key(w2))
    assert(w1.count() <= (1 << 14) / 64)
  }

  test("union law: merge(bloom(A), bloom(B)) == bloom(A ∪ B) bit-for-bit") {
    val df = (1L to 10000L).toDF("id")
    val a = words(df.filter($"id" % 2 === 0))
    val b = words(df.filter($"id" % 2 === 1))
    assert(key(Sketch.bloomMerge(Seq(a, b))) == key(words(df)))
    // idempotence: merging a filter with itself is the identity
    assert(key(Sketch.bloomMerge(Seq(a, a))) == key(a))
  }

  test("no false negatives; false positives bounded near (1-e^{-kn/m})^k") {
    val members = (1L to 2000L).toDF("id")
    val w = Sketch.bloomWords(members, "id", mBits = 1 << 16, kHashes = 4)
    val candidates = (1L to 40000L).toDF("id")
    val probed = Sketch.bloomProbe(w, candidates, "id",
      mBits = 1 << 16, kHashes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member hits
    (1L to 2000L).foreach(i => assert(probed(i) == 1L, s"false negative at $i"))
    // FP rate among the 38k non-members: theory ~ (1-e^{-4*2000/65536})^4
    // ≈ 1.7e-4; allow a generous 10x margin
    val fps = (2001L to 40000L).count(i => probed(i) == 1L)
    assert(fps <= 65, s"$fps false positives in 38000 probes")
  }

  test("probing an empty filter misses everything") {
    val empty = words(Seq.empty[Long].toDF("id"))
    val probed = Sketch.bloomProbe(empty, (1L to 100L).toDF("id"), "id",
      mBits = 1 << 14, kHashes = 4)
    assert(probed.filter($"bloom_hit" === 1L).count() == 0)
  }

  test("probe plan broadcasts the word table (candidates never shuffle for the join)") {
    val w = words((1L to 1000L).toDF("id"))
    val probed = Sketch.bloomProbe(w, (1L to 5000L).toDF("id"), "id",
      mBits = 1 << 14, kHashes = 4)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("mBits must be a power of two (oracle mod-equality contract)") {
    val df = (1L to 10L).toDF("id")
    intercept[IllegalArgumentException] {
      Sketch.bloomWords(df, "id", mBits = 1000)
    }
    intercept[IllegalArgumentException] {
      Sketch.bloomProbe(words(df), df, "id", mBits = 1000)
    }
  }
}

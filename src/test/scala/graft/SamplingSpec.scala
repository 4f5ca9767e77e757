package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Sampling

/** Deterministic sampling/interleave: reproducibility across runs and
  * partitionings is the operator's entire point.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  private lazy val ids = spark.range(0, 100000).toDF("id")

  test("hash sample is deterministic and fraction-accurate") {
    val a = Sampling.hashSample(ids, "id", 0.25, seed = 1).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(17), "id", 0.25, seed = 1)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same rows regardless of partitioning")
    val frac = a.size.toDouble / 100000
    assert(math.abs(frac - 0.25) < 0.01, s"fraction $frac")
    // different seed → different (but deterministic) subset
    val c = Sampling.hashSample(ids, "id", 0.25, seed = 2).collect().map(_.getLong(0)).toSet
    assert(a != c)
    // nested property: fraction 0.1 ⊂ fraction 0.25 (same seed) —
    // bucket cutoffs nest, so growing a sample never resamples
    val small = Sampling.hashSample(ids, "id", 0.1, seed = 1).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
  }

  test("temperature sampling flattens a skewed mix and clamps the tail") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 8000 head + 500 mid + 120 tail rows
    val df = spark.range(0, 8620).toDF("id")
      .withColumn("src", when(col("id") < 8000, "head")
        .when(col("id") < 8500, "mid").otherwise("tail"))
    val out = Sampling.temperatureSample(df, "id", "src",
      temperature = 2.0, seed = 3)
    val by = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tail keep-fraction clamps at 1 → every tail row survives
    assert(by("tail") == 120L, s"tail must keep all rows, got ${by("tail")}")
    // head downsamples hard; expected fraction = min(1, (N·w/Σw)/c)
    def w(c: Long) = math.sqrt(c.toDouble)
    val sum = w(8000) + w(500) + w(120) // fold order: head, mid, tail (sorted)
    val fHead = 8620.0 * w(8000) / sum / 8000.0
    val cutHead = math.floor(math.min(1.0, fHead) * 4096.0) / 4096.0
    assert(math.abs(by("head").toDouble / 8000.0 - cutHead) < 0.03,
      s"head fraction ${by("head") / 8000.0} vs expected ≈ $cutHead")
    // deterministic: same seed → identical sample
    val again = Sampling.temperatureSample(df, "id", "src", 2.0, seed = 3)
    assert(out.collect().map(_.getLong(0)).sorted
      .sameElements(again.collect().map(_.getLong(0)).sorted))
    // nested: a hotter (more uniform) τ=4 sample of the head is NOT
    // required to nest, but same-τ different-seed must differ
    val other = Sampling.temperatureSample(df, "id", "src", 2.0, seed = 4)
    assert(!out.collect().map(_.getLong(0)).sorted
      .sameElements(other.collect().map(_.getLong(0)).sorted))
  }

  test("mixture sampling hits target proportions, keeps the binding stratum whole, drops unnamed strata") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 8000 a + 1000 b + 300 c + 500 junk; targets 70/20/10 over a/b/c:
    // budget = min(8000/.7, 1000/.2, 300/.1) = 3000 (c binding, kept whole)
    val df = spark.range(0, 9800).toDF("id")
      .withColumn("src", when(col("id") < 8000, "a")
        .when(col("id") < 9000, "b")
        .when(col("id") < 9300, "c").otherwise("junk"))
    val out = Sampling.mixtureSample(df, "id", "src",
      Seq(("a", 0.7), ("b", 0.2), ("c", 0.1)), seed = 3)
    val by = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!by.contains("junk"), "unnamed stratum must be dropped")
    assert(by("c") == 300L, s"binding stratum kept whole, got ${by("c")}")
    // a keeps ≈ .7·3000/8000 = 26.25% (floor to 1/4096 grid), b ≈ 60%
    def cut(p: Double, c: Long) =
      math.floor(math.min(1.0, p * 3000.0 / c) * 4096.0) / 4096.0
    assert(math.abs(by("a").toDouble / 8000.0 - cut(0.7, 8000)) < 0.03,
      s"a fraction ${by("a") / 8000.0} vs ${cut(0.7, 8000)}")
    assert(math.abs(by("b").toDouble / 1000.0 - cut(0.2, 1000)) < 0.06,
      s"b fraction ${by("b") / 1000.0} vs ${cut(0.2, 1000)}")
    // deterministic under repartition and across runs
    val again = Sampling.mixtureSample(df.repartition(13), "id", "src",
      Seq(("a", 0.7), ("b", 0.2), ("c", 0.1)), seed = 3)
    assert(out.collect().map(_.getLong(0)).sorted
      .sameElements(again.collect().map(_.getLong(0)).sorted))
    // a named stratum with zero rows must fail loudly, not sample empty
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(df, "id", "src",
        Seq(("a", 0.5), ("nope", 0.5)), seed = 3)
    }
    assert(ex.getMessage.contains("nope"), ex.getMessage)
  }

  test("sequence packing: budget respected, complete, deterministic") {
    import spark.implicits._
    // token counts 1..400, some exceeding half the budget, one giant
    val docs = (0L until 2000L).map(i => (i, (i * 37 % 400) + 1))
      .toDF("id", "n_tokens")
      .union(Seq((9999L, 5000L)).toDF("id", "n_tokens")) // over budget alone
    val packed = Sampling.packSequences(docs, "id", "n_tokens",
      budget = 512, streams = 4, seed = 1)
    val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 2001 && rows.map(_._1).distinct.length == 2001,
      "every doc packed exactly once")
    val tokens = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byPack = rows.groupBy(_._2)
    byPack.foreach { case (pid, members) =>
      val total = members.map(m => tokens(m._1)).sum
      assert(total <= 512 || members.length == 1,
        s"pack $pid overflows with ${members.length} members / $total tokens")
      assert(members.map(_._3).sorted.toSeq == (0 until members.length),
        s"pack $pid positions not contiguous")
    }
    // over-budget doc is alone in its pack
    val giantPack = rows.find(_._1 == 9999L).get._2
    assert(byPack(giantPack).length == 1)
    // partition-layout independence
    val again = Sampling.packSequences(docs.repartition(23), "id", "n_tokens",
      budget = 512, streams = 4, seed = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == rows.toSet)
  }

  test("weighted sample is deterministic and weight-proportional") {
    // two strata: ids < 1000 weigh 100, the rest weigh 1 — expected
    // inclusion odds for a heavy id are ~100× a light id's
    val df = ids.limit(10000)
      .withColumn("w", when(col("id") < 1000, 100L).otherwise(1L))
    val s1 = Sampling.weightedSample(df, "id", "w", k = 500, seed = 7)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(df, "id", "w", k = 500, seed = 7)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must select the same rows")
    assert(s1.size == 500)
    val heavy = s1.count(_ < 1000)
    // heavy stratum holds 100k of 109k total weight → E[heavy] ≈ 459
    assert(heavy > 380 && heavy <= 500,
      s"heavy stratum got $heavy of 500, expected ≈459")
    val s3 = Sampling.weightedSample(df, "id", "w", k = 500, seed = 8)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(s1 != s3, "different seed must move the sample")
  }

  test("negative sampling: deterministic, no self-pairs, partners spread across the corpus") {
    val docs = spark.range(0, 5000).toDF("id")
    val a = Sampling.negativeSample(docs, "id", k = 4, bucketBits = 6, seed = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sampling.negativeSample(docs.repartition(13), "id", k = 4,
        bucketBits = 6, seed = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "same pairs regardless of partitioning")
    assert(a.forall { case (id, _, neg) => id != neg }, "no self-pairs")
    assert(a.forall { case (_, draw, _) => draw >= 0 && draw < 4 })
    // every row gets close to k draws (only self-collisions drop at
    // this corpus/bucket ratio), and partners hit many distinct reps
    assert(a.size > 5000 * 4 * 0.9, s"too many dropped draws: ${a.size}")
    val partners = a.map(_._3)
    assert(partners.size > 40, s"only ${partners.size} distinct partners for 64 buckets")
  }

  test("interleave is a deterministic permutation") {
    val r1 = Sampling.interleave(ids, "id", seed = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = Sampling.interleave(ids.repartition(13), "id", seed = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2, "same order regardless of partitioning")
    assert(r1.values.toSet == (0L until 100000L).toSet, "a complete permutation")
    // actually shuffled: the identity prefix is broken
    assert((0L until 100L).exists(i => r1(i) > 1000L))
  }
}

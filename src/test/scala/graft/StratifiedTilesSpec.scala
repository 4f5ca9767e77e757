package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Sampling

/** Exact per-stratum NTILE via the bin-histogram decomposition
  * (the CCNet head/middle/tail primitive): bit-equality with the
  * direct window form, the remainder rule, tie handling, the spike
  * guard, and null-score behavior.
  */
class StratifiedTilesSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def mkDf(n: Int) = (1 to n).map { i =>
    val lang = Seq("en", "de", "fr")(i % 3)
    // deterministic pseudo-scores with deliberate ties (i % 7)
    (i.toLong, lang, (i % 7).toDouble + (i % 3) * 0.25)
  }.toDF("doc_id", "lang", "score")

  test("bit-equal to ntile over (partition by stratum order by score, id)") {
    // 47, 48, 49: three stratum sizes that are ≠ 0 mod 3, = 0 mod 3,
    // and = 1 mod 3 across the strata — the remainder rule in all its
    // cases, with heavy score ties broken by doc_id
    for (n <- Seq(141, 144, 145); k <- Seq(2, 3, 5)) {
      val df = mkDf(n)
      val got = Sampling.stratifiedTiles(df, "lang", "score", "doc_id",
          tiles = k, binWidth = 0.5)
        .select(col("doc_id"), col("tile")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("tile", ntile(k).over(
          Window.partitionBy(col("lang"))
            .orderBy(col("score"), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("tile")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("a stratum smaller than the tile count still matches ntile") {
    val df = Seq((1L, "en", 1.0), (2L, "en", 2.0), (3L, "de", 1.0))
      .toDF("doc_id", "lang", "score")
    val got = Sampling.stratifiedTiles(df, "lang", "score", "doc_id",
        tiles = 5, binWidth = 1.0)
      .select(col("doc_id"), col("tile")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("tile", ntile(5).over(
        Window.partitionBy(col("lang"))
          .orderBy(col("score"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("tile")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("the spike-bin guard trips loudly, naming binWidth") {
    // constant score: every row of a stratum lands in ONE bin
    val df = (1 to 50).map(i => (i.toLong, "en", 1.0))
      .toDF("doc_id", "lang", "score")
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedTiles(df, "lang", "score", "doc_id",
        maxBinRows = 10L)
    }
    assert(e.getMessage.contains("binWidth"), e.getMessage)
  }

  test("null scores are dropped, not ranked") {
    val df = Seq((1L, "en", Some(1.0)), (2L, "en", None),
      (3L, "en", Some(2.0))).toDF("doc_id", "lang", "score")
    val out = Sampling.stratifiedTiles(df, "lang", "score", "doc_id",
      tiles = 2, binWidth = 1.0)
    assert(out.count() == 2L)
    assert(out.filter(col("doc_id") === 2L).count() == 0L)
  }

  test("sample.tiles plugin annotates metadata; batch-only guard") {
    import graft.model.Cdc
    import graft.ops.Registry
    val docs = Cdc.wrap(mkDf(30), "doc_id", "docs")
    val out = Registry.create("sample.tiles", Map(
        "stratum" -> ".Payload.After.lang",
        "score" -> ".Payload.After.score",
        "id" -> ".Payload.After.doc_id",
        "tiles" -> "3", "binWidth" -> "0.5"))
      .transform(docs)
    val tiles = out.select(col(Cdc.Metadata)).collect()
      .map(_.getMap[String, String](0)("tile").toLong)
    assert(tiles.length == 30)
    assert(tiles.toSet == Set(1L, 2L, 3L))

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val streamDf = Cdc.wrap(in.toDF().toDF("doc_id", "lang", "score"),
      "doc_id", "docs")
    val e = intercept[IllegalArgumentException] {
      Registry.create("sample.tiles", Map(
        "stratum" -> ".Payload.After.lang",
        "score" -> ".Payload.After.score",
        "id" -> ".Payload.After.doc_id")).transform(streamDf)
    }
    assert(e.getMessage.contains("sample.tiles is batch-only"))
  }
}

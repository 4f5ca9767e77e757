package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Graph, Profiling, Stats, Temporal => TOps}

/** Round-9 wave-C semantics: HITS, linear attribution, trimmed mean,
  * schema drift — each against a hand-computed reference.
  */
class HitsAttributionSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("hits: bipartite endorsement ranks the shared authority highest") {
    // hubs 1,2 both point at authority 10; hub 3 points at 11 only.
    // 10 collects two hub scores, 11 one -> auth(10) > auth(11);
    // after the auth half-step, hubs 1,2 (pointing at the stronger
    // authority) outrank 3.
    val e = Seq((1L, 10L), (2L, 10L), (3L, 11L)).toDF("s", "d")
    val out = Graph.hits(e, "s", "d", iterations = 3,
        deterministic = true)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(10L)._1 > out(11L)._1, out.toString)
    assert(out(1L)._2 > out(3L)._2)
    assert(out(1L)._2 == out(2L)._2) // symmetric hubs
    // L1 normalization: each side sums to 1
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-12)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-12)
    // pure hubs carry zero authority and vice versa
    assert(out(1L)._1 == 0.0 && out(10L)._2 == 0.0)
  }

  test("hits deterministic mode is repartition-invariant and near production") {
    val edges = (1 to 300).map(i =>
      ((i % 37).toLong, ((i * 11) % 23).toLong + 100L)).toDF("s", "d")
    def run(df: org.apache.spark.sql.DataFrame, det: Boolean) =
      Graph.hits(df, "s", "d", iterations = 3, deterministic = det)
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getDouble(2))).toMap
    val a = run(edges, det = true)
    val b = run(edges.repartition(13), det = true)
    assert(a == b, "deterministic folds must not depend on partitioning")
    val c = run(edges, det = false)
    assert(a.keySet == c.keySet)
    a.foreach { case (k, (au, hu)) =>
      assert(math.abs(au - c(k)._1) < 1e-12 &&
        math.abs(hu - c(k)._2) < 1e-12, s"node $k") }
  }

  test("linear attribution: equal split, window cut, none fallback") {
    // conv 100 at t=1000 (value 30): touches click@900, click@950,
    // view@990 -> click 2/3, view 1/3. conv 101 at t=5000: only touch
    // is at 900 (out of 1000-s window) -> none.
    val conv = Seq((100L, 1L, 1000L, 30.0), (101L, 1L, 5000L, 12.0))
      .toDF("cid", "uid", "ts", "value")
    val tch = Seq((1L, 900L, "click"), (1L, 950L, "click"),
      (1L, 990L, "view")).toDF("uid", "tts", "ch")
    val out = TOps.linearAttribution(conv, "cid", "uid", "ts", "value",
        tch, "uid", "tts", "ch", lookbackSeconds = 200L)
      .collect().map(r => (r.getLong(0), r.getString(3)) ->
        (r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(out((100L, "click")) == (2L, 3L, 30.0 * 2 / 3))
    assert(out((100L, "view")) == (1L, 3L, 30.0 / 3))
    assert(out((101L, "none")) == (0L, 0L, 12.0))
    // credits of one conversion sum to its value
    assert(math.abs(out((100L, "click"))._3 + out((100L, "view"))._3
      - 30.0) < 1e-12)
  }

  test("trimmed mean: hand case with the outlier cut, ppm boundary") {
    // 10 values: 1..9 and 1000; trim 0.1 -> k=1, drop 1 and 1000,
    // mean of 2..9 = 5.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _))
      .toDF("g", "v")
    val r = Stats.trimmedMean(df, Seq("g"), "v", 0.1).collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_trimmed_each") == 1L)
    assert(r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == 5.5, r.toString)
    // trim 0 = plain mean; floor semantics: 0.19 on n=10 still k=1
    val r0 = Stats.trimmedMean(df, Seq("g"), "v", 0.0).collect().head
    assert(r0.getAs[Long]("n_kept") == 10L)
    val r19 = Stats.trimmedMean(df, Seq("g"), "v", 0.19).collect().head
    assert(r19.getAs[Long]("n_trimmed_each") == 1L)
  }

  test("schema drift: added, removed, type_changed, unchanged") {
    val a = Seq((1L, "x", 2.0)).toDF("id", "name", "score")
    val b = a.drop("name")
      .withColumn("id", col("id").cast("int"))
      .withColumn("flag", lit(true))
    val out = Profiling.schemaDrift(a, b).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out("id") == ("bigint", "integer", "type_changed"))
    assert(out("name") == ("varchar", null, "removed"))
    assert(out("flag") == (null, "boolean", "added"))
    assert(out("score") == ("double", "double", "unchanged"))
  }
}

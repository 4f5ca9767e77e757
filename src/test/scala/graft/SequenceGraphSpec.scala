package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Graph, Sequences, Stats}

/** Semantics of the round-8 second continuation: triangle counting,
  * Mann–Whitney U, chi-square GOF, Markov transitions — each against
  * a hand-computed or brute-force reference.
  */
class SequenceGraphSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("triangles: K4 has 4, a square has 0, direction/dups ignored") {
    // K4 on {1,2,3,4} with edges in mixed direction + a duplicate,
    // plus a 4-cycle on {10,11,12,13} (no triangle).
    val edges = Seq(
      (1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 1L), // duplicate of (1,2) reversed
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)
    ).toDF("u", "v")
    val got = Graph.triangles(edges, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles equal brute force on a randomized graph") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for {
      u <- 0 until n; v <- (u + 1) until n
      if rnd.nextDouble() < 0.2
    } yield (u.toLong, v.toLong)).toVector
    val eset = edges.toSet
    val brute = (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
      c <- (b + 1) until n.toLong
      if eset((a, b)) && eset((a, c)) && eset((b, c))
    } yield (a, b, c)).toSet
    // feed in randomized direction
    val fed = edges.map { case (u, v) =>
      if (rnd.nextBoolean()) (u, v) else (v, u) }
    val got = Graph.triangles(fed.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the case actually exercises something
  }

  test("mann-whitney: hand case without ties") {
    // A = {1, 3}, B = {2, 4, 5}: ranks A = 1, 3 -> R1 = 4,
    // U1 = 4 - 2*3/2 = 1, so 2*U1 = 2. No ties -> tie_term = 0.
    val df = Seq(("a", 1.0, 0L), ("a", 3.0, 0L),
      ("a", 2.0, 1L), ("a", 4.0, 1L), ("a", 5.0, 1L)).toDF("g", "v", "grp")
    val r = Stats.mannWhitney(df, Seq("g"), "v", col("grp") === 0L)
      .collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[java.math.BigDecimal]("u1_x2").longValueExact == 2L)
    assert(r.getAs[java.math.BigDecimal]("tie_term").longValueExact == 0L)
  }

  test("mann-whitney: midranks with ties match the float formulation") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // discrete values force heavy ties
      val xs = Vector.fill(60)((rnd.nextInt(8).toDouble, rnd.nextInt(2)))
      val df = xs.map { case (v, g) => ("t", v, g.toLong) }.toDF("g", "v", "grp")
      val r = Stats.mannWhitney(df, Seq("g"), "v", col("grp") === 0L)
        .collect().head
      // float reference: midranks via sorting
      val sorted = xs.map(_._1).sorted
      def midrank(v: Double): Double = {
        val lo = sorted.indexOf(v); val hi = sorted.lastIndexOf(v)
        (lo + hi) / 2.0 + 1.0
      }
      val a = xs.filter(_._2 == 0).map(_._1)
      val b = xs.filter(_._2 == 1).map(_._1)
      val r1 = a.map(midrank).sum
      val u1 = r1 - a.size * (a.size + 1) / 2.0
      assert(r.getAs[java.math.BigDecimal]("u1_x2").doubleValue ==
        2.0 * u1, s"trial $trial")
      // significance agrees with the float z-test off the boundary
      val n = xs.size.toDouble
      val ties = xs.map(_._1).groupBy(identity).values
        .map(g => math.pow(g.size, 3) - g.size).sum
      val varU = a.size * b.size / 12.0 * ((n + 1) - ties / (n * (n - 1)))
      if (varU > 0) {
        val z = math.abs(u1 - a.size * b.size / 2.0) / math.sqrt(varU)
        val fl = z >= 1.96
        if (math.abs(z - 1.96) > 1e-6)
          assert(r.getAs[Boolean]("significant") == fl, s"trial $trial z=$z")
      }
    }
  }

  test("chisq gof: exact uniform is not significant, point mass is") {
    val uni = (0 until 700).map(i => ("u", (i % 7).toLong)).toDF("g", "c")
    val ru = Stats.chisqUniform(uni, Seq("g"), col("c"), k = 7)
      .collect().head
    assert(ru.getAs[Long]("stat_num") == 0L && !ru.getAs[Boolean]("significant"))
    val point = (0 until 700).map(_ => ("p", 3L)).toDF("g", "c")
    val rp = Stats.chisqUniform(point, Seq("g"), col("c"), k = 7)
      .collect().head
    // chi^2 = (k-1)*N = 4200 >> 12.592
    assert(rp.getAs[Boolean]("significant"))
    assert(math.abs(rp.getAs[Double]("chisq") - 4200.0) < 1e-9)
  }

  test("chisq gof: statistic equals the classic sum over cells") {
    val counts = Seq(12L, 9L, 15L, 7L, 11L, 13L, 10L)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c.toInt)(("g", i.toLong)) }
    val r = Stats.chisqUniform(rows.toDF("g", "c"), Seq("g"), col("c"), k = 7)
      .collect().head
    val nTot = counts.sum.toDouble
    val e = nTot / 7.0
    val classic = counts.map(o => (o - e) * (o - e) / e).sum
    assert(math.abs(r.getAs[Double]("chisq") - classic) < 1e-9)
  }

  test("transitions: hand sequence and row-conditional p") {
    // user 1: a b a b ; user 2: a b  ->  a->b x3, b->a x1
    val df = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 3L, "a"), (1L, 40L, 4L, "b"),
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b")).toDF("u", "ts", "id", "st")
    val got = Sequences.transitionMatrix(df, Seq("u"),
        col("ts"), col("id"), col("st"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("cnt"), r.getAs[Long]("prev_total"),
        r.getAs[Double]("p"))).toSet
    assert(got == Set(("a", "b", 3L, 3L, 1.0), ("b", "a", 1L, 1L, 1.0)))
  }

  test("transitions: tie column makes the sequence repartition-stable") {
    // same timestamp, order decided by id: a(id1) b(id2) c(id3)
    val df = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 10L, 3L, "c"))
      .toDF("u", "ts", "id", "st")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sequences.transitionMatrix(d, Seq("u"), col("ts"), col("id"), col("st"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val a = run(df)
    val b = run(df.repartition(7))
    assert(a == Set(("a", "b"), ("b", "c")) && a == b)
  }
}

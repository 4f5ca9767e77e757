package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Privacy, Stats, Temporal => TOps}

/** Randomized equivalence for the round-10 numeric operators: the
  * distributed result must match an independent in-JVM brute-force
  * reference on seeded random data (the RandomizedEquivSpec
  * discipline).
  */
class Round10EquivSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private val rnd = new scala.util.Random(20261014L)

  test("kendall tau-b matches the O(n^2) in-JVM reference") {
    val data = (1 to 120).map { _ =>
      ("g", (rnd.nextInt(25)).toLong, rnd.nextInt(12).toDouble)
    }
    val got = Stats.kendallTau(data.toDF("g", "x", "y"),
      Seq("g"), "x", "y").collect().head
    // brute force
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- data.indices; j <- (i + 1) until data.size) {
      val (_, xi, yi) = data(i); val (_, xj, yj) = data(j)
      if (xi == xj && yi == yj) { tx += 1; ty += 1 }
      else if (xi == xj) tx += 1
      else if (yi == yj) ty += 1
      else if ((xi < xj) == (yi < yj)) c += 1
      else d += 1
    }
    val np = data.size.toLong * (data.size - 1) / 2
    assert(got.getAs[Long]("concordant") == c)
    assert(got.getAs[Long]("discordant") == d)
    assert(got.getAs[Long]("ties_x") == tx)
    assert(got.getAs[Long]("ties_y") == ty)
    val tau = (c - d).toDouble / math.sqrt((np - tx).toDouble * (np - ty).toDouble)
    assert(math.abs(got.getAs[Double]("kendall_tau") - tau) < 1e-12)
  }

  test("holt matches the in-JVM sequential recursion") {
    val ys = (1 to 40).map(i => (i.toLong, rnd.nextDouble() * 100))
    val got = TOps.holt(ys.map { case (d, y) => ("s", d, y) }
        .toDF("g", "day", "y"),
      Seq("g"), "day", "y", alpha = 0.3, beta = 0.1).collect().head
    var l = ys.head._2; var b = 0.0
    for ((_, y) <- ys.tail) {
      val nl = 0.3 * y + (1.0 - 0.3) * (l + b)
      b = 0.1 * (nl - l) + (1.0 - 0.1) * b
      l = nl
    }
    assert(got.getAs[Double]("level") == l)
    assert(got.getAs[Double]("trend") == b)
    assert(got.getAs[Double]("forecast") == l + b)
  }

  test("t-closeness matches the in-JVM cumulative EMD") {
    val rows = (1 to 400).map(_ =>
      (s"q${rnd.nextInt(4)}", rnd.nextInt(6).toLong))
    val got = Privacy.tCloseness(rows.toDF("q", "b"), Seq("q"), "b")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val cats = rows.map(_._2).distinct.sorted
    val n = rows.size.toDouble
    val globalCum = cats.map(c => rows.count(_._2 <= c) / n)
    for ((q, grp) <- rows.groupBy(_._1)) {
      val ng = grp.size.toDouble
      val cum = cats.map(c => grp.count(_._2 <= c) / ng)
      val emd = cum.zip(globalCum).map { case (a, b) =>
        math.abs(a - b) }.sum / (cats.size - 1)
      assert(math.abs(got(q) - emd) < 1e-12, s"$q: ${got(q)} vs $emd")
    }
  }

  test("brown-forsythe matches the in-JVM median-deviation ANOVA") {
    val rows = (1 to 200).map(_ =>
      (s"g${rnd.nextInt(3)}", (rnd.nextInt(2000) - 500) / 100.0))
    val got = Stats.brownForsythe(rows.toDF("g", "v"), "g", "v")
      .collect().head
    // in-JVM: doubled cents deviations from the doubled median
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.size
      s((n + 1) / 2 - 1) + s(n / 2)
    }
    val byG = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val devs = byG.map { case (g, xs) =>
      val cents = xs.map(x => math.round(x._2 * 100))
      val m2 = med2(cents)
      g -> cents.map(c => math.abs(2 * c - m2))
    }
    val k = devs.size
    val nTot = devs.map(_._2.size).sum
    val sTot = devs.map(_._2.sum).sum
    val ssTot = devs.map(_._2.map(d => d * d).sum).sum
    var sqMeans = 0.0
    for ((_, ds) <- devs)
      sqMeans += ds.sum.toDouble * ds.sum.toDouble / ds.size.toDouble
    val grand = sTot.toDouble
    val ssb = sqMeans - grand * grand / nTot.toDouble
    val ssw = ssTot.toDouble - sqMeans
    val f = (ssb / (k - 1).toDouble) / (ssw / (nTot - k).toDouble)
    assert(got.getAs[Long]("k") == k && got.getAs[Long]("n") == nTot)
    assert(math.abs(got.getAs[Double]("f_stat") - f) < 1e-9,
      s"${got.getAs[Double]("f_stat")} vs $f")
  }
}

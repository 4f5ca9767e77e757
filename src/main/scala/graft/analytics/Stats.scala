package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistical screens over grouped data. The float trap
  * here is that mean/stddev of doubles depend on aggregation order, so
  * a naive z-score can hash-differ run to run (and engine to engine).
  * These operators stay in EXACT integer arithmetic end to end by
  * clearing denominators: scale values to integral decimals, and
  * compare (n·v − S)² against z²·(n·Sq − S²) — the z-score inequality
  * multiplied through by n², with S = Σv and Sq = Σv². No division,
  * no square root, no rounding anywhere, so partial aggregation order
  * cannot change a bit.
  */
object Stats {

  /** Rows whose value lies strictly more than `z` sample standard
    * deviations from their group's mean. `valueCol` is scaled by
    * 10^scale through decimal so the test is integer-exact (pick scale
    * = the data's decimal places). Variance here is the population
    * form (/n), cleared of its denominator.
    *
    * One shuffle: the group sums ride a window over the group key;
    * the flag is a row-local integer compare. At 100 TB this is the
    * same shape as any grouped aggregate — no second pass, no
    * collect.
    */
  def zscoreOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      z: Int = 3,
      scale: Int = 2): DataFrame = {
    require(z >= 1 && scale >= 0 && scale <= 9)
    val d38 = "decimal(38,0)"
    val v = (col(valueCol).cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast(d38)
    val w = Window.partitionBy(groupCols.map(col): _*)
    val withSums = df
      .withColumn("_v", v)
      .withColumn("_s", sum(col("_v")).over(w))
      .withColumn("_sq", sum(col("_v") * col("_v")).over(w))
      .withColumn("_n", count(lit(1)).over(w).cast(d38))
    // |v − S/n| > z·σ, σ² = Sq/n − (S/n)²  ⟺  (n·v − S)² > z²·(n·Sq − S²)
    val dev = col("_n") * col("_v") - col("_s")
    val spread = col("_n") * col("_sq") - col("_s") * col("_s")
    withSums
      .filter(dev * dev > lit(z.toLong * z.toLong).cast(d38) * spread)
      .drop("_v", "_s", "_sq", "_n")
  }
}

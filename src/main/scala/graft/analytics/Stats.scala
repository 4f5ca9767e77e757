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

  /** Robust (median/MAD) outlier screen: rows with
    * |v − median| > k · MAD, where median is the LOWER median (the
    * value at rank ⌈n/2⌉ of the sorted group) and MAD is the same
    * median of the absolute deviations. Unlike the z-score, one wild
    * point cannot drag the screen's own yardstick (50% breakdown).
    *
    * Everything runs on 10^scale-scaled integers: ranks select an
    * ACTUAL data value (no interpolation), deviations and the k·MAD
    * compare are integer arithmetic — bit-stable under any
    * partitioning, replayed exactly by the oracle. Degenerate groups
    * where over half the values are identical have MAD = 0 and flag
    * every differing row (the standard MAD caveat — screen first).
    *
    * Shape: two rank windows + two group-keyed joins, all on the
    * group key — the same shuffle reused, no broadcast of data-sized
    * state.
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 3,
      scale: Int = 2): DataFrame = {
    require(k >= 1 && scale >= 0 && scale <= 9)
    val g = groupCols.map(col)
    val vi = (col(valueCol).cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast("long")
    val wAll = Window.partitionBy(g: _*)
    val base = df.withColumn("_v", vi)
    val med = base
      .withColumn("_rn", row_number().over(wAll.orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_rn") === expr("(_n + 1) div 2"))
      .select(groupCols.map(col) :+ col("_v").as("_med"): _*)
    val withMed = base.join(med, groupCols)
    val mad = withMed
      .withColumn("_d", abs(col("_v") - col("_med")))
      .withColumn("_rn", row_number().over(wAll.orderBy(col("_d"))))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_rn") === expr("(_n + 1) div 2"))
      .select(groupCols.map(col) :+ col("_d").as("_mad"): _*)
    withMed.join(mad, groupCols)
      .filter(abs(col("_v") - col("_med")) > lit(k.toLong) * col("_mad"))
      .drop("_v", "_med", "_mad")
  }

  /** Rolling z-score anomaly screen: flag a row when its value
    * deviates more than k·σ from its OWN key's PRECEDING window of up
    * to `windowRows` observations — the temporal variant of
    * [[zscoreOutliers]], catching level shifts a global screen
    * averages away. The current row is deliberately EXCLUDED from its
    * frame: a sample containing the candidate bounds the achievable
    * z² at n−1 (a lone spike in a 10-row inclusive frame can never
    * exceed 3σ — the test would be vacuous), while scoring against
    * prior history makes a genuine level shift arbitrarily many σ.
    * Same division-free integer test on scaled values:
    * (n·vᵢ − s)² > k²·(n·sq − s²) over the frame, bit-stable under
    * any partitioning and replicated exactly in the oracle's integer
    * arithmetic — computed in decimal(38,0) (128-bit, the oracle's
    * HUGEINT domain), NOT long: the squared terms wrap 64 bits
    * already at |value| ≈ 10⁷ with scale=2, silently inverting the
    * flag. With |scaled value| ≤ 10¹⁹/(2·windowRows·k) every
    * intermediate stays below 10³⁸; values beyond that bound fail
    * loudly (raise_error) instead of corrupting the test. Rows with
    * fewer than `minObs` prior observations never flag (cold start),
    * and a zero-variance history flags any departure from it.
    *
    * Scale shape: ONE key shuffle + per-partition sort; the frame
    * sums are running window aggregates (no self-join, no per-row
    * re-scan). State per key is the frame, bounded by `windowRows`.
    */
  def rollingZOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      windowRows: Int = 10,
      k: Int = 3,
      scale: Int = 2,
      minObs: Int = 5): DataFrame = {
    require(windowRows >= 2 && k >= 1 && minObs >= 2 && minObs <= windowRows)
    require(scale >= 0 && scale <= 9)
    val viLong = (col(valueCol).cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast("long")
    // decimal(38,0)-safe magnitude bound: both test sides peak at
    // ~4·windowRows²·vi² (lhs) and ~2·k²·windowRows²·vi² (rhs)
    val maxVi = (1e19 / (2.0 * windowRows * k)).toLong
    val vi = when(abs(viLong) > maxVi,
        raise_error(concat(lit("rollingZOutliers: |value|*10^scale = "),
          abs(viLong), lit(s" exceeds the 128-bit-safe bound $maxVi " +
            s"(windowRows=$windowRows, k=$k, scale=$scale) — lower " +
            "scale or pre-clip the value column"))).cast("decimal(38,0)"))
      .otherwise(viLong.cast("decimal(38,0)"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-windowRows, -1)
    df.withColumn("_vi", vi)
      .withColumn("_s", sum(col("_vi")).over(w))
      .withColumn("_sq", sum(col("_vi") * col("_vi")).over(w))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_n") >= minObs &&
        (col("_n") * col("_vi") - col("_s")) *
          (col("_n") * col("_vi") - col("_s")) >
        lit(k.toLong * k) * (col("_n") * col("_sq") - col("_s") * col("_s")))
      .drop("_vi", "_s", "_sq", "_n")
  }

  /** Exponentially-decayed event count per group — the "trending"
    * score of a monitoring/rec pipeline: recent events count ~1, an
    * event `halfLife` old counts 1/2, and so on. Decay is BUCKETED to
    * whole half-lives on purpose: weight = 2^(−⌊(ref − t)/halfLife⌋),
    * a dyadic rational that doubles represent EXACTLY, so the grouped
    * sum is order-independent bit for bit (a continuous e^{−λΔt}
    * rides libm pow/exp, which is not correctly rounded — the sum
    * would then depend on partial-aggregation order and could never
    * carry a hash oracle). Events after `ref` and events beyond
    * `maxBuckets` half-lives are dropped (weight would round to
    * nothing anyway; 2^-60 ≈ 1e-18).
    *
    * Scale shape: row-local weight inside the scan, one grouped sum
    * with map-side partial aggregation — the cheapest aggregate shape
    * there is. Exactness bound: weights are multiples of
    * 2^−maxBuckets, so the double sum is exact while
    * n · 2^maxBuckets ≤ 2^53 (gate: 60 buckets ⇒ documented for
    * n ≤ ~8M rows per group at the default; raise buckets only with
    * that bound in mind).
    */
  def decayedCount(
      df: DataFrame,
      groupCols: Seq[String],
      tsCol: String,
      refTime: Long,
      halfLifeSeconds: Long,
      maxBuckets: Int = 60): DataFrame = {
    require(halfLifeSeconds > 0 && maxBuckets >= 1 && maxBuckets <= 60)
    val age = lit(refTime) - col(tsCol).cast("long")
    // integer `div`, not double `/`: the bucket must floor exactly at
    // every boundary (the DuckDB oracle uses `//` on integers)
    val bucket = expr(
      s"(${refTime}L - CAST($tsCol AS BIGINT)) div ${halfLifeSeconds}L")
    df.filter(age >= 0 && bucket < maxBuckets)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -bucket.cast("double"))).as("decayed_count"))
  }

  /** Winsorization at EXACT per-group order statistics: every value is
    * clipped to [v₍ₖlo₎, v₍ₖhi₎] where kq = ⌈q·n⌉ — the robust
    * pre-training clip for heavy-tailed features, deterministic
    * because an order statistic depends only on the value multiset
    * (tie order cannot change it) and clipping is pure
    * least/greatest, no arithmetic on the values at all.
    *
    * Scale shape: one per-group sort window for the ranks (the same
    * envelope as [[madOutliers]] — exact order statistics are a sort
    * per group by nature; use [[Sketch.histogramQuantiles]] when an
    * approximate cut is acceptable at 100 TB) and one bounds join
    * back (two rows per group — AQE broadcasts it).
    */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      loQ: Double = 0.05,
      hiQ: Double = 0.95): DataFrame = {
    require(loQ > 0 && hiQ < 1 && loQ < hiQ, s"bad quantiles [$loQ, $hiQ]")
    val g = groupCols.map(col)
    val wAll = Window.partitionBy(g: _*)
    val bounds = df
      .withColumn("_rn", row_number().over(wAll.orderBy(col(valueCol))))
      .withColumn("_n", count(lit(1)).over(wAll))
      .groupBy(g: _*)
      .agg(
        min(when(col("_rn") ===
          ceil(lit(loQ) * col("_n")).cast("long"), col(valueCol)))
          .as("_lo"),
        min(when(col("_rn") ===
          ceil(lit(hiQ) * col("_n")).cast("long"), col(valueCol)))
          .as("_hi"))
    df.join(bounds, groupCols)
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  /** Population Stability Index (the classic model-monitoring drift
    * score; see e.g. Yurdakul 2018 for its distribution): values are
    * binned into `bins` fixed widths over [lo, lo + bins·width)
    * (outliers clamped to the edge bins), the rows matching `refCond`
    * form the reference distribution and the rest the current one, and
    * PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i) with add-one (Laplace)
    * smoothing — p_i = (c_i + 1)/(n + bins) — so empty bins stay
    * finite. PSI ≳ 0.2 conventionally flags a shifted feature.
    *
    * Scale shape: ONE scan with conditional counts (no second pass per
    * side), one (group, bin) shuffle with map-side combine; everything
    * after operates on ≤ groups × bins integer rows. The float tail is
    * a per-group sequential fold in bin order over exactly `bins`
    * terms ([[HashFunctions.java_ln]] for glibc ln parity) — IEEE
    * deterministic under any partitioning, so the gate hash-checks it.
    */
  def psiDrift(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      refCond: Column,
      lo: Double,
      width: Double,
      bins: Int): DataFrame = {
    require(bins >= 2 && width > 0, s"bad geometry bins=$bins width=$width")
    val g = groupCols.map(col)
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(bins.toLong - 1))
    val counts = df.filter(col(valueCol).isNotNull)
      .select(g ++ Seq(bin.as("_bin"),
        when(refCond, lit(1L)).otherwise(lit(0L)).as("_isref")): _*)
      .groupBy(g :+ col("_bin"): _*)
      .agg(sum(col("_isref")).as("_cr"),
        (count(lit(1)) - sum(col("_isref"))).as("_cc"))
    // full bin grid per group: absent bins still carry a smoothed term
    val grid = counts.select(g: _*).distinct()
      .select(g :+ explode(sequence(lit(0L), lit(bins.toLong - 1)))
        .as("_bin"): _*)
    val full = grid
      .join(counts, groupCols :+ "_bin", "left_outer")
      .na.fill(0L, Seq("_cr", "_cc"))
    val totals = full.groupBy(g: _*)
      .agg(sum(col("_cr")).as("n_ref"), sum(col("_cc")).as("n_cur"))
    val b = lit(bins.toDouble)
    val p = (col("_cr") + lit(1L)).cast("double") /
      (col("n_ref").cast("double") + b)
    val q = (col("_cc") + lit(1L)).cast("double") /
      (col("n_cur").cast("double") + b)
    full.join(totals, groupCols)
      .withColumn("_term", (p - q) * HashFunctions.java_ln(p / q))
      .groupBy(g: _*)
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        aggregate(
          array_sort(collect_list(struct(col("_bin"), col("_term")))),
          lit(0.0),
          (acc, x) => acc + x.getField("_term")).as("psi"))
  }

  /** Per-group ordinary-least-squares trend line from closed-form
    * sums: slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), computed on
    * INTEGER sums (x re-based to each group's minimum, y scaled by
    * 10^scale through decimal) so numerator and denominator are exact
    * under any partitioning; the float slope/intercept derive from
    * the two exact longs in one fixed expression. The daily-revenue-
    * trend shape: one window (group min) + one aggregation.
    *
    * Exactness window: the rational is computed in decimal(38,0)
    * (never overflows in practice); the convenience `slope_num`/
    * `slope_den` LONG columns are populated only while the rational
    * fits a signed 64-bit value (n·Σxy ≲ 9.2e18, ~1e5 rows/group at
    * cent precision and x-spans of weeks) — beyond it they are null
    * and the boolean `exact` column flips to false LOUDLY instead of
    * a silent non-ANSI null-cast, while `slope`/`intercept` keep
    * flowing from the decimal rational (double-rounded, not lost).
    */
  def linearTrend(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      valueCol: String,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6)
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val wAll = Window.partitionBy(g: _*)
    val y = (col(valueCol).cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast(d38)
    val x = (col(xCol) - min(col(xCol)).over(wAll)).cast(d38)
    val s = df
      .withColumn("_x", x).withColumn("_y", y)
      .groupBy(g: _*)
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"))
    val numD = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val denD = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val maxL = lit("9223372036854775807").cast(d38)
    val inRange = abs(numD) <= maxL && abs(denD) <= maxL
    // the doubles derive from the DECIMAL rational (BigDecimal
    // round-to-nearest — identical to long→double inside the long
    // window, still correct beyond it), never from a silent long cast
    val slope = numD.cast("double") / denD.cast("double")
    val nD = col("_n").cast("double")
    val intercept = (col("_sy").cast("double") / nD -
      slope * col("_sx").cast("double") / nD) /
      lit(math.pow(10, scale))
    s.select(g ++ Seq(col("_n").cast("long").as("n"),
      when(inRange, numD.cast("long")).as("slope_num"),
      when(inRange, denD.cast("long")).as("slope_den"),
      inRange.as("exact"),
      (slope / lit(math.pow(10, scale))).as("slope"),
      intercept.as("intercept")): _*)
  }

  /** Two-proportion z-test per group (pooled variance), DIVISION- and
    * SQRT-FREE: clearing denominators turns |z| ≥ z_α into
    * `den · n · (x1·n2 − x2·n1)² ≥ num · n1·n2·x·(n−x)` with
    * z_α² = num/den exactly (α = 0.05 ⟹ 1.96² = 2401/625), evaluated
    * in decimal(38,0) — the significance flag is bit-stable under any
    * partitioning, like the [[zscoreOutliers]] family. Groups where
    * either variant is empty or the pooled rate is degenerate (x = 0
    * or x = n) report not-significant.
    *
    * One aggregation pass (4 conditional sums per group). The exact
    * path needs the cross terms inside 38 decimal digits — fine to
    * ~1e8 rows per variant per group; beyond that, sample or accept
    * the float z.
    */
  def abTest(
      df: DataFrame,
      groupCols: Seq[String],
      variantACond: Column,
      successCond: Column,
      zAlphaSqNum: Long = 2401,
      zAlphaSqDen: Long = 625): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val one = lit(1L)
    val zero = lit(0L)
    val agg = df.groupBy(g: _*)
      .agg(
        sum(when(variantACond, one).otherwise(zero)).as("n1"),
        sum(when(variantACond && successCond, one).otherwise(zero)).as("x1"),
        sum(when(!variantACond, one).otherwise(zero)).as("n2"),
        sum(when(!variantACond && successCond, one).otherwise(zero)).as("x2"))
    val n = (col("n1") + col("n2")).cast(d38)
    val x = (col("x1") + col("x2")).cast(d38)
    val diff = col("x1").cast(d38) * col("n2").cast(d38) -
      col("x2").cast(d38) * col("n1").cast(d38)
    val lhs = lit(zAlphaSqDen).cast(d38) * n * diff * diff
    val rhs = lit(zAlphaSqNum).cast(d38) *
      col("n1").cast(d38) * col("n2").cast(d38) * x * (n - x)
    agg.withColumn("significant",
      col("n1") > 0L && col("n2") > 0L &&
        x > lit(0L).cast(d38) && x < n && lhs >= rhs)
  }

  /** Kaplan–Meier survival curve (Kaplan & Meier 1958) per group from
    * right-censored durations: S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over
    * distinct event times, with censored subjects leaving the at-risk
    * set without contributing an event (their factor is exactly 1.0,
    * so censor-only times need no special case). The classic
    * churn/retention estimator.
    *
    * Scale shape: ONE subject-level aggregation collapses any row
    * count to ≤ groups × distinct-durations rows (integer d/c/n —
    * exact); the cumulative product then runs on that metadata-sized
    * table via a bounded self-join + t-ordered IEEE fold (bit-stable,
    * oracle-replayable — a window cumulative PRODUCT does not exist
    * as an exact primitive, and k² on ≤ thousands of distinct times
    * is free).
    */
  def kaplanMeier(
      df: DataFrame,
      groupCols: Seq[String],
      durationCol: String,
      observedCol: Column): DataFrame = {
    val g = groupCols.map(col)
    val agg = df
      .select(g ++ Seq(col(durationCol).as("t"),
        when(observedCol, lit(1L)).otherwise(lit(0L)).as("_o")): _*)
      .groupBy(g :+ col("t"): _*)
      .agg(sum(col("_o")).as("n_churn"),
        (count(lit(1)) - sum(col("_o"))).as("n_censored"))
    val wAll = Window.partitionBy(g: _*)
    val wPrior = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withN = agg
      .withColumn("_drop", col("n_churn") + col("n_censored"))
      .withColumn("n_risk",
        sum(col("_drop")).over(wAll) -
          coalesce(sum(col("_drop")).over(wPrior), lit(0L)))
      .drop("_drop")
      .withColumn("_f",
        lit(1.0) - col("n_churn").cast("double") /
          col("n_risk").cast("double"))
    val factors = withN.select(
      (groupCols.map(c => col(c).as(s"_g_$c")) :+
        col("t").as("_t2") :+ col("_f").as("_f2")): _*)
    val joinCond = groupCols.map(c => col(c) === col("_g_" + c))
      .foldLeft(col("_t2") <= col("t"))(_ && _)
    withN.join(factors, joinCond)
      .groupBy((g :+ col("t") :+ col("n_risk") :+ col("n_churn") :+
        col("n_censored")): _*)
      .agg(aggregate(
        array_sort(collect_list(struct(col("_t2"), col("_f2")))),
        lit(1.0),
        (acc, x) => acc * x.getField("_f2")).as("survival"))
      .select((g :+ col("t").as("t_days") :+ col("n_risk") :+
        col("n_churn") :+ col("n_censored") :+ col("survival")): _*)
  }

  /** One-sided CUSUM change detection (Page 1954) over a per-group
    * time series of INTEGER values (e.g. daily event counts), via the
    * scan-free identity CUSUM⁺_t = S_t − min_{j≤t} S_j with
    * S = Σ (x − k): the classic recursive max(0, prev + x − k) needs a
    * sequential scan, but the identity is a window cumulative sum plus
    * a running minimum — two frames on ONE key shuffle + sort, exact
    * integer arithmetic end to end (k is the reference level plus
    * slack, in the same integer units). `alarm` marks rows where the
    * statistic crosses `h` — a sustained upward level shift.
    */
  def cusum(
      df: DataFrame,
      groupCols: Seq[String],
      timeCol: String,
      valueCol: String,
      k: Long,
      h: Long): DataFrame = {
    val g = groupCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_s", sum(col(valueCol).cast("long") - lit(k)).over(wCum))
      .withColumn("_m", min(least(col("_s"), lit(0L))).over(wCum))
      .withColumn("cusum", col("_s") - col("_m"))
      .withColumn("alarm", col("cusum") > lit(h))
      .drop("_s", "_m")
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group — the
    * distribution-drift twin of [[psiDrift]] that needs NO binning
    * choice: D = max_x |F_ref(x) − F_cur(x)| over the empirical CDFs,
    * evaluated after ties at every distinct value. Reported as the
    * EXACT rational d_num/(n_ref·n_cur) (cross-multiplied in
    * decimal(38,0) — no division until the final display column, so
    * the statistic is bit-stable at any row count, including
    * n_ref·n_cur beyond 2^63) plus the conventional double `d`.
    *
    * Scale shape: one (group, value) pre-aggregation with map-side
    * combine, then one window pass over the ≤ |distinct values| rows
    * per group (single key shuffle — the same sort the ECDF needs).
    * No all-pairs, no resort per sample.
    */
  def ksTest(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      refCond: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .select(g ++ Seq(col(valueCol).as("_v"),
        when(refCond, lit(1L)).otherwise(lit(0L)).as("_isref")): _*)
      .groupBy(g :+ col("_v"): _*)
      .agg(sum(col("_isref")).as("_c1"),
        (count(lit(1)) - sum(col("_isref"))).as("_c2"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("_v"))
    val wAll = Window.partitionBy(g: _*)
    counts
      .withColumn("_r1", sum(col("_c1")).over(wCum))
      .withColumn("_r2", sum(col("_c2")).over(wCum))
      .withColumn("_n1", sum(col("_c1")).over(wAll))
      .withColumn("_n2", sum(col("_c2")).over(wAll))
      .withColumn("_diff", abs(
        col("_r1").cast(d38) * col("_n2").cast(d38) -
          col("_r2").cast(d38) * col("_n1").cast(d38)))
      .groupBy(g: _*)
      .agg(max(col("_diff")).as("_dn"),
        max(col("_n1")).as("n_ref"), max(col("_n2")).as("n_cur"))
      .select(g ++ Seq(
        col("_dn").as("d_num"),
        col("n_ref"), col("n_cur"),
        (col("_dn").cast("double") /
          (col("n_ref").cast("double") * col("n_cur").cast("double")))
          .as("d")): _*)
  }

  /** Precision/recall operating points of a scored classifier at fixed
    * decision thresholds: one row per threshold with the exact
    * confusion counts (tp, fp, fn, tn) over rows where both score and
    * label are non-null. Precision/recall/F1 are one division away —
    * the output stays integer so it is bit-exact under any
    * partitioning.
    *
    * Scale shape — deliberately NOT the sort-based curve: K thresholds
    * become 2K+2 conditional sums in a SINGLE aggregation pass (fully
    * map-side combined, one 1-row reduce), so a 100 TB score table is
    * scanned once with no global sort and no shuffle of data rows. The
    * sklearn-style every-unique-score curve needs a total order; at
    * pipeline scale you pick the operating grid up front.
    */
  def prCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val clean = df.filter(col(scoreCol).isNotNull && labelCol.isNotNull)
      .select(col(scoreCol).as("_s"), labelCol.as("_y"))
    val aggs: Seq[Column] =
      Seq(sum(when(col("_y"), lit(1L)).otherwise(lit(0L))).as("_pos"),
        sum(when(!col("_y"), lit(1L)).otherwise(lit(0L))).as("_neg")) ++
        thresholds.zipWithIndex.flatMap { case (th, i) => Seq(
          sum(when(col("_s") >= lit(th) && col("_y"), lit(1L))
            .otherwise(lit(0L))).as(s"_tp$i"),
          sum(when(col("_s") >= lit(th) && !col("_y"), lit(1L))
            .otherwise(lit(0L))).as(s"_fp$i")) }
    val base = clean.agg(aggs.head, aggs.tail: _*)
    base.select(explode(array(thresholds.zipWithIndex.map { case (th, i) =>
        struct(lit(th).as("threshold"),
          col(s"_tp$i").as("tp"), col(s"_fp$i").as("fp"),
          (col("_pos") - col(s"_tp$i")).as("fn"),
          (col("_neg") - col(s"_fp$i")).as("tn")) }: _*)).as("_r"))
      .select(col("_r.*"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) per group:
    * does the distribution of `valueCol` differ between variant A
    * (`variantACond`) and the rest? Rank-based, so it screens shifts
    * the mean-based [[abTest]] misses and is robust to outliers — the
    * standard nonparametric two-sample drift test.
    *
    * Exactness: midranks are kept DOUBLED (2·rank is always an
    * integer, ties or not), so R1, U1 and the tie correction
    * Σ(t³−t) are exact integers, and the normal-approximation
    * significance test is the usual |U−n1n2/2| ≥ z·σ with both the
    * division and the square root cleared:
    *
    *   (2U1 − n1n2)² · zDen · 3n(n−1)  ≥  zNum · n1n2 · (n(n+1)(n−1) − T)
    *
    * in decimal(38,0) — bit-stable under any partitioning. Magnitude
    * bound: the left side is ~(n/2)⁴·1875·n², inside 38 digits for
    * groups up to ~900k rows; beyond that ANSI decimal overflow fails
    * loudly (pre-aggregate or sample first — at that n the test's
    * power saturates anyway).
    *
    * Scale shape: one (group, value) aggregation collapses data rows
    * to ≤ groups × distinct-values rows; the rank cumsum is a window
    * on that collapsed table (one key shuffle + sort); the verdict is
    * a 1-row-per-group aggregate. No data-row sort.
    */
  def mannWhitney(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      variantACond: Column,
      zAlphaSqNum: Long = 2401,
      zAlphaSqDen: Long = 625): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .select(g ++ Seq(col(valueCol).as("_v"),
        when(variantACond, lit(1L)).otherwise(lit(0L)).as("_isa")): _*)
      .groupBy(g :+ col("_v"): _*)
      .agg(sum(col("_isa")).as("_a"), count(lit(1)).as("_t"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("_v"))
    // doubled midrank of every observation tied at _v:
    // 2·(count below) + (count at _v) + 1 — integer by construction
    val ranked = counts
      .withColumn("_below", sum(col("_t")).over(wCum) - col("_t"))
      .withColumn("_r2",
        lit(2L) * col("_below") + col("_t") + lit(1L))
    val agg = ranked.groupBy(g: _*).agg(
      sum(col("_a")).as("n1"),
      (sum(col("_t")) - sum(col("_a"))).as("n2"),
      sum(col("_a").cast(d38) * col("_r2").cast(d38)).as("_2r1"),
      sum(col("_t").cast(d38) * col("_t").cast(d38) *
        col("_t").cast(d38) - col("_t").cast(d38)).as("tie_term"))
    val n1 = col("n1").cast(d38)
    val n2 = col("n2").cast(d38)
    val n = n1 + n2
    val u1x2 = col("_2r1") - n1 * (n1 + lit(1L).cast(d38))
    val dev = u1x2 - n1 * n2
    val varTerm = n1 * n2 * (n * (n + lit(1L).cast(d38)) *
      (n - lit(1L).cast(d38)) - col("tie_term"))
    val lhs = dev * dev * lit(3L * zAlphaSqDen).cast(d38) *
      n * (n - lit(1L).cast(d38))
    val rhs = lit(zAlphaSqNum).cast(d38) * varTerm
    agg.select(g ++ Seq(
      col("n1"), col("n2"),
      u1x2.as("u1_x2"),
      col("tie_term"),
      (col("n1") > 0L && col("n2") > 0L &&
        varTerm > lit(0L).cast(d38) && lhs >= rhs).as("significant")): _*)
  }

  /** Chi-square goodness-of-fit against the UNIFORM distribution over
    * `k` categories, per group (Pearson 1900): are observations spread
    * evenly across k fixed buckets (day-of-week, hour-of-day, shard
    * id)? The load-balance / periodicity drift screen beside the
    * two-sample [[psiDrift]]/[[ksTest]].
    *
    * Exactness: with uniform expected counts E = N/k the statistic
    * collapses to χ² = k·ΣO²/N − N, so the decision χ² ≥ crit clears
    * its denominator to (k·ΣO² − N²)·critDen ≥ critNum·N — pure
    * integer, no division. Categories absent from the data contribute
    * O = 0 and need no row. Default crit = 12.592 (α = 0.05, df = 6 —
    * the day-of-week case); pass the critical value matching your
    * k − 1 degrees of freedom.
    *
    * Scale shape: one (group, category) count aggregation (map-side
    * combined), then a ≤ groups × k-row reduce. Scan-bound at 100 TB.
    */
  def chisqUniform(
      df: DataFrame,
      groupCols: Seq[String],
      catCol: Column,
      k: Int,
      critNum: Long = 12592,
      critDen: Long = 1000): DataFrame = {
    require(k >= 2, s"k=$k categories must be >= 2")
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val counts = df
      .select(g :+ catCol.as("_cat"): _*)
      .groupBy(g :+ col("_cat"): _*)
      .agg(count(lit(1)).as("_o"))
    val agg = counts.groupBy(g: _*).agg(
      sum(col("_o")).as("n"),
      sum(col("_o").cast(d38) * col("_o").cast(d38)).as("_ss"),
      count(lit(1)).as("n_cats"))
    val nD = col("n").cast(d38)
    val stat = lit(k.toLong).cast(d38) * col("_ss") - nD * nD
    agg.select(g ++ Seq(
      col("n"), col("n_cats"),
      stat.cast("long").as("stat_num"),
      (stat.cast("double") / col("n").cast("double")).as("chisq"),
      (col("n") > 0L &&
        stat * lit(critDen).cast(d38) >= lit(critNum).cast(d38) * nD)
        .as("significant")): _*)
  }

  /** Seasonal-naive anomaly screen: each period bucket's INTEGER value
    * is compared to the SAME bucket one season earlier (day vs day−7,
    * hour vs hour−168) — the classic baseline that [[cusum]] (level
    * shifts) and [[rollingZOutliers]] (local spikes) both miss when
    * the series is strongly periodic. A row alarms when the deviation
    * is large both relatively (|Δ|·relDen > relNum·prev) and
    * absolutely (|Δ| ≥ minAbs, suppressing noise on tiny counts) —
    * pure integer comparisons, bit-stable anywhere.
    *
    * The seasonal reference is fetched by VALUE, not row offset: a
    * range window frame pinned at exactly [−period, −period] (time
    * buckets are unique per group, so the frame sum IS the lagged
    * value, null when that bucket is missing — gaps never misalign
    * the season the way a row-lag would). One key shuffle + sort.
    */
  def seasonalNaive(
      df: DataFrame,
      groupCols: Seq[String],
      timeCol: String,
      valueCol: String,
      period: Long,
      minAbs: Long = 20L,
      relNum: Long = 3L,
      relDen: Long = 10L): DataFrame = {
    require(period >= 1, s"period=$period")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(timeCol))
      .rangeBetween(-period, -period)
    df.select(g ++ Seq(col(timeCol), col(valueCol)): _*)
      .withColumn("prev", sum(col(valueCol)).over(w))
      .withColumn("diff",
        when(col("prev").isNotNull, col(valueCol) - col("prev")))
      .withColumn("alarm",
        col("prev").isNotNull &&
          abs(col("diff")) * lit(relDen) > lit(relNum) * col("prev") &&
          abs(col("diff")) >= lit(minAbs))
  }

  /** Gini concentration coefficient per group over non-negative
    * INTEGER values (cents, counts): G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) /
    * (n·Σx) with x₍ᵢ₎ the ascending sort — how concentrated is
    * revenue per user, token mass per type, traffic per domain. The
    * numerator and denominator are EXACT integers (decimal(38,0)
    * internally; emitted as long — valid while n·max|x| stays under
    * 2^63, i.e. any realistic count/cents table); the coefficient is
    * one IEEE division at the end.
    *
    * Rank ties: Σ i·x over a run of EQUAL values is invariant under
    * any rank assignment inside the run, so `row_number` ordered by
    * value alone is deterministic here — no tie column needed.
    *
    * Scale shape: one key shuffle + sort for the rank window, then a
    * per-group aggregate. Same cost class as any grouped order
    * statistic; nothing quadratic.
    */
  def gini(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    val ranked = df.select(g :+ col(valueCol).as("_x"): _*)
      .withColumn("_i", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("_x"))))
    val agg = ranked.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      sum(col("_x")).as("total"),
      sum(col("_i").cast(d38) * col("_x").cast(d38)).as("_ix"))
    val nD = col("n").cast(d38)
    val num = lit(2L).cast(d38) * col("_ix") -
      (nD + lit(1L).cast(d38)) * col("total").cast(d38)
    val den = nD * col("total").cast(d38)
    agg.select(g ++ Seq(col("n"), col("total"),
      num.cast("long").as("gini_num"),
      den.cast("long").as("gini_den"),
      when(col("total") > 0L,
        num.cast("double") / den.cast("double")).as("gini")): _*)
  }

  /** Lag-k autocorrelation per group of an INTEGER time series:
    * Pearson correlation over the (x_t, x_{t−lag}) pairs where BOTH
    * buckets exist — the seasonal reference is fetched by VALUE (the
    * same pinned range frame [[seasonalNaive]] uses), so gaps drop
    * the pair instead of misaligning it. The five sums are exact
    * integers; r = num / √(den1·den2) is two IEEE casts, one multiply,
    * one sqrt, one divide — bit-replicable. Long-emission bound:
    * n·Σx² under 2^63 (counts: always; large cents: pre-scale).
    *
    * Scale shape: one key shuffle + sort for the window, one grouped
    * aggregate — the series table is already metadata-sized (one row
    * per time bucket).
    */
  def autocorr(
      df: DataFrame,
      groupCols: Seq[String],
      timeCol: String,
      valueCol: String,
      lag: Long): DataFrame = {
    require(lag >= 1, s"lag=$lag")
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(timeCol))
      .rangeBetween(-lag, -lag)
    val pairs = df.select(g ++ Seq(col(timeCol), col(valueCol).as("_y")): _*)
      .withColumn("_x", sum(col("_y")).over(w))
      .filter(col("_x").isNotNull)
    val agg = pairs.groupBy(g: _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(col("_x").cast(d38) * col("_y").cast(d38)).as("_sxy"),
      sum(col("_x").cast(d38) * col("_x").cast(d38)).as("_sxx"),
      sum(col("_y").cast(d38) * col("_y").cast(d38)).as("_syy"))
    val nD = col("n_pairs").cast(d38)
    val num = nD * col("_sxy") - col("_sx").cast(d38) * col("_sy").cast(d38)
    val den1 = nD * col("_sxx") - col("_sx").cast(d38) * col("_sx").cast(d38)
    val den2 = nD * col("_syy") - col("_sy").cast(d38) * col("_sy").cast(d38)
    agg.select(g ++ Seq(col("n_pairs"),
      num.cast("long").as("r_num"),
      den1.cast("long").as("r_den1"),
      den2.cast("long").as("r_den2"),
      when(den1 > lit(0L).cast(d38) && den2 > lit(0L).cast(d38),
        num.cast("double") /
          sqrt(den1.cast("double") * den2.cast("double"))).as("r")): _*)
  }

  /** Theil–Sen robust trend (Theil 1950; Sen 1968) per group: the
    * MEDIAN of all pairwise slopes (y_j − y_i)/(t_j − t_i) — immune
    * to outliers that wreck the OLS line from [[linearTrend]]. Each
    * slope is carried as the exact rational (Δy, Δt); the median is
    * selected positionally (lower median) over the order
    * (double-slope, Δy, Δt) — the double division is one exactly-
    * rounded IEEE op on integer inputs, so both engines sort
    * identically, and the trailing exact pair makes the order total.
    *
    * Scale contract: pairwise slopes are quadratic in the SERIES
    * length, which for a per-time-bucket series is calendar-bounded
    * metadata (a year of days = 365 rows → 66k slope rows per group),
    * not data-bounded — same bounded-self-join class as
    * [[kaplanMeier]]'s factor join. Do not feed raw event rows.
    */
  def theilSen(
      df: DataFrame,
      groupCols: Seq[String],
      timeCol: String,
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val base = df.select(g ++ Seq(col(timeCol).as("_t"),
      col(valueCol).as("_y")): _*)
    val a = base.select(groupCols.map(c => col(c).as(s"_ga_$c")) ++
      Seq(col("_t").as("_ti"), col("_y").as("_yi")): _*)
    val joinCond = groupCols.map(c => col(s"_ga_$c") === col(c))
      .foldLeft(col("_t") > col("_ti"))(_ && _)
    val slopes = base.join(a, joinCond)
      .select(g ++ Seq((col("_y") - col("_yi")).as("dy"),
        (col("_t") - col("_ti")).as("dt")): _*)
      .withColumn("_s", col("dy").cast("double") / col("dt").cast("double"))
    val wOrd = Window.partitionBy(g: _*)
      .orderBy(col("_s"), col("dy"), col("dt"))
    val wAll = Window.partitionBy(g: _*)
    slopes
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("n_slopes", count(lit(1)).over(wAll))
      // integer div — Spark's `/` on longs is DOUBLE division
      .filter(col("_rn") === expr("(n_slopes + 1) div 2"))
      .select(g ++ Seq(col("n_slopes"),
        col("dy").as("med_num"), col("dt").as("med_den"),
        col("_s").as("slope")): _*)
  }

  /** Benford leading-digit expectations, parts-per-million: round
    * (log10((d+1)/d) · 1e6) — fixed rational approximations so the
    * deviation test stays integer-exact (the irrational logs never
    * enter the arithmetic).
    */
  val benfordPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit screen (Newcomb 1881; Benford 1938) per
    * group over POSITIVE integer values (cents, counts): a fabricated
    * or truncated numeric column drifts from the log-digit law long
    * before summary stats notice. Each digit row flags when observed
    * count deviates more than `relNum/relDen` RELATIVELY from the
    * Benford expectation: |O·1e6 − N·ppm_d| · relDen > relNum · N ·
    * ppm_d — pure integer cross-multiplication against the fixed
    * [[benfordPpm]] rationals.
    *
    * Scale shape: leading digit is row-local string arithmetic; one
    * (group, digit) count aggregate (≤ groups × 9 rows) + a group
    * window for N. Scan-bound.
    */
  def benford(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      relNum: Long = 1L,
      relDen: Long = 5L): DataFrame = {
    val g = groupCols.map(col)
    val counts = df.filter(col(valueCol) > 0L)
      .select(g :+ substring(col(valueCol).cast("string"), 1, 1)
        .cast("long").as("digit"): _*)
      .groupBy(g :+ col("digit"): _*)
      .agg(count(lit(1)).as("observed"))
    val ppmCol = benfordPpm.foldLeft(lit(null).cast("long")) {
      case (acc, (d, ppm)) =>
        when(col("digit") === d.toLong, lit(ppm)).otherwise(acc)
    }
    val wAll = Window.partitionBy(g: _*)
    counts
      .withColumn("n", sum(col("observed")).over(wAll))
      .withColumn("expected_ppm", ppmCol)
      .withColumn("flag",
        abs(col("observed") * lit(1000000L) - col("n") * col("expected_ppm"))
          * lit(relDen) > lit(relNum) * col("n") * col("expected_ppm"))
  }

  /** EXACT rank-select quantiles per group: for each requested p, the
    * value at rank max(1, ⌈p·n⌉) of the ascending sort — the
    * lower-step empirical quantile, no interpolation, so the answer
    * is always a REAL data value and two engines agree bit-for-bit
    * (p·n and its ceiling are the same IEEE ops everywhere). The
    * exactness sibling of the mergeable histogram-quantile sketch in
    * [[Sketch]]: use this when the per-group sort is affordable and
    * the answer must be exact; use the sketch at 100 TB rollup scale.
    *
    * Scale shape: ONE key shuffle + sort carrying the data rows (the
    * unavoidable cost of exact order statistics), a rank window, and
    * a row-local k-way probe (each row tests the k requested ranks —
    * no join, no second pass).
    */
  def quantilesExact(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"ps=$ps")
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("value"))
    val wAll = Window.partitionBy(g: _*)
    df.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).as("value"): _*)
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(g ++ Seq(col("_rn"), col("n"), col("value"),
        explode(array(ps.map(lit): _*)).as("p")): _*)
      .filter(col("_rn") === greatest(lit(1L),
        ceil(col("p") * col("n")).cast("long")))
      .select(g ++ Seq(col("p"), col("n"), col("value")): _*)
  }

  /** RFM scoring (recency / frequency / monetary, the classic
    * direct-marketing segmentation): per entity, days since last
    * activity, activity count, and total spend in cents — each then
    * quintile-ranked WITHIN its segment with `ntile(5)` under a TOTAL
    * order (metric, entity id), so tile assignment is deterministic
    * under any partitioning. Tile orientation: 1 = best (most recent,
    * most frequent, highest spend). `rfm_cell` = r·100 + f·10 + m.
    *
    * Scale shape: one entity aggregation over the event scan, then
    * three ntile windows over the ENTITY table (rows = distinct
    * entities, not events), partitioned by `segmentCols` — which is
    * both the analytically right form (compare customers against
    * their peer segment) and what keeps the sort distributed. An
    * empty segment degrades to a single-partition global window —
    * fine for bounded entity tables, wrong at 100 TB; segment first.
    */
  def rfm(
      df: DataFrame,
      segmentCols: Seq[String],
      entityCols: Seq[String],
      timeCol: String,
      valueCentsCol: String,
      asOfSeconds: Long): DataFrame = {
    val g = (segmentCols ++ entityCols).map(col)
    val per = df.groupBy(g: _*).agg(
      ((lit(asOfSeconds) - max(col(timeCol))) / lit(86400L))
        .cast("long").as("recency_days"),
      count(lit(1)).as("frequency"),
      sum(col(valueCentsCol)).as("monetary_cents"))
    val seg = segmentCols.map(col)
    val tieCols = entityCols.map(col)
    val wR = Window.partitionBy(seg: _*)
      .orderBy(col("recency_days") +: tieCols: _*)
    val wF = Window.partitionBy(seg: _*)
      .orderBy(col("frequency").desc +: tieCols: _*)
    val wM = Window.partitionBy(seg: _*)
      .orderBy(col("monetary_cents").desc +: tieCols: _*)
    per
      .withColumn("r", ntile(5).over(wR))
      .withColumn("f", ntile(5).over(wF))
      .withColumn("m", ntile(5).over(wM))
      .withColumn("rfm_cell",
        (col("r") * 100 + col("f") * 10 + col("m")).cast("long"))
  }

  /** Tukey IQR fences per group (Tukey 1977, the box-plot rule):
    * quartiles by exact rank selection (the [[quantilesExact]] rule,
    * rank ⌈p·n⌉ — real data values), fences q1 − 1.5·IQR and
    * q3 + 1.5·IQR, and the count of rows outside them. The fence
    * arithmetic is four IEEE ops on two data values — bit-replicable.
    * The distribution-free cousin of [[zscoreOutliers]] (no moments,
    * so one wild value cannot widen its own fence).
    *
    * Scale shape: one key shuffle + sort for the rank window, the
    * quartile pick as a max(when(rn = target)) aggregate on the same
    * pass, then one broadcast join of the ≤ groups-row fence table
    * back onto the data for the outlier count (second scan — fence
    * membership needs the fences first; at 100 TB the rescan is
    * cheaper than sorting twice).
    */
  def tukeyFences(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("_v"))
    val wAll = Window.partitionBy(g: _*)
    val ranked = df.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).as("_v"): _*)
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_n", count(lit(1)).over(wAll))
    def at(p: Double) = max(when(col("_rn") === greatest(lit(1L),
      ceil(lit(p) * col("_n")).cast("long")), col("_v")))
    val fences = ranked.groupBy(g: _*)
      .agg(at(0.25).as("q1"), at(0.75).as("q3"))
      .withColumn("fence_lo",
        col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("fence_hi",
        col("q3") + lit(1.5) * (col("q3") - col("q1")))
    df.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).as("_v"): _*)
      .join(broadcast(fences), groupCols)
      .groupBy(g: _*)
      .agg(max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        max(col("fence_lo")).as("fence_lo"),
        max(col("fence_hi")).as("fence_hi"),
        sum(when(col("_v") < col("fence_lo") ||
          col("_v") > col("fence_hi"), lit(1L)).otherwise(lit(0L)))
          .as("n_outliers"))
  }

  /** Wald–Wolfowitz runs test (1940) per group: is the ORDER of a
    * binary sequence random, or do like outcomes clump? The screen
    * that catches autocorrelated residuals and regime stickiness that
    * every value-distribution test (PSI/KS/χ²) is blind to — those
    * would pass a sequence sorted by outcome. R = number of runs via
    * one lag window; the normal-approximation significance inequality
    * clears mean AND variance denominators:
    *
    *   (R·n − n − 2·n1·n2)² · (n−1) · zDen ≥ zNum · 2n1n2 · (2n1n2 − n)
    *
    * — exact decimal(38,0) integers; 2n1n2 ≤ n (degenerate variance)
    * reports not-significant.
    *
    * Scale shape: one key shuffle + sort for the lag window, then a
    * per-group aggregate. Same cost class as sessionize.
    */
  def runsTest(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: Column,
      tieCol: Column,
      cond: Column,
      zAlphaSqNum: Long = 2401,
      zAlphaSqDen: Long = 625): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("_ord"), col("_tie"))
    val seq0 = df.select(g ++ Seq(orderCol.as("_ord"), tieCol.as("_tie"),
        cond.cast("boolean").as("_x")): _*)
      .filter(col("_x").isNotNull)
      .withColumn("_prev", lag(col("_x"), 1).over(w))
    val agg = seq0.groupBy(g: _*).agg(
      sum(when(col("_x"), lit(1L)).otherwise(lit(0L))).as("n1"),
      sum(when(!col("_x"), lit(1L)).otherwise(lit(0L))).as("n2"),
      (lit(1L) + sum(when(col("_prev").isNotNull &&
        col("_prev") =!= col("_x"), lit(1L)).otherwise(lit(0L))))
        .as("runs"))
    val n1 = col("n1").cast(d38)
    val n2 = col("n2").cast(d38)
    val n = n1 + n2
    val two = lit(2L).cast(d38)
    val dev = col("runs").cast(d38) * n - n - two * n1 * n2
    val lhs = dev * dev * (n - lit(1L).cast(d38)) *
      lit(zAlphaSqDen).cast(d38)
    val rhs = lit(zAlphaSqNum).cast(d38) * two * n1 * n2 *
      (two * n1 * n2 - n)
    agg.withColumn("significant",
      col("n1") > 0L && col("n2") > 0L &&
        two * n1 * n2 > n && lhs >= rhs)
  }

  /** Seasonal-naive forecast backtest: predict each period bucket
    * from the SAME bucket one season earlier ([[seasonalNaive]]'s
    * reference, fetched by value so gaps drop the comparison), score
    * the whole history in one pass. Errors aggregate as exact
    * integers; MAE = Σ|e|/n and WAPE = Σ|e|/Σactual are one IEEE
    * division each — WAPE deliberately instead of MAPE (no per-row
    * division, no zero-actual blowups, the demand-forecasting
    * standard). This is the baseline every fancier forecaster must
    * beat; shipping the backtest IS the operator.
    */
  def forecastBacktest(
      df: DataFrame,
      groupCols: Seq[String],
      timeCol: String,
      valueCol: String,
      period: Long): DataFrame = {
    require(period >= 1, s"period=$period")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(timeCol))
      .rangeBetween(-period, -period)
    df.select(g ++ Seq(col(timeCol), col(valueCol).as("_x")): _*)
      .withColumn("_f", sum(col("_x")).over(w))
      .filter(col("_f").isNotNull)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_forecasts"),
        sum(abs(col("_x") - col("_f"))).as("sum_abs_err"),
        sum(col("_x")).as("sum_actual"))
      .withColumn("mae", col("sum_abs_err").cast("double") /
        col("n_forecasts").cast("double"))
      .withColumn("wape", when(col("sum_actual") > 0L,
        col("sum_abs_err").cast("double") /
          col("sum_actual").cast("double")))
  }

  /** Exact mode per group over an INTEGER value column: the most
    * frequent value, ties to the SMALLEST value — a total rule, so
    * the answer is deterministic under any partitioning (Spark's
    * built-in `mode()` leaves ties unspecified, which would
    * hash-differ run to run).
    *
    * Scale shape: one (group, value) count aggregate (map-side
    * combined), then a per-group `max(struct(count, −value))` — the
    * same single-pass argmax idiom as [[graft.analytics.Dedup]]'s
    * canonical selection. No sort, no window.
    */
  def exactMode(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(g: _*)
      .agg(max(struct(col("_c").as("_cnt"), (-col("_v")).as("_negv")))
        .as("_best"))
      .select(g ++ Seq((-col("_best._negv")).as("mode_value"),
        col("_best._cnt").as("mode_count")): _*)
  }

  /** Benjamini–Hochberg FDR control (Benjamini & Hochberg 1995) over
    * a table of test p-values: within each group, rank p ascending
    * and reject ranks ≤ k* where k* = max{k : p_(k)·m ≤ k·α} — the
    * multiple-comparisons gate every wide screen (one test per
    * segment/metric) needs before acting on its "significant" rows.
    * Both comparison sides are single double products of exact
    * inputs, so the verdict is deterministic; ties in p break by
    * `idCol` for a stable ranking.
    *
    * One rank window + one max window over the same partition — two
    * passes over a tests-sized (not data-sized) table.
    */
  def fdrBH(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      pCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha=$alpha")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(pCol), col(idCol))
    val wAll = Window.partitionBy(g: _*)
    df.filter(col(pCol).isNotNull)
      .withColumn("p_rank", row_number().over(w).cast("long"))
      .withColumn("_m", count(lit(1)).over(wAll))
      .withColumn("_ok",
        col(pCol) * col("_m").cast("double") <=
          col("p_rank").cast("double") * lit(alpha))
      .withColumn("k_star",
        coalesce(max(when(col("_ok"), col("p_rank"))).over(wAll), lit(0L)))
      .withColumn("rejected", col("p_rank") <= col("k_star"))
      .drop("_m", "_ok")
  }

  /** Additive seasonal phase effects: for a per-period series, the
    * mean at each seasonal phase (e.g. day-of-week for daily data)
    * against the group's overall mean — the decomposition's seasonal
    * component as exact decimal sums with one final division each,
    * the quantitative sibling of the seasonal-naive screen. Phase =
    * (period index) mod `phases`.
    */
  def seasonalEffect(
      df: DataFrame,
      groupCols: Seq[String],
      periodCol: String,
      valueCol: String,
      phases: Int,
      scale: Int = 2): DataFrame = {
    require(phases >= 2 && phases <= 1000, s"phases=$phases")
    require(scale >= 0 && scale <= 6)
    val d = s"decimal(18,$scale)"
    val g = groupCols.map(col)
    val phase = pmod(col(periodCol).cast("long"), lit(phases.toLong))
    val byPhase = df
      .withColumn("_ph", phase)
      .groupBy(g :+ col("_ph").as("phase"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(d)).as("_s"))
    val wAll = Window.partitionBy(g: _*)
    byPhase
      .withColumn("_tn", sum(col("n")).over(wAll))
      .withColumn("_ts", sum(col("_s")).over(wAll))
      .select(g ++ Seq(col("phase"), col("n"),
        (col("_s").cast("double") / col("n").cast("double"))
          .as("phase_mean"),
        (col("_ts").cast("double") / col("_tn").cast("double"))
          .as("overall_mean"),
        (col("_s").cast("double") / col("n").cast("double") -
          col("_ts").cast("double") / col("_tn").cast("double"))
          .as("effect")): _*)
  }

  /** Per-group Shannon entropy of a categorical column, with the
    * −Σ p·ln p sum folded in CATEGORY order (the PSI/pagerank
    * deterministic-fold device) so the double is bit-stable under any
    * partitioning — the class-balance / label-skew screen a training
    * mix needs next to [[abTest]] and the drift family. Also emits
    * the ln(k)-normalized form (1 = uniform over observed
    * categories).
    *
    * One (group, category) count aggregation + one per-group fold
    * over ≤ k category rows — the category table is metadata-sized.
    */
  def categoricalEntropy(
      df: DataFrame,
      groupCols: Seq[String],
      catCol: String): DataFrame = {
    import HashFunctions.java_ln
    val g = groupCols.map(col)
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(g :+ col(catCol).as("_c"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val wAll = Window.partitionBy(g: _*)
    val p = col("_cnt").cast("double") / col("_n").cast("double")
    counts
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .withColumn("_t", struct(col("_c").as("_k"),
        (lit(0.0) - p * java_ln(p)).as("_term")))
      .groupBy(g: _*)
      .agg(max(col("_n")).as("n"),
        count(lit(1)).as("n_categories"),
        aggregate(array_sort(collect_list(col("_t"))), lit(0.0),
          (acc, x) => acc + x.getField("_term")).as("entropy"))
      .withColumn("normalized",
        when(col("n_categories") > 1, col("entropy") /
          java_ln(col("n_categories").cast("double"))))
  }

  /** Per-group trimmed mean: drop the lowest and highest
    * ⌊trim·n⌋ values (ppm-exact: k = (n·round(trim·10⁶)) div 10⁶ —
    * integer arithmetic, no float cut), then average the survivors
    * through an exact decimal sum — the robust location estimate
    * between the mean (trim 0) and the median (trim → 0.5). The
    * row_number tie order inside equal values is arbitrary but
    * harmless: ties straddling the cut are equal VALUES, so the kept
    * multiset — and the exact sum — is deterministic anyway.
    *
    * One rank window + one aggregation; per-group sort contract as
    * all rank screens here.
    */
  def trimmedMean(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      trimFraction: Double,
      scale: Int = 2): DataFrame = {
    require(trimFraction >= 0 && trimFraction < 0.5, s"trim=$trimFraction")
    require(scale >= 0 && scale <= 6)
    val g = groupCols.map(col)
    val t = math.round(trimFraction * 1000000L)
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(g: _*)
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_k",
        ((col("_n") * lit(t) - pmod(col("_n") * lit(t), lit(1000000L)))
          / lit(1000000L)).cast("long"))
    ranked.filter(col("_rn") > col("_k") && col("_rn") <= col("_n") - col("_k"))
      .groupBy(g: _*)
      .agg(max(col("_n")).as("n"), max(col("_k")).as("n_trimmed_each"),
        count(lit(1)).as("n_kept"),
        sum(col(valueCol).cast(s"decimal(18,$scale)")).as("_s"))
      .select(g ++ Seq(col("n"), col("n_trimmed_each"), col("n_kept"),
        col("_s").cast("double").as("sum_kept"),
        (col("_s").cast("double") / col("n_kept").cast("double"))
          .as("trimmed_mean")): _*)
  }

  /** Per-group Spearman rank correlation (Spearman 1904) between two
    * columns, EXACT through the rank arithmetic: average ranks with
    * ties are half-integers, so DOUBLED average ranks
    * r2 = 2·rank_min + ties − 1 are integers (the ×2 cancels in ρ),
    * and the Pearson-on-ranks cross sums accumulate in decimal(38,0)
    * — bit-stable under any partitioning. ρ = num/√(denx·deny) is
    * derived from the exact pieces with the long→double rounding
    * route both engines share; the exact pieces themselves
    * (spearman_num, den_x, den_y) are emitted alongside (null past
    * the signed-64 window, like [[linearTrend]]).
    *
    * Scale shape: two rank windows (one shuffle on the group key,
    * in-partition sorts) + one hash aggregation. Ranks within a group
    * must fit one partition's sort — the per-group contract every
    * rank-based screen here shares.
    */
  def spearman(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    def r2(c: String): Column = {
      val wOrd = Window.partitionBy(g: _*).orderBy(col(c))
      val wTie = Window.partitionBy(g :+ col(c): _*)
      (lit(2) * rank().over(wOrd) + count(lit(1)).over(wTie) - lit(1))
        .cast("long")
    }
    val ranked = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn("_rx", r2(xCol))
      .withColumn("_ry", r2(yCol))
      .select(g ++ Seq(col("_rx").cast(d38).as("_rx"),
        col("_ry").cast(d38).as("_ry")): _*)
    val s = ranked.groupBy(g: _*)
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_rx")).as("_sx"), sum(col("_ry")).as("_sy"),
        sum(col("_rx") * col("_ry")).as("_sxy"),
        sum(col("_rx") * col("_rx")).as("_sxx"),
        sum(col("_ry") * col("_ry")).as("_syy"))
    val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val dx = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val dy = col("_n") * col("_syy") - col("_sy") * col("_sy")
    val maxL = lit("9223372036854775807").cast(d38)
    val inR = abs(num) <= maxL && dx <= maxL && dy <= maxL
    // in-window ρ routes decimal→long→double (round-to-nearest, the
    // route an independent HUGEINT replay shares); past the window it
    // degrades to the direct decimal→double cast — still correct to
    // an ulp, with the exact pieces nulled as the loud flag
    val rho = when(dx > 0 && dy > 0,
      when(inR,
        num.cast("long").cast("double") /
          sqrt(dx.cast("long").cast("double") *
            dy.cast("long").cast("double")))
        .otherwise(num.cast("double") /
          sqrt(dx.cast("double") * dy.cast("double"))))
    s.select(g ++ Seq(col("_n").cast("long").as("n"),
      when(inR, num.cast("long")).as("spearman_num"),
      when(inR, dx.cast("long")).as("den_x"),
      when(inR, dy.cast("long")).as("den_y"),
      rho.as("spearman")): _*)
  }

  /** Cohort retention matrix: each entity's cohort is the period of
    * its FIRST activity; cell (cohort, offset) counts the cohort's
    * entities active `offset` periods later — the canonical retention
    * triangle, in exact integers (period = floor(ts/periodSeconds)).
    *
    * Scale shape: one aggregation to per-(entity, period) activity,
    * one window min per entity (or self-aggregate), one final count
    * per (cohort, offset) — everything keyed, map-side combined; the
    * matrix itself is (periods²/2) rows, metadata-sized.
    */
  def cohortRetention(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds=$periodSeconds")
    // floor division via pmod (exact: the numerator is divisible, so
    // the intermediate double division cannot round)
    val ts = col(tsCol).cast("long")
    val p = ((ts - pmod(ts, lit(periodSeconds))) / lit(periodSeconds))
      .cast("long")
    val active = df.select(col(entityCol).as("_e"), p.as("_p"))
      .filter(col("_e").isNotNull)
      .distinct()
    val wE = Window.partitionBy(col("_e"))
    active
      .withColumn("_cohort", min(col("_p")).over(wE))
      .groupBy(col("_cohort").as("cohort"),
        (col("_p") - col("_cohort")).as("offset"))
      .agg(count(lit(1)).as("active_entities"))
  }

  /** Kendall's τ-b per group (Kendall 1938; tie-corrected form):
    * concordant/discordant pair counts over all within-group pairs,
    * τ_b = (C − D) / sqrt((n₀ − n₁)(n₀ − n₂)) with n₀ = n(n−1)/2 and
    * n₁/n₂ the tie terms — the rank-correlation complement to
    * [[spearman]] that is robust to monotone re-scaling AND reads
    * directly as a probability difference.
    *
    * Exactness: C, D and the tie terms are pure integer counts
    * (deterministic under any partitioning); τ derives from the exact
    * longs with one correctly-rounded sqrt — the same
    * integers-then-one-float discipline as [[mannWhitney]].
    *
    * Scale shape: the pair count is QUADRATIC per group by definition
    * (τ has no sufficient-statistic decomposition with ties) — and
    * the contract is ENFORCED: `maxGroupRows` (default 10⁵ ⇒ ≤ 5·10⁹
    * pairs per group) fails FAST with guidance before the self-join
    * runs when any group exceeds it (one map-side-combined count, a
    * 1-row probe — the linkage-`maxBlock` discipline; chunking can't
    * help here because τ needs every pair, so the right fix is
    * sampling, as the gate row does with the [[spearman]] user-parity
    * sample). The join is one keyed self-join on the group;
    * everything after is a map-side-combined count.
    */
  def kendallTau(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      maxGroupRows: Long = 100000L): DataFrame = {
    require(maxGroupRows >= 2, s"maxGroupRows=$maxGroupRows")
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val over = base.groupBy(g: _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxGroupRows).limit(1).collect()
    if (over.nonEmpty)
      throw new IllegalStateException(
        s"kendallTau: a group holds ${over.head.getLong(over.head.length - 1)} " +
          s"rows (> maxGroupRows=$maxGroupRows ⇒ >" +
          s" ${maxGroupRows * (maxGroupRows - 1) / 2} pairs). τ needs every" +
          " pair — SAMPLE the group first (the spearman-sample pattern)" +
          " or raise maxGroupRows explicitly.")
    val w = Window.partitionBy(g: _*)
      .orderBy(col(xCol), col(yCol))
    // fenced ([[Fences]], r18): rows feeds both sides of the pair
    // self-join — unfenced, the rank window (and its input scan)
    // replayed twice
    val rows = Fences.fence(base
      .withColumn("_i", row_number().over(w).cast("long"))
      .select(g ++ Seq(col(xCol).as("_x"), col(yCol).as("_y"),
        col("_i")): _*))
    val pairs = rows.as("a").join(
      rows.select(g ++ Seq(col("_x").as("_x2"), col("_y").as("_y2"),
        col("_i").as("_i2")): _*).as("b"),
      groupCols)
      .filter(col("_i") < col("_i2"))
    val cls = pairs.select(g ++ Seq(
      when(col("_x") === col("_x2") && col("_y") === col("_y2"), "txy")
        .when(col("_x") === col("_x2"), "tx")
        .when(col("_y") === col("_y2"), "ty")
        .when((col("_x") < col("_x2")) === (col("_y") < col("_y2")), "c")
        .otherwise("d").as("_cls")): _*)
    val agg = cls.groupBy(g: _*).agg(
      sum(when(col("_cls") === "c", 1L).otherwise(0L)).cast(d38).as("_c"),
      sum(when(col("_cls") === "d", 1L).otherwise(0L)).cast(d38).as("_d"),
      sum(when(col("_cls") === "tx", 1L).otherwise(0L)).cast(d38).as("_tx"),
      sum(when(col("_cls") === "ty", 1L).otherwise(0L)).cast(d38).as("_ty"),
      sum(when(col("_cls") === "txy", 1L).otherwise(0L)).cast(d38).as("_txy"),
      count(lit(1)).cast(d38).as("_np"))
    // pairs tied on x (incl. both) / tied on y (incl. both)
    val n1 = col("_tx") + col("_txy")
    val n2 = col("_ty") + col("_txy")
    val dx = col("_np") - n1
    val dy = col("_np") - n2
    agg.select(g ++ Seq(
      col("_c").cast("long").as("concordant"),
      col("_d").cast("long").as("discordant"),
      n1.cast("long").as("ties_x"),
      n2.cast("long").as("ties_y"),
      when(dx > 0 && dy > 0,
        (col("_c") - col("_d")).cast("long").cast("double") /
          sqrt(dx.cast("long").cast("double") *
            dy.cast("long").cast("double"))).as("kendall_tau")): _*)
  }

  /** One-way ANOVA F per grouping dimension (Fisher): between/within
    * variance ratio across the category groups, from the exact
    * per-category integer sums (value at cent precision). The classic
    * "does the mean differ across segments" screen next to the
    * rank-based [[mannWhitney]]/[[kruskalWallis]].
    *
    * Determinism: Σv and Σv² per category are exact decimals; the
    * categories fold into SSB/SSW in CATEGORY ORDER (sorted fold, the
    * deterministic-mode discipline) so the double accumulation replays
    * bit for bit; F is a fixed expression over those doubles.
    *
    * Scale shape: one keyed aggregation to category sums (map-side
    * combined), then a k-row sorted fold — the category table is
    * metadata-sized.
    */
  def anovaF(
      df: DataFrame,
      catCol: String,
      valueCol: String,
      scale: Int = 2): DataFrame = {
    val d38 = "decimal(38,0)"
    val v = (col(valueCol).cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast(d38)
    val cats = df.filter(col(valueCol).isNotNull && col(catCol).isNotNull)
      .select(col(catCol).as("_g"), v.as("_v"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).cast(d38).as("_n"), sum(col("_v")).as("_s"),
        sum(col("_v") * col("_v")).as("_ss"))
    // sorted fold over the k category rows: group means enter the
    // between-group sum in category order — bit-stable
    val folded = cats.agg(
      count(lit(1)).cast("long").as("k"),
      sum(col("_n")).cast("long").as("_nTot"),
      sum(col("_s")).as("_sTot"),
      sum(col("_ss")).as("_ssTot"),
      aggregate(
        array_sort(collect_list(struct(col("_g").as("_k"),
          (col("_s").cast("double") * col("_s").cast("double") /
            col("_n").cast("double")).as("_c")))),
        lit(0.0), (acc, x) => acc + x.getField("_c")).as("_sqMeans"))
    val nD = col("_nTot").cast("double")
    val grand = col("_sTot").cast("double")
    val ssb = col("_sqMeans") - grand * grand / nD
    val ssw = col("_ssTot").cast("double") - col("_sqMeans")
    val dfb = (col("k") - 1).cast("double")
    val dfw = (col("_nTot") - col("k")).cast("double")
    folded.select(col("k"), col("_nTot").as("n"),
      ssb.as("ss_between"), ssw.as("ss_within"),
      when(col("k") > 1 && col("_nTot") > col("k") && ssw > 0,
        (ssb / dfb) / (ssw / dfw)).as("f_stat"))
  }

  /** Brown–Forsythe variance-equality screen (Brown & Forsythe 1974;
    * Levene's test with the median center): one-way ANOVA F on the
    * absolute deviations from each category's MEDIAN — the robust
    * "are the spreads equal" companion to [[anovaF]]'s "are the means
    * equal".
    *
    * Exactness: deviations are computed on DOUBLED cent values
    * (|2·cents − doubled-median|, an exact integer even for
    * even-sized groups whose median falls between two observations),
    * so the entire deviation table is integer-exact and the F
    * statistic inherits [[anovaF]]'s category-order fold discipline.
    *
    * Scale shape: one per-category sort window for the two middle
    * ranks + the [[anovaF]] aggregation — two keyed shuffles total.
    */
  def brownForsythe(
      df: DataFrame,
      catCol: String,
      valueCol: String,
      scale: Int = 2): DataFrame = {
    val cents = (col(valueCol).cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast("long")
    val base = df.filter(col(valueCol).isNotNull && col(catCol).isNotNull)
      .select(col(catCol).as("_g"), cents.as("_c"))
    val wOrd = Window.partitionBy(col("_g")).orderBy(col("_c"))
    val wAll = Window.partitionBy(col("_g"))
    // doubled median = x_ceil(n/2) + x_(n/2+1) (1-indexed; equal for
    // odd n) — exact integer, no halving
    val ranked = base
      .withColumn("_rn", row_number().over(wOrd).cast("long"))
      .withColumn("_n", count(lit(1)).over(wAll))
    // subtract-pmod keeps the rank arithmetic in exact integers
    // (bare long/long division is double in Spark)
    val mid1 = ((col("_n") + 1 - pmod(col("_n") + 1, lit(2))) / 2)
      .cast("long")
    val mid2 = ((col("_n") - pmod(col("_n"), lit(2))) / 2 + 1).cast("long")
    val med2 = ranked
      .filter(col("_rn") === mid1 || col("_rn") === mid2)
      .groupBy(col("_g"))
      .agg((sum(col("_c")) * 2 / count(lit(1))).cast("long").as("_m2"))
    val dev = ranked.join(med2, "_g")
      .select(col("_g"), abs(col("_c") * 2 - col("_m2")).as("_d"))
    anovaF(dev, "_g", "_d", scale = 0)
  }

  /** Kruskal–Wallis H per grouping dimension (Kruskal & Wallis 1952,
    * tie-corrected): the k-sample generalization of [[mannWhitney]] —
    * are the value distributions across categories stochastically
    * equal? Doubled mid-ranks (2·rank + ties − 1) keep every rank sum
    * an exact integer; H and its tie correction derive from the exact
    * decimals in one fixed expression, with the per-category fold in
    * category order (bit-stable).
    *
    * Scale shape: ranks come from DISTINCT-value cumulative counts
    * (the [[mannWhitney]] 'below' trick) — the only window runs over
    * the distinct-value table, not the rows, so no row-level global
    * sort exists anywhere; plus one keyed aggregation and a k-row
    * fold.
    */
  def kruskalWallis(
      df: DataFrame,
      catCol: String,
      valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(valueCol).isNotNull && col(catCol).isNotNull)
      .select(col(catCol).as("_g"), col(valueCol).as("_v"))
    val cv = base.groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).cast(d38).as("_cnt"))
    val vs = cv.groupBy(col("_v")).agg(sum(col("_cnt")).as("_t"))
    // distinct-value table: metadata-sized relative to the rows, so
    // the single-partition cumulative window is bounded
    val wv = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rankOf = vs.withColumn("_below",
        coalesce(sum(col("_t")).over(wv), lit(0).cast(d38)))
      // doubled midrank of every row holding value v:
      // 2·min_rank + t − 1 = 2·below + t + 1 (exact integer)
      .withColumn("_r2", lit(2) * col("_below") + col("_t") + 1)
    val cats = cv.join(rankOf.select(col("_v"), col("_r2")), "_v")
      .groupBy(col("_g"))
      .agg(sum(col("_cnt")).as("_n"),
        sum(col("_cnt") * col("_r2")).as("_rs"))
    val ties = rankOf
      .agg(coalesce(sum(col("_t") * col("_t") * col("_t") - col("_t")),
        lit(0).cast(d38)).as("_tie"))
    val folded = cats.agg(
      count(lit(1)).cast("long").as("k"),
      sum(col("_n")).cast("long").as("_nTot"),
      aggregate(
        array_sort(collect_list(struct(col("_g").as("_k"),
          (col("_rs").cast("double") * col("_rs").cast("double") /
            col("_n").cast("double")).as("_c")))),
        lit(0.0), (acc, x) => acc + x.getField("_c")).as("_sqRank"))
      .crossJoin(broadcast(ties))
    val nD = col("_nTot").cast("double")
    // H on doubled ranks: Σ(R2_g)²/n_g = 4·ΣR_g²/n_g, so
    // H = 3/(N(N+1)) · Σ(R2)²/n − 3(N+1)
    val h = lit(3.0) / (nD * (nD + 1.0)) * col("_sqRank") -
      lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) -
      col("_tie").cast("double") / (nD * nD * nD - nD)
    folded.select(col("k"), col("_nTot").as("n"),
      col("_tie").cast("long").as("tie_term"),
      when(col("_nTot") > col("k") && corr > 0, h / corr).as("h_stat"))
  }
}

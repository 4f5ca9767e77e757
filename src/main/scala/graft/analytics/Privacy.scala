package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy screens for released aggregates. Training corpora and the
  * telemetry around them leak through small groups, not big ones —
  * k-anonymity (Sweeney 2002) is the standard release gate: no
  * quasi-identifier combination may describe fewer than k rows.
  */
object Privacy {

  /** k-anonymous generalization by a suppress-from-the-right ladder:
    * quasi-identifier groups with at least `minK` rows are released at
    * full detail (level 0); smaller groups are re-aggregated with the
    * LAST column generalized away (level 1), then the next (level 2),
    * and so on — the final remainder collapses into one fully-
    * suppressed row (level = #columns) regardless of size, so the
    * output always accounts for every input row. Order `qiCols` from
    * most essential to most expendable. Generalized columns are null;
    * counts are exact integers.
    *
    * Scale shape: ONE data-sized aggregation (the level-0 groupBy,
    * map-side combined); every further level re-aggregates only the
    * FAILING GROUP ROWS of the previous one — metadata-sized by
    * definition (each carries < minK source rows). The driver loop
    * runs #qiCols ≤ a handful of times over lazily-composed frames;
    * nothing collects.
    */
  def kAnonymize(
      df: DataFrame,
      qiCols: Seq[String],
      minK: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    require(minK >= 2, s"minK=$minK")
    def shaped(frame: DataFrame, level: Int): DataFrame = {
      val kept = qiCols.take(qiCols.size - level)
      frame.select(
        lit(level.toLong).as("level") +:
          qiCols.map(c => if (kept.contains(c)) col(c)
            else lit(null).cast(df.schema(c).dataType).as(c)) :+
          col("_n").as("n"): _*)
    }
    var cur = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    var out = shaped(cur.filter(col("_n") >= minK), 0)
    for (level <- 1 to qiCols.size) {
      val failing = cur.filter(col("_n") < minK)
      val kept = qiCols.take(qiCols.size - level)
      cur =
        if (kept.isEmpty) failing.agg(sum(col("_n")).as("_n"))
        else failing.groupBy(kept.map(col): _*)
          .agg(sum(col("_n")).as("_n"))
      val pass = if (level == qiCols.size) cur.filter(col("_n") > 0L)
        else cur.filter(col("_n") >= minK)
      out = out.unionByName(shaped(pass, level))
    }
    out
  }

  /** l-diversity check (Machanavajjhala et al. 2006): k-anonymity is
    * not enough when everyone in a released group shares the same
    * SENSITIVE value — each quasi-identifier group must also carry at
    * least `l` distinct sensitive values. One aggregation: group
    * size, exact distinct-sensitive count, and the pass flag.
    *
    * Scale shape: a single (qi..., sensitive) hash-distinct pass then
    * the per-group rollup — the same two-hash-aggregate shape as
    * [[Profiling.columnProfile]], map-side combined throughout.
    */
  def lDiversity(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      minL: Long): DataFrame = {
    require(qiCols.nonEmpty && minL >= 2, s"minL=$minL")
    df.groupBy(qiCols.map(col) :+ col(sensitiveCol).as("_s"): _*)
      .agg(count(lit(1)).as("_n"))
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("_n")).as("n"),
        count(lit(1)).as("diversity"))
      .withColumn("ok", col("diversity") >= minL)
  }

  /** Keyed pseudonymization: replace identifier columns with
    * splitmix64(fnv1a(value) + secret) — consistent within a release
    * (the same id maps to the same pseudonym everywhere, so joins and
    * group-bys still line up across tables) while unlinkable without
    * the secret. Row-local codegen'd hash chain, zero shuffle — rotate
    * the secret per release to prevent cross-release linkage. This is
    * pseudonymization (GDPR art. 4(5)), not anonymization: k-anonymity
    * / l-diversity on the quasi-identifiers still apply.
    */
  def pseudonymize(
      df: DataFrame,
      idCols: Seq[String],
      secret: Long): DataFrame = {
    import HashFunctions.{fnv1a_hash, splitmix64_hash}
    require(idCols.nonEmpty)
    idCols.foldLeft(df)((d, c) => d.withColumn(c,
      splitmix64_hash(fnv1a_hash(col(c).cast("string")) + lit(secret))))
  }

  /** Laplace-mechanism noisy counts: per-group count plus
    * Laplace(1/ε) noise drawn by inverse CDF from a SEEDED uniform
    * (splitmix64 over the group key), so the release is reproducible
    * and oracle-replayable — the machinery of differential privacy
    * with an honest caveat: seeded noise derived FROM the group key
    * is pseudo-random, not the fresh randomness formal ε-DP requires;
    * swap the seed source for a secure draw per release to get the
    * real guarantee. Noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) with
    * u = (low 52 hash bits)/2^52 — one codegen'd hash chain + one
    * `ln` (bit-compatible with the oracle's, like the BM25 scores).
    *
    * Scale shape: the count aggregate IS the work; noise is row-local
    * arithmetic on the ≤ groups-row result.
    */
  def noisyCount(
      df: DataFrame,
      groupCols: Seq[String],
      epsilon: Double,
      seed: Long): DataFrame = {
    require(epsilon > 0, s"epsilon=$epsilon")
    import HashFunctions.{fnv1a_hash, java_ln, splitmix64_hash}
    val g = groupCols.map(col)
    val counts = df.groupBy(g: _*).agg(count(lit(1)).as("n"))
    val keyStr = concat_ws("|", g.map(_.cast("string")): _*)
    val u = splitmix64_hash(fnv1a_hash(keyStr) + lit(seed))
      .bitwiseAND(lit((1L << 52) - 1)).cast("double") /
      lit(4503599627370496.0)
    val c = u - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(c) *
      java_ln(lit(1.0) - lit(2.0) * abs(c))
    counts
      .withColumn("noise", noise)
      .withColumn("noisy_n", col("n").cast("double") + col("noise"))
  }

  /** t-closeness audit per quasi-identifier group (Li, Li &
    * Venkatasubramanian, ICDE 2007) for an ORDERED sensitive
    * attribute: the Earth-Mover's Distance between each group's
    * sensitive-value distribution and the global one, computed as
    * Σ_i |cumP_i − cumQ_i| / (m − 1) over the m ordered categories —
    * the stronger-than-l-diversity disclosure screen (a group can be
    * diverse yet skewed toward one end of the value range).
    *
    * Exactness: cumulative counts are integers; each |cumP − cumQ|
    * term clears denominators to |cum_g·N − cum_all·n_g| in
    * decimal(38,0), and the EMD is ONE division of the exact sum by
    * n_g·N·(m−1). Bit-stable under any partitioning.
    *
    * Scale shape: one (group × category) count + one global category
    * count; the cumulative window runs over the group×category GRID
    * (metadata-sized — groups × m rows, never the data), built by a
    * broadcast cross of the two distinct sets so empty cells
    * cumulate correctly.
    */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[String],
      sensCol: String): DataFrame = {
    require(qiCols.nonEmpty, "need quasi-identifier columns")
    val d38 = "decimal(38,0)"
    val g = qiCols.map(col)
    val base = df.filter(col(sensCol).isNotNull)
      .select(g :+ col(sensCol).as("_s"): _*)
    val cell = base.groupBy(g :+ col("_s"): _*)
      .agg(count(lit(1)).cast(d38).as("_c"))
    val groups = cell.groupBy(g: _*).agg(sum(col("_c")).as("_ng"))
    val cats = cell.groupBy(col("_s")).agg(sum(col("_c")).as("_cAll"))
    val nTot = cats.agg(sum(col("_cAll")).as("_nTot"))
    val m = cats.agg(count(lit(1)).as("_m"))
    // full grid: every (group, category) — zero cells must cumulate
    val grid = groups.crossJoin(broadcast(cats))
      .join(cell, qiCols :+ "_s", "left")
      .withColumn("_c", coalesce(col("_c"), lit(0).cast(d38)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = grid
      .withColumn("_cumG", sum(col("_c")).over(w))
      .withColumn("_cumAll", sum(col("_cAll")).over(w))
    cum.crossJoin(broadcast(nTot))
      .groupBy((g :+ col("_ng") :+ col("_nTot")): _*)
      .agg(sum(abs(col("_cumG") * col("_nTot") -
        col("_cumAll") * col("_ng"))).as("_num"))
      .crossJoin(broadcast(m))
      .select(g ++ Seq(col("_ng").cast("long").as("n"),
        when(col("_m") > 1,
          col("_num").cast("double") /
            (col("_ng") * col("_nTot") * (col("_m") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("emd")): _*)
  }
}

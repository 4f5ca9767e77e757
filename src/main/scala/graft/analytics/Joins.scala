package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import HashFunctions.splitmix64_hash

/** Skew utilities for equi-joins. AQE's skew-join splitting handles
  * moderate skew at runtime; explicit salting is the tool for the
  * pathological case — one key holding a double-digit percentage of a
  * 100 TB fact side, where a single post-split partition still
  * overwhelms a task. Salting trades `salt`× replication of the
  * (small) build side for an even fan-out of the hot key.
  */
object Joins {

  /** Equi-join with the probe side salted `salt` ways: probe rows get
    * a deterministic salt from splitmix64(idCol) (reproducible across
    * runs/partitionings, unlike rand()); build rows replicate into
    * every salt bucket; the join key becomes (key, salt). The result
    * is EXACTLY the plain join's multiset — the `join_salted` gate row
    * proves the invariance against a plain-join oracle.
    *
    * `right` must be the smaller side (it is replicated salt×).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      idCol: String,
      salt: Int): DataFrame = {
    require(salt >= 1 && salt <= 4096, s"salt=$salt out of range")
    val l = left.withColumn("_salt",
      pmod(splitmix64_hash(col(idCol)), lit(salt.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, l("_salt") === r("_salt") && col(leftKey) === col(rightKey))
      .drop("_salt")
  }

  /** EXACT semi-join with a Bloom-filter prefilter: fact rows whose
    * key is definitively absent from `dim` (no false negatives) are
    * dropped at the scan, BEFORE any shuffle; only probable matches —
    * true hits plus an fpp-fraction — reach the confirming left-semi
    * join, so the result equals the plain semi-join exactly (the
    * `join_bloom_prune` gate row proves it against an IN-subquery
    * oracle).
    *
    * This is the runtime-filter idea (Spark's
    * spark.sql.optimizer.runtime.bloomFilter applies it planner-side
    * when statistics justify it) made explicit and composable: at
    * 100 TB a selective dim cuts the fact side's shuffle volume by the
    * dim's selectivity, and the codegen'd probe
    * ([[HashFunctions.bloom_might_contain]]) rides inside the scan's
    * whole-stage pipeline. The filter costs n·1.44·log2(1/fpp) bits
    * (~12 MB per 10^7 keys at 1%), built by treeAggregate over the
    * dim's DISTINCT keys.
    *
    * Null fact keys are dropped, matching IN-subquery semantics
    * (NULL never equals anything).
    */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val keys = dim.select(col(dimKey).cast("string").as("_k"))
      .filter(col("_k").isNotNull).distinct()
    // expectedItems from a count of the deduped keys — one small extra
    // job on the (by assumption small) dim side
    val n = math.max(keys.count(), 1L)
    val bf = keys.rdd.treeAggregate(BloomFilter.create(n, fpp))(
      (f, row) => {
        f.putBinary(row.getString(0)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        f
      },
      (a, b) => a.mergeInPlace(b))
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = HashFunctions.bloom_might_contain(
      col(factKey).cast("string"), bos.toByteArray)
    fact.filter(coalesce(probe, lit(false)))
      .join(keys, col(factKey).cast("string") === col("_k"), "left_semi")
  }

  /** Per-group 2-D skyline (Börzsönyi, Kossmann & Stocker, ICDE
    * 2001): rows not DOMINATED in the maximize-both sense — p
    * dominates q when p ≥ q in both dims and > in at least one
    * (duplicate points survive together). The Pareto-frontier query
    * of every "best price for the size" analysis.
    *
    * Sort-free-of-quadratics formulation: per (group, x) class the
    * class max-y, a prefix max over classes with strictly larger x
    * (one row per distinct x — metadata-sized relative to the data),
    * then one equi-join back: q is dominated iff prefixMax(x' > x)
    * ≥ q.y (strict x beats, tied-or-better y) or classMax(x) > q.y
    * (tied x, strictly better y). Two keyed shuffles, no self-join —
    * the classic nested-loop skyline is quadratic; this is n log n.
    * Exact comparisons only, so the surviving SET is deterministic
    * under any partitioning.
    */
  def skyline2D(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    val g = groupCols.map(col)
    val cls = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(g :+ col(xCol): _*)
      .agg(max(col(yCol)).as("_clsMax"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col(xCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cls2 = cls.withColumn("_prefMax", max(col("_clsMax")).over(w))
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .join(cls2, groupCols :+ xCol)
      .filter(!((col("_prefMax").isNotNull && col("_prefMax") >= col(yCol)) ||
        col("_clsMax") > col(yCol)))
      .drop("_clsMax", "_prefMax")
  }
}

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
}

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
}

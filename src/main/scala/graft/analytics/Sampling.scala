package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import HashFunctions._

/** Deterministic sampling and ordering for training-data pipelines.
  *
  * Both operators key on `splitmix64(id + seed)` rather than
  * `rand()`/`xxhash64`: the result is reproducible across runs,
  * engines, and partitionings (a training mix must be re-derivable
  * from the recipe), and the DuckDB oracle replicates the identical
  * arithmetic. Everything is row-local except the rank's range
  * exchange.
  */
object Sampling {

  /** 4096 hash buckets via bit extraction — shift/mask is identical on
    * signed and unsigned interpretations, so engine parity is trivial.
    */
  private val BucketBits = 12
  private val Buckets = 1 << BucketBits // 4096

  def bucketOf(id: Column, seed: Long): Column =
    shiftrightunsigned(splitmix64_hash(id + lit(seed)), BucketBits)
      .bitwiseAND(lit((Buckets - 1).toLong))

  /** Deterministic hash sample: keeps ≈`fraction` of rows (granularity
    * 1/4096), the SAME rows every run for a given seed. A row-local
    * filter inside the scan — no shuffle, no RNG state, prunable.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val cut = math.floor(fraction * Buckets).toLong
    df.filter(bucketOf(col(idCol), seed) < lit(cut))
  }

  /** Deterministic global interleave: every row gets a stable
    * pseudo-random position (dense rank of its hash; ties broken by
    * id). Training pipelines read in `shuffle_rank` order to decorrel-
    * ate adjacent source documents. The sort is a range exchange on an
    * 8-byte key — at cluster scale Spark samples range bounds and
    * sorts each partition independently (the standard total-order
    * shuffle); no driver-side collection anywhere.
    */
  def interleave(df: DataFrame, idCol: String, seed: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(splitmix64_hash(col(idCol) + lit(seed)).asc, col(idCol).asc)
    df.select(col(idCol), (row_number().over(w) - 1).cast("long").as("shuffle_rank"))
  }
}

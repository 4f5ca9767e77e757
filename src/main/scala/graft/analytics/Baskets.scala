package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity: frequent co-occurring item pairs with
  * Apriori pruning (Agrawal & Srikant, VLDB 1994 — the downward-closure
  * property: a pair can only be frequent if both items are). Reference
  * scope: co-occurrence analytics over transactional logs, the basket
  * form of the collocation/PMI surface already in [[Text]].
  */
object Baskets {

  /** All item pairs appearing together in at least `minSupport`
    * baskets, with each item's own basket support carried alongside
    * (the integer inputs for lift/confidence downstream — the output
    * stays pure counts so it is exact under any partitioning).
    *
    * Dataflow: distinct (basket, item) presence → item support
    * aggregate → support prefilter (the Apriori prune) → within-basket
    * self-join (`item_a < item_b`, each unordered pair generated once)
    * → pair count filter.
    *
    * Scale shape: the prune is the point at 100 TB — the self-join
    * explodes each basket quadratically in its PRUNED size only, and
    * the long tail of rare items (the bulk of an open vocabulary)
    * never reaches the join. The join itself is an equi-join on the
    * basket key (one shuffle, AQE-broadcastable when the pruned side
    * collapses); there is no all-pairs product across baskets. For
    * adversarial baskets containing thousands of surviving items,
    * bound the basket like [[Dedup.boundedSelfPairs]] does for LSH
    * buckets — at `minSupport` thresholds that matter analytically,
    * pruned baskets are small by construction.
    */
  def frequentPairs(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport must be >= 1")
    val items = df.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val supp = items.groupBy(col("_i"))
      .agg(count(lit(1)).as("_supp"))
      .filter(col("_supp") >= minSupport)
    val pruned = items.join(supp, Seq("_i"))
    val a = pruned.select(col("_b").as("_ba"), col("_i").as("item_a"),
      col("_supp").as("_sa"))
    val b = pruned.select(col("_b").as("_bb"), col("_i").as("item_b"),
      col("_supp").as("_sb"))
    a.join(b, col("_ba") === col("_bb") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"),
        max(col("_sa")).as("supp_a"),
        max(col("_sb")).as("supp_b"))
      .filter(col("pair_cnt") >= minSupport)
  }
}

package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Fences.fence

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
    // Fence the multiply-referenced tables ([[Fences]]): `items` feeds
    // the support aggregate AND the prune join, `supp` the prune plus
    // both output attach joins, `pruned` both sides of the
    // within-basket self-join — unfenced, the input scan + distinct
    // exchange derived FOUR times per call (Explain-audited on the r18
    // gate: 4 identical parquet scans + 4 distinct aggregates in one
    // basket_pairs plan; ReuseExchange does not fire because the alias
    // projections de-canonicalize the copies).
    val items = fence(df.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct())
    val supp = fence(items.groupBy(col("_i"))
      .agg(count(lit(1)).as("_supp")))
    // Apriori prune as a SEMI-join: the support value is NOT carried
    // through the pair machinery (guide §2.3 — shuffle fewer bytes).
    // The old shape shipped (_sa, _sb) on every self-join output row
    // into the pair exchange, where the map-side combine reduces
    // almost nothing (pair keys are near-unique: 1.20M join rows →
    // 1.196M groups on the r18 gate), so the two support columns were
    // +16 bytes on ~every shuffled row, folded by a max() that only
    // ever saw one value. Supports are re-attached AFTER the
    // `pair_cnt >= minSupport` filter, where the stream side is
    // output-sized (3.6k rows vs 1.2M on the gate) — pair_cnt >=
    // minSupport implies both items' supports pass, so the semi-join
    // prune + late attach is row-identical to the old inner join.
    val pruned = fence(items.join(
      supp.filter(col("_supp") >= minSupport).select(col("_i")),
      Seq("_i"), "left_semi"))
    // both sides project the SAME (basket, item) pair from the same
    // fenced leaf so the two exchanges canonicalize identically and
    // ReuseExchange ships the self-join input once
    val a = pruned.select(col("_b").as("_ba"), col("_i").as("item_a"))
    val b = pruned.select(col("_b").as("_bb"), col("_i").as("item_b"))
    a.join(b, col("_ba") === col("_bb") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minSupport)
      .join(supp.select(col("_i").as("item_a"), col("_supp").as("supp_a")),
        Seq("item_a"))
      .join(supp.select(col("_i").as("item_b"), col("_supp").as("supp_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("supp_a"), col("supp_b"))
  }

  /** Association rules from [[frequentPairs]]: both directions of
    * every frequent pair as antecedent → consequent with the classic
    * strengths — confidence = supp(AB)/supp(A), lift =
    * confidence / (supp(B)/N) = supp(AB)·N / (supp(A)·supp(B)) — and
    * the rule kept when confidence ≥ `minConfidence` by EXACT
    * cross-multiply (pair_cnt·10⁶ ≥ conf_ppm·supp_A: the verdict is
    * integer, only the reported strengths are one-division doubles).
    *
    * Cost on top of the pair mining: one 1-row basket count
    * (broadcast) and a row-local projection — the pair table is
    * already metadata-sized relative to the corpus.
    */
  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      minConfidence: Double): DataFrame = {
    require(minConfidence > 0 && minConfidence <= 1,
      s"minConfidence=$minConfidence")
    val confPpm = math.round(minConfidence * 1000000L)
    val n = df.select(col(basketCol)).distinct()
      .agg(count(lit(1)).as("_n"))
    // both rule directions reference the pair table — fenced, or the
    // within-basket self-join replays once per direction (r18)
    val pairs = fence(frequentPairs(df, basketCol, itemCol, minSupport))
    val fwd = pairs.select(col("item_a").as("antecedent"),
      col("item_b").as("consequent"), col("pair_cnt"),
      col("supp_a").as("supp_ante"), col("supp_b").as("supp_cons"))
    val rev = pairs.select(col("item_b").as("antecedent"),
      col("item_a").as("consequent"), col("pair_cnt"),
      col("supp_b").as("supp_ante"), col("supp_a").as("supp_cons"))
    fwd.unionByName(rev)
      .filter(col("pair_cnt") * lit(1000000L) >=
        lit(confPpm) * col("supp_ante"))
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("pair_cnt"),
        col("supp_ante"), col("supp_cons"), col("_n").as("n_baskets"),
        (col("pair_cnt").cast("double") / col("supp_ante").cast("double"))
          .as("confidence"),
        (col("pair_cnt").cast("double") * col("_n").cast("double") /
          (col("supp_ante").cast("double") * col("supp_cons").cast("double")))
          .as("lift"))
  }
}

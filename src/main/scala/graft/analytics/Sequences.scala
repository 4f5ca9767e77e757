package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: per-entity ordered streams reduced to
  * transition statistics. The sequence-mining counterpart of the
  * funnel/sessionize family in [[Temporal]] — funnels ask "did this
  * fixed pattern occur", transitions ask "what follows what, how
  * often" (the first-order Markov view of a clickstream).
  */
object Sequences {

  /** First-order Markov transition counts: for each entity's
    * time-ordered event stream, count consecutive (prev → next) state
    * pairs globally, with the row-conditional probability alongside.
    * Ties on the order column are broken by `tieCol` so the sequence —
    * and therefore every count — is deterministic under any
    * partitioning. `cnt` and `prev_total` are exact integers;
    * `p = cnt / prev_total` is one IEEE division on the final
    * states² table (oracle-replayable).
    *
    * Scale shape: ONE shuffle on the entity key for the lag window
    * (the same sort sessionize rides), then a (prev, next) count
    * aggregate with map-side combine — the output is ≤ states² rows
    * no matter the input size. No self-join: the lag window sees each
    * row once.
    */
  def transitionMatrix(
      df: DataFrame,
      entityCols: Seq[String],
      orderCol: Column,
      tieCol: Column,
      stateCol: Column): DataFrame = {
    val keyed = df.select(entityCols.map(col) ++
      Seq(orderCol.as("_ord"), tieCol.as("_tie"), stateCol.as("_st")): _*)
    val w = Window.partitionBy(entityCols.map(col): _*)
      .orderBy(col("_ord"), col("_tie"))
    val pairs = keyed
      .withColumn("_prev", lag(col("_st"), 1).over(w))
      .filter(col("_prev").isNotNull)
    val counts = pairs.groupBy(col("_prev").as("prev"), col("_st").as("next"))
      .agg(count(lit(1)).as("cnt"))
    val wPrev = Window.partitionBy(col("prev"))
    counts
      .withColumn("prev_total", sum(col("cnt")).over(wPrev))
      .withColumn("p",
        col("cnt").cast("double") / col("prev_total").cast("double"))
  }

  /** Per-entity sequence log-likelihood under the corpus' own
    * first-order Markov model ([[transitionMatrix]]): the sum of
    * ln p(next | prev) over the entity's consecutive transitions,
    * folded in (order, tie) sequence position — the "how typical is
    * this clickstream" fluency score, the behavioral sibling of
    * [[Text.unigramLogProb]] (bot/fraud streams score far from the
    * mass). Emits n_transitions, total and per-transition mean
    * negative log-likelihood; entities with no transitions are
    * omitted (no model evidence either way). Unseen transitions
    * cannot occur by construction — the model is fit on the same
    * corpus; fit on a reference corpus instead to score drift, and
    * pre-smooth the matrix if the corpora may differ.
    *
    * Scale shape: the transition matrix is a ≤ states² broadcast; the
    * scoring pass reuses the same one-shuffle lag window, then one
    * per-entity fold over its own transitions.
    */
  def sequenceLikelihood(
      df: DataFrame,
      entityCols: Seq[String],
      orderCol: Column,
      tieCol: Column,
      stateCol: Column): DataFrame = {
    import HashFunctions.java_ln
    val model = transitionMatrix(df, entityCols, orderCol, tieCol, stateCol)
      .select(col("prev"), col("next"), col("p"))
    val keyed = df.select(entityCols.map(col) ++
      Seq(orderCol.as("_ord"), tieCol.as("_tie"), stateCol.as("_st")): _*)
    val w = Window.partitionBy(entityCols.map(col): _*)
      .orderBy(col("_ord"), col("_tie"))
    val pairs = keyed
      .withColumn("_prev", lag(col("_st"), 1).over(w))
      .filter(col("_prev").isNotNull)
    pairs
      .join(broadcast(model),
        col("_prev") === col("prev") && col("_st") === col("next"))
      .select(entityCols.map(col) :+
        struct(col("_ord").as("_k1"), col("_tie").as("_k2"),
          (lit(0.0) - java_ln(col("p"))).as("_nll")).as("_t"): _*)
      .groupBy(entityCols.map(col): _*)
      .agg(count(lit(1)).as("n_transitions"),
        aggregate(array_sort(collect_list(col("_t"))), lit(0.0),
          (acc, x) => acc + x.getField("_nll")).as("nll_total"))
      .withColumn("nll_mean",
        col("nll_total") / col("n_transitions").cast("double"))
  }

  /** Frequent sequential n-grams (behavioral motifs): every length-n
    * window of consecutive states in each entity's time-ordered
    * stream, counted globally, support-pruned — the order-sensitive
    * generalization of [[transitionMatrix]] (n = 2 recovers its
    * counts) and the sequence-mining sibling of
    * [[Baskets.frequentPairs]] (which is order-free within a basket).
    * Ties on the order column are broken by `tieCol`, so every gram —
    * and count — is deterministic under any partitioning.
    *
    * Scale shape: ONE shuffle on the entity key for the lead window
    * (n − 1 leads over the same sort — no self-join, each row seen
    * once), then a gram count with map-side combine; output is
    * ≤ states^n rows and the support filter prunes it further. No
    * per-entity collect: an entity with a billion events costs n − 1
    * lead reads per row inside its sorted partition range.
    */
  def frequentNgrams(
      df: DataFrame,
      entityCols: Seq[String],
      orderCol: Column,
      tieCol: Column,
      stateCol: Column,
      n: Int,
      minSupport: Long): DataFrame = {
    require(n >= 2 && n <= 8, s"n=$n")
    require(minSupport >= 1, s"minSupport=$minSupport")
    val keyed = df.select(entityCols.map(col) ++
      Seq(orderCol.as("_ord"), tieCol.as("_tie"), stateCol.as("_s0")): _*)
    val w = Window.partitionBy(entityCols.map(col): _*)
      .orderBy(col("_ord"), col("_tie"))
    val withLeads = (1 until n).foldLeft(keyed) { (acc, k) =>
      acc.withColumn(s"_s$k", lead(col("_s0"), k).over(w))
    }
    // The joined gram must be injective in its token sequence: a
    // state containing the separator would otherwise collide (states
    // ["a>b","c"] vs ["a","b>c"] counting as one trigram), so '>' is
    // escaped as '\>' (and '\' as '\\' so the escape itself can't be
    // forged) before joining. Token-free vocabularies render exactly
    // as before.
    def esc(c: Column): Column =
      replace(replace(c, lit("\\"), lit("\\\\")), lit(">"), lit("\\>"))
    withLeads
      // every position must be non-null INCLUDING the window head:
      // concat_ws skips nulls, so an unchecked null head would emit a
      // shortened (n−1)-token string counted as an n-gram
      .filter((0 until n).map(k => col(s"_s$k").isNotNull).reduce(_ && _))
      .select(concat_ws(">", (0 until n).map(k => esc(col(s"_s$k"))): _*)
        .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}

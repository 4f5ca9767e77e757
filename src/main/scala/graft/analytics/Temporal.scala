package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in Spark surface lacks: as-of
  * join and (pure, no-equi-key) range join. Both are composed from
  * existing operators (brief preference order (a)) so Catalyst keeps
  * full visibility — pushdown, AQE, whole-stage codegen all apply.
  *
  * Scale design:
  *  - [[asOfJoin]] is the union–sort formulation: ONE hash shuffle on
  *    the key + one per-partition sort, never a per-row probe or a
  *    range-expanded join. At 100 TB this is the same shape as a
  *    shuffle-hash aggregation — no build-side blowup, no skew
  *    amplification beyond the key histogram itself.
  *  - [[rangeJoinBinned]] turns an interval predicate into an
  *    equi-join on a time bucket + a residual filter. Spark's planner
  *    would otherwise fall back to BroadcastNestedLoop/cartesian for a
  *    pure inequality join; binning restores a shuffle-partitionable
  *    equi-key whose fan-out is ceil(intervalLen/bucketWidth)+1 per
  *    interval — O(1) when the bucket width is chosen near the typical
  *    interval length.
  */
object Temporal {

  /** As-of join: for every left row, attach the right row with the
    * greatest `rightTime` ≤ `leftTime` (or strictly < when
    * `strict = true`) within the same key group; left rows with no
    * such right row keep nulls (left-outer semantics).
    *
    * Implementation: tag both sides, union, then one cumulative
    * `last(ignoreNulls)` window per key ordered by (time, side) —
    * the right payload is carried as a single struct so the match is
    * atomic (a null value INSIDE a right row can never inherit from
    * an older right row).
    *
    * Preconditions (caller-enforced, asserted where cheap):
    *  - `leftTime` / `rightTime` are the same orderable type
    *    (normalize timestamps to epoch longs first);
    *  - at most one right row per (key, time) — pass
    *    `dedupRight = true` to have the operator enforce it (a
    *    max-struct pre-reduce per (key, time): deterministic because
    *    a struct max depends only on the value multiset, never on
    *    partitioning or arrival order), or pre-reduce yourself;
    *    otherwise the tie is nondeterministic;
    *  - right value column names must not collide with left columns.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      strict: Boolean = false,
      dedupRight: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq
    require(rightValueCols.forall(c => !lCols.contains(c)),
      s"right value columns ${rightValueCols.mkString(",")} collide with left columns")
    val right1 = if (dedupRight)
      dedupRightByMaxStruct(right, rightKey, rightTime, rightValueCols)
    else right
    // Inclusive (ts >= rt): right rows sort BEFORE left rows at a tied
    // time so the tied right row is visible. Strict: left first.
    val (sideL, sideR) = if (strict) (0, 1) else (1, 0)
    val lSel: Seq[Column] =
      Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(sideL).as("_side")) ++
        lCols.map(c => col(c).as(s"_l_$c")) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightValueCols.map(c => org.apache.spark.sql.types.StructField(
            c, right1.schema(c).dataType, nullable = true)))).as("_r")
    val rSel: Seq[Column] =
      Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(sideR).as("_side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) :+
        struct(rightValueCols.map(col): _*).as("_r")
    val unioned = left.select(lSel: _*).unionByName(right1.select(rSel: _*))
    // Ties among LEFT rows at the same (key, time) are harmless: the
    // cumulative last(_r) only reads right-side rows, which are unique
    // per (key, time) by precondition — the frame ambiguity cannot
    // change any output value.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === sideL)
      .select(lCols.map(c => col(s"_l_$c").as(c)) ++
        rightValueCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Broadcast as-of join: same semantics as [[asOfJoin]] (inclusive
    * ties, left-outer), different physical shape for a SMALL right
    * side: versions collapse to one sorted array per key
    * (`sort_array` orders structs by first field = time), ride a
    * broadcast hash join, and each left row binary-searches with the
    * codegen'd [[AsOfPick]] expression — the left side is never
    * shuffled OR sorted, which is the right trade at 100 TB probes ×
    * feature-store-sized dims. Also the stream-static formulation:
    * `left` may be a streaming DataFrame (pass a pre-materialized
    * right side — Spark re-evaluates static subtrees per micro-batch).
    *
    * Same preconditions as [[asOfJoin]]: unique (key, time) on the
    * right (`dedupRight = true` enforces it with the same max-struct
    * pre-reduce), no name collisions.
    */
  def asOfJoinBroadcast(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      dedupRight: Boolean = false): DataFrame =
    joinPackedAsOf(left,
      packAsOfRight(right, rightKey, rightTime, rightValueCols, dedupRight),
      leftKey, leftTime, rightValueCols)

  /** The version-array build half of [[asOfJoinBroadcast]]: per key,
    * the time-sorted struct array the codegen'd `as_of_pick` binary
    * search probes. Split out so a per-micro-batch caller (the
    * `enrich.asof` processor) can persist the packed dimension ONCE
    * instead of re-aggregating the static side on every batch.
    */
  def packAsOfRight(right: DataFrame, rightKey: String, rightTime: String,
                    rightValueCols: Seq[String],
                    dedupRight: Boolean = false): DataFrame = {
    val right1 = if (dedupRight)
      dedupRightByMaxStruct(right, rightKey, rightTime, rightValueCols)
    else right
    right1
      .groupBy(col(rightKey).as("_pk"))
      .agg(sort_array(collect_list(struct(
        col(rightTime).as("_vt") +: rightValueCols.map(col): _*))).as("_versions"))
  }

  /** The probe half of [[asOfJoinBroadcast]] over an already-packed
    * right side (the output of [[packAsOfRight]]). */
  def joinPackedAsOf(left: DataFrame, packed: DataFrame, leftKey: String,
                     leftTime: String,
                     rightValueCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    require(rightValueCols.forall(c => !lCols.contains(c)),
      s"right value columns ${rightValueCols.mkString(",")} collide with left columns")
    left.join(broadcast(packed), col(leftKey) === col("_pk"), "left_outer")
      .withColumn("_m",
        TemporalFunctions.as_of_pick(col("_versions"), col(leftTime)))
      .select(lCols.map(col) ++
        rightValueCols.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** The documented (key, time)-uniqueness pre-reduce for the as-of
    * joins: per (key, time), keep the row whose VALUE STRUCT is the
    * field-wise maximum — a pure function of the value multiset, so
    * the winner is identical on any partitioning, shuffle order, or
    * cluster size (a `first()`-style reduce would not be). One extra
    * key shuffle, only when requested.
    */
  private def dedupRightByMaxStruct(right: DataFrame, rightKey: String,
                                    rightTime: String,
                                    rightValueCols: Seq[String]): DataFrame =
    right
      .groupBy(col(rightKey), col(rightTime))
      .agg(max(struct(rightValueCols.map(col): _*)).as("_rv"))
      .select(col(rightKey) +: col(rightTime) +:
        rightValueCols.map(c => col(s"_rv.$c").as(c)): _*)

  /** Nearest-in-time join: each left row picks the right row with the
    * CLOSEST time in either direction, within `maxGap` (feature-store
    * alignment where a reading may arrive just before OR just after
    * the probe — as-of's backward-only pick loses the nearer forward
    * observation). Equidistant ties prefer the backward row; a right
    * row at the exact probe time wins with distance 0. Left-outer:
    * unmatched probes keep null right columns and a null `direction`
    * (otherwise 'prev'/'next').
    *
    * Same union-sort shape as [[asOfJoin]] — ONE key shuffle + one
    * sort, with the backward pick (cumulative last) and the forward
    * pick (first over the following frame) computed over the same
    * sort; never a range join or nested loop. Precondition: unique
    * right (key, time) — use the max-struct pre-reduce if unsure.
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      maxGap: Long): DataFrame = {
    require(maxGap >= 0, s"maxGap=$maxGap")
    val lCols = left.columns.toSeq
    require(rightValueCols.forall(c => !lCols.contains(c)),
      s"right value columns ${rightValueCols.mkString(",")} collide with left columns")
    val rStruct = struct(col(rightTime).as("_rt") +:
      rightValueCols.map(col): _*)
    val rType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_rt",
        right.schema(rightTime).dataType, nullable = true) +:
        rightValueCols.map(c => org.apache.spark.sql.types.StructField(
          c, right.schema(c).dataType, nullable = true)))
    // right rows sort BEFORE left at a tied time: the tied row lands
    // in the backward frame with distance 0 (minimal), so tie
    // preference needs no special case
    val lSel: Seq[Column] =
      Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_side")) ++
        lCols.map(c => col(c).as(s"_l_$c")) :+
        lit(null).cast(rType).as("_r")
    val rSel: Seq[Column] =
      Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) :+
        rStruct.as("_r")
    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val sort = Seq(col("_t").asc, col("_side").asc)
    val wPrev = Window.partitionBy(col("_k")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("_k")).orderBy(sort: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevD = col("_t") - col("_prev._rt")
    val nextD = col("_next._rt") - col("_t")
    val prevOk = col("_prev").isNotNull && prevD <= maxGap
    val nextOk = col("_next").isNotNull && nextD <= maxGap
    val pick = when(prevOk && (!nextOk || prevD <= nextD), col("_prev"))
      .when(nextOk, col("_next"))
    val dir = when(prevOk && (!nextOk || prevD <= nextD), lit("prev"))
      .when(nextOk, lit("next")).otherwise(lit(null).cast("string"))
    unioned
      .withColumn("_prev", last(col("_r"), ignoreNulls = true).over(wPrev))
      .withColumn("_next", first(col("_r"), ignoreNulls = true).over(wNext))
      .filter(col("_side") === 1)
      .withColumn("_m", pick)
      .withColumn("direction", dir)
      .select(lCols.map(c => col(s"_l_$c").as(c)) ++
        Seq(col("_m._rt").as(s"near_$rightTime")) ++
        rightValueCols.map(c => col(s"_m.$c").as(c)) :+
        col("direction"): _*)
  }

  /** Gap-based sessionization: assigns each row a per-key session
    * ordinal (1-based, in time order) — a new session starts when the
    * gap to the previous row of the same key exceeds `gapSeconds`.
    * `tieCol` must make (key, time, tie) a total order or the lag is
    * nondeterministic. Both windows share one partitioning + sort, so
    * the whole operator is a single shuffle.
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("session_seq",
        sum(when(col("_prev").isNull ||
          (col(tsCol) - col("_prev")) > gapSeconds, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev")
  }

  /** Interval-overlap join: pairs every `a` row with every `b` row
    * whose [start, end) ranges intersect — no equi-key. Both sides
    * explode into their bucket ranges and equi-join on the bucket;
    * since a pair shares every bucket in the intersection of its
    * ranges, the pair is emitted ONLY in the first shared bucket
    * (max of the two start buckets — always in both ranges when the
    * intervals overlap), so no `distinct` pass is needed. Fan-out is
    * ceil(len/bucketWidth)+1 per row per side; residual is the
    * standard half-open overlap predicate.
    */
  def intervalOverlapJoin(
      a: DataFrame,
      b: DataFrame,
      aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "interval column names must be disjoint between sides")
    val ae = a.withColumn("_bucket_a",
      explode(sequence(
        expr(s"$aStart div ${bucketWidth}L"),
        expr(s"($aEnd - 1L) div ${bucketWidth}L"))))
    val be = b.withColumn("_bucket_b",
      explode(sequence(
        expr(s"$bStart div ${bucketWidth}L"),
        expr(s"($bEnd - 1L) div ${bucketWidth}L"))))
    ae.join(be,
        col("_bucket_a") === col("_bucket_b") &&
          col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
          col("_bucket_a") === greatest(
            expr(s"$aStart div ${bucketWidth}L"),
            expr(s"$bStart div ${bucketWidth}L")))
      .drop("_bucket_a", "_bucket_b")
  }

  /** Interval union per key: merge overlapping OR touching [start,
    * end) intervals into maximal disjoint spans (touching merges —
    * [0,10) ∪ [10,20) = [0,20) — because the half-open union is
    * contiguous). Classic running-max sweep: one key shuffle + sort;
    * an interval starts a new group iff its start lies strictly beyond
    * the furthest end seen so far. Duplicate intervals are harmless
    * (tie order cannot move a group boundary).
    */
  /** Concurrency profile of half-open intervals per group: the classic
    * +1/−1 boundary sweep — at each boundary timestamp, how many
    * intervals are open just AFTER it. `max(concurrency)` per group is
    * peak load; the profile is the ops view of session/connection
    * tables. End-before-start ordering at a tied timestamp (half-open
    * [s, e): an interval ending exactly when another starts does not
    * overlap it).
    *
    * One key shuffle + one window cumsum over 2 rows per interval —
    * integer-exact under any partitioning, linear in interval count.
    */
  def concurrency(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val starts = df.select(col(keyCol).as("_k"), col(startCol).as("_t"),
      lit(1L).as("_d"))
    val ends = df.select(col(keyCol).as("_k"), col(endCol).as("_t"),
      lit(-1L).as("_d"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_d").asc) // -1 before +1 at ties
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(ends)
      .groupBy(col("_k"), col("_t"), col("_d"))
      .agg(sum(col("_d")).as("_dd"))
      .withColumn("concurrency", sum(col("_dd")).over(w))
      .select(col("_k").as(keyCol), col("_t").as("at_time"),
        col("concurrency"))
      // collapse the two boundary rows (start/end at one instant) to
      // the final value at that instant
      .groupBy(col(keyCol), col("at_time"))
      .agg(max(col("concurrency")).as("concurrency"))
  }

  def mergeIntervals(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val runMax = max(col(endCol)).over(
      wOrd.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("_new",
        when(runMax.isNull || col(startCol) > runMax, 1L).otherwise(0L))
      .withColumn("_gid", sum(col("_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_gid"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol))
      .drop("_gid")
  }

  /** Interval subtraction (A \ ∪B per key): the uncovered remainder of
    * the availability intervals after removing every blackout — the
    * missing third of the interval algebra next to [[mergeIntervals]]
    * (union) and [[intervalOverlapJoin]] (intersection test). Both
    * sides are half-open [s, e); overlapping A's union first (the
    * sweep counts open intervals, not rows).
    *
    * Implementation: a boundary sweep — ±1 events at every interval
    * edge, pre-aggregated per (key, instant) so ties apply atomically,
    * ONE key shuffle + sort, running (openA, openB) counts, emit the
    * segment to the next boundary wherever openA > 0 ∧ openB = 0, then
    * [[mergeIntervals]] glues touching segments. Cost is linear in
    * boundary count; no interval×interval join anywhere.
    */
  def intervalSubtract(
      avail: DataFrame,
      block: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    def edges(df: DataFrame, da: Int, db: Int): DataFrame =
      df.filter(col(startCol) < col(endCol))
        .select(col(keyCol).as("_k"), col(startCol).as("_t"),
          lit(da.toLong).as("_da"), lit(db.toLong).as("_db"))
        .unionByName(df.filter(col(startCol) < col(endCol))
          .select(col(keyCol).as("_k"), col(endCol).as("_t"),
            lit(-da.toLong).as("_da"), lit(-db.toLong).as("_db")))
    val bounds = edges(avail, 1, 0).unionByName(edges(block, 0, 1))
      .groupBy(col("_k"), col("_t"))
      .agg(sum(col("_da")).as("_da"), sum(col("_db")).as("_db"))
    val wc = Window.partitionBy(col("_k")).orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col("_k")).orderBy(col("_t"))
    val segs = bounds
      .withColumn("_ca", sum(col("_da")).over(wc))
      .withColumn("_cb", sum(col("_db")).over(wc))
      .withColumn("_nt", lead(col("_t"), 1).over(wn))
      .filter(col("_ca") > 0L && col("_cb") === 0L &&
        col("_nt").isNotNull && col("_nt") > col("_t"))
      .select(col("_k").as(keyCol), col("_t").as(startCol),
        col("_nt").as(endCol))
    mergeIntervals(segs, keyCol, startCol, endCol)
  }

  /** Regularize an irregular per-key time series: emit one row per
    * key per multiple of `step` inside that key's observed span, with
    * the value forward-filled from the latest observation at-or-before
    * the grid instant (LOCF). The grid starts at ceil(min/step)·step —
    * every grid point has a prior observation, so no nulls — and a key
    * whose span contains no step multiple yields no rows.
    *
    * Same union–sort shape as [[asOfJoin]]: grid rows and observation
    * rows union, ONE key shuffle + per-partition sort, cumulative
    * last(ignoreNulls) window, keep grid rows. No per-grid-point probe
    * join; cost is linear in observations + grid points. Observations
    * at a grid instant win over earlier ones (obs sorts before grid at
    * equal ts).
    *
    * `obs` must be unique per (keyCol, tsCol) — pre-aggregate ties
    * (e.g. max_by) for a deterministic fill. Negative (pre-1970)
    * epochs are handled: the grid endpoints use floor/ceil-safe
    * division, not Spark's truncate-toward-zero `div`.
    */
  /** Grid index span ceil(_mn/step)..floor(_mx/step) as a SQL
    * sequence, empty when the span contains no step multiple.
    * Floor/ceil-SAFE division: Spark `div` truncates toward zero
    * while the documented span (and DuckDB's `//` oracle) floors —
    * for negative (pre-1970) epochs the truncating form shifts both
    * endpoints up by one. floor = div minus one when the remainder is
    * negative; ceil = div plus one when it is positive (Spark `%`
    * takes the dividend's sign).
    */
  private def gridSpanSql(step: Long): String = {
    val lo = s"((_mn div ${step}L) + (CASE WHEN _mn % ${step}L > 0 THEN 1L ELSE 0L END))"
    val hi = s"((_mx div ${step}L) - (CASE WHEN _mx % ${step}L < 0 THEN 1L ELSE 0L END))"
    s"CASE WHEN $lo <= $hi THEN sequence($lo, $hi) ELSE array() END"
  }

  def resampleLocf(
      obs: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      step: Long): DataFrame = {
    require(step > 0, "step must be positive")
    val valueType = obs.schema(valueCol).dataType
    val grid = obs.groupBy(col(keyCol).as("_k"))
      .agg(min(col(tsCol)).as("_mn"), max(col(tsCol)).as("_mx"))
      // sequence(a, b) DESCENDS when a > b — guard the empty-span case
      .withColumn("_gi", explode(expr(gridSpanSql(step))))
      .select(col("_k"), (col("_gi") * lit(step)).as("_t"))
    val o = obs.select(col(keyCol).as("_k"), col(tsCol).cast("long").as("_t"),
      lit(0).as("_tag"), col(valueCol).as("_v"))
    val g = grid.select(col("_k"), col("_t"), lit(1).as("_tag"),
      lit(null).cast(valueType).as("_v"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(g)
      .withColumn("_fill", last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_k").as(keyCol), col("_t").as(tsCol),
        col("_fill").as(valueCol))
  }

  /** Absence detection: the probe rows with NO event in the following
    * window [t, t+window) on the same key — "clicks that never
    * converted within two hours", the negative-space complement of
    * [[asOfJoin]] (which attaches the most recent PAST event). An
    * anti-join against a range predicate would plan as a broadcast
    * nested loop; this is the union–sort formulation instead: ONE key
    * shuffle, one sort, a forward first(ignoreNulls) window finds each
    * probe's next event, and a row-local comparison decides absence.
    * An event AT the probe instant counts as present (events sort
    * after probes at ties, inside the forward frame).
    *
    * Returns the probe rows (original columns) that had no event.
    */
  def absentWithin(
      probe: DataFrame,
      events: DataFrame,
      probeKey: String,
      eventKey: String,
      probeTime: String,
      eventTime: String,
      window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    val pCols = probe.columns.toSeq
    val pSel: Seq[Column] =
      Seq(col(probeKey).as("_k"), col(probeTime).cast("long").as("_t"),
        lit(0).as("_tag")) ++ pCols.map(c => col(c).as(s"_p_$c"))
    val eSel: Seq[Column] =
      Seq(col(eventKey).as("_k"), col(eventTime).cast("long").as("_t"),
        lit(1).as("_tag")) ++
        pCols.map(c => lit(null).cast(probe.schema(c).dataType).as(s"_p_$c"))
    val wf = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    probe.select(pSel: _*).unionByName(events.select(eSel: _*))
      .withColumn("_ne",
        first(when(col("_tag") === 1, col("_t")), ignoreNulls = true).over(wf))
      .filter(col("_tag") === 0 &&
        (col("_ne").isNull || col("_ne") >= col("_t") + lit(window)))
      .select(pCols.map(c => col(s"_p_$c").as(c)): _*)
  }

  /** Funnel analysis: how far through an ordered step sequence (e.g.
    * view → click → purchase) each key progressed. A step counts as
    * reached when an event of that type occurs at-or-after the FIRST
    * time the previous step was reached — the classic min-cascade
    * semantics (tᵢ = min time of step-i events with t ≥ tᵢ₋₁), which a
    * single greedy pass over the key's time-ordered events computes
    * exactly (each tᵢ is the earliest eligible instant, and nothing
    * before tᵢ₋₁ can ever become eligible later).
    *
    * Returns (keyCol, steps_reached: int, step_times: array<long>) —
    * steps_reached = 0 means the first step never occurred;
    * step_times(i) is tᵢ₊₁ for the reached prefix.
    *
    * Scale shape: ONE key shuffle (the groupBy); the per-key fold is
    * a codegen'd higher-order `aggregate` over the key's own events —
    * no join chain, no step-count × corpus re-scans. Per-key state is
    * that key's event list, the same envelope as sessionization;
    * pre-filter to the step types (done here) to keep it minimal.
    * Timestamp ties between different step types are resolved in step
    * order (an earlier step sorts first), so a later step CAN be
    * reached at the same instant as its predecessor — matching the
    * min-cascade's `t >= prev` inequality.
    */
  def funnelSteps(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      timeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    // map each event to its step index (1-based); non-step events drop
    val stepIdx = steps.zipWithIndex
      .map { case (st, i) => (st, i + 1) }.toMap
    val idxCol = stepIdx.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val n = steps.size
    events
      .select(col(keyCol).as("_k"), col(timeCol).cast("long").as("_t"),
        idxCol.as("_si"))
      .filter(col("_si").isNotNull)
      .groupBy(col("_k"))
      .agg(sort_array(collect_list(struct(col("_t"), col("_si")))).as("_evs"))
      .withColumn("_acc", expr(
        // acc = (reached so far, times of reached steps); advance when
        // the event is the NEXT step (sorted order guarantees t >= all
        // recorded times, so the >= prev-time check is implicit)
        s"""aggregate(_evs,
              struct(0 AS r, CAST(array() AS array<bigint>) AS ts),
              (a, e) -> IF(e._si = a.r + 1,
                           struct(a.r + 1 AS r,
                                  array_append(a.ts, e._t) AS ts),
                           a))"""))
      .select(col("_k").as(keyCol), col("_acc.r").as("steps_reached"),
        col("_acc.ts").as("step_times"))
  }

  /** Linear-interpolation resample: like [[resampleLocf]] but each
    * grid value is interpolated between the latest observation
    * at-or-before and the earliest observation at-or-after the grid
    * instant: v = vₚ + (vₙ − vₚ)·(t − tₚ)/(tₙ − tₚ). A grid point
    * coinciding with an observation returns that observation exactly
    * (guarded branch on tₚ = t — which also covers the series-end
    * grid point, whose forward frame is empty). Grid spans
    * ceil(min/step)·step to
    * floor(max/step)·step per key, so both neighbours always exist —
    * no extrapolation cases.
    *
    * Same union–sort shape as [[resampleLocf]]: ONE key shuffle, one
    * sort, a backward last(ignoreNulls) and a forward
    * first(ignoreNulls) window over the same sorted runs (Spark
    * computes both in a single Window node — no second shuffle).
    * Value must be DOUBLE; the arithmetic is fixed-order IEEE so the
    * DuckDB oracle reproduces it bit-for-bit.
    */
  def resampleInterpolate(
      obs: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      step: Long): DataFrame = {
    require(step > 0, "step must be positive")
    val grid = obs.groupBy(col(keyCol).as("_k"))
      .agg(min(col(tsCol)).as("_mn"), max(col(tsCol)).as("_mx"))
      .withColumn("_gi", explode(expr(gridSpanSql(step))))
      .select(col("_k"), (col("_gi") * lit(step)).as("_t"))
    val o = obs.select(col(keyCol).as("_k"), col(tsCol).cast("long").as("_t"),
      lit(0).as("_tag"), col(valueCol).cast("double").as("_v"))
    val g = grid.select(col("_k"), col("_t"), lit(1).as("_tag"),
      lit(null).cast("double").as("_v"))
    // obs sorts before grid at an equal instant: the backward window
    // sees it as "prev at distance 0" and the interpolation collapses
    // to exactly that observation
    val wb = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevT = last(when(col("_tag") === 0, col("_t")), ignoreNulls = true).over(wb)
    val prevV = last(col("_v"), ignoreNulls = true).over(wb)
    val nextT = first(when(col("_tag") === 0, col("_t")), ignoreNulls = true).over(wf)
    val nextV = first(col("_v"), ignoreNulls = true).over(wf)
    o.unionByName(g)
      .withColumn("_pt", prevT).withColumn("_pv", prevV)
      .withColumn("_nt", nextT).withColumn("_nv", nextV)
      .filter(col("_tag") === 1)
      // _pt = _t ⟺ an observation sits ON the grid instant — return it
      // exactly (also the only case where _nt can be null: a grid
      // point tied with the LAST observation has no row at-or-after
      // itself in the forward frame). Otherwise _pt < _t < _nt and
      // both neighbours are non-null.
      .withColumn("_iv",
        when(col("_pt") === col("_t"), col("_pv"))
          .otherwise(col("_pv") +
            (col("_nv") - col("_pv")) *
              ((col("_t") - col("_pt")).cast("double") /
                (col("_nt") - col("_pt")).cast("double"))))
      .select(col("_k").as(keyCol), col("_t").as(tsCol),
        col("_iv").as(valueCol))
  }

  /** Range join without an equi-key: pairs every `points` row whose
    * `pointTime` falls in `[startCol, endCol)` of an `intervals` row.
    * Returns INNER matches (interval columns ++ point columns);
    * left-outer aggregation shapes compose on top (join the interval
    * table back to the aggregated pairs).
    *
    * A point lives in exactly one bucket, so no pair is emitted twice
    * even though an interval is replicated into every bucket it
    * overlaps. Times must be non-negative longs (epoch-style) —
    * `div` floor-division assumes it.
    */
  def rangeJoinBinned(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(intervals.columns.toSet.intersect(points.columns.toSet).isEmpty,
      "interval and point column names must be disjoint")
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        expr(s"$startCol div ${bucketWidth}L"),
        // end is exclusive; an interval ending exactly on a bucket
        // boundary must not claim the next bucket
        expr(s"($endCol - 1L) div ${bucketWidth}L"))))
    val pt = points.withColumn("_bucket", expr(s"$pointTime div ${bucketWidth}L"))
    iv.join(pt,
        iv("_bucket") === pt("_bucket") &&
          pt(pointTime) >= iv(startCol) && pt(pointTime) < iv(endCol))
      .drop("_bucket")
  }

  /** Time-weighted average of a stepwise (LOCF) signal per key: each
    * observation holds its INTEGER value until the next one; the last
    * extends to `endTs`. TWA = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (endTs − t₁) — the
    * metrics-correct mean for irregularly sampled gauges (a price
    * held for 9 minutes must weigh 9× one held for a minute, which
    * the plain row mean gets wrong). The weighted sum and span are
    * exact integers (value·seconds through decimal(38,0), emitted as
    * long); the average is one IEEE division.
    *
    * Duplicate timestamps per key pre-reduce to their MAX value (a
    * total, partitioning-independent choice). Observations after
    * `endTs` are excluded. One key shuffle + sort (the lead window)
    * over the pre-reduced observation table.
    */
  def twa(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      endTs: Long): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = keyCols.map(col)
    val obs = df.filter(col(tsCol) <= lit(endTs))
      .groupBy(g :+ col(tsCol).as("_t"): _*)
      .agg(max(col(valueCol)).as("_v"))
    val w = Window.partitionBy(g: _*).orderBy(col("_t"))
    obs
      .withColumn("_nxt", coalesce(lead(col("_t"), 1).over(w), lit(endTs)))
      .groupBy(g: _*)
      .agg(
        (lit(endTs) - min(col("_t"))).as("span_s"),
        sum(col("_v").cast(d38) * (col("_nxt") - col("_t")).cast(d38))
          .cast("long").as("weighted_sum"))
      .withColumn("twa", when(col("span_s") > 0L,
        col("weighted_sum").cast("double") / col("span_s").cast("double")))
  }

  /** Point-in-time join against an interval-versioned (SCD2) history:
    * each fact resolves the dimension version whose
    * [valid_from, valid_to) span contains the fact instant — the
    * lookup versioned dimensions exist for. Because versions
    * partition the timeline per key (each closes at the NEXT change,
    * so spans never overlap), the latest valid_from ≤ fact time is
    * the ONLY candidate: the plan is the as-of union-sort (one key
    * shuffle, no join operator) plus a row-local validity filter that
    * nulls the payload when the candidate closed before the fact
    * (deleted keys). Same-second version chains (valid_from ties)
    * resolve by the as-of dedupRight max-struct rule — the later
    * version wins, matching the empty-interval semantics of the
    * containment formulation the oracle runs.
    */
  def pitJoin(
      facts: DataFrame,
      hist: DataFrame,
      factKey: String,
      histKey: String,
      factTime: String,
      validFrom: String,
      validTo: String,
      payloadCols: Seq[String]): DataFrame = {
    val joined = asOfJoin(facts, hist, factKey, histKey, factTime,
      validFrom, payloadCols :+ validTo, dedupRight = true)
    val live = col(validTo).isNull || col(factTime) < col(validTo)
    joined.select(facts.columns.map(col) ++
      payloadCols.map(c => when(live, col(c)).as(c)): _*)
  }

  /** LTTB-style series downsampling (Steinarsson 2013, the
    * largest-triangle-three-buckets family): keep both endpoints plus,
    * from each of `buckets`−2 equal-time interior buckets, the point
    * forming the largest triangle with its neighbor buckets' mean
    * points. PARALLEL-ANCHOR variant: anchors are the nearest
    * non-empty neighbor buckets' means (endpoints where none), not
    * the previously SELECTED point — the canonical selection is a
    * sequential per-series scan, this one is one window pass, and it
    * is the standard parallelization of the algorithm. Every triangle
    * area is compared as an EXACT integer (the 2×2 cross product with
    * both anchor denominators cleared into decimal(38,0)), ties to
    * the earlier timestamp — fully deterministic. Duplicate
    * timestamps per key pre-reduce to max value.
    *
    * Scale shape: one key shuffle (range/min-max join + bucket means +
    * neighbor lag all ride it), candidates evaluated row-local, one
    * struct-max per bucket. Nothing sequential, nothing collected.
    */
  def lttb(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 3 && buckets <= 4096, s"buckets=$buckets")
    val d38 = "decimal(38,0)"
    val kInner = buckets - 2
    val g = keyCols.map(col)
    val obs = df.groupBy(g :+ col(tsCol).as("_t"): _*)
      .agg(max(col(valueCol)).as("_v"))
    val rng = obs.groupBy(g: _*)
      .agg(min(col("_t")).as("_tmin"), max(col("_t")).as("_tmax"),
        max_by(col("_v"), -col("_t")).as("_vmin"),
        max_by(col("_v"), col("_t")).as("_vmax"))
    val j = obs.join(rng, keyCols)
    val endpoints = j.filter(col("_t") === col("_tmin") ||
        col("_t") === col("_tmax"))
      .select(g ++ Seq(col("_t").as("t"), col("_v").as("v")): _*)
    val interior = j.filter(col("_t") > col("_tmin") &&
        col("_t") < col("_tmax"))
      .withColumn("_b", expr(
        s"((_t - _tmin) * ${kInner}L) div (_tmax - _tmin + 1)"))
    val means = interior.groupBy(g :+ col("_b"): _*)
      .agg(sum(col("_t").cast(d38)).as("_st"),
        sum(col("_v").cast(d38)).as("_sv"),
        count(lit(1)).cast(d38).as("_c"),
        max(col("_tmin")).as("_tmin"), max(col("_tmax")).as("_tmax"),
        max(col("_vmin")).as("_vmin"), max(col("_vmax")).as("_vmax"))
    val wB = Window.partitionBy(g: _*).orderBy(col("_b"))
    val one = lit(1L).cast(d38)
    val anchored = means
      .withColumn("_lst", coalesce(lag(col("_st"), 1).over(wB),
        col("_tmin").cast(d38)))
      .withColumn("_lsv", coalesce(lag(col("_sv"), 1).over(wB),
        col("_vmin").cast(d38)))
      .withColumn("_lc", coalesce(lag(col("_c"), 1).over(wB), one))
      .withColumn("_rst", coalesce(lead(col("_st"), 1).over(wB),
        col("_tmax").cast(d38)))
      .withColumn("_rsv", coalesce(lead(col("_sv"), 1).over(wB),
        col("_vmax").cast(d38)))
      .withColumn("_rc", coalesce(lead(col("_c"), 1).over(wB), one))
      .select(g ++ Seq(col("_b"), col("_lst"), col("_lsv"), col("_lc"),
        col("_rst"), col("_rsv"), col("_rc")): _*)
    val cand = interior.select(g ++ Seq(col("_b"), col("_t"),
        col("_v")): _*)
      .join(anchored, keyCols :+ "_b")
    val tD = col("_t").cast(d38)
    val vD = col("_v").cast(d38)
    // triangle cross product with both anchor denominators cleared:
    // E·cl²·cr = (lst·rc − rst·lc)(v·lc − lsv) − (lst − t·lc)(lsv·rc − rsv·lc)
    val e = (col("_lst") * col("_rc") - col("_rst") * col("_lc")) *
      (vD * col("_lc") - col("_lsv")) -
      (col("_lst") - tD * col("_lc")) *
        (col("_lsv") * col("_rc") - col("_rsv") * col("_lc"))
    val picked = cand
      .withColumn("_area", abs(e))
      .groupBy(g :+ col("_b"): _*)
      .agg(max(struct(col("_area").as("_a"), (-col("_t")).as("_negt"),
        col("_v").as("_pv"))).as("_best"))
      .select(g ++ Seq((-col("_best._negt")).as("t"),
        col("_best._pv").as("v")): _*)
    endpoints.unionByName(picked)
  }

  /** Per-key inter-arrival (gap) statistics: event count, time span,
    * max/min gap, and the exact sample-variance rational of the gaps
    * — the heartbeat-health screen (dying producers show growing
    * max_gap; bursty ones high variance) next to [[absence]]'s
    * point-in-time alerts. Σgaps telescopes to the span, so mean gap
    * is span/(n−1) without a gap aggregate; Σgap² accumulates in
    * decimal(38,0) and the variance rational follows the
    * [[graft.analytics.Stats.linearTrend]] discipline — long
    * convenience columns nulled past the signed-64 window with
    * doubles still flowing from the decimals.
    *
    * One key-window sort + one aggregation; keys with < 2 events
    * report zero gaps and null gap stats.
    */
  def interArrival(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = keyCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(tsCol), col(tieCol))
    val gapped = df
      .withColumn("_gap", col(tsCol).cast("long") -
        lag(col(tsCol).cast("long"), 1).over(w))
    val s = gapped.groupBy(g: _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol).cast("long")).as("_t0"),
        max(col(tsCol).cast("long")).as("_t1"),
        min(col("_gap")).as("min_gap"),
        max(col("_gap")).as("max_gap"),
        sum(col("_gap").cast(d38) * col("_gap").cast(d38)).as("_sg2"))
    val m = (col("n_events") - lit(1L)).cast(d38)
    val span = (col("_t1") - col("_t0")).cast(d38)
    val varNum = m * col("_sg2") - span * span
    val varDen = m * (m - lit(1).cast(d38))
    val maxL = lit("9223372036854775807").cast(d38)
    val inR = abs(varNum) <= maxL && varDen <= maxL
    s.select(g ++ Seq(col("n_events"),
      (col("n_events") - lit(1L)).as("n_gaps"),
      (col("_t1") - col("_t0")).as("span_s"),
      when(col("n_events") > 1,
        (col("_t1") - col("_t0")).cast("double") /
          (col("n_events") - lit(1L)).cast("double")).as("mean_gap"),
      col("min_gap"), col("max_gap"),
      when(inR, varNum.cast("long")).as("gap_var_num"),
      when(inR, varDen.cast("long")).as("gap_var_den"),
      coalesce(inR, lit(false)).as("exact"),
      // long-routed double inside the window (HUGEINT replay parity),
      // decimal-routed degradation past it
      when(col("n_events") > 2,
        when(inR, varNum.cast("long").cast("double") /
            varDen.cast("long").cast("double"))
          .otherwise(varNum.cast("double") / varDen.cast("double")))
        .as("gap_var")): _*)
  }

  /** Per-key strict local maxima of a series: a row is a peak when
    * its value exceeds BOTH neighbors under the (time, tie) order —
    * boundary rows and plateau members are not peaks (strictness
    * makes the verdict deterministic; detect plateaus with
    * [[sessionize]]-style runs if needed). The spike-finding
    * primitive under alerting and seasonality eyeballing.
    *
    * One lag + one lead on the same window sort — a single key
    * shuffle, then row-local comparisons.
    */
  def localPeaks(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val g = keyCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(tsCol), col(tieCol))
    df.withColumn("_prev", lag(col(valueCol), 1).over(w))
      .withColumn("_next", lead(col(valueCol), 1).over(w))
      .filter(col("_prev").isNotNull && col("_next").isNotNull &&
        col(valueCol) > col("_prev") && col(valueCol) > col("_next"))
      .drop("_prev", "_next")
  }

  /** Linear (equal-credit) multi-touch attribution: every touch in a
    * conversion's lookback window shares the conversion's value
    * equally — the complement of the last-touch pick, at PER-
    * CONVERSION granularity: one output row per (conversion, channel)
    * with the exact credit rational (touches-of-channel k_c over
    * total touches n) plus the one-IEEE-division credit value.
    * Conversions with no touch in the window emit channel 'none'
    * with full credit. Channel ROLLUPS are left to the caller
    * deliberately: summing the per-conversion doubles is aggregation-
    * order-dependent; sum the (value·k_c, n) rationals instead if a
    * bit-stable report matters.
    *
    * Scale shape: one equi-join on the entity key with the window
    * predicate applied as a join filter (pairs per key bounded by
    * that key's activity — the per-key contract all the temporal
    * joins here share), then one (conversion, channel) aggregation
    * and one conversion-window count. No cross-key or all-pairs
    * products anywhere.
    */
  def linearAttribution(
      conversions: DataFrame,
      convIdCol: String,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      touches: DataFrame,
      touchKeyCol: String,
      touchTsCol: String,
      channelCol: String,
      lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds >= 1, s"lookbackSeconds=$lookbackSeconds")
    val conv = conversions.select(col(convIdCol).as("_cid"),
      col(keyCol).as("_k"), col(tsCol).cast("long").as("_ts"),
      col(valueCol).as("_val"))
    val tch = touches.select(col(touchKeyCol).as("_k"),
      col(touchTsCol).cast("long").as("_tts"),
      col(channelCol).as("_ch"))
    val inWindow = conv.join(tch,
      conv("_k") === tch("_k") &&
        col("_tts") <= col("_ts") &&
        col("_ts") - col("_tts") <= lit(lookbackSeconds))
      .groupBy(col("_cid"), col("_ch"))
      .agg(count(lit(1)).as("k_c"),
        max(col("_ts")).as("_ts"), max(conv("_k")).as("_k"),
        max(col("_val")).as("_val"))
    val wConv = Window.partitionBy(col("_cid"))
    // fenced ([[Fences]], r18): credited feeds the attribution
    // projection AND the unattributed anti-join probe — unfenced, the
    // range join + window replayed twice
    val credited = Fences.fence(inWindow
      .withColumn("n_touches", sum(col("k_c")).over(wConv))
      .select(col("_cid"), col("_k"), col("_ts"), col("_val"),
        col("_ch"), col("k_c"), col("n_touches")))
    val attributed = credited.select(col("_cid").as("conversion_id"),
      col("_k").as("entity"), col("_ts").as("ts"), col("_ch").as("channel"),
      col("k_c"), col("n_touches"),
      (col("_val").cast("double") * col("k_c").cast("double") /
        col("n_touches").cast("double")).as("credit"))
    val unattributed = conv.join(
        credited.select(col("_cid")).distinct(), Seq("_cid"), "left_anti")
      .select(col("_cid").as("conversion_id"), col("_k").as("entity"),
        col("_ts").as("ts"), lit("none").as("channel"),
        lit(0L).as("k_c"), lit(0L).as("n_touches"),
        col("_val").cast("double").as("credit"))
    attributed.unionByName(unattributed)
  }

  /** Holt double exponential smoothing per group (Holt 1957): level
    * and trend recursion l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, zero-initial-trend
    * variant (l₁ = y₁, b₁ = 0) — the one-step-ahead forecaster for
    * per-segment daily series, complementing the seasonal-mean
    * forecaster with a trend term.
    *
    * Determinism: the recursion is a SEQUENTIAL fold in x order over
    * the group's (x, y) pairs — bit-stable under any partitioning
    * (the [[graft.analytics.Graph.pageRank]] deterministic-fold
    * discipline), and replayable term for term by an independent
    * engine's ordered list fold.
    *
    * Scale shape: one aggregation collects each group's series into
    * a single buffer — a per-GROUP state contract ENFORCED by
    * `maxPoints` (default 10⁶): any group over it fails FAST via a
    * 1-row count probe before the collect, instead of OOMing one
    * aggregation buffer (the pageRank-`maxInDegree` discipline; a
    * daily series is a few thousand points, so the default never
    * bites on time-grained series — it bites when a caller
    * accidentally feeds raw events).
    */
  def holt(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      valueCol: String,
      alpha: Double,
      beta: Double,
      maxPoints: Long = 1000000L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha")
    require(beta >= 0 && beta <= 1, s"beta=$beta")
    require(maxPoints >= 1, s"maxPoints=$maxPoints")
    val g = groupCols.map(col)
    val base = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
    val over = base.groupBy(g: _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxPoints).limit(1).count()
    require(over == 0,
      s"holt: a group exceeds maxPoints=$maxPoints series points (the " +
        "fold builds one buffer per group) — aggregate to a coarser " +
        "time grain first or raise maxPoints explicitly")
    val series = base
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_points"),
        array_sort(collect_list(struct(col(xCol).as("_x"),
          col(valueCol).cast("double").as("_y")))).as("_s"))
    // fold accumulator = [level, trend]; the trend line recomputes
    // the new level expression — identical ops in identical order on
    // both engines, so the duplication is bit-safe
    val a = lit(alpha); val b = lit(beta)
    def newLevel(acc: Column, y: Column): Column =
      a * y + (lit(1.0) - a) * (element_at(acc, 1) + element_at(acc, 2))
    val state = aggregate(
      slice(col("_s"), lit(2), greatest(size(col("_s")) - 1, lit(0))),
      array(element_at(col("_s"), 1).getField("_y"), lit(0.0)),
      (acc, x) => {
        val y = x.getField("_y")
        array(newLevel(acc, y),
          b * (newLevel(acc, y) - element_at(acc, 1)) +
            (lit(1.0) - b) * element_at(acc, 2))
      })
    series.filter(col("n_points") >= 1)
      .withColumn("_st", state)
      .select(g ++ Seq(col("n_points"),
        element_at(col("_st"), 1).as("level"),
        element_at(col("_st"), 2).as("trend"),
        (element_at(col("_st"), 1) + element_at(col("_st"), 2))
          .as("forecast")): _*)
  }

  /** Lagged cross-correlation between two aligned series (the
    * lead/lag dependence screen: does series A at day d predict
    * series B at day d+lag?). Pearson r per lag in [−maxLag, maxLag]
    * over the inner-joined (x, x+lag) pairs.
    *
    * Exactness: both series are integer-valued aggregates (counts or
    * cent-scaled sums); all five sufficient statistics fold exactly
    * in decimal(38,0) and r derives from them in one fixed double
    * expression (sqrt is IEEE-correctly-rounded on both engines —
    * the [[graft.analytics.Stats.spearman]] discipline).
    *
    * Scale shape: per lag one equi-join of the two (day-grained,
    * metadata-sized) series tables — the lag set is a constant;
    * everything map-side combines.
    */
  def crossCorrelation(
      a: DataFrame,
      b: DataFrame,
      xCol: String,
      valueCol: String,
      maxLag: Int,
      scale: Int = 0): DataFrame = {
    require(maxLag >= 0 && maxLag <= 64, s"maxLag=$maxLag")
    require(scale >= 0 && scale <= 6, s"scale=$scale")
    val d38 = "decimal(38,0)"
    // fractional series: Pearson r is invariant under positive affine
    // maps, so `scale` fixes the decimal precision the inputs fold at
    // (values × 10^scale, the bollinger cent-scaling pattern) without
    // perturbing r — scale=0 keeps the integer-series contract (and
    // silently floors genuinely fractional inputs; pass scale > 0 for
    // those)
    val vcast = (c: Column) =>
      if (scale == 0) c.cast(d38)
      else (c.cast(s"decimal(38,$scale)") *
        lit(BigDecimal(10).pow(scale))).cast(d38)
    val lags = (-maxLag to maxLag).map(l => lit(l.toLong)).toSeq
    val aa = a.select(col(xCol).cast("long").as("_x"),
      vcast(col(valueCol)).as("_va"))
    val bb = b.select(col(xCol).cast("long").as("_xb"),
      vcast(col(valueCol)).as("_vb"))
    val lagged = aa.withColumn("lag", explode(array(lags: _*)))
      .join(bb, col("_xb") === col("_x") + col("lag"))
    val s = lagged.groupBy(col("lag"))
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_va")).as("_sa"), sum(col("_vb")).as("_sb"),
        sum(col("_va") * col("_vb")).as("_sab"),
        sum(col("_va") * col("_va")).as("_saa"),
        sum(col("_vb") * col("_vb")).as("_sbb"))
    val num = col("_n") * col("_sab") - col("_sa") * col("_sb")
    val da = col("_n") * col("_saa") - col("_sa") * col("_sa")
    val dbb = col("_n") * col("_sbb") - col("_sb") * col("_sb")
    s.select(col("lag"), col("_n").cast("long").as("n_days"),
      when(da > 0 && dbb > 0,
        num.cast("double") /
          sqrt(da.cast("double") * dbb.cast("double"))).as("xcorr"))
  }

  /** Rolling Bollinger bands per group (Bollinger 1980s): over the
    * trailing `window` periods, mean ± k·σ of the period value — the
    * classic adaptive-envelope anomaly screen for metric streams
    * (complements the fixed-threshold and seasonal-naive screens).
    *
    * Determinism: the rolling Σ and Σ² fold in exact decimal cents
    * over a ROWS frame ordered by (x) within the group — integer
    * sums under any partitioning; mean, population σ (one sqrt) and
    * the bands derive from the exact decimals in one fixed double
    * expression, so an independent engine's window replays them bit
    * for bit.
    *
    * Scale shape: one keyed sort window, two running decimal sums —
    * no self-join, no explode.
    */
  def bollinger(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      valueCol: String,
      window: Int,
      k: Double,
      scale: Int = 2): DataFrame = {
    require(window >= 2, s"window=$window")
    require(k > 0, s"k=$k")
    val d38 = "decimal(38,0)"
    val g = groupCols.map(col)
    val cents = (col(valueCol).cast(s"decimal(18,$scale)") *
      lit(math.pow(10, scale).toLong)).cast(d38)
    val w = Window.partitionBy(g: _*).orderBy(col(xCol))
      .rowsBetween(-(window - 1), 0)
    val base = df.filter(col(xCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("_c", cents)
      .withColumn("_n", count(lit(1)).over(w).cast(d38))
      .withColumn("_s", sum(col("_c")).over(w))
      .withColumn("_ss", sum(col("_c") * col("_c")).over(w))
    val nD = col("_n").cast("double")
    val unit = lit(math.pow(10, scale))
    val mean = col("_s").cast("double") / nD / unit
    // population variance from the exact sums: (n·Σx² − (Σx)²)/n²
    val varD = (col("_n") * col("_ss") - col("_s") * col("_s"))
      .cast("double") / (nD * nD) / (unit * unit)
    val sd = sqrt(varD)
    base.select(g ++ Seq(col(xCol).as("x"),
      col("_n").cast("long").as("n_window"),
      (col("_c").cast("double") / unit).as("value"),
      mean.as("mean"), sd.as("stddev"),
      (mean + lit(k) * sd).as("upper"),
      (mean - lit(k) * sd).as("lower")): _*)
  }

  /** Per-period OHLC bars (open/high/low/close) per group: open and
    * close pick the first/last value by (time, id) — the id
    * tie-break makes the bar DETERMINISTIC under any partitioning
    * even when two events share a timestamp. The standard
    * market-style downsample for dashboard pipelines.
    *
    * Scale shape: one keyed aggregation (min/max/min_by/max_by all
    * map-side combine on the struct ordering); no window, no sort.
    */
  def ohlc(
      df: DataFrame,
      groupCols: Seq[String],
      tsCol: String,
      idCol: String,
      valueCol: String,
      periodSeconds: Long): DataFrame = {
    require(periodSeconds >= 1, s"periodSeconds=$periodSeconds")
    val g = groupCols.map(col)
    val ts = col(tsCol).cast("long")
    val p = ((ts - pmod(ts, lit(periodSeconds))) / lit(periodSeconds))
      .cast("long")
    val v = col(valueCol).cast("decimal(18,2)")
    // null ts/id would aggregate into a spurious null-period bar (and
    // a null leg in the min/max struct ordering) — filter every input
    // column, like the sibling operators
    df.filter(col(valueCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull)
      .select(g ++ Seq(p.as("period"), ts.as("_t"),
        col(idCol).as("_id"), v.as("_v")): _*)
      .groupBy(g :+ col("period"): _*)
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("_t"), col("_id"), col("_v"))).as("_first"),
        max(struct(col("_t"), col("_id"), col("_v"))).as("_last"),
        max(col("_v")).as("high"), min(col("_v")).as("low"))
      .select(g ++ Seq(col("period"), col("n_events"),
        // decimal(18,2)→double is exact at these magnitudes; double
        // output matches the oracle bridge (DECIMAL renders as float)
        col("_first._v").cast("double").as("open"),
        col("high").cast("double").as("high"),
        col("low").cast("double").as("low"),
        col("_last._v").cast("double").as("close")): _*)
  }

  /** Exact single changepoint per series (binary segmentation, depth
    * 1 — the first split of Scott & Knott 1974 / the CUSUM-style
    * offline complement of [[graft.analytics.Stats]]' streaming
    * cusum): over each group's (order, value) series, the split k
    * that maximizes the SSE reduction
    * Δ(k) = k(n−k)/n · (mean_left − mean_right)², i.e. argmax of
    * A(k)²/D(k) with A = S_k·n − S·k (exact integers) and
    * D = k(n−k).
    *
    * Determinism contract: A and D are exact decimal(38,0)/HUGEINT
    * integers under any partitioning; the score is ONE fixed
    * expression over their correctly-rounded double casts —
    * (A_d·A_d)/D_d — so every engine computes identical bits and the
    * argmax (ties → smallest k) replays exactly. Means are one IEEE
    * division from exact sums.
    *
    * Scale shape: per-group running windows (one shuffle on the
    * group key) + one argmax aggregate. The series is a per-group
    * SCAN STATISTIC: n is the number of ordered points per group
    * (days of a KPI, not raw events) — aggregate upstream, as the
    * gate row does. Values must be exact integers (cents);
    * |S·n| must fit decimal(38,0) — at daily granularity that is
    * ~10²⁰ headroom.
    *
    * Output: (group…, n, cp_k, split order value, mean_left,
    * mean_right, score); groups with n < 2 are absent (no split
    * exists).
    */
  def changepoint(df: DataFrame, groupCols: Seq[String], orderCol: String,
                  valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_t"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val staged = df.select(groupCols.map(col) ++ Seq(col(orderCol).as("_t"),
        col(valueCol).cast("long").as("_v")): _*)
      .withColumn("_k", row_number().over(w).cast("long"))
      .withColumn("_sk", sum(col("_v")).over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_s", sum(col("_v")).over(wAll))
    val cand = staged.filter(col("_k") < col("_n"))
      .withColumn("_a", col("_sk").cast(d38) * col("_n").cast(d38) -
        col("_s").cast(d38) * col("_k").cast(d38))
      .withColumn("_dd", (col("_k") * (col("_n") - col("_k"))).cast(d38))
      .withColumn("_q", (col("_a").cast("double") * col("_a").cast("double"))
        / col("_dd").cast("double"))
    cand.groupBy(groupCols.map(col): _*)
      .agg(max(struct(col("_q"), (-col("_k")).as("_nk"), col("_t"),
        col("_sk"), col("_n"), col("_s"))).as("_best"))
      .select(groupCols.map(col) ++ Seq(
        col("_best._n").as("n"),
        (-col("_best._nk")).as("cp_k"),
        col("_best._t").as("split_at"),
        (col("_best._sk").cast("double") /
          (-col("_best._nk")).cast("double")).as("mean_left"),
        ((col("_best._s") - col("_best._sk")).cast("double") /
          (col("_best._n") + col("_best._nk")).cast("double")).as("mean_right"),
        col("_best._q").as("score")): _*)
  }

  /** Hurst exponent by rescaled-range analysis (Hurst 1951; the R/S
    * formulation of Mandelbrot & Wallis 1969): for each block size m,
    * split the group's ordered series into full m-point blocks; per
    * block compute R/S = (max−min of the cumulative mean deviations)
    * over the population std; average R/S per m in BLOCK ORDER; the
    * slope of ln E[R/S] on ln m is H — the long-range-dependence
    * diagnostic (H≈0.5 memoryless, H→1 trending/persistent) a KPI
    * curator reads next to [[changepoint]].
    *
    * Exactness: within a block of fixed m, the deviation
    * dev_i = S_i·m − i·S_m and the variance m·Σx² − (Σx)² are exact
    * integers (values are cents), so R/S = R_scaled/√var_scaled is
    * ONE fixed double expression — identical bits on any engine. The
    * per-m mean folds in block order (deterministic-fold idiom,
    * bounded: blocks ≤ n/min(m)); the final 2-to-4-point OLS rounds
    * to 6 dp (the zipf/heaps precedent). Zero-variance blocks carry
    * no rescaled range and are excluded; groups with fewer than two
    * distinct usable m points are absent.
    *
    * Scale shape: one shuffle on the group key for the block windows,
    * one (group, m, block) aggregate, one bounded per-(group, m)
    * fold, one tiny OLS — series length per group is the bounded
    * scan-statistic contract of [[changepoint]].
    */
  def hurstRs(df: DataFrame, groupCols: Seq[String], orderCol: String,
              valueCol: String,
              blockSizes: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    require(blockSizes.nonEmpty && blockSizes.forall(_ >= 2),
      s"blockSizes=$blockSizes")
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_t"))
    val base = df.select(groupCols.map(col) ++ Seq(col(orderCol).as("_t"),
        col(valueCol).cast("long").as("_v")): _*)
      .withColumn("_k", (row_number().over(w) - 1).cast("long"))
    val ms = blockSizes.map(m =>
      base.withColumn("_m", lit(m.toLong))
        .withColumn("_b", expr(s"_k div $m")))
      .reduce(_.unionByName(_))
    val wb = Window.partitionBy((groupCols.map(col) ++
        Seq(col("_m"), col("_b"))): _*).orderBy(col("_t"))
    val wbAll = Window.partitionBy((groupCols.map(col) ++
        Seq(col("_m"), col("_b"))): _*)
    val staged = ms
      .withColumn("_i", row_number().over(wb).cast("long"))
      .withColumn("_si", sum(col("_v")).over(wb))
      .withColumn("_sm", sum(col("_v")).over(wbAll))
      .withColumn("_cnt", count(lit(1)).over(wbAll))
      .filter(col("_cnt") === col("_m"))
      .withColumn("_dev", col("_si").cast(d38) * col("_m").cast(d38) -
        col("_i").cast(d38) * col("_sm").cast(d38))
    val blocks = staged
      .groupBy((groupCols.map(col) ++ Seq(col("_m"), col("_b"))): _*)
      .agg((max(col("_dev")) - min(col("_dev"))).as("_r"),
        (max(col("_m")).cast(d38) *
          sum(col("_v").cast(d38) * col("_v").cast(d38)) -
          sum(col("_v").cast(d38)) * sum(col("_v").cast(d38))).as("_var"))
      .filter(col("_var") > 0)
      .withColumn("_rs", col("_r").cast("double") /
        sqrt(col("_var").cast("double")))
    val perM = blocks
      .groupBy((groupCols.map(col) :+ col("_m")): _*)
      .agg((aggregate(array_sort(collect_list(struct(col("_b"), col("_rs")))),
        lit(0.0), (acc, x) => acc + x.getField("_rs")) /
        count(lit(1)).cast("double")).as("_mean_rs"),
        count(lit(1)).as("_n_blocks"))
      .filter(col("_mean_rs") > 0.0)
      .withColumn("_x", log(col("_m").cast("double")))
      .withColumn("_y", log(col("_mean_rs")))
    // deterministic m-ordered OLS fold (ols_fit6; x = ln m is the
    // unique ascending key): the native regr_* fold order is
    // partition-dependent
    perM.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_scales"),
        sum(col("_n_blocks")).as("n_blocks"),
        HashFunctions.ols_fit6(collect_list(
          struct(col("_x").as("x"), col("_y").as("y")))).as("_fit"))
      .select((groupCols.map(col) ++ Seq(col("n_scales"), col("n_blocks"),
        col("_fit.slope").as("hurst"),
        col("_fit.intercept").as("log_c"))): _*)
      .filter(col("n_scales") >= 2)
  }
}

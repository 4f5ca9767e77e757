package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-level data-quality profiling: the schema-wide companion of
  * [[Text.corpusProfile]] (which profiles one text column). The first
  * thing a pipeline runs against an unfamiliar 100 TB drop is exactly
  * this — per-column null rates, cardinalities and ranges — so it is
  * a first-class operator, not a notebook one-off.
  */
object Profiling {

  /** One profile row per column: non-null / null counts, exact
    * distinct count, and min/max (numeric columns in the `_num` pair,
    * string columns in the `_str` pair — the other pair is null, so
    * the output schema is fixed regardless of the profiled mix).
    *
    * Scale shape: ONE aggregation over a single scan. The exact
    * distinct counts compile to Catalyst's Expand-based
    * multi-distinct rewrite — one shuffle carrying (column-tag, value)
    * rows, map-side partially aggregated; there is no per-column scan
    * and no driver loop. The row-per-column pivot at the end is an
    * explode of a k-element array on a 1-row frame. For columns where
    * exact cardinality is not worth the Expand shuffle at 100 TB,
    * profile them with [[Sketch.hllRegisters]] instead — here the
    * contract is exactness (the oracle replays every count).
    */
  def columnProfile(
      df: DataFrame,
      numCols: Seq[String],
      strCols: Seq[String]): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty, "no columns to profile")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_total")) ++
        numCols.flatMap { c => Seq(
          count(col(c)).as(s"_cnt_$c"),
          count_distinct(col(c)).as(s"_dst_$c"),
          min(col(c)).cast("double").as(s"_min_$c"),
          max(col(c)).cast("double").as(s"_max_$c")) } ++
        strCols.flatMap { c => Seq(
          count(col(c)).as(s"_cnt_$c"),
          count_distinct(col(c)).as(s"_dst_$c"),
          min(col(c)).as(s"_smin_$c"),
          max(col(c)).as(s"_smax_$c")) }
    val base = df.agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] =
      numCols.map { c => struct(
        lit(c).as("column"),
        col(s"_cnt_$c").as("n_nonnull"),
        (col("_total") - col(s"_cnt_$c")).as("n_null"),
        col(s"_dst_$c").as("n_distinct"),
        col(s"_min_$c").as("min_num"),
        col(s"_max_$c").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str")) } ++
      strCols.map { c => struct(
        lit(c).as("column"),
        col(s"_cnt_$c").as("n_nonnull"),
        (col("_total") - col(s"_cnt_$c")).as("n_null"),
        col(s"_dst_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"_smin_$c").as("min_str"),
        col(s"_smax_$c").as("max_str")) }
    base.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }
}

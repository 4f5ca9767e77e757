package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/Great-Expectations
  * shape, re-expressed as plain aggregations): a suite of constraints
  * runs against a table and yields one verdict row per constraint —
  * the contract gate every ingest pipeline wants in front of a sink.
  *
  * Exactness: every metric is an exact integer (violation counts,
  * distinct counts); fraction thresholds compare by cross-multiply
  * (violations·10⁶ ≤ scaled-threshold·n), so verdicts are bit-stable
  * under any partitioning — no float accumulations anywhere.
  *
  * Scale shape: all ROW-LOCAL checks (null/range/set-membership)
  * fold into ONE aggregation pass over the table (conditional sums,
  * map-side combined); each uniqueness or distinct-cardinality check
  * adds one keyed aggregation of its own (they need a shuffle by
  * definition). A 10-check suite with one unique key is two scans of
  * the table, not ten.
  */
object DataQuality {

  sealed trait Check {
    def id: String
    def column: String
  }
  /** Null fraction of `column` must be ≤ maxNullFraction (ppm
    * precision). */
  final case class NotNull(id: String, column: String,
                           maxNullFraction: Double = 0.0) extends Check
  /** All non-null values of `column` must lie in [lo, hi]. */
  final case class InRange(id: String, column: String,
                           lo: Double, hi: Double) extends Check
  /** All non-null values of `column` must be in `allowed`. */
  final case class ValuesIn(id: String, column: String,
                            allowed: Seq[String]) extends Check
  /** `columns` must be a unique key (no group occurs twice). */
  final case class Unique(id: String, columns: Seq[String]) extends Check {
    def column: String = columns.mkString(",")
  }
  /** Exact distinct count of `column` must lie in [lo, hi]. */
  final case class DistinctCountBetween(id: String, column: String,
                                        lo: Long, hi: Long) extends Check

  /** Run the suite; returns one row per check:
    * (check_id, check_type, column, n_rows, metric, passed) where
    * `metric` is the check's exact integer evidence (violation count,
    * duplicate-row surplus, or distinct count).
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.id).distinct.size == checks.size,
      "check ids must be unique")
    val spark = df.sparkSession

    val rowChecks = checks.collect {
      case c: NotNull => c.id ->
        sum(when(col(c.column).isNull, lit(1L)).otherwise(lit(0L)))
      case c: InRange => c.id ->
        sum(when(col(c.column).isNotNull &&
            (col(c.column) < c.lo || col(c.column) > c.hi),
          lit(1L)).otherwise(lit(0L)))
      case c: ValuesIn => c.id ->
        sum(when(col(c.column).isNotNull &&
            !col(c.column).cast("string")
              .isin(c.allowed.map(lit(_)): _*),
          lit(1L)).otherwise(lit(0L)))
    }

    // ONE pass for every row-local check
    val rowAgg: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else Some(df.agg(count(lit(1)).as("_n"),
        rowChecks.map { case (id, e) => e.as(s"_m_$id") }: _*))

    def verdictRow(base: DataFrame, c: Check, tpe: String,
                   metric: Column, passed: Column): DataFrame =
      base.select(lit(c.id).as("check_id"), lit(tpe).as("check_type"),
        lit(c.column).as("column"), col("_n").cast("long").as("n_rows"),
        metric.cast("long").as("metric"), passed.as("passed"))

    val rowVerdicts = checks.flatMap {
      case c: NotNull =>
        val m = col(s"_m_${c.id}")
        val thr = math.round(c.maxNullFraction * 1000000L)
        Some(verdictRow(rowAgg.get, c, "not_null", m,
          m * lit(1000000L) <= lit(thr) * col("_n")))
      case c: InRange =>
        val m = col(s"_m_${c.id}")
        Some(verdictRow(rowAgg.get, c, "in_range", m, m === 0L))
      case c: ValuesIn =>
        val m = col(s"_m_${c.id}")
        Some(verdictRow(rowAgg.get, c, "values_in", m, m === 0L))
      case _ => None
    }

    val keyedVerdicts = checks.flatMap {
      case c: Unique =>
        // surplus rows beyond the first of each duplicated group
        val grouped = df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("_c"))
          .agg(sum(col("_c")).as("_n"),
            sum(col("_c") - lit(1L)).as("_dups"))
        Some(verdictRow(grouped, c, "unique", col("_dups"),
          col("_dups") === 0L))
      case c: DistinctCountBetween =>
        val g = df.agg(count(lit(1)).as("_n"),
          count_distinct(col(c.column)).as("_d"))
        Some(verdictRow(g, c, "distinct_between", col("_d"),
          col("_d") >= c.lo && col("_d") <= c.hi))
      case _ => None
    }

    (rowVerdicts ++ keyedVerdicts).reduce(_.unionByName(_))
  }

  /** Row-level reconciliation of two snapshots of the same table —
    * the CDC-pipeline acceptance check ("did the replica converge?"):
    * a FULL OUTER join on the key classifies every key as `only_a`,
    * `only_b`, `mismatch` or `match`, and names the differing columns
    * (sorted, comma-joined) so a drifted field is directly visible.
    * Null-safe per-column equality (two nulls agree).
    *
    * Scale shape: one keyed full-outer join (AQE-broadcastable when a
    * side collapses); the per-column comparison is row-local codegen.
    * Pair with [[graft.queries]] `schema_drift` (structure) — this is
    * the VALUE-level half of snapshot diffing.
    */
  def reconcile(
      a: DataFrame,
      b: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "need key and compare columns")
    val k = keyCols.map(col)
    def side(df: DataFrame, p: String) =
      df.select(k ++ compareCols.map(c => col(c).as(s"${p}$c")) :+
        lit(1).as(s"${p}present"): _*)
    val joined = side(a, "_a_").join(side(b, "_b_"), keyCols, "full_outer")
    val diffs = compareCols.map(c =>
      when(!(col(s"_a_$c") <=> col(s"_b_$c")), lit(c)))
    val mismatchCols = concat_ws(",",
      array_sort(filter(array(diffs: _*), x => x.isNotNull)))
    joined.select(k ++ Seq(
      when(col("_b_present").isNull, lit("only_a"))
        .when(col("_a_present").isNull, lit("only_b"))
        .when(mismatchCols =!= "", lit("mismatch"))
        .otherwise(lit("match")).as("status"),
      when(col("_a_present").isNotNull && col("_b_present").isNotNull,
        mismatchCols).otherwise(lit("")).as("mismatch_cols")): _*)
  }
}

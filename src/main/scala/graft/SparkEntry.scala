package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-area registries:
  *  - [[graft.queries.Relational]] — Spark's relational surface
  *  - [[graft.queries.Processors]] — Conduit processor semantics over
  *    CDC-wrapped test tables
  *  - [[graft.queries.Analytics]] — training-data pipeline operators
  *    (dedup / similarity / text / multimodal)
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Processors.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Temporal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Processors.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.Temporal.oracles
}

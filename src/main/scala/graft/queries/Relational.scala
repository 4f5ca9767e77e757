package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational query surface (SURVEY §2.8): the reference has no
  * SQL engine, so these expose Spark's own operators — aggregation,
  * joins (broadcast for dims), windows, top-k, set ops, grouping sets —
  * as the engine's analytics layer. Each query has a DuckDB oracle.
  *
  * Determinism rules for the oracle hash-compare:
  *  - monetary aggregates go through `decimal(18,2)` (exact) and are
  *    cast to double only at the end — both engines produce the same
  *    bits regardless of partial-aggregation order;
  *  - every result set carries a unique natural key so row sorting is
  *    total;
  *  - timestamps are reduced to dates/epoch longs (parquet ns vs µs).
  */
object Relational {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val d2 = "decimal(18,2)"

  /** events.ts arrives as long nanos (parquet TIMESTAMP(NANOS) via
    * nanosAsLong). Integer `div` keeps full precision — a double
    * division would round above 2^53 ns.
    */
  private def tsEpochSeconds(df: DataFrame): Column =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      expr("ts div 1000000000")
    else unix_timestamp(col("ts"))
  private def tsDay(df: DataFrame): Column =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      to_date(timestamp_seconds(expr("ts div 1000000000")))
    else to_date(col("ts"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: partial aggregation map-side,
    // one shuffle on the 6-value group key.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(d2)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(d2)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast(d2) * (lit(1).cast(d2) - col("l_discount").cast(d2))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Revenue per nation: fact ⋈ 3 dims. Only the FIXED-cardinality
    // dim (nation, 25 rows at every SF) gets an explicit broadcast
    // hint; orders/customer scale with the fact table, so their join
    // strategy is left to the size-gated planner + AQE — at sf0.1
    // they auto-broadcast (same plan as before), at 100 TB they
    // correctly become shuffle joins instead of OOMing the driver.
    "q2_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice").cast(d2) * (lit(1).cast(d2) - col("l_discount").cast(d2))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Top-10 orders by revenue — TakeOrderedAndProject, no full sort.
    "q3_top_orders" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice").cast(d2) * (lit(1).cast(d2) - col("l_discount").cast(d2))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Window: top-3 priciest lineitems per supplier.
    "q4_top3_per_supplier" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
    }),

    // Semi join: customers having at least one high-value order.
    "q5_big_spenders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Selective scan: filter + project pushed into the parquet reader.
    "q6_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice").cast(d2) * col("l_discount").cast(d2)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Distinct + anti join (set difference on keys).
    "q7_parts_never_ordered" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val li = t(s, dir, "lineitem").select(col("l_partkey")).distinct()
      p.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
    }),

    // Rollup with grouping indicators.
    "q8_rollup_returns" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(d2)).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).cast("long").as("grp"))
    }),

    // CUBE completes the grouping surface next to q8's ROLLUP: all
    // four grouping sets incl. the linestatus-only marginals, with the
    // grouping bitmask disambiguating aggregate rows from data rows.
    "q19_cube_returns" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(d2)).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).cast("long").as("grp"))
    }),

    // Event-stream windowing: per-user session counts via lag + gap>30m.
    "q9_user_sessions" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      ev.select(col("user_id"), col("event_id"), tsEpochSeconds(ev).as("ts_s"), col("ts"))
        .select(col("user_id"), col("ts_s"), lag(col("ts_s"), 1).over(w).as("prev_s"))
        .withColumn("new_session",
          when(col("prev_s").isNull || (col("ts_s") - col("prev_s")) > 1800L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // Join fact to events-day aggregate: date-typed group key.
    "q10_daily_event_value" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.groupBy(tsDay(ev).cast("string").as("day"), col("event_type"))
        .agg(sum(col("value").cast(d2)).cast("double").as("total_value"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q13 shape: left outer join + per-customer count + histogram.
    "q11_customer_distribution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Conditional aggregation (TPC-H Q12 shape): case-when sums.
    "q12_priority_lines" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
    }),

    // String functions: like / substring / concat / upper.
    "q13_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_name").like("%gold%") || col("p_type").startsWith("SMALL"))
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"))
    }),

    // Set operations on key sets.
    "q14_set_ops" -> ((s, dir) => {
      val fromOrders = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val highValue = t(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("k"))
      fromOrders.distinct().except(highValue.distinct())
        .withColumnRenamed("k", "custkey_low_only")
    }),

    // Correlated-subquery shape (TPC-H Q17): qty below 20% of the
    // per-part average — expressed as aggregate + self-join (the
    // decorrelation Catalyst would do anyway).
    "q15_small_qty_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((sum(col("l_quantity").cast(d2)) / count(lit(1))).cast("double").as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(sum(col("l_extendedprice").cast(d2)).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // RANGE-frame window: 7-day rolling revenue per customer. The
    // frame is value-based (peers at the same day all included), the
    // only window-frame kind the surface didn't cover yet. Decimal
    // sums keep the rolling total order-independent.
    "q17_rolling_revenue" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("od_s").asc)
        .rangeBetween(-6 * 86400L, 0L)
      o.select(col("o_orderkey"), col("o_custkey"),
          unix_timestamp(col("o_orderdate")).as("od_s"),
          col("o_totalprice"))
        .select(col("o_orderkey"), col("o_custkey"), col("od_s"),
          sum(col("o_totalprice").cast(d2)).over(w).cast("double").as("rolling_rev"),
          count(lit(1)).over(w).as("n_orders_7d"))
    }),

    // Date arithmetic and truncation.
    "q16_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_add(to_date(col("o_orderdate")), 30).cast("string").as("due_date"),
          datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate")))
            .cast("long").as("age_days"))
    }),

    // Wide pivot: per-user spend matrix over a FIXED value list (an
    // explicit list keeps the plan one pass — inferring values adds a
    // distinct job — and keeps the schema deterministic). Sums ride
    // decimal for order-free bits.
    "pivot_events" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("value").cast(d2)).cast("double"))
    }),

    // Unpivot (melt): lineitem charge columns to long form — the
    // inverse reshape, one pass, no shuffle at all.
    "unpivot_charges" -> ((s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "amount")),

    // Cohort retention matrix: users bucketed by first-active day,
    // counted on every later active day. Two shuffles total — the
    // (user, day) distinct and the matrix groupBy; the per-user min
    // rides the same distinct output. All-integer, order-free.
    "q18_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val act = ev.select(col("user_id"), tsEpochSeconds(ev).as("ts_s"))
        .select(col("user_id"), expr("ts_s div 86400").as("day"))
        .distinct()
      val coh = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      act.join(coh, "user_id")
        .groupBy(col("cohort_day"), col("day"))
        .agg(count(lit(1)).as("users"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q2_revenue_by_nation" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q3_top_orders" ->
      """SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY l_orderkey
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q4_top3_per_supplier" ->
      """SELECT * FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             CAST(row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INT) AS rk
           FROM lineitem) WHERE rk <= 3""",
    "q5_big_spenders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""",
    "q6_forecast_revenue" ->
      """SELECT
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q7_parts_never_ordered" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)""",
    "q8_rollup_returns" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         count(*) AS n_rows,
         CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS grp
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q19_cube_returns" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         count(*) AS n_rows,
         CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS grp
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q9_user_sessions" ->
      """SELECT user_id,
         CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id,
             CASE WHEN prev_s IS NULL OR (ts_s - prev_s) > 1800 THEN 1 ELSE 0 END AS new_session
           FROM (SELECT user_id,
             epoch_ns(ts) // 1000000000 AS ts_s,
             lag(epoch_ns(ts) // 1000000000, 1) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_s
             FROM events)) GROUP BY user_id""",
    "q10_daily_event_value" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(*) AS n
         FROM events GROUP BY CAST(ts AS DATE), event_type""",
    "q11_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey) GROUP BY c_count""",
    "q12_priority_lines" ->
      """SELECT l_linestatus,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY l_linestatus""",
    "q13_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, substr(p_name, 1, 5) AS prefix,
         p_brand || '/' || p_type AS brand_type,
         CAST(length(p_name) AS BIGINT) AS name_len
         FROM part WHERE p_name LIKE '%gold%' OR p_type LIKE 'SMALL%'""",
    "q14_set_ops" ->
      """SELECT k AS custkey_low_only FROM (
           SELECT DISTINCT o_custkey AS k FROM orders
           EXCEPT
           SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 150000.0)""",
    "q15_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_rows
         FROM lineitem JOIN (
           SELECT l_partkey AS ap_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*) AS DOUBLE) AS avg_qty
           FROM lineitem GROUP BY l_partkey) ON l_partkey = ap_partkey
         WHERE l_quantity < 0.5 * avg_qty""",
    "q17_rolling_revenue" ->
      """SELECT o_orderkey, o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS od_s,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_rev,
         count(*) OVER w AS n_orders_7d
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT) ASC
           RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)""",
    "q16_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
         CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS age_days
         FROM orders""",
    "pivot_events" ->
      """SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
         CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
         CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
         CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
         FROM events GROUP BY user_id""",
    "unpivot_charges" ->
      """SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, l_extendedprice AS amount
         FROM lineitem WHERE l_orderkey < 2000
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem WHERE l_orderkey < 2000
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
         FROM lineitem WHERE l_orderkey < 2000""",
    "q18_cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
             epoch_ns(ts) // 1000000000 // 86400 AS day
           FROM events),
         coh AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
         SELECT cohort_day, day, count(*) AS users
         FROM act JOIN coh USING (user_id)
         GROUP BY 1, 2"""
  )
}

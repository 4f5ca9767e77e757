package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (the 100 TB join story): fact and
  * dimension saved bucketed by the join key join WITHOUT a shuffle
  * exchange on either side — the partitioning is baked into storage
  * and reused across every downstream join/aggregation on that key.
  * At sf0.1 a shuffle is cheap; at 100 TB removing the fact-table
  * exchange is the difference between one network pass and none.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // a previously-failed run can leave an orphan managed-table dir
    for (t <- Seq("li_bucketed", "o_bucketed"))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t))
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // sf0.001 dims auto-broadcast, which hides the mechanism under
    // test — force the shuffle-join path a 100 TB fact table would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not exchange either side: bucket pruning
    // makes both inputs co-partitioned on the join key already
    val exchangesBeforeAgg = plan.linesIterator
      .takeWhile(!_.contains("SortMergeJoin"))
      .count(_.contains("Exchange"))
    assert(plan.contains("SortMergeJoin"), plan.take(400))
    assert(exchangesBeforeAgg <= 1, // only the final group-by exchange
      s"bucketed join must not shuffle its inputs:\n${plan.take(1200)}")
    assert(!plan.linesIterator.dropWhile(!_.contains("SortMergeJoin"))
      .exists(_.contains("Exchange")),
      "no exchange below the join")
    // and the result matches the plain-parquet join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}

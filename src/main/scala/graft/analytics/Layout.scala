package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional clustering. Sorting a table
  * by a Z-order (Morton) key interleaves the bits of two range-query
  * columns, so file-level min/max statistics prune BOTH dimensions —
  * the standard lakehouse trick for "WHERE a BETWEEN … AND b
  * BETWEEN …" workloads where a single-column sort only prunes one.
  * The key is pure bit arithmetic on columns (codegen'd, no UDF).
  */
object Layout {

  /** Morton key from the low `bits` of two non-negative longs: bit i
    * of x lands at position 2i, bit i of y at 2i+1. Values must fit in
    * `bits` bits for the key to preserve locality (callers bucket or
    * clamp first; TPC-H keys at sf ≤ 1 fit in 31).
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Cluster `df` for two-dimensional range pruning: range-partition
    * then sort within partitions by the Morton key of (xCol, yCol).
    * Writing the result gives each file a tight z-range, i.e. a tight
    * rectangle in (x, y) — min/max skipping then works on both
    * columns. Content is untouched (same multiset of rows).
    */
  def zorderLayout(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      numPartitions: Int): DataFrame = {
    val key = zorderKey(col(xCol), col(yCol), bits)
    df.withColumn("_zkey", key)
      .repartitionByRange(numPartitions, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }
}

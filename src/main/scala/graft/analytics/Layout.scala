package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional clustering. Sorting a table
  * by a Z-order (Morton) key interleaves the bits of two range-query
  * columns, so file-level min/max statistics prune BOTH dimensions —
  * the standard lakehouse trick for "WHERE a BETWEEN … AND b
  * BETWEEN …" workloads where a single-column sort only prunes one.
  * The key is pure bit arithmetic on columns (codegen'd, no UDF).
  */
object Layout {

  /** Morton key from the low `bits` of N non-negative longs: bit i of
    * column j lands at position i·n + j (the standard round-robin
    * interleave — for n = 2 this is the classic x-even/y-odd layout).
    * n·bits must fit in 63 key bits; values must fit in `bits` bits
    * for the key to preserve locality (callers bucket or clamp first;
    * TPC-H keys at sf ≤ 1 fit in 31). Covers the common 3-4-column
    * clustering case (e.g. (order, part, supplier)) with the same
    * pure-bit-arithmetic, codegen'd column expression.
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zorderKey needs at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"bits=$bits with $n columns exceeds a 63-bit key")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Two-column Morton key (delegates to the N-column interleave). */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits <= 31, s"bits=$bits out of range")
    zorderKey(Seq(x, y), bits)
  }

  /** Two-column Hilbert key — the locality upgrade over [[zorderKey]]:
    * consecutive key values are always 4-adjacent grid cells (the
    * defining curve property, asserted in spec), where the Morton
    * order takes cross-quadrant "Z jumps", so Hilbert-sorted files
    * cover tighter (x, y) rectangles and min/max pruning discards
    * more. Inputs must lie in [0, 2^bits) — mask or bucket upstream.
    * Cost: the 2-D curve only (the rotation state has no clean
    * N-column closed form; for 3+ columns use [[zorderKey]], which is
    * why both ship).
    */
  def hilbertKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    HashFunctions.hilbert_index(x.cast("long"), y.cast("long"), bits)
  }

  /** Cluster `df` for two-dimensional range pruning: range-partition
    * then sort within partitions by the Morton key of (xCol, yCol).
    * Writing the result gives each file a tight z-range, i.e. a tight
    * rectangle in (x, y) — min/max skipping then works on both
    * columns. Content is untouched (same multiset of rows).
    */
  /** Bin-packing compaction plan over a file LISTING — the planner
    * half of a lakehouse OPTIMIZE/rewrite (reference intent: keeping
    * a 100 TB CDC-compacted table readable after many small streaming
    * commits). Files already ≥ `targetBytes` are left in place
    * (`bin = -1`, their own singleton group); the rest, ordered
    * deterministically by `pathCol` within each table partition, pack
    * by size quota: with exclusive running size c(f), file f goes to
    * `bin = c(f) div targetBytes`. Quota packing (vs greedy re-fit)
    * is one window over metadata rows — ~1 row per file, i.e. ~800k
    * rows for 100 TB of 128 MB files, partitioned by the table's
    * partition columns — and each bin overflows the target by less
    * than one file by construction. No data rows move until the
    * caller executes the plan (read bin, coalesce(1), rewrite).
    */
  def compactionPlan(
      files: DataFrame,
      pathCol: String,
      sizeCol: String,
      targetBytes: Long,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    val pc = partitionCols.map(col)
    val isSmall = col(sizeCol) < lit(targetBytes)
    val wCum = Window.partitionBy(pc :+ isSmall: _*)
      .orderBy(col(pathCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBin = Window.partitionBy(pc :+ col("bin"): _*)
    files
      .withColumn("_cum", coalesce(sum(col(sizeCol)).over(wCum), lit(0L)))
      .withColumn("bin",
        when(isSmall, expr(s"_cum div ${targetBytes}L")).otherwise(lit(-1L)))
      .withColumn("bin_bytes",
        when(col("bin") === -1L, col(sizeCol).cast("long"))
          .otherwise(sum(col(sizeCol)).over(wBin).cast("long")))
      .withColumn("bin_files",
        when(col("bin") === -1L, lit(1L)).otherwise(count(lit(1)).over(wBin)))
      .select(pc ++ Seq(col(pathCol), col(sizeCol).cast("long").as("size_bytes"),
        col("bin"), col("bin_bytes"), col("bin_files")): _*)
  }

  /** Per-file column statistics — the footer/metadata a lakehouse
    * writer records for every file it closes: row count + min/max of
    * each skipping column. One aggregation over data rows; at 100 TB
    * the OUTPUT is ~1 row per file (~800k rows for 128 MB files), the
    * working set every subsequent [[pruneFiles]] call plans against
    * without touching data.
    */
  def fileStats(df: DataFrame, fileCol: String,
                statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "statCols must be non-empty")
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(col(fileCol))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Min/max skipping decision over a [[fileStats]] listing: a file
    * must be read iff EVERY range predicate `[lo, hi]` intersects the
    * file's `[min, max]` on that column (`max ≥ lo AND min ≤ hi`) —
    * the conservative test cannot skip a file containing a match.
    * Under a [[zorderLayout]] write both dimensions prune; under a
    * single-column sort only that column does. Pure metadata-row
    * arithmetic: evaluating a 100 TB table's skip set costs one pass
    * over ~800k stats rows, no data I/O.
    */
  def pruneFiles(stats: DataFrame,
                 ranges: Seq[(String, Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "ranges must be non-empty")
    val mustRead = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    stats.withColumn("must_read", mustRead)
  }

  /** Per-file 64-bit Bloom masks for POINT-lookup skipping — the
    * complement of [[fileStats]]'s min/max ranges (which cannot skip
    * on a high-cardinality key scattered across every file's range).
    * Each row sets `kProbes` bits chosen by golden-strided splitmix64
    * lanes; the file mask is the `bit_or` of its rows — one shuffle
    * of (file, 8-byte mask) partials with map-side combine, metadata
    * scale thereafter. 64 bits keeps the mask an integer COLUMN (no
    * binary blobs, fully oracle-replayable); production file-level
    * blooms are KB-sized — same algebra, wider array.
    */
  def bloomFileStats(df: DataFrame, fileCol: String, keyCol: String,
                     kProbes: Int = 2, seed: Long = 7L): DataFrame = {
    require(kProbes >= 1 && kProbes <= 8)
    val bits = (0 until kProbes).map { p =>
      call_function("shiftleft", lit(1L),
        pmod(HashFunctions.splitmix64_hash(
          col(keyCol) + lit(seed + p * 2654435769L)), lit(64L)).cast("int"))
    }.reduce(_ bitwiseOR _)
    df.select(col(fileCol), bits.as("_bits"))
      .groupBy(col(fileCol))
      .agg(expr("bit_or(_bits)").as("bloom_mask"),
        count(lit(1)).as("n_rows"))
  }

  /** Skip decision per (file, probe key): read the file iff every
    * probe bit is set in its mask (`mask & probe == probe`) —
    * conservative like [[pruneFiles]]: a false positive reads a file
    * needlessly, a containing file can never be skipped.
    */
  def bloomPrune(stats: DataFrame, probes: DataFrame, probeCol: String,
                 kProbes: Int = 2, seed: Long = 7L): DataFrame = {
    val bits = (0 until kProbes).map { p =>
      call_function("shiftleft", lit(1L),
        pmod(HashFunctions.splitmix64_hash(
          col(probeCol) + lit(seed + p * 2654435769L)), lit(64L)).cast("int"))
    }.reduce(_ bitwiseOR _)
    stats.crossJoin(broadcast(probes.select(col(probeCol))))
      .withColumn("_probe", bits)
      .withColumn("might_contain",
        col("bloom_mask").bitwiseAND(col("_probe")) === col("_probe"))
      .drop("_probe")
  }

  def zorderLayout(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      numPartitions: Int): DataFrame =
    zorderLayout(df, Seq(xCol, yCol), bits, numPartitions)

  /** N-column Z-order clustering: range-partition then sort within
    * partitions by the Morton key, so each written file gets a tight
    * hyper-rectangle in every clustering dimension. Content untouched
    * (same multiset of rows).
    */
  def zorderLayout(
      df: DataFrame,
      zCols: Seq[String],
      bits: Int,
      numPartitions: Int): DataFrame = {
    val key = zorderKey(zCols.map(col), bits)
    df.withColumn("_zkey", key)
      .repartitionByRange(numPartitions, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969): score
  * candidate pairs by the log-likelihood ratio of their field
  * agreement pattern — agreement on field i contributes ln(m_i/u_i)
  * (m = P(agree | match), u = P(agree | non-match)), disagreement
  * ln((1−m_i)/(1−u_i)) — the entity-resolution workhorse between
  * exact dedup and embedding similarity. Parameters come from the
  * caller (EM-fit or hand-set); the operator is the scoring pass.
  */
object Linkage {

  /** The blocked pair join with ENFORCED per-task bounds — the
    * [[Dedup.boundedSelfPairs]]/`boundedCrossPairs` discipline applied
    * to the linkage block key, carrying full comparison-field rows
    * instead of bare member ids. A hot-block prepass (one count row
    * per DISTINCT block, map-side combined) finds blocks where either
    * side exceeds `maxBlock` rows; those are grid-chunked so no join
    * key ever holds more than maxBlock×maxBlock comparisons and a
    * degenerate low-cardinality blocking key (the 10¹²-pair failure
    * mode) spreads across the cluster instead of one straggler/OOM.
    * Cold blocks — the overwhelmingly common case under a sane
    * blocking key — take the plain equi-join with no replication, so
    * the default cap is a no-op there.
    *
    * `selfPairs = true` uses the triangular chunk layout (left emits
    * blocks j ≥ own chunk, right emits i ≤ own chunk) so each
    * unordered pair meets exactly once across chunks; same-chunk
    * blocks hold both orderings and are de-duplicated by the id
    * filter. Output keeps the internal `_ci`/`_cj` chunk-block
    * columns (null on the cold path) so specs can assert the
    * per-key-group pair bound; [[linkageScore]] drops them.
    */
  private[graft] def boundedBlockedJoin(
      aa0: DataFrame,
      bb0: DataFrame,
      selfPairs: Boolean,
      maxBlock: Int): DataFrame = {
    // Fence both sides ([[Fences]], r18 — the boundedSelfPairs
    // rationale): each feeds its size prepass, the hot-flag join, and
    // the cold/hot splits — ~3 upstream replays per side unfenced.
    val aa = Fences.fence(aa0)
    val bb = Fences.fence(bb0)
    val lsz = aa.groupBy(col("_blk")).agg(count(lit(1)).as("_lsz"))
    val rsz =
      if (selfPairs) lsz.select(col("_blk"), col("_lsz").as("_rsz"))
      else bb.groupBy(col("_blk")).agg(count(lit(1)).as("_rsz"))
    val hot = lsz.join(rsz, Seq("_blk"))
      .filter(col("_lsz") > maxBlock || col("_rsz") > maxBlock)
      .withColumn("_nl",
        ceil(col("_lsz").cast("double") / lit(maxBlock)).cast("int"))
      .withColumn("_nr",
        ceil(col("_rsz").cast("double") / lit(maxBlock)).cast("int"))
      .select(col("_blk"), col("_nl"), col("_nr"))
    // fenced like Dedup.boundedSelfPairs' flagged (r18): each side's
    // flag join feeds its cold AND hot split — unfenced, the hot-count
    // prepass + flag join rebuild per split
    val lf = Fences.fence(aa.join(hot, Seq("_blk"), "left"))
    val rf = Fences.fence(bb.join(hot, Seq("_blk"), "left"))

    // cold blocks: the plain blocked join, exactly the pre-cap plan
    val cold = lf.filter(col("_nl").isNull).drop("_nl", "_nr")
      .join(rf.filter(col("_nl").isNull).drop("_nl", "_nr"), Seq("_blk"))
      .withColumn("_ci", lit(null).cast("int"))
      .withColumn("_cj", lit(null).cast("int"))

    val hotPairs =
      if (selfPairs) {
        // triangular layout on the shared chunk hash: cross-chunk
        // blocks (i < j) hold each unordered pair once, same-chunk
        // blocks both orderings (the caller's id filter dedupes)
        val m = lf.filter(col("_nl").isNotNull)
          .withColumn("_chunk",
            pmod(xxhash64(col("_id_a")), col("_nl")).cast("int"))
        val right = rf.filter(col("_nl").isNotNull)
          .withColumn("_chunk",
            pmod(xxhash64(col("_id_b")), col("_nl")).cast("int"))
        val left = m
          .withColumn("_cj",
            explode(sequence(col("_chunk"), col("_nl") - 1)))
          .withColumnRenamed("_chunk", "_ci")
          .drop("_nl", "_nr")
        val r = right
          .withColumn("_ci", explode(sequence(lit(0), col("_chunk"))))
          .withColumnRenamed("_chunk", "_cj")
          .drop("_nl", "_nr")
        left.join(r, Seq("_blk", "_ci", "_cj"))
      } else {
        val hl = lf.filter(col("_nl").isNotNull)
          .withColumn("_ci",
            pmod(xxhash64(col("_id_a")), col("_nl")).cast("int"))
          .withColumn("_cj", explode(sequence(lit(0), col("_nr") - 1)))
          .drop("_nl", "_nr")
        val hr = rf.filter(col("_nl").isNotNull)
          .withColumn("_cj",
            pmod(xxhash64(col("_id_b")), col("_nr")).cast("int"))
          .withColumn("_ci", explode(sequence(lit(0), col("_nl") - 1)))
          .drop("_nl", "_nr")
        hl.join(hr, Seq("_blk", "_ci", "_cj"))
      }
    cold.unionByName(hotPairs)
  }

  /** Score blocked candidate pairs of `a` × `b`. Every weight is a
    * DRIVER-computed double literal (the same constant lands in any
    * replay — no runtime ln anywhere), the per-pair score is a
    * fixed-order sum of those constants, and agreement uses
    * null-safe equality (two nulls agree, null vs value disagrees).
    * Pairs below `minScore` are dropped.
    *
    * `selfPairs = true` treats a/b as the same table and keeps only
    * id_a < id_b (each unordered pair once — valid because the
    * agreement pattern, and hence the score, is symmetric in the
    * pair).
    *
    * Scale shape: one equi-join on the block key, with the blocked-
    * quadratic contract (pairs per block = |block_a|·|block_b|) now
    * ENFORCED by `maxBlock` via [[boundedBlockedJoin]]: blocks whose
    * either side exceeds it are grid-chunked so no task compares more
    * than maxBlock² pairs — a degenerate low-cardinality blocking key
    * degrades to distributed (still quadratic-in-pairs) work instead
    * of a single straggler/OOM task. Results are IDENTICAL for any
    * cap (chunking repartitions the pair space, never drops pairs);
    * under a sane blocking key (blocks ≤ maxBlock) the plan is the
    * plain pre-cap equi-join. Scoring itself is row-local codegen.
    */
  def linkageScore(
      a: DataFrame,
      b: DataFrame,
      idColA: String,
      idColB: String,
      blockCol: String,
      fields: Seq[(String, Double, Double)],
      minScore: Double,
      selfPairs: Boolean = false,
      maxBlock: Int = 10000): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(maxBlock >= 1, s"maxBlock=$maxBlock")
    fields.foreach { case (f, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
        s"field $f: need 0 < u < m < 1, got m=$m u=$u") }
    def side(df: DataFrame, idCol: String, idAs: String, p: String) =
      df.select(Seq(col(idCol).as(idAs), col(blockCol).as("_blk")) ++
        fields.map { case (f, _, _) => col(f).as(s"${p}$f") }: _*)
    val aa = side(a, idColA, "_id_a", "_a_")
    val bb = side(b, idColB, "_id_b", "_b_")
    val joined = boundedBlockedJoin(aa, bb, selfPairs, maxBlock)
    val pairs = dedupSelfPairs(joined, selfPairs)
    val agrees = fields.map { case (f, _, _) =>
      col(s"_a_$f") <=> col(s"_b_$f") }
    // StrictMath, not Math: the HotSpot Math.log intrinsic may change
    // bits between interpreted and JIT-compiled calls, so the "same"
    // constant computed twice in one JVM can differ by an ulp (seen in
    // the gate); StrictMath is bit-reproducible everywhere
    val score = fields.zip(agrees).map { case ((_, m, u), ag) =>
      when(ag, lit(StrictMath.log(m / u)))
        .otherwise(lit(StrictMath.log((1 - m) / (1 - u))))
    }.reduce(_ + _)
    val nAgree = agrees.map(ag =>
      when(ag, lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    pairs
      .withColumn("n_agree", nAgree)
      .withColumn("score", score)
      .filter(col("score") >= minScore)
      .select(pairIdCols(selfPairs) :+ col("n_agree") :+ col("score"): _*)
  }

  /** selfPairs: cold + same-chunk blocks hold both orderings (drop
    * the duplicate), cross-chunk blocks each unordered pair exactly
    * once (arbitrary id order — reordered by [[pairIdCols]]; valid
    * because every per-pair measure here is symmetric in the pair).
    */
  private def dedupSelfPairs(joined: DataFrame,
                             selfPairs: Boolean): DataFrame =
    if (!selfPairs) joined
    else joined.filter(
      when(col("_ci").isNull || col("_ci") === col("_cj"),
        col("_id_a") < col("_id_b")).otherwise(lit(true)))

  private def pairIdCols(selfPairs: Boolean): Seq[Column] = Seq(
    (if (selfPairs) least(col("_id_a"), col("_id_b"))
     else col("_id_a")).as("id_a"),
    (if (selfPairs) greatest(col("_id_a"), col("_id_b"))
     else col("_id_b")).as("id_b"))

  /** Fuzzy record-linkage pairs: Jaro–Winkler similarity over the
    * same blocked (and maxBlock-chunked) join as [[linkageScore]] —
    * the fuzzy-agreement extension of Fellegi–Sunter (exact agreement
    * is a 0/1 collapse of this). The kernel
    * ([[JaroWinklerImpl]]) byte-matches DuckDB's rapidfuzz-derived
    * `jaro_winkler_similarity` (probed: byte-level matching, integer
    * transposition halving, 0.7 boost threshold); similarities are
    * rounded to 9 dp BEFORE the threshold so both engines filter the
    * same value (the text_collocations ulp discipline). JW is
    * symmetric in the pair, so the selfPairs id reordering is sound.
    * Scale shape: one equi-join on the block key; chunking bounds any
    * task at maxBlock² comparisons; scoring is row-local codegen (one
    * static call per pair).
    */
  def fuzzyLinks(
      a: DataFrame,
      b: DataFrame,
      idColA: String,
      idColB: String,
      blockCol: String,
      textCol: String,
      minSim: Double,
      selfPairs: Boolean = false,
      maxBlock: Int = 10000): DataFrame = {
    require(minSim > 0 && minSim <= 1, s"minSim=$minSim")
    require(maxBlock >= 1, s"maxBlock=$maxBlock")
    val aa = a.select(col(idColA).as("_id_a"), col(blockCol).as("_blk"),
      col(textCol).as("_a_t"))
    val bb = b.select(col(idColB).as("_id_b"), col(blockCol).as("_blk"),
      col(textCol).as("_b_t"))
    val joined = boundedBlockedJoin(aa, bb, selfPairs, maxBlock)
    dedupSelfPairs(joined, selfPairs)
      .withColumn("jw", round(
        graft.analytics.HashFunctions.jaro_winkler(col("_a_t"), col("_b_t")),
        9))
      .filter(col("jw") >= lit(minSim))
      .select(pairIdCols(selfPairs) :+ col("jw"): _*)
  }
}

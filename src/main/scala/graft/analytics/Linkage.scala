package graft.analytics

import org.apache.spark.sql.DataFrame
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

  /** Score blocked candidate pairs of `a` × `b`. Every weight is a
    * DRIVER-computed double literal (the same constant lands in any
    * replay — no runtime ln anywhere), the per-pair score is a
    * fixed-order sum of those constants, and agreement uses
    * null-safe equality (two nulls agree, null vs value disagrees).
    * Pairs below `minScore` are dropped.
    *
    * `selfPairs = true` treats a/b as the same table and keeps only
    * id_a < id_b (each unordered pair once).
    *
    * Scale shape: one equi-join on the block key — the classic
    * blocked-quadratic linkage contract (pairs per block =
    * |block_a|·|block_b|): like [[Dedup.sortedNeighborhoodPairs]]'
    * window and LSH's `maxBucket`, the BLOCKING choice is the scale
    * lever; keep blocks bounded (add fields to the key) when a block
    * outgrows ~10⁴ rows. Scoring itself is row-local codegen.
    */
  def linkageScore(
      a: DataFrame,
      b: DataFrame,
      idColA: String,
      idColB: String,
      blockCol: String,
      fields: Seq[(String, Double, Double)],
      minScore: Double,
      selfPairs: Boolean = false): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    fields.foreach { case (f, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
        s"field $f: need 0 < u < m < 1, got m=$m u=$u") }
    def side(df: DataFrame, idCol: String, idAs: String, p: String) =
      df.select(Seq(col(idCol).as(idAs), col(blockCol).as("_blk")) ++
        fields.map { case (f, _, _) => col(f).as(s"${p}$f") }: _*)
    val aa = side(a, idColA, "id_a", "_a_")
    val bb = side(b, idColB, "id_b", "_b_")
    val joined = aa.join(bb, Seq("_blk"))
    val pairs = if (selfPairs) joined.filter(col("id_a") < col("id_b"))
                else joined
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
      .select(Seq(col("id_a"), col("id_b"), col("n_agree"),
        col("score")): _*)
  }
}

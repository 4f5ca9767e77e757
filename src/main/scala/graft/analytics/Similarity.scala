package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * against the corpus — one scan, no shuffle, top-k via per-query heap
  * (TakeOrdered after a window rank). The LSH/IVF paths bound the
  * candidate set so a 100 TB corpus only scores vectors sharing a
  * bucket/centroid with the query.
  */
object Similarity {
  import HashFunctions._

  /** Cosine similarity of two pre-normalized double vectors. */
  def cosine(a: Column, b: Column): Column = dot_product(a, b)

  /** L2-normalize a float/double vector (one-pass custom expression —
    * a lambda formulation re-evaluates the norm per element).
    */
  def normalize(v: Column): Column = l2_normalize(v)

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast). Output:
    * (query_id, rank, neighbor_id, cos_sim).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      l2_normalize(col(vecCol)).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      l2_normalize(col(vecCol)).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot_product(col("q_vec"), col("c_vec")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cos_sim"))
  }

  /** Embedding near-duplicate pairs above a cosine threshold.
    * method "brute" = block-nested pairing (correctness baseline);
    * method "lsh" = multi-table hyperplane LSH candidate generation
    * (the scale path: only vectors sharing a (table, bucket) cell are
    * paired; k planes tighten precision, L tables recover recall —
    * tune (k, L) to the threshold: high thresholds allow larger k).
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, method: String = "lsh",
                  numPlanes: Int = 4, numTables: Int = 12): DataFrame = {
    val base = df.select(col(idCol).as("vid"), normalize(col(vecCol)).as("nvec"))
    val candidates = method match {
      case "brute" =>
        val a = base.select(col("vid").as("id_a"), col("nvec").as("vec_a"))
        val b = base.select(col("vid").as("id_b"), col("nvec").as("vec_b"))
        a.join(b, col("id_a") < col("id_b"))
      case "lsh" =>
        // bucket join + dedup on bare id pairs (8 bytes each) — the
        // 64-dim vectors are joined back only for surviving pairs, so
        // they never ride through the dedup shuffle
        val bucketed = base
          .withColumn("buckets", hyperplane_buckets(col("nvec"), numPlanes, numTables))
          .select(col("vid"), posexplode(col("buckets")).as(Seq("table_id", "bucket")))
        val a = bucketed.select(col("table_id"), col("bucket"), col("vid").as("id_a"))
        val b = bucketed.select(col("table_id"), col("bucket"), col("vid").as("id_b"))
        val idPairs = a.join(b, Seq("table_id", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        idPairs
          .join(base.select(col("vid").as("id_a"), col("nvec").as("vec_a")), "id_a")
          .join(base.select(col("vid").as("id_b"), col("nvec").as("vec_b")), "id_b")
    }
    candidates
      .withColumn("cos_sim",
        dot_product(col("vec_a"), col("vec_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** IVF-style ANN: corpus assigned to the nearest of `nlist` centroids
    * (deterministic seed centroids = lowest-id vectors); queries probe
    * the `nprobe` nearest centroids only. Returns the same shape as
    * [[bruteForceTopK]]; recall < 1 by design, measured in tests.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val base = corpus.select(col(idCol).as("vid"), normalize(col(vecCol)).as("nvec"))
    // seed centroids deterministically, then one Lloyd refinement:
    // assign → mean per cell → renormalize (k-means on the sphere)
    val seeds = base.orderBy(col("vid").asc).limit(nlist)
      .select(col("vid").as("cid"), col("nvec").as("cvec"))
    val seedAssign = base.join(broadcast(seeds), lit(true))
      .select(col("vid"), col("nvec"), col("cid"),
        dot_product(col("nvec"), col("cvec")).as("cdot"))
    val wSeed = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vid")).orderBy(col("cdot").desc, col("cid").asc)
    // dimension-wise mean (distributed: (cid, dim) partial aggregates,
    // never a whole cell in one row), then renormalize to the sphere
    val centroids = seedAssign.withColumn("r", row_number().over(wSeed))
      .filter(col("r") === 1)
      .select(col("cid"), posexplode(col("nvec")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim")).agg(avg(col("x")).as("mx"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mx")))).as("dims"))
      .select(col("cid"), normalize(expr("transform(dims, d -> d.mx)")).as("cvec"))
    // assign: argmax over centroids (broadcast) of dot product
    val assigned = base.join(broadcast(centroids), lit(true))
      .select(col("vid"), col("nvec"), col("cid"),
        dot_product(col("nvec"), col("cvec")).as("cdot"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vid")).orderBy(col("cdot").desc, col("cid").asc)
    val corpusAssigned = assigned.withColumn("crank", row_number().over(w1))
      .filter(col("crank") === 1).select(col("vid"), col("nvec"), col("cid"))
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("qvec"))
    val qAssigned = q.join(broadcast(centroids), lit(true))
      .select(col("query_id"), col("qvec"), col("cid"),
        dot_product(col("qvec"), col("cvec")).as("cdot"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cdot").desc, col("cid").asc)
    val qProbes = qAssigned.withColumn("crank", row_number().over(w2))
      .filter(col("crank") <= nprobe).select(col("query_id"), col("qvec"), col("cid"))
    val scored = qProbes.join(corpusAssigned, Seq("cid"))
      .filter(col("query_id") =!= col("vid"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        dot_product(col("qvec"), col("nvec")).as("cos_sim"))
    val w3 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w3))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cos_sim"))
  }
}

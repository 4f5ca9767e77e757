package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import HashFunctions.java_ln

/** Sparse lexical retrieval over a document corpus: BM25 ranking and
  * TF-IDF weighting (Robertson & Spärck Jones; the k1/b form is BM25 as
  * published in TREC-3 / the Probabilistic Relevance Framework survey).
  *
  * Scale shape — the inverted-index plan, not a cartesian score:
  *   - document length is row-local (no shuffle);
  *   - corpus stats (N, avgdl) are a single two-value aggregate kept in
  *     the plan via a broadcast cross join (nothing collects);
  *   - only tokens that MATCH a query term are exploded, so the shuffle
  *     carries the posting lists of the query vocabulary, never the
  *     corpus text — with Q query terms this is the classic
  *     document-at-a-time candidate set;
  *   - per-term document frequencies are a |vocab(Q)|-row aggregate,
  *     broadcast back;
  *   - per-query top-k ranks only the candidate set (docs sharing ≥1
  *     term with the query), partitioned by query id so queries rank in
  *     parallel.
  *
  * Determinism: the per-document score folds term contributions in
  * lexicographic term order via a sequential `aggregate` fold, so the
  * IEEE sum is bit-identical to any engine folding the same order —
  * which is what lets the DuckDB oracle hash-match a floating-point
  * ranking function.
  */
object Retrieval {

  /** BM25 top-k per query. `queries` maps query_id -> bag of terms
    * (duplicate terms in a query are collapsed; scoring uses distinct
    * terms, the standard bag-of-words query model).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(String, Seq[String])],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val qdf = broadcast(
      queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
        .toDF("query_id", "term"))
    val allTerms = queries.flatMap(_._2).distinct

    // ONE corpus scan: tokenize once, keep only the document length and
    // the query-matched tokens (a few bytes/doc), and cache that slim
    // frame — the stats branch and the posting-list branch both read it,
    // so the full text is never scanned or tokenized twice. Lazy
    // persist: the first branch to execute materializes it.
    val termSet = array(allTerms.map(lit(_)): _*)
    val slim = docs.select(col(idCol).as("doc_id"),
      Text.wsTokens(lower(trim(col(textCol)))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        filter(col("toks"), t => array_contains(termSet, t)).as("qtoks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // N and avgdl as a one-row frame: stays in the distributed plan.
    val stats = slim.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .select(col("n"),
        (col("sumdl").cast("double") / col("n").cast("double")).as("avgdl"))

    val tf = slim
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))

    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))

    val idf = java_ln(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val termScore = idf *
      (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))

    val contrib = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .join(qdf, "term")
      .select(col("query_id"), col("doc_id"),
        struct(col("term"), termScore.as("c")).as("tc"))

    // Sequential fold in term order — deterministic IEEE sum.
    val scores = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(array_sort(collect_list(col("tc"))), lit(0.0),
        (acc, x) => acc + x.getField("c")).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scores.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** TF-IDF weights of every (document, term) with the term's corpus
    * document frequency at or above `minDf`. The weight is the standard
    * ltc-style tf·idf: (1 + ln tf) · ln(N / df). One explode + two hash
    * aggregations; the exchange carries (doc, term, count) triples with
    * map-side partial aggregation, never raw token instances.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
            minDf: Long = 2): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      Text.wsTokens(lower(trim(col(textCol)))).as("toks"))
    // count(*) only — column-pruned scan, no tokenization
    val stats = docs.agg(count(lit(1)).as("n"))
    // the inverted index itself: cached so the df aggregation and the
    // final weight join share one tokenize+explode pass over the corpus
    val tf = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
      .filter(col("df") >= minDf)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((lit(1.0) + java_ln(col("tf").cast("double"))) *
          java_ln(col("n").cast("double") / col("df").cast("double"))).as("weight"))
  }
}

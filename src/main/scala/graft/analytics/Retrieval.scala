package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Fences.fence
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
    * terms, the standard bag-of-words query model). Unit-weight
    * facade over [[bm25Weighted]] — ×1.0 is an IEEE identity, so the
    * scores (and the text_bm25 oracle hashes) are unchanged.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(String, Seq[String])],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame =
    bm25Weighted(docs, idCol, textCol,
      queries.map { case (q, ts) => q -> ts.map(t => t -> 1.0) },
      k1, b, topK)

  /** Weighted-term BM25: score(q,d) = Σ_t w(q,t)·bm25_t(d) — the
    * scoring core [[rm3]]'s interpolated feedback queries need, and
    * the general weighted-bag query model. Contributions fold in term
    * order (deterministic IEEE), weights multiply per term BEFORE the
    * fold.
    */
  def bm25Weighted(docs: DataFrame, idCol: String, textCol: String,
                   queries: Seq[(String, Seq[(String, Double)])],
                   k1: Double = 1.2, b: Double = 0.75,
                   topK: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // empty terms are dropped HERE as well as from termSet below — a
    // caller tokenizing "" gets [""], and an empty query term would
    // otherwise join every unmatched doc's sentinel row into a score
    val qdf = broadcast(
      queries.flatMap { case (q, ts) =>
        ts.filter(_._1.nonEmpty).distinctBy(_._1)
          .map { case (t, w) => (q, t, w) } }
        .toDF("query_id", "term", "weight"))
    val allTerms = queries.flatMap(_._2.map(_._1)).distinct

    // ONE corpus scan, NO cache. A prior version persisted the slim
    // tokenized frame and never unpersisted it — a CacheManager entry
    // leaked for the life of the session, degrading every later query
    // under storage pressure. The leak-free single-scan shape instead
    // makes the posting-list aggregate's own shuffle the sharing point:
    // every consumer (tf, document frequencies, corpus stats) reads the
    // SAME canonicalized Exchange(doc_id, dl, term), so ReuseExchange /
    // AQE stage reuse materializes the tokenize+explode map stage
    // exactly once and shuffle files are cleaned with the job.
    //
    // Two tricks keep the three subtree copies canonically identical
    // (without them Catalyst prunes each copy differently and the scan
    // runs three times):
    //  - docs with NO query-matched token get a sentinel "" token, so
    //    corpus stats (N, avgdl) can be computed from the exchange
    //    output — every doc has >= 1 row. "" never matches a real query
    //    term (empty terms are dropped from the query set), so the
    //    sentinel rows vanish at the qdf join and are skipped for df.
    //  - downstream branches that don't arithmetically need the count
    //    gate on `tf > 0` (always true, but a filter on an aggregate
    //    RESULT cannot be pushed below the aggregate) so the partial
    //    count(1) survives pruning identically in every copy.
    // The exchange carries one slim row per (doc, matched term) plus
    // one sentinel per unmatched doc — ~20 B/row, never corpus text.
    val termSet = array(allTerms.filter(_.nonEmpty).map(lit(_)): _*)
    val slim = docs.select(col(idCol).as("doc_id"),
      Text.wsTokens(lower(trim(col(textCol)))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        filter(col("toks"), t => array_contains(termSet, t)).as("qtoks"))
      .select(col("doc_id"), col("dl"),
        when(size(col("qtoks")) === 0, array(lit(""))).otherwise(col("qtoks"))
          .as("qtoks"))

    val tf = slim
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))

    // N and avgdl from the shared exchange (collapse to one row per
    // doc, then count/sum), kept in the plan via a broadcast cross join.
    val stats = tf.filter(col("tf") > 0)
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .select(col("n"),
        (col("sumdl").cast("double") / col("n").cast("double")).as("avgdl"))

    // "" keeps its (meaningless) df row — filtering it here would push
    // a grouping-key predicate below the shared exchange and break the
    // canonical-equality reuse; it dies at the query-terms join instead.
    val dfreq = tf.filter(col("tf") > 0)
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))

    val idf = java_ln(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val termScore = idf *
      (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))

    // qdf joins FIRST so sentinel rows (and non-query postings) drop
    // before the dfreq/stats joins widen the rows.
    val contrib = tf
      .join(qdf, "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        struct(col("term"), (termScore * col("weight")).as("c")).as("tc"))

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

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft, SIGIR 2001
    * relevance models; the RM3 interpolation of Abdul-Jaleel et al.,
    * TREC 2004): run [[bm25]], build the RM1 feedback model from the
    * top `fbDocs` documents — w(q,t) = Σ_d (tf_{t,d}/|d|)·score(q,d)
    * over the feedback set, normalized per query — keep the top
    * `fbTerms` expansion terms, interpolate with the original query
    * (α on the uniform original weights, 1−α on the feedback
    * weights), and rescore with [[bm25Weighted]]. The classic
    * recall-boosting second pass of a lexical retrieval stack.
    *
    * Determinism: pass-1 scores are bm25's term-ordered folds; the
    * feedback sums fold in doc order, the normalizer in term order,
    * expansion selection ties break (weight desc, term asc), and the
    * interpolation is one fixed expression — so a SQL replay matches
    * bit for bit. No stoplist: the feedback model is the corpus's
    * own (document it, don't hide it).
    *
    * Scale shape: two bm25 passes (each the leak-free single-scan
    * posting dataflow) + one scan of the ≤ |Q|·fbDocs feedback
    * documents; the collected weight table is |Q|·(|terms|+fbTerms)
    * rows — the documented bounded-collect class (query sets are
    * driver-side literals already).
    */
  def rm3(docs: DataFrame, idCol: String, textCol: String,
          queries: Seq[(String, Seq[String])],
          k1: Double = 1.2, b: Double = 0.75,
          fbDocs: Int = 3, fbTerms: Int = 5, alpha: Double = 0.6,
          topK: Int = 10): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1, s"fbDocs=$fbDocs fbTerms=$fbTerms")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha")
    // fenced ([[Fences]], r18): |Q|·fbDocs rows, but referenced by the
    // feedback semi-join AND the RM1 fold — and wn's wRaw/z references
    // compound — so the ENTIRE bm25 pass-1 replayed ~4× unfenced
    val fb = fence(bm25(docs, idCol, textCol, queries, k1, b, topK = fbDocs)
      .select(col("query_id"), col("doc_id").as("_fd"), col("score")))
    // term distributions of the feedback docs: one scan, semi-joined
    // to the (tiny, broadcast) feedback id set
    val tfall = docs
      .select(col(idCol).as("_fd"),
        Text.wsTokens(lower(trim(col(textCol)))).as("toks"))
      .join(broadcast(fb.select(col("_fd")).distinct()), Seq("_fd"),
        "left_semi")
      .select(col("_fd"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("_fd"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    // RM1: fold the per-doc contributions in doc order. Fenced: the
    // normalizer z and the normalized wn each reference it (2 replays
    // of the feedback-doc scan unfenced); |Q|·vocab(fbDocs) rows
    val wRaw = fence(tfall.join(broadcast(fb), "_fd")
      .select(col("query_id"), col("term"),
        struct(col("_fd"),
          ((col("tf").cast("double") / col("dl").cast("double")) *
            col("score")).as("_c")).as("dc"))
      .groupBy(col("query_id"), col("term"))
      .agg(aggregate(array_sort(collect_list(col("dc"))), lit(0.0),
        (acc, x) => acc + x.getField("_c")).as("w")))
    val z = wRaw
      .groupBy(col("query_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("w").as("_c")))),
        lit(0.0), (acc, x) => acc + x.getField("_c")).as("z"))
    val wn = wRaw.join(broadcast(z), "query_id")
      .select(col("query_id"), col("term"), (col("w") / col("z")).as("wn"))
    val wSel = Window.partitionBy(col("query_id"))
      .orderBy(col("wn").desc, col("term").asc)
    val expansion = wn.withColumn("_rk", row_number().over(wSel))
      .filter(col("_rk") <= fbTerms)
      .select(col("query_id"), col("term"), col("wn"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (q, rows) =>
        q -> rows.map(r => r.getString(1) -> r.getDouble(2)).toSeq }
    val weighted = queries.map { case (q, ts0) =>
      val ts = ts0.distinct.filter(_.nonEmpty)
      val orig = 1.0 / ts.length
      val e = expansion.getOrElse(q, Nil).toMap
      val origTerms = ts.map(t =>
        t -> (alpha * orig + (1.0 - alpha) * e.getOrElse(t, 0.0)))
      val extras = e.toSeq.filter { case (t, _) => !ts.contains(t) }
        .sortBy(_._1)
        .map { case (t, w) => t -> ((1.0 - alpha) * w) }
      q -> (origTerms ++ extras)
    }
    bm25Weighted(docs, idCol, textCol, weighted, k1, b, topK)
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty, SIGIR 2001) — the language-modeling complement of
    * [[bm25]]: score(q,d) = Σ_{t∈q} ln((tf + μ·p(t|C)) / (dl + μ)),
    * decomposed doc-at-a-time as Σ_{matched t} ln(1 + tf·|C|/(μ·cf))
    * + |q|·ln(μ/(dl+μ)) so only matched postings are joined — the
    * zero-tf terms collapse into the per-document length prior.
    * Candidate set = docs sharing ≥ 1 query term, ranked per query by
    * (score desc, doc_id). Matched contributions fold in term order
    * (the [[bm25]] determinism device); the prior adds once after the
    * fold.
    *
    * Scale shape: same posting-list dataflow as bm25 — slim
    * (doc, dl, matched-term) rows, |vocab(Q)|-row collection
    * frequencies broadcast back, per-query top-k behind a window.
    */
  def queryLikelihood(docs: DataFrame, idCol: String, textCol: String,
                      queries: Seq[(String, Seq[String])],
                      mu: Double = 2000.0, topK: Int = 10): DataFrame = {
    require(mu > 0, s"mu=$mu")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries.map { case (q, ts) =>
      (q, ts.distinct.filter(_.nonEmpty)) }
    val qdf = broadcast(qterms.flatMap { case (q, ts) =>
      ts.map(t => (q, t)) }.toDF("query_id", "term"))
    val nq = broadcast(qterms.map { case (q, ts) =>
      (q, ts.size.toLong) }.toDF("query_id", "nq"))
    val termSet = array(qterms.flatMap(_._2).distinct.map(lit(_)): _*)
    val dls = docs.select(col(idCol).as("doc_id"),
        Text.wsTokens(lower(trim(col(textCol)))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        filter(col("toks"), t => array_contains(termSet, t)).as("qtoks"))
    val stats = dls.agg(sum(col("dl")).as("total"))
    val tf = dls
      .select(col("doc_id"), col("dl"), explode(col("qtoks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val cf = tf.groupBy(col("term"))
      .agg(sum(col("tf")).as("cf"))
    val c = java_ln(lit(1.0) +
      col("tf").cast("double") * col("total").cast("double") /
        (lit(mu) * col("cf").cast("double")))
    val contrib = tf
      .join(qdf, "term")
      .join(broadcast(cf), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("dl"),
        struct(col("term"), c.as("c")).as("tc"))
    val scores = contrib.groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(aggregate(array_sort(collect_list(col("tc"))), lit(0.0),
        (acc, x) => acc + x.getField("c")).as("_s"))
      .join(nq, "query_id")
      .select(col("query_id"), col("doc_id"),
        (col("_s") + col("nq").cast("double") *
          java_ln(lit(mu) / (col("dl").cast("double") + lit(mu))))
          .as("score"))
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
    // the inverted index itself. NOT cached: the df aggregation and the
    // final weight join both sit on the tf aggregate's own shuffle
    // (Exchange hashpartitioning(doc_id, term)), so ReuseExchange / AQE
    // stage reuse runs the tokenize+explode map side once and both
    // consumers read the same shuffle files — no CacheManager entry to
    // leak across the session (a prior persist here was never
    // unpersisted and degraded long-lived sessions under storage
    // pressure).
    val tf = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    // the `tf > 0` gate is always true but cannot be pushed below the
    // aggregate (it filters an aggregate RESULT) — it forces this copy
    // of the tf subtree to keep count(1) like the join copy does, so
    // the two copies stay canonically identical and the exchange is
    // reused instead of re-scanning the corpus.
    val dfreq = tf.filter(col("tf") > 0)
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
      .filter(col("df") >= minDf)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((lit(1.0) + java_ln(col("tf").cast("double"))) *
          java_ln(col("n").cast("double") / col("df").cast("double"))).as("weight"))
  }

  /** Per-document keyword extraction: the top-`k` terms of each
    * document by its [[tfidf]] weight — the zero-model keyword/tag
    * signal (corpus-rare terms the document repeats), with the
    * (weight desc, term asc) total order making the cut
    * deterministic under any partitioning. Same two-aggregation
    * inverted-index shape as tfidf plus one per-doc window; Spark
    * plans the row_number ≤ k filter as a partial group-limit below
    * the exchange, so the shuffle carries at most k·docs rows.
    */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               k: Int, minDf: Long = 2): DataFrame = {
    require(k >= 1, s"k=$k")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("weight").desc, col("term").asc)
    tfidf(docs, idCol, textCol, minDf)
      .withColumn("kw_rank", row_number().over(w).cast("long"))
      .filter(col("kw_rank") <= k)
      .select(col("doc_id"), col("kw_rank"), col("term"),
        col("tf"), col("df"), col("weight"))
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse N ranked lists into one by score(d) = Σ_systems
    * 1/(k0 + rank_s(d)) — the standard hybrid-retrieval combiner
    * (e.g. BM25 + dense ANN), robust because it reads only RANKS, so
    * incomparable score scales never matter.
    *
    * Each input is a (query, doc, rank) table — typically already a
    * per-query top-K, so the fuse operates on K·|systems| rows per
    * query regardless of corpus size: union → one (query, doc)
    * shuffle → per-query top-K (Spark plans the row_number filter as
    * a bounded partial below the exchange). The score sum folds in
    * system order (not union order), so the double result is
    * deterministic under any partitioning and N.
    */
  /** Exact phrase matching: how many times does the consecutive token
    * sequence `phrase` occur in each document (whitespace tokens,
    * lowercased — the house tokenization)? Emits only matching docs
    * (doc_id, n_matches ≥ 1).
    *
    * Scale shape — deliberately ROW-LOCAL, not an inverted-index join:
    * a phrase test inside one document needs no other document, so the
    * right 100 TB plan is a codegen'd higher-order filter over the
    * token array (count start positions where every phrase term lines
    * up) on a single scan — zero shuffles, zero joins, in contrast to
    * the posting-list intersection a search engine with a PREBUILT
    * positional index would run ([[bm25]] covers the index-shaped
    * workload). Overlapping occurrences count individually
    * ("a a a" contains "a a" twice).
    */
  def phraseCount(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val terms = phrase.map(_.toLowerCase)
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val matchAt = terms.zipWithIndex.map { case (w, i) =>
      (p: Column) => element_at(col("_t"), (p + lit(i + 1)).cast("int")) === lit(w)
    }.reduce[(Column => Column)]((f, g) => p => f(p) && g(p))
    docs
      .select(col(idCol).as("doc_id"), toks.as("_t"))
      .filter(size(col("_t")) >= phrase.size)
      .select(col("doc_id"),
        size(filter(sequence(lit(0), size(col("_t")) - lit(phrase.size)),
          p => matchAt(p))).cast("long").as("n_matches"))
      .filter(col("n_matches") >= 1L)
  }

  def rrfFuse(systems: Seq[(String, DataFrame)],
              queryCol: String, docCol: String, rankCol: String,
              k0: Int = 60, topK: Int = 10): DataFrame = {
    require(systems.nonEmpty, "need at least one ranking")
    require(k0 >= 1 && topK >= 1)
    val tagged = systems.zipWithIndex.map { case ((_, df), i) =>
      df.select(col(queryCol).as("query_id"), col(docCol).as("doc_id"),
        lit(i).as("_sys"),
        (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double")))
          .as("_term")) }
    val scored = tagged.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("_sys"), col("_term")))),
          lit(0.0),
          (acc, x) => acc + x.getField("_term")).as("rrf_score"),
        count(lit(1)).as("n_systems"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    scored.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
      .select(col("query_id"), col("fused_rank"), col("doc_id"),
        col("rrf_score"), col("n_systems"))
  }

  /** Ranked-retrieval evaluation against a relevance set: per query,
    * precision@k and the reciprocal rank of the first relevant hit —
    * the offline quality loop for the [[bm25]]/[[rrfFuse]] output
    * (nDCG is deliberately omitted: its log2 discount is the one
    * piece that isn't an exact rational).
    *
    * Exactness: hit counts and first-relevant ranks are integers;
    * P@k and RR are one division each. Queries with no relevant hit
    * in the top k report rr = 0 (the standard MRR convention).
    *
    * Scale shape: one equi-join of the (query, doc) ranking against
    * the qrels (both metadata-sized relative to the corpus) + one
    * keyed aggregate; a left join keeps queries with zero hits.
    */
  def rankEval(
      ranked: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      rankCol: String,
      docCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val r = ranked.select(col(queryCol).as("query_id"),
      col(rankCol).cast("long").as("_rk"), col(docCol).as("_doc"))
      .filter(col("_rk") <= k)
    val q = qrels.select(col(queryCol).as("query_id"),
      col(docCol).as("_doc")).distinct()
      .withColumn("_rel", lit(1L))
    r.join(q, Seq("query_id", "_doc"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(when(col("_rel").isNotNull, 1L).otherwise(0L))
          .as("n_relevant"),
        min(when(col("_rel").isNotNull, col("_rk"))).as("first_rel_rank"))
      .withColumn("precision_at_k",
        col("n_relevant").cast("double") / lit(k.toDouble))
      .withColumn("reciprocal_rank",
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double"))
          .otherwise(lit(0.0)))
  }
}

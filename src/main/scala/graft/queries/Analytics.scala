package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{Dedup, Multimodal, Similarity, Text}

/** Training-data pipeline queries (dedup / similarity / text /
  * multimodal). SQL-expressible ones carry DuckDB oracles; the
  * hash-based ones (MinHash, SimHash, LSH, fingerprints) are checked
  * by ScalaTest specs instead (driver records rows-only).
  */
object Analytics {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")),

    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 128, numBands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)),

    // char-5-grams: 3-grams of a small shared vocabulary are near-
    // universal across documents (every pair becomes an LSH candidate);
    // 5-grams restore selectivity at the same shingling cost
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 5, threshold = 0.8).select(col("id_a"), col("id_b"))),

    "dedup_embedding" -> ((s, dir) =>
      Similarity.cosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, method = "lsh")
        .select(col("id_a"), col("id_b"))),

    "sim_topk_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
    }),

    "sim_topk_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
    }),

    "text_tokens" -> ((s, dir) =>
      Text.tokenCounts(t(s, dir, "documents"), "doc_id", "text")),

    "text_quality" -> ((s, dir) =>
      Text.qualityScore(t(s, dir, "documents"), "doc_id", "text")),

    "text_langid" -> ((s, dir) =>
      Text.langId(t(s, dir, "documents"), "doc_id", "text")),

    "text_fingerprint" -> ((s, dir) =>
      Text.fingerprint(t(s, dir, "documents"), "doc_id", "text")),

    "multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.fakeMediaTable(s, dir))
        .select(col("media_id"), col("n_bytes"), col("sha256_prefix"))),

    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.fakeMediaTable(s, dir), 4))
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_brute" ->
      """SELECT qid AS query_id, CAST(rk AS INT) AS rank, nid AS neighbor_id FROM (
           SELECT q.vec_id qid, c.vec_id nid,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id ASC) rk
           FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 8) WHERE rk <= 5""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
         FROM documents GROUP BY text""",
    // the whitespace-normalized polynomial rolling hash (base 1000003,
    // wrap mod 2^64) is replicated with HUGEINT arithmetic; unicode()
    // codepoints equal Java's UTF-16 units for this BMP-only corpus
    "text_fingerprint" ->
      """WITH norm AS (
           SELECT doc_id,
             array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ') AS s
           FROM documents
         ), h AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS HUGEINT),
                 list_transform(string_split_regex(s, ''),
                   c -> CAST(unicode(c) AS HUGEINT))),
               (acc, c) -> (acc * 1000003 + c) %
                 CAST(18446744073709551616 AS HUGEINT)) AS uh
           FROM norm
         )
         SELECT doc_id,
           CAST(CASE WHEN uh >= CAST(9223372036854775808 AS HUGEINT)
             THEN uh - CAST(18446744073709551616 AS HUGEINT)
             ELSE uh END AS BIGINT) AS fingerprint
         FROM h""",
    // the frame-sampler stub slices deterministic byte ranges, so the
    // oracle replicates the slicing arithmetic over the UTF-8 lengths
    "multimodal_frames" ->
      """WITH m AS (
           SELECT doc_id, octet_length(encode(text)) AS len FROM documents
         ), f AS (
           SELECT doc_id, len, greatest(1, len // 4) AS step FROM m
         ), x AS (
           SELECT doc_id, len, step,
             unnest(range(0, least(4, len))) AS i FROM f
         )
         SELECT doc_id AS media_id, CAST(i AS INT) AS frame_index,
           CAST(least(len, i*step + step) - i*step AS BIGINT) AS frame_bytes
         FROM x""",
    // brute-force exact-Jaccard oracle: the LSH pipeline's verification
    // makes precision exact and the banding parameters make recall 1
    // on this corpus (asserted against brute force in AnalyticsSpec),
    // so the approximate operator must EQUAL the quadratic ground truth
    "dedup_minhash" ->
      """WITH sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             END AS s
           FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
                 FROM documents WHERE trim(text) <> ''))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5""",
    "dedup_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id,
             CASE WHEN length(s0) < 5 THEN [s0]
                  ELSE list_distinct(list_transform(range(1, length(s0) - 3),
                    i -> s0[i:i+4]))
             END AS s
           FROM (SELECT doc_id, trim(lower(text)) AS s0
                 FROM documents WHERE trim(text) <> ''))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8""",
    "text_tokens" ->
      """SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
         FROM documents""",
    "text_quality" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         (length(text) - length(regexp_replace(text, '[\.,;:!\?''"]', '', 'g'))) / CAST(length(text) AS DOUBLE) AS punct_ratio,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / CAST(length(text) AS DOUBLE) AS digit_ratio,
         len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by'], x)))
           / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS stopword_ratio,
         length(text) / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS mean_token_len
         FROM documents""",
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         substr(sha256(text), 1, 16) AS sha256_prefix
         FROM documents"""
  )
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import HashFunctions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, fingerprinting. All are
  * row-local column expressions — they run inside the scan's codegen
  * stage with zero shuffles, which is what lets them stream over 100 TB.
  */
object Text {

  /** Whitespace tokens of trimmed text. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword-ish token count: runs of letters, runs of digits,
    * and single other non-space characters each count as one token —
    * the usual cheap proxy for tokenizer counts.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Token/char counting: (whitespace tokens, bpe-ish tokens, chars). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(wsTokens(col(textCol))).cast("long").as("n_ws_tokens"),
      bpeishTokenCount(col(textCol)).cast("long").as("n_bpeish_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "on", "for", "with", "as", "at", "by")

  /** Heuristic quality features + a composite score. Every ratio is a
    * single IEEE division of integer counts — bit-identical across
    * engines, so the whole frame is oracle-checkable.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val nTokens = size(wsTokens(t)).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[\\.,;:!\\?'\"]", ""))).cast("double")
    val digits = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val stop = size(filter(wsTokens(lower(t)),
      x => x.isin(stopwords.map(lit(_)): _*))).cast("double")
    df.select(col(idCol),
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      (punct / nChars).as("punct_ratio"),
      (digits / nChars).as("digit_ratio"),
      (stop / nTokens).as("stopword_ratio"),
      (nChars / nTokens).as("mean_token_len"))
  }

  /** Tiny built-in character-trigram profiles (public-knowledge top
    * trigrams per language) for heuristic language ID. The score of a
    * language is the fraction of the document's trigrams found in its
    * profile; argmax wins, 'und' when nothing matches.
    */
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at", "en",
      "nd", "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar"),
    "de" -> Seq("en", "er", "ch", "de", "ei", "te", "in", "nd", "ie",
      "ge", "st", "ne", "be", "es", "un", "re", "an", "he", "au", "ng"),
    "fr" -> Seq("es", "le", "de", "en", "re", "nt", "on", "er", "te",
      "el", "an", "se", "et", "la", "ai", "it", "me", "ou", "em", "ie"),
    "es" -> Seq("de", "es", "en", "el", "la", "os", "on", "as", "er",
      "ra", "ad", "ar", "re", "al", "an", "nt", "ue", "ci", "co", "se"))

  /** Language-ID: bigram-profile overlap scoring. Deterministic and
    * cheap; a real pipeline would swap in fastText — the operator shape
    * (text → (lang, score)) is what the engine provides.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = Dedup.charNgrams(col(textCol), 2)
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      struct(
        (size(array_intersect(grams, array(prof.map(lit(_)): _*))).cast("double") /
          greatest(size(grams), lit(1)).cast("double")).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*) // struct compare: score first, then lang
    df.select(col(idCol),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
        .as("pred_lang"),
      best.getField("score").as("lang_score"))
  }

  /** Document fingerprint: polynomial rolling hash over the
    * whitespace-normalized lowercase text (content-defined identity,
    * stable under formatting noise).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      rolling_fingerprint(
        concat_ws(" ", split(lower(trim(col(textCol))), "\\s+"))).as("fingerprint"))

  /** Corpus vocabulary statistics: global frequency of lowercase
    * whitespace tokens at or above `minCount` — the input to BPE/vocab
    * training and frequency-based filtering. One explode + one
    * hash aggregation; partial (map-side) aggregation collapses each
    * partition's counts before the shuffle, so the exchange carries
    * distinct (token, partial_count) pairs, not token instances.
    */
  def vocab(df: DataFrame, textCol: String, minCount: Long = 2): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
}

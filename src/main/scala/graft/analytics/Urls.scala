package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup pass of every web-crawl
  * pipeline: the same page arrives under case variants, default
  * ports, tracking parameters, permuted query strings, and fragments,
  * and the crawl store must collapse them BEFORE any content-level
  * dedup runs (RFC 3986 §6 syntax-based normalization plus the
  * conventional utm_* strip).
  *
  * Everything here is row-local built-in string/array expressions —
  * whole-stage-codegen'd, no UDF, no shuffle until the keeper vote —
  * so canonicalization adds a projection to the scan, nothing more.
  */
object Urls {

  /** Syntax-canonical form of an absolute URL:
    *  - fragment dropped;
    *  - `userinfo@` dropped (credentials never identify a page, and
    *    the crawl store must not key on them);
    *  - scheme and host lowercased; bracketed IPv6 literals
    *    (`[::1]:8080`) keep their brackets and split host/port on the
    *    colon AFTER the closing bracket, not inside the address;
    *  - default port stripped (`:80` for http, `:443` for https);
    *  - empty path normalized to `/`;
    *  - query parameters: `utm_*` tracking params and empty segments
    *    dropped, the rest sorted bytewise and rejoined (`?` dropped
    *    when nothing survives).
    *
    * Malformed input (no `scheme://`) passes through unchanged —
    * canonicalization must never invent structure.
    */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    // authority ends at the first '/' OR '?' (fragment already gone)
    val hostport = substring_index(substring_index(rest, "/", 1), "?", 1)
    val pathq = rest.substr(length(hostport) + 1, lit(1 << 20))
    // userinfo (user:pass@) stripped BEFORE host/port splitting —
    // otherwise 'pass@host' masquerades as the port and the host is
    // never isolated; substring_index(-1) takes after the LAST '@'
    val auth = when(hostport.contains("@"),
      substring_index(hostport, "@", -1)).otherwise(hostport)
    // bracketed IPv6: host is everything through ']', the port split
    // is on ']:' — a bare ':' inside the address is not a port
    val bracketed = auth.startsWith("[")
    val host = lower(when(bracketed,
      concat(substring_index(auth, "]", 1), lit("]")))
      .otherwise(substring_index(auth, ":", 1)))
    val port = when(bracketed,
      when(auth.contains("]:"), substring_index(auth, "]:", -1))
        .otherwise(lit("")))
      .otherwise(when(auth.contains(":"),
        substring_index(auth, ":", -1)).otherwise(lit("")))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path0 = substring_index(pathq, "?", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // substring_index(_, "?", -1) is the raw query when a "?" exists
    // (guarded below — without one it returns the whole path)
    val params = array_sort(filter(
      split(substring_index(pathq, "?", -1), "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val canonQuery = when(
      pathq.contains("?") && size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(rest === "", u) // not scheme://... — leave untouched
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path, canonQuery))
  }

  /** Canonical-URL dedup verdicts: every row with its canonical form
    * and `keep` = true on exactly one row per canonical URL (the
    * minimum id — deterministic under any partitioning). One key
    * shuffle on the canonical string; at crawl scale, hash the
    * canonical into a 64-bit digest first if the shuffle width
    * matters ([[Dedup]] exact-dedup shape).
    */
  def dedupByCanonical(df: DataFrame, idCol: String,
                       urlCol: String): DataFrame = {
    val w = Window.partitionBy(col("canonical_url"))
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .withColumn("keep", col(idCol) === min(col(idCol)).over(w))
  }

  /** One regex, identical under Java regex and RE2 (both
    * leftmost-first), that isolates the HOST of an absolute URL:
    * after `scheme://`, skip optional userinfo (`…@`), then capture
    * either a bracketed IPv6 literal or everything up to a port
    * colon, path, query, or fragment. No match (not URL-shaped)
    * captures the empty string on both engines. */
  private val HostRe =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]]*\\]|[^/?#:]*)"

  /** The staged lowercase host column (callers alias it once — three
    * signals read it); IPv6 brackets are stripped after capture
    * (the oracle's regexp_replace needs its 'g' flag for the same). */
  def hostOf(u: Column): Column =
    lower(regexp_replace(regexp_extract(u, HostRe, 1), "^\\[|\\]$", ""))

  /** URL-level quality signals (name → expression) — the
    * REFINEDWEB-style first gate (Penedo et al. 2023 §3.1 "URL
    * filtering": a domain blocklist plus URL word scoring runs BEFORE
    * any content is fetched or parsed, because it is the only filter
    * whose cost is zero bytes of the page). Row-local; every count is
    * an integer regex count and every test a containment, so the
    * DuckDB oracle replays them bit-exactly.
    */
  def urlSignals(u: Column, host: Column,
                 blockWords: Seq[String]): Seq[(String, Column)] = {
    val lo = lower(u)
    Seq(
      "host" -> host,
      "url_len" -> length(u).cast("long"),
      "host_dots" -> regexp_count(host, lit("\\.")).cast("long"),
      "host_digit_frac" -> (regexp_count(host, lit("[0-9]")).cast("double") /
        greatest(length(host), lit(1)).cast("double")),
      "is_ip_host" -> host.rlike("^[0-9]+(\\.[0-9]+){3}$"),
      "has_block_word" ->
        (if (blockWords.isEmpty) lit(false)
         else blockWords.map(w => lo.contains(w.toLowerCase): Column)
           .reduce(_ || _)))
  }

  /** Per-rule verdicts + `keep` from the named signals (cheap
    * references). Rules: URL length cap (spam/query-stuffing), host
    * subdomain-dot cap (keyword-stuffed hosts), host digit fraction
    * (generated domains), bare-IP hosts dropped, blocklist word
    * containment over the whole URL. A non-URL-shaped string has an
    * empty host — it passes the host rules and is judged on
    * length/blocklist only (filtering garbage rows is the schema's
    * job, not this gate's).
    */
  def urlVerdicts(sig: String => Column, maxUrlLen: Long,
                  maxHostDots: Long,
                  maxHostDigitFrac: Double): Seq[(String, Column)] = {
    val passLen = sig("url_len") <= lit(maxUrlLen)
    val passDots = sig("host_dots") <= lit(maxHostDots)
    val passDigits = sig("host_digit_frac") <= lit(maxHostDigitFrac)
    val passIp = !sig("is_ip_host")
    val passBlock = !sig("has_block_word")
    Seq(
      "pass_len" -> passLen,
      "pass_dots" -> passDots,
      "pass_digits" -> passDigits,
      "pass_ip" -> passIp,
      "pass_blocklist" -> passBlock,
      "keep" -> (passLen && passDots && passDigits && passIp && passBlock))
  }

  /** The URL gate over a frame: (id, url, signals…, verdicts…, keep).
    * Defaults are conservative crawl-hygiene values; the block list
    * is a parameter (RefinedWeb applies a curated public list — the
    * deployment chooses its own). Row-local, zero shuffle — this
    * runs at manifest speed, before any document bytes move.
    */
  def urlFilter(df: DataFrame, idCol: String, urlCol: String,
                maxUrlLen: Long = 2048, maxHostDots: Long = 4,
                maxHostDigitFrac: Double = 0.4,
                blockWords: Seq[String] = Nil): DataFrame = {
    // host materializes once in its own projection (the gopherRules
    // staging discipline — three signals read it)
    val staged = df.select(col(idCol), col(urlCol).as("_u"))
      .withColumn("_host", hostOf(col("_u")))
    val sigCols = urlSignals(col("_u"), col("_host"), blockWords)
    val sig = staged.select(
      Seq(col(idCol), col("_u").as(urlCol)) ++
        sigCols.map { case (n, c) => c.as(n) }: _*)
    val verdicts = urlVerdicts(n => col(n), maxUrlLen, maxHostDots,
      maxHostDigitFrac)
    sig.select((Seq(col(idCol), col(urlCol)) ++
      sigCols.map(nc => col(nc._1)) ++
      verdicts.map { case (n, c) => c.as(n) }): _*)
  }
}

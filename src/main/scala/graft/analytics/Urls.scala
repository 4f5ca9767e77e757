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
}

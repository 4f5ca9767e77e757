package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.analytics.JaroWinklerImpl

/** Jaro–Winkler kernel (round 13): golden values probed from DuckDB
  * 1.0.0's rapidfuzz-derived jaro_winkler_similarity — the oracle the
  * link_jw gate row replays — plus the semantic contracts (byte-level
  * matching, integer transposition halving, 0.7 boost threshold,
  * symmetry).
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values match DuckDB's jaro_winkler_similarity bit-for-bit") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334) // no prefix → no boost
    assert(jw("DwAyNE", "DuANE") == 0.8400000000000001)
    assert(jw("arnab", "aranb") == 0.9466666666666665)
    assert(jw("goldenrod lavender", "goldenrod lavendar") == 0.9777777777777777)
    assert(jw("abc", "abc") == 1.0)
  }

  test("boost threshold is strict 0.7; empties and window-0 cases are 0") {
    // jaro = 0.6 with a 4-char common prefix: below the threshold,
    // Winkler must NOT fire (DuckDB: 0.6)
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB convention: empty-vs-empty is 0
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window max(2,2)/2-1 = 0: no matches
  }

  test("odd mismatch count halves by integer division (DuckDB parity)") {
    // 'abcdef'/'bcadef': m=6, 3 mismatched aligned matches → t = 1
    // (not 1.5): jaro = (1 + 1 + 5/6)/3, prefix 0 → no boost
    assert(jw("abcdef", "bcadef") == 0.9444444444444445)
    assert(jw("abcdefgh", "bcadefgh") == 0.9583333333333334)
  }

  test("matching is byte-level (multi-byte codepoints count per byte)") {
    // probed from DuckDB: é is 2 UTF-8 bytes, lengths 8 vs 7 bytes
    assert(jw("é é é", "é e é") == 0.8694444444444446)
  }

  test("symmetric in the pair (selfPairs id-reordering soundness)") {
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("abcdef", "bcadef"), ("goldenrod", "lavender"), ("a", ""),
      ("chocolate lace", "chocolate lake"))
    pairs.foreach { case (a, b) => assert(jw(a, b) == jw(b, a), s"($a, $b)") }
  }

  test("fuzzyLinks: blocked self-pairs, rounded threshold, column shape") {
    val df = Seq(
      (1L, "blk1", "chocolate lace"),
      (2L, "blk1", "chocolate lake"),
      (3L, "blk1", "zzzz qqqq wwww"),
      (4L, "blk2", "chocolate lace") // other block: never pairs with 1
    ).toDF("id", "blk", "name")
    val out = graft.analytics.Linkage.fuzzyLinks(df, df, "id", "id",
      "blk", "name", minSim = 0.9, selfPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    val (a, b, s) = out.head
    assert(a == 1L && b == 2L)
    assert(s == math.rint(jw("chocolate lace", "chocolate lake") * 1e9) / 1e9
      || s >= 0.9) // rounded to 9 dp by the operator
  }
}

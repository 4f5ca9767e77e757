package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Text
import graft.model.Cdc
import graft.ops.Registry

/** FineWeb line-shape heuristics (Penedo et al. 2024 §3.6): the
  * terminal-punct line fraction, duplicated-line character mass, and
  * short-line fraction signals, the paper-threshold verdicts, and the
  * `text.fineweb` plugin's annotate/drop surface.
  */
class FineWebSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  // distinct, > 30 chars, terminal punctuation
  private def longPunct(i: Int) =
    s"This is numbered sentence $i and it ends with a period."
  // distinct, > 30 chars, NO terminal punctuation
  private def longBare(i: Int) =
    s"this line number $i carries no terminal punctuation at all"
  // distinct, < 30 chars, terminal punctuation
  private def shortPunct(i: Int) = s"Tiny line number $i."

  test("signals: punct fraction, short fraction, duplicate-line char mass") {
    val a = Seq(longPunct(1), longBare(1), shortPunct(1)).mkString("\n")
    // one line duplicated 3x: dup chars = 2 * len(dup line)
    val dup = longPunct(7)
    val b = Seq(dup, dup, dup, longBare(2)).mkString("\n")
    val out = Text.finewebRules(
      Seq((1L, a), (2L, b), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 3L)
    assert(out(1L).getAs[Double]("punct_line_frac") == 2.0 / 3.0)
    assert(out(1L).getAs[Double]("short_line_frac") == 1.0 / 3.0)
    assert(out(1L).getAs[Double]("dup_line_char_frac") == 0.0)
    val totB = 3 * dup.length + longBare(2).length
    assert(out(2L).getAs[Double]("dup_line_char_frac") ==
      (2.0 * dup.length) / totB)
    // empty text: one empty line, zero chars — dup mass defined as 0,
    // the empty line is short and unpunctuated
    assert(out(3L).getAs[Long]("n_lines") == 1L)
    assert(out(3L).getAs[Double]("dup_line_char_frac") == 0.0)
    assert(out(3L).getAs[Double]("short_line_frac") == 1.0)
    assert(out(3L).getAs[Double]("punct_line_frac") == 0.0)
  }

  test("verdicts: each violator fails ONLY its own rule (plus keep)") {
    val clean = (1 to 10).map(longPunct).mkString("\n")
    // punct: 1 of 9 lines punct-terminated = 0.111… ≤ 0.12
    val punctBad = (longPunct(1) +: (1 to 8).map(longBare)).mkString("\n")
    // dup: 10 equal-length lines, one duplicated once → mass exactly
    // 0.1, and the rule is ≥
    val dupBad = (Seq(longPunct(1)) ++ (1 to 9).map(longPunct))
      .mkString("\n")
    // short: 7 of 10 lines under 30 chars = 0.7 ≥ 0.67
    val shortBad = ((1 to 7).map(shortPunct) ++ (8 to 10).map(longPunct))
      .mkString("\n")
    val out = Text.finewebRules(Seq(
      (1L, clean), (2L, punctBad), (3L, dupBad), (4L, shortBad))
      .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("pass_punct")
      && !out(2L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Boolean]("pass_dup")
      && out(2L).getAs[Boolean]("pass_short"))
    assert(out(3L).getAs[Double]("dup_line_char_frac") == 0.1)
    assert(!out(3L).getAs[Boolean]("pass_dup")
      && !out(3L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Boolean]("pass_punct")
      && out(3L).getAs[Boolean]("pass_short"))
    assert(!out(4L).getAs[Boolean]("pass_short")
      && !out(4L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Boolean]("pass_punct")
      && out(4L).getAs[Boolean]("pass_dup"))
  }

  test("text.fineweb plugin annotates metadata and drop gates on keep") {
    val clean = (1 to 10).map(longPunct).mkString("\n")
    val bad = (1 to 8).map(longBare).mkString("\n")
    val docs = Cdc.wrap(Seq((1L, clean), (2L, bad))
      .toDF("doc_id", "text"), "doc_id", "docs")
    // a record whose payload has no text field at all
    val noText = Cdc.wrap(Seq(Tuple1(9L)).toDF("doc_id"), "doc_id", "docs")
    val both = docs.unionByName(noText, allowMissingColumns = true)
    val annotated = Registry.create("text.fineweb",
        Map("field" -> ".Payload.After.text")).transform(both)
    val metas = annotated.select(col(Cdc.Metadata)).collect()
      .map(_.getMap[String, String](0))
    assert(metas.count(_.get("fineweb.keep").contains("true")) == 1)
    assert(metas.count(_.get("fineweb.keep").contains("false")) == 1)
    assert(metas.count(_.get("fineweb.keep").isEmpty) == 1,
      "absent text stays unannotated")
    assert(metas.filter(_.contains("fineweb.keep")).forall(m =>
      m.contains("fineweb.pass_punct") &&
        m.contains("fineweb.punct_line_frac")))
    val gated = Registry.create("text.fineweb",
        Map("field" -> ".Payload.After.text", "drop" -> "true"))
      .transform(both)
    assert(gated.count() == 1L)
  }
}

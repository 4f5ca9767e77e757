package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Text
import graft.model.Cdc
import graft.ops.Registry

/** C4 cleanup rules (Raffel et al. 2020 §2.2, released c4_utils
  * defaults): line retention, page verdicts, the cleaned text, and
  * the `text.c4` plugin's annotate/drop surface.
  */
class C4Spec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private val goodLine = "This sentence has five good words."

  test("line retention: terminal punctuation, word floor, javascript, policy") {
    val text = Seq(
      goodLine,                                   // kept
      "No terminal punctuation here at all",      // dropped: no . ! ? "
      "Too short.",                               // dropped: < 5 words
      "Please enable javascript to view this.",   // dropped: javascript
      "We updated our privacy policy this week.", // dropped: policy notice
      "Does a question mark count as terminal?",  // kept
      "\"A quoted ending also counts here.\""     // kept (ends in ")
    ).mkString("\n")
    val out = Text.c4Rules(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(out.getAs[Long]("n_lines") == 7L)
    assert(out.getAs[Long]("n_kept_lines") == 3L)
    val clean = out.getAs[String]("clean_text")
    assert(clean == Seq(goodLine,
      "Does a question mark count as terminal?",
      "\"A quoted ending also counts here.\"").mkString("\n"))
  }

  test("page verdicts: sentences, lorem ipsum, curly brace, bad words") {
    val five = Seq.fill(5)(goodLine).mkString("\n")
    val docs = Seq(
      (1L, five),                                   // keep
      (2L, Seq.fill(4)(goodLine).mkString("\n")),   // 4 sentences < 5
      (3L, five + "\nsome Lorem Ipsum filler"),     // lorem (case-blind)
      (4L, five + "\nvar x = { a: 1 }"),            // curly brace
      (5L, "")                                      // empty: 0 sentences
    ).toDF("doc_id", "text")
    val out = Text.c4Rules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("pass_sentences"))
    assert(!out(3L).getAs[Boolean]("pass_lorem"))
    assert(!out(4L).getAs[Boolean]("pass_brace"))
    assert(!out(5L).getAs[Boolean]("keep"))
    // the badword gate only fires when a list is configured
    assert(out(1L).getAs[Boolean]("pass_badword"))
    val flagged = Text.c4Rules(docs, "doc_id", "text",
        badWords = Seq("filler"))
      .filter(col("doc_id") === 3L).head()
    assert(flagged.getAs[Boolean]("has_badword"))
    assert(!flagged.getAs[Boolean]("pass_badword"))
  }

  test("sentence count runs on the CLEANED text, not the raw page") {
    // 5 raw sentence marks, but every line is dropped (no word floor
    // met) → clean text is empty → 0 sentences → not kept
    val text = Seq.fill(5)("Nope.").mkString("\n")
    val out = Text.c4Rules(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(out.getAs[Long]("n_kept_lines") == 0L)
    assert(out.getAs[String]("clean_text") == "")
    assert(out.getAs[Long]("n_sentences") == 0L)
    assert(!out.getAs[Boolean]("keep"))
  }

  test("text.c4 plugin annotates metadata and drop gates on keep") {
    val five = Seq.fill(5)(goodLine).mkString("\n")
    val docs = Cdc.wrap(Seq((1L, five), (2L, "too short"))
      .toDF("doc_id", "text"), "doc_id", "docs")
    val annotated = Registry.create("text.c4",
        Map("field" -> ".Payload.After.text")).transform(docs)
    val metas = annotated.select(col(Cdc.Metadata)).collect()
      .map(_.getMap[String, String](0))
    assert(metas.length == 2)
    assert(metas.exists(_.get("c4.keep").contains("true")))
    assert(metas.exists(_.get("c4.keep").contains("false")))
    assert(metas.forall(m => m.contains("c4.n_sentences")
      && m.contains("c4.pass_lorem")))
    val gated = Registry.create("text.c4",
        Map("field" -> ".Payload.After.text", "drop" -> "true"))
      .transform(docs)
    assert(gated.count() == 1L)
  }

  test("text.c4 clean=true rewrites the field to the retained lines") {
    val text = Seq(goodLine, "dropped line no punct", goodLine)
      .mkString("\n")
    val docs = Cdc.wrap(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "docs")
    val out = Registry.create("text.c4",
        Map("field" -> ".Payload.After.text", "clean" -> "true"))
      .transform(docs)
    val got = out.select(
      get_json_object(col(Cdc.PayloadAfter), "$.text")).head().getString(0)
    assert(got == Seq(goodLine, goodLine).mkString("\n"), got)
    // the verdict metadata still describes the ORIGINAL page
    val meta = out.select(col(Cdc.Metadata)).head().getMap[String, String](0)
    assert(meta("c4.n_kept_lines") == "2")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Dedup, Retrieval}

/** Query-likelihood retrieval and content-defined chunking. */
class QldChunkSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  test("qld: term-matching doc outranks longer non-matching, prior penalizes length") {
    val docs = Seq(
      (1L, "spark shuffle join"),
      (2L, "spark " + Seq.fill(50)("filler").mkString(" ")),
      (3L, "totally unrelated words entirely")).toDF("doc_id", "text")
    val out = Retrieval.queryLikelihood(docs, "doc_id", "text",
        Seq("q" -> Seq("spark", "join")), mu = 10.0, topK = 10)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("doc_id"))
      .toMap
    // doc 1 matches both terms and is short -> rank 1; doc 2 matches
    // one term but pays the length prior; doc 3 never a candidate
    assert(out(1L) == 1L, out.toString)
    assert(out(2L) == 2L)
    assert(out.size == 2)
    // score formula hand check for doc 1: both terms tf=1, dl=3,
    // total=3+51+4=58, cf(spark)=2, cf(join)=1
    val s1 = Retrieval.queryLikelihood(docs, "doc_id", "text",
        Seq("q" -> Seq("spark", "join")), mu = 10.0, topK = 10)
      .filter(col("doc_id") === 1L).collect().head.getAs[Double]("score")
    val want = math.log(1.0 + 1.0 * 58 / (10.0 * 1)) +
      math.log(1.0 + 1.0 * 58 / (10.0 * 2)) +
      2.0 * math.log(10.0 / (3.0 + 10.0))
    assert(math.abs(s1 - want) < 1e-12, s"$s1 vs $want")
  }

  test("cdc chunks: boundaries resynchronize after a prefix insertion") {
    // find a corpus where the base doc has >= 2 chunks, then verify
    // the suffix chunks of the edited copy share hashes with the base
    val words = (0 until 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, words), (2L, "inserted preamble goes here " + words))
      .toDF("doc_id", "text")
    val out = Dedup.cdcChunks(docs, "doc_id", "text", boundaryBits = 3)
    val byDoc = out.collect().groupBy(_.getAs[Long]("doc_id"))
    val h1 = byDoc(1L).map(_.getAs[Long]("chunk_hash")).toSet
    val h2 = byDoc(2L).map(_.getAs[Long]("chunk_hash")).toSet
    val sharedChunks = h1.intersect(h2)
    // with expected chunk len 8 over 200 tokens, nearly every chunk
    // after the first boundary must re-align
    assert(byDoc(1L).length >= 10, s"want many chunks: ${byDoc(1L).length}")
    assert(sharedChunks.size >= byDoc(1L).length / 2,
      s"resync failed: ${sharedChunks.size} of ${h1.size} shared")
    // shared chunks report n_docs_sharing = 2 and exactly one keeper
    val shared = out.filter(col("n_docs_sharing") === 2).collect()
    assert(shared.nonEmpty)
    val keeps = shared.groupBy(_.getAs[Long]("chunk_hash"))
      .map { case (_, rows) => rows.count(_.getAs[Boolean]("keep")) }
    assert(keeps.forall(_ == 1), "exactly one keeper per shared chunk")
    // token counts partition the doc
    assert(byDoc(1L).map(_.getAs[Long]("n_tokens")).sum == 200L)
    // determinism under repartition
    val rep = Dedup.cdcChunks(docs.repartition(7), "doc_id", "text", 3)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_hash"))).toSet
    val base = out.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_hash"))).toSet
    assert(rep == base)
  }
}

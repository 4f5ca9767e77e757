package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Cdc
import graft.ops.Registry
import graft.pipeline.{Pipeline, Runner}

/** The shipped examples cannot rot: every YAML in examples/pipelines
  * must parse, every processor must instantiate from its settings, and
  * the parquet-only pipelines must execute end-to-end on the sf0.001
  * test tables.
  */
class ExamplesSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private val dir = new java.io.File("examples/pipelines")

  test("every example parses and its processors instantiate") {
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".yaml")).sortBy(_.getName)
    assert(files.length >= 3, s"examples missing at ${dir.getAbsolutePath}")
    files.foreach { f =>
      val cfgs = Pipeline.fromYaml(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      assert(cfgs.nonEmpty, f.getName)
      val cfg = cfgs.head
      assert(cfg.sources.nonEmpty && cfg.destinations.nonEmpty, f.getName)
      cfg.processors.foreach { p =>
        assert(Registry.create(p.plugin, p.settings) != null,
          s"${f.getName}: ${p.plugin}")
      }
    }
  }

  test("curate-documents runs end-to-end on sf0.001") {
    val cfg = Pipeline.fromYaml(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "curate-documents.yaml").toPath), "UTF-8")).head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val n = out.count()
    assert(n > 0)
    val metas = out.select(col(Cdc.Metadata)).limit(50).collect()
      .map(_.getMap[String, String](0))
    // every stage left its mark: quality + langid annotations AND the
    // pii stage's per-category counts (the redaction step cannot be
    // dropped from the YAML without this failing)
    assert(metas.forall(m => m.contains("quality.n_tokens")
      && m.contains("lang.pred") && m.contains("pii.n_emails")),
      metas.head.toString())
  }

  test("dedupe-and-weight runs end-to-end and weights sum per cluster") {
    val cfg = Pipeline.fromYaml(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "dedupe-and-weight.yaml").toPath), "UTF-8")).head
    val out = Cdc.ok(Runner.build(spark, cfg, streaming = false))
    val pay = out.select(col(Cdc.PayloadAfter)).collect()
      .map(r => graft.functions.JsonOps.parse(r.getString(0)))
    assert(pay.nonEmpty)
    val perCluster = pay.groupBy(_.get("cluster_id").asLong)
      .map { case (_, rows) => rows.map(_.get("weight").asDouble).sum }
    assert(perCluster.forall(s => math.abs(s - 1.0) < 1e-9))
  }
}

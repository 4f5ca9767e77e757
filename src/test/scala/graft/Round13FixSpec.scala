package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Cdc
import graft.ops.LlmProcessor
import graft.pipeline.{Pipeline, Runner}

/** Round-13 ADVICE fixes: YAML `ordered` fail-fast, Go `%%` escape in
  * goSprintf, and the control-plane hardening specced in
  * GrpcControlPlaneSpec.
  */
class Round13FixSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private def yamlWithOrdered(v: String): String =
    s"""pipelines:
       |  - id: o1
       |    ordered: "$v"
       |    connectors:
       |      - id: gen
       |        type: source
       |        plugin: builtin:generator
       |""".stripMargin

  test("fromYaml: ordered accepts the documented vocabulary only") {
    assert(Pipeline.fromYaml(yamlWithOrdered("true")).head.ordered == "global")
    assert(Pipeline.fromYaml(yamlWithOrdered("global")).head.ordered == "global")
    assert(Pipeline.fromYaml(yamlWithOrdered("key")).head.ordered == "key")
    assert(Pipeline.fromYaml(yamlWithOrdered("false")).head.ordered == "")
    // a typo like 'keyed' must fail loudly, not silently drop the
    // ordering guarantee the config declared
    val ex = intercept[IllegalArgumentException] {
      Pipeline.fromYaml(yamlWithOrdered("keyed"))
    }
    assert(ex.getMessage.contains("keyed"), ex.getMessage)
    assert(ex.getMessage.contains("global"), ex.getMessage)
  }

  private def genRecords(n: Int) =
    Runner.source(spark, graft.pipeline.ConnectorConfig("g", "builtin:generator",
      Map("format.options.id" -> "int", "recordCount" -> n.toString)),
      streaming = false)

  test("goSprintf: Go %% escape is a literal percent, never a verb") {
    val resp = """{"message":{"content":[{"type":"text","text":"ok"}]}}"""
    // "100%%s off %s" — Go renders the %%s as literal "%s" and the
    // trailing %s consumes the arg
    val proc = LlmProcessor("cohere.command", Map(
      "prompt" -> "100%%s off %s",
      "request.body" -> ".Payload.After.name",
      "response.body" -> ".Payload.After.answer"),
      CaptureTransport("r13-cmd-1", resp))
    val out = proc(genRecords(1)).collect()
    assert(out.head.getAs[String](Cdc.Error) == null)
    val body = CapturedBodies.map.get("r13-cmd-1")
    assert(body != null && body.contains("100%s off "), s"body=$body")
    assert(!body.contains("MISSING"), s"no verb beyond the arg: $body")

    // only the escaped form: arg unconsumed → Go's EXTRA suffix
    val proc2 = LlmProcessor("cohere.command", Map(
      "prompt" -> "100%%s off",
      "request.body" -> ".Payload.After.name",
      "response.body" -> ".Payload.After.answer"),
      CaptureTransport("r13-cmd-2", resp))
    proc2(genRecords(1)).collect()
    val body2 = CapturedBodies.map.get("r13-cmd-2")
    assert(body2 != null && body2.contains("100%s off%!(EXTRA string="),
      s"body=$body2")
  }

  test("goSprintf: argument DATA containing %s passes through verbatim") {
    // fmt.Sprintf never scans argument data for verbs: a record whose
    // field contains "%s" must land in the prompt unmangled
    val resp = """{"message":{"content":[{"type":"text","text":"ok"}]}}"""
    val proc = LlmProcessor("cohere.command", Map(
      "prompt" -> "Q: %s",
      "request.body" -> ".Payload.After.promo",
      "response.body" -> ".Payload.After.answer"),
      CaptureTransport("r13-cmd-3", resp))
    val rec = genRecords(1)
    val withPromo = graft.ops.FieldSet(
      graft.model.Ref.parse(".Payload.After.promo"), "save 50%s today")(rec)
    proc(withPromo).collect()
    val body = CapturedBodies.map.get("r13-cmd-3")
    assert(body != null && body.contains("save 50%s today"), s"body=$body")
    assert(!body.contains("MISSING"), s"body=$body")
  }

  test("frequentNgrams: a null window head never emits a shortened gram") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 1L, Option.empty[String]), (1L, 2L, 2L, Some("b")),
      (1L, 3L, 3L, Some("c")), (1L, 4L, 4L, Some("d")))
    val g = graft.analytics.Sequences.frequentNgrams(
      rows.toDF("u", "t", "id", "s"), Seq("u"),
      org.apache.spark.sql.functions.col("t"),
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("s"), n = 3, minSupport = 1L)
      .collect().map(_.getString(0)).toSet
    assert(g == Set("b>c>d"), s"got $g") // never "b>c" from (null,b,c)
  }
}

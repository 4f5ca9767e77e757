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
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.pipeline.{ControlPlane, GrpcControlPlane, Pipeline, Runner}

/** gRPC PipelineService facade (round 12): the reference's
  * `api.v1.PipelineService` vocabulary served over the shaded gRPC
  * runtime, delegating to the same ControlPlane as the REST facade.
  */
class GrpcControlPlaneSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  private def yamlFor(id: String, records: Int = 50): String =
    Pipeline.toYaml(Seq(
      Pipeline(id)
        .source("gen", "builtin:generator",
          "format.options.id" -> "int", "recordCount" -> records.toString)
        .destination("out", "memory")))

  test("in-process round-trip: create, get, export, start, stop, delete") {
    val cp = new ControlPlane(spark,
      java.nio.file.Files.createTempDirectory("grpc_cp").toString)
    val svc = new GrpcControlPlane(cp)
    svc.serveInProcess("grpc-spec-1")
    val cli = GrpcControlPlane.inProcessClient("grpc-spec-1")
    try {
      // Create from provisioning YAML
      val created = JsonOps.parse(
        cli.call("CreatePipeline", s"""{"yaml":${quote(yamlFor("gp1"))}}"""))
      assert(created.get("pipeline").get("id").asText() == "gp1")
      assert(created.get("pipeline").get("status").asText() == "stopped")

      // List includes it
      val listed = JsonOps.parse(cli.call("ListPipelines", "{}"))
      assert(listed.get("pipelines").size() == 1)

      // Get mirrors status
      val got = JsonOps.parse(cli.call("GetPipeline", """{"id":"gp1"}"""))
      assert(got.get("pipeline").get("status").asText() == "stopped")

      // Export round-trips through the YAML schema
      val exported = JsonOps.parse(cli.call("ExportPipeline", """{"id":"gp1"}"""))
      val back = Pipeline.fromYaml(exported.get("yaml").asText())
      assert(back.map(_.id) == Seq("gp1"))
      assert(back.head.sources.map(_.plugin) == Seq("builtin:generator"))

      // Start runs the streaming query; records land in the sink
      Runner.memorySinks.clear()
      cli.call("StartPipeline", """{"id":"gp1"}""")
      val deadline = System.currentTimeMillis() + 60000
      while (Runner.memorySink("out").size < 50 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(Runner.memorySink("out").size >= 50)
      val running = JsonOps.parse(cli.call("GetPipeline", """{"id":"gp1"}"""))
      assert(running.get("pipeline").get("status").asText() == "running")

      cli.call("StopPipeline", """{"id":"gp1"}""")
      val stopped = JsonOps.parse(cli.call("GetPipeline", """{"id":"gp1"}"""))
      assert(stopped.get("pipeline").get("status").asText() == "stopped")

      cli.call("DeletePipeline", """{"id":"gp1"}""")
      assert(JsonOps.parse(cli.call("ListPipelines", "{}"))
        .get("pipelines").size() == 0)
    } finally { cli.close(); svc.stop(); cp.stop() }
  }

  test("plan/apply/import/DLQ vocabulary and gRPC error codes") {
    val cp = new ControlPlane(spark,
      java.nio.file.Files.createTempDirectory("grpc_cp2").toString)
    val svc = new GrpcControlPlane(cp)
    svc.serveInProcess("grpc-spec-2")
    val cli = GrpcControlPlane.inProcessClient("grpc-spec-2")
    try {
      val yaml = yamlFor("gp2")
      // Plan against an empty registry: pure create
      val plan = JsonOps.parse(
        cli.call("PlanPipeline", s"""{"yaml":${quote(yaml)}}"""))
      assert(plan.get("plan").get("create").get(0).asText() == "gp2")
      // Apply registers it
      cli.call("ApplyPipeline", s"""{"yaml":${quote(yaml)}}""")
      assert(cp.isRegistered("gp2"))
      // Second plan: unchanged
      val plan2 = JsonOps.parse(
        cli.call("PlanPipeline", s"""{"yaml":${quote(yaml)}}"""))
      assert(plan2.get("plan").get("unchanged").get(0).asText() == "gp2")

      // Import (create alias) of another pipeline
      val imp = JsonOps.parse(
        cli.call("ImportPipeline", s"""{"yaml":${quote(yamlFor("gp3"))}}"""))
      assert(imp.get("ids").get(0).asText() == "gp3")

      // DLQ get/update
      assert(JsonOps.parse(cli.call("GetDLQ", """{"id":"gp2"}"""))
        .get("dlq").isNull)
      val upd = JsonOps.parse(cli.call("UpdateDLQ",
        """{"id":"gp2","dlq":{"plugin":"builtin:log","windowSize":9,"windowNackThreshold":3}}"""))
      assert(upd.get("dlq").get("windowSize").asInt() == 9)
      assert(cp.config("gp2").flatMap(_.dlq).exists(_.windowNackThreshold == 3))

      // Errors surface as INVALID_ARGUMENT, not transport failures
      val ex = intercept[Exception] {
        cli.call("GetPipeline", """{"id":"nope"}""")
      }
      assert(ex.getMessage.contains("INVALID_ARGUMENT"), ex.getMessage)
      assert(ex.getMessage.contains("unknown pipeline"), ex.getMessage)
      // duplicate create → already exists
      val dup = intercept[Exception] {
        cli.call("CreatePipeline", s"""{"yaml":${quote(yaml)}}""")
      }
      assert(dup.getMessage.contains("already exists"), dup.getMessage)
    } finally { cli.close(); svc.stop(); cp.stop() }
  }

  test("real socket: the shaded Netty transport binds and serves") {
    import org.sparkproject.connect.grpc.netty.NettyChannelBuilder
    val cp = new ControlPlane(spark,
      java.nio.file.Files.createTempDirectory("grpc_cp3").toString)
    val svc = new GrpcControlPlane(cp)
    val port = svc.serve(0) // ephemeral
    assert(port > 0)
    val ch = NettyChannelBuilder.forAddress("127.0.0.1", port)
      .usePlaintext().build()
    val cli = new GrpcControlPlane.Client(ch)
    try {
      cli.call("CreatePipeline", s"""{"yaml":${quote(yamlFor("gp4"))}}""")
      val listed = JsonOps.parse(cli.call("ListPipelines", "{}"))
      assert(listed.get("pipelines").get(0).get("id").asText() == "gp4")
    } finally { cli.close(); svc.stop(); cp.stop() }
  }

  private def quote(s: String): String =
    JsonOps.render(JsonOps.mapper.getNodeFactory.textNode(s))
}

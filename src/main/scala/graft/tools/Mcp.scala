package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.functions.JsonOps

/** `graft mcp` — an MCP (Model Context Protocol) server exposing
  * pipeline operations to AI agents, the engine's analogue of the
  * reference's `conduit mcp` (`cmd/conduit/root/mcp/mcp.go`, tool
  * catalog in `cmd/conduit/internal/mcp/catalog.go`).
  *
  * Transport: stdio, newline-delimited JSON-RPC 2.0 — the MCP stdio
  * transport (the agent owns the process, so no auth layer; the
  * reference's `--http` daemon mode is out of scope here, matching
  * its own "EXPERIMENTAL" framing). Supported methods: `initialize`,
  * `notifications/initialized` (ignored, per protocol), `ping`,
  * `tools/list`, `tools/call`; anything else answers JSON-RPC
  * `-32601`. Notifications (no `id`) never get a response.
  *
  * Tool catalog, 1:1 with CLI verbs over the SAME control-plane REST
  * facade the CLI uses (the reference registers its tools against the
  * same engines as its CLI — that split is mirrored exactly):
  *
  *  - always registered (read-only): `validate` (offline YAML parse,
  *    mutates nothing, needs no server), `plan` (diff vs registered
  *    state, mutates nothing), `list_pipelines`, `inspect`
  *    (status + provisioning YAML + DLQ head), `list_plugins`,
  *    `doctor` (reachability checklist)
  *  - registered only under `--allow-mutations` (an OPERATOR/process
  *    flag, never agent-settable — the reference's exact contract,
  *    `catalog.go` `Mutates`): `apply`, `start`, `stop`
  *
  * The server address comes from `--api <url>` / `GRAFT_API` like
  * every other CLI command. [[handle]] is a pure request→response
  * function so McpSpec drives the whole protocol in-process.
  */
object Mcp {

  /** Latest protocol revision this server knows; initialize echoes
    * the client's requested version when present (version agreement
    * is the client's job per spec — we accept what it proposes). */
  val ProtocolVersion = "2025-06-18"

  def main(args: Array[String]): Unit = {
    val base = Cli.apiFrom(args)
    val allowMutations = args.contains("--allow-mutations")
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in, UTF_8))
    val out = new java.io.PrintStream(System.out, true, "UTF-8")
    var line = in.readLine()
    while (line != null) {
      if (line.trim.nonEmpty) {
        handle(line, base, allowMutations)
          .foreach(resp => out.println(JsonOps.render(resp)))
      }
      line = in.readLine()
    }
  }

  /** One JSON-RPC message in → optional response out (None for
    * notifications and unparseable ids). Malformed JSON on a line
    * with no recoverable id answers a `null`-id `-32700` per
    * JSON-RPC 2.0.
    */
  def handle(line: String, baseUrl: String,
             allowMutations: Boolean): Option[JsonNode] = {
    val req =
      try JsonOps.parse(line)
      catch {
        case _: Exception =>
          return Some(error(JsonOps.mapper.nullNode(), -32700, "parse error"))
      }
    val id = req.get("id")
    val isNotification = id == null || id.isNull
    def reply(result: ObjectNode): Option[JsonNode] =
      if (isNotification) None
      else {
        val o = JsonOps.mapper.createObjectNode()
        o.put("jsonrpc", "2.0")
        o.set[JsonNode]("id", id)
        o.set[JsonNode]("result", result)
        Some(o)
      }
    def fail(code: Int, msg: String): Option[JsonNode] =
      if (isNotification) None else Some(error(id, code, msg))

    Option(req.get("method")).map(_.asText()) match {
      case Some("initialize") =>
        val clientVersion = Option(req.get("params"))
          .flatMap(p => Option(p.get("protocolVersion")))
          .map(_.asText()).getOrElse(ProtocolVersion)
        val r = JsonOps.mapper.createObjectNode()
        r.put("protocolVersion", clientVersion)
        r.putObject("capabilities").putObject("tools")
          .put("listChanged", false)
        val info = r.putObject("serverInfo")
        info.put("name", "graft")
        info.put("version", graft.ops.PluginCatalog.Version)
        reply(r)
      case Some("notifications/initialized") => None
      case Some("ping") => reply(JsonOps.mapper.createObjectNode())
      case Some("tools/list") =>
        val r = JsonOps.mapper.createObjectNode()
        val arr = r.putArray("tools")
        tools(allowMutations).foreach { t =>
          val o = arr.addObject()
          o.put("name", t.name)
          o.put("description", t.description)
          o.set[JsonNode]("inputSchema", JsonOps.parse(t.inputSchema))
        }
        reply(r)
      case Some("tools/call") =>
        val params = Option(req.get("params"))
          .getOrElse(JsonOps.mapper.createObjectNode())
        val name = Option(params.get("name")).map(_.asText()).getOrElse("")
        tools(allowMutations).find(_.name == name) match {
          case None => fail(-32602, s"unknown tool: $name")
          case Some(t) =>
            val args = Option(params.get("arguments"))
              .getOrElse(JsonOps.mapper.createObjectNode())
            val (isError, text) =
              try t.call(args, baseUrl)
              catch { case e: Exception => (true, s"${e.getMessage}") }
            val r = JsonOps.mapper.createObjectNode()
            val content = r.putArray("content").addObject()
            content.put("type", "text")
            content.put("text", text)
            r.put("isError", isError)
            reply(r)
        }
      case Some(other) => fail(-32601, s"method not found: $other")
      case None => fail(-32600, "missing method")
    }
  }

  private def error(id: JsonNode, code: Int, msg: String): JsonNode = {
    val o = JsonOps.mapper.createObjectNode()
    o.put("jsonrpc", "2.0")
    o.set[JsonNode]("id", if (id == null) JsonOps.mapper.nullNode() else id)
    val e = o.putObject("error")
    e.put("code", code)
    e.put("message", msg)
    o
  }

  /** One MCP tool: stable name, description (the agent-facing doc),
    * a JSON-Schema input contract, whether it mutates, and the call
    * body returning (isError, text). */
  final case class Tool(name: String, description: String,
                        inputSchema: String, mutates: Boolean,
                        call: (JsonNode, String) => (Boolean, String))

  private val NoArgs =
    """{"type":"object","properties":{},"additionalProperties":false}"""
  private val YamlArg =
    """{"type":"object","properties":{"yaml":{"type":"string",
      |"description":"provisioning YAML (version 2.2 pipeline file)"}},
      |"required":["yaml"],"additionalProperties":false}"""
      .stripMargin.replace("\n", "")
  private val PipelineArg =
    """{"type":"object","properties":{"pipeline_id":{"type":"string",
      |"description":"pipeline id as registered in the control plane"}},
      |"required":["pipeline_id"],"additionalProperties":false}"""
      .stripMargin.replace("\n", "")

  private def str(args: JsonNode, field: String): String = {
    val v = args.get(field)
    require(v != null && v.isTextual, s"missing required argument: $field")
    v.asText()
  }

  /** The catalog — read tools always; write tools only when the
    * operator started the process with `--allow-mutations`. */
  def tools(allowMutations: Boolean): Seq[Tool] = {
    val read = Seq(
      Tool("validate",
        "Parses a provisioning YAML offline and reports every error " +
          "(unknown plugin, bad settings, missing connectors). Mutates " +
          "nothing; needs no running server. Same engine as `graft run`.",
        YamlArg, mutates = false,
        (args, _) =>
          try {
            val ps = graft.pipeline.Pipeline.fromYaml(str(args, "yaml"))
            require(ps.nonEmpty, "no pipelines in file")
            (false, s"ok: ${ps.map(_.id).mkString(", ")}")
          } catch {
            case e: Exception => (true, s"invalid: ${e.getMessage}")
          }),
      Tool("plan",
        "Computes the create/update diff of a provisioning YAML against " +
          "the registered state. Mutates nothing. Same engine as `graft " +
          "pipelines plan`.",
        YamlArg, mutates = false,
        (args, base) =>
          http(Cli.post(base, "/v1/pipelines/plan", str(args, "yaml")))),
      Tool("list_pipelines",
        "Lists registered pipelines with state, restart count and row " +
          "counts. Same data as `graft pipelines ls`.",
        NoArgs, mutates = false,
        (_, base) => http(Cli.get(base, "/v1/pipelines"))),
      Tool("inspect",
        "Reports one pipeline's live status, provisioning YAML and " +
          "dead-letter-queue head. Same engines as `graft pipelines " +
          "describe` + the DLQ route.",
        PipelineArg, mutates = false,
        (args, base) => {
          val id = str(args, "pipeline_id")
          val parts = Seq(
            Cli.get(base, s"/v1/pipelines/$id/status"),
            Cli.get(base, s"/v1/pipelines/$id/export"),
            Cli.get(base, s"/v1/pipelines/$id/dead-letter-queue"))
          parts.collectFirst { case Left((_, m)) => (true, m) }
            .getOrElse((false, parts.map(_.toOption.get).mkString("\n")))
        }),
      Tool("list_plugins",
        "Lists every processor and connector plugin (optionally filtered " +
          "by a name regex) with its spec. Same data as `graft plugins ls`.",
        """{"type":"object","properties":{"name_regex":{"type":"string",
          |"description":"optional name filter"}},
          |"additionalProperties":false}""".stripMargin.replace("\n", ""),
        mutates = false,
        (args, base) => {
          val q = Option(args.get("name_regex")).filter(_.isTextual)
            .map(n => s"?name=${n.asText()}").getOrElse("")
          val procs = Cli.get(base, s"/v1/processors/plugins$q")
          val conns = Cli.get(base, s"/v1/connectors/plugins$q")
          (procs, conns) match {
            case (Right(p), Right(c)) =>
              (false, s"""{"processors":$p,"connectors":$c}""")
            case _ =>
              (true, Seq(procs, conns).collectFirst {
                case Left((_, m)) => m }.get)
          }
        }),
      Tool("doctor",
        "Checks control-plane reachability and health — offline-safe, " +
          "non-destructive. Same checklist as `graft doctor`.",
        NoArgs, mutates = false,
        (_, base) => {
          val (code, out) = Cli.run(Array("doctor"), base)
          (code != 0, out)
        }))
    val write = Seq(
      Tool("apply",
        "Registers the creates and updates of a provisioning YAML in the " +
          "control plane. MUTATES the pipeline store. Same engine as " +
          "`graft pipelines apply`.",
        YamlArg, mutates = true,
        (args, base) =>
          http(Cli.post(base, "/v1/pipelines/apply", str(args, "yaml")))),
      Tool("start",
        "Starts a registered pipeline (begins the streaming query). " +
          "MUTATES runtime state. Same engine as `graft pipelines start`.",
        PipelineArg, mutates = true,
        (args, base) => http(Cli.post(base,
          s"/v1/pipelines/${str(args, "pipeline_id")}/start", ""))),
      Tool("stop",
        "Stops a running pipeline. MUTATES runtime state. Same engine as " +
          "`graft pipelines stop`.",
        PipelineArg, mutates = true,
        (args, base) => http(Cli.post(base,
          s"/v1/pipelines/${str(args, "pipeline_id")}/stop", ""))))
    if (allowMutations) read ++ write else read
  }

  private def http(r: Either[(Int, String), String]): (Boolean, String) =
    r.fold({ case (_, msg) => (true, msg) }, body => (false, body))
}

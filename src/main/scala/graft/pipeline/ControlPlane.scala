package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.JsonOps

/** Minimal REST control plane over the pipeline runner — the engine's
  * analogue of the reference's HTTP API (`proto/api/v1/api.proto`
  * PipelineService: Create/Start/Stop/Status + streaming inspect via
  * the inspector tap). JDK HttpServer: no extra dependencies.
  *
  * Endpoints:
  *   GET    /v1/pipelines               list {id, status}
  *   POST   /v1/pipelines               body = provisioning YAML → create
  *   POST   /v1/pipelines/import        alias of create (reference Import)
  *   GET    /v1/pipelines/export        all registered pipelines as YAML
  *   POST   /v1/pipelines/plan          YAML → diff vs registered (no change)
  *   POST   /v1/pipelines/apply         YAML → register creates+updates
  *   POST   /v1/pipelines/{id}/start    start streaming query
  *   POST   /v1/pipelines/{id}/stop     stop query
  *   GET    /v1/pipelines/{id}/status   status + metrics snapshot
  *   GET    /v1/pipelines/{id}/export   one pipeline as YAML
  *   GET    /v1/pipelines/{id}/inspect  drained inspector sample
  *   GET    /v1/pipelines/{id}/dead-letter-queue   DLQ config
  *   PUT    /v1/pipelines/{id}/dead-letter-queue   update DLQ config
  *   DELETE /v1/pipelines/{id}          stop + unregister
  *   GET    /v1/processors/plugins      processor-plugin specs (?name=regex)
  *   GET    /v1/connectors/plugins      connector-plugin specs (?name=regex)
  *   GET    /v1/connectors/{id}/inspect       first drained tap payload
  *   GET    /v1/processors/{id}/inspect-in    (same tap — see the
  *   GET    /v1/processors/{id}/inspect-out    GrpcControlPlane tap note)
  *   GET    /openapi.json               OpenAPI 3 document of this surface
  *   GET    /openapi                    minimal self-contained explorer
  *   GET    /metrics                    Prometheus text exposition
  *   GET    /info                       version/os/arch
  */
class ControlPlane(spark: SparkSession, checkpointRoot: String) {
  private val configs = new ConcurrentHashMap[String, PipelineConfig]()
  private val queries = new ConcurrentHashMap[String, StreamingQuery]()
  private val supervisors = new ConcurrentHashMap[String, Supervisor]()
  private var server: HttpServer = _

  /** Per-pipeline mutation monitor: config CRUD and lifecycle starts
    * serialize on it, so (a) two concurrent copy-and-mutate updates
    * can't silently lose one write and (b) a StartPipeline can't race
    * a mutation past its isActive guard (the reference serializes the
    * same paths through orchestrator locks,
    * `pkg/orchestrator/pipelines.go:27`). Monitors are never removed —
    * one Object per pipeline id ever seen is noise next to a config. */
  private val locks = new ConcurrentHashMap[String, Object]()
  private def lockFor(id: String): Object =
    locks.computeIfAbsent(id, _ => new Object)

  def registered: Seq[String] =
    scala.jdk.CollectionConverters.EnumerationHasAsScala(configs.keys()).asScala.toSeq

  def register(p: PipelineConfig): Unit =
    lockFor(p.id).synchronized { configs.put(p.id, p) }

  /** Atomic check-and-replace of a registered config: runs `f` under
    * the pipeline's mutation monitor with the isActive check INSIDE
    * the critical section — the topology-CRUD primitive the gRPC
    * facade builds on. Throws IllegalArgumentException for an unknown
    * id, IllegalStateException while the pipeline runs. */
  def mutate(id: String)(f: PipelineConfig => PipelineConfig): PipelineConfig =
    lockFor(id).synchronized {
      val cfg = configs.get(id)
      require(cfg != null, s"unknown pipeline: $id")
      if (isActive(id)) throw new IllegalStateException(
        s"pipeline $id is running; stop it before changing its configuration")
      val updated = f(cfg)
      configs.put(id, updated)
      updated
    }

  def startPipeline(id: String): StreamingQuery = lockFor(id).synchronized {
    val cfg = configs.get(id)
    require(cfg != null, s"unknown pipeline: $id")
    queries.get(id) match {
      case q: StreamingQuery if q.isActive => q // start is idempotent
      case _ =>
        stopPipeline(id) // clear a dead query / old supervisor first
        Metrics.inspector(id) // attach a tap
        val q = Runner.start(spark, cfg, s"$checkpointRoot/$id",
          Trigger.ProcessingTime("1 second"))
        queries.put(id, q)
        q
    }
  }

  /** Start under supervision: crash → checkpoint restart with backoff,
    * DEGRADED after maxRetries (reference recovery semantics,
    * `pkg/lifecycle/service.go:238`); status surfaces the supervisor
    * state + restart count. Idempotent: a repeated start returns the
    * running supervisor; a dead one (and any bare query holding the
    * checkpoint) is stopped first, so no supervisor is ever orphaned
    * out of reach of stopPipeline.
    */
  def superviseStart(id: String, maxRetries: Int = 5): Supervisor = lockFor(id).synchronized {
    val cfg = configs.get(id)
    require(cfg != null, s"unknown pipeline: $id")
    supervisors.get(id) match {
      case sup: Supervisor if sup.status == sup.Status.Running => sup
      case _ =>
        stopPipeline(id) // release the checkpoint + drop any stale handle
        Metrics.inspector(id)
        val sup = Supervisor(spark, cfg, s"$checkpointRoot/$id",
          Trigger.ProcessingTime("1 second"), maxRetries = maxRetries).start()
        supervisors.put(id, sup)
        sup
    }
  }

  def stopPipeline(id: String): Unit = {
    Option(supervisors.remove(id)).foreach(_.stop())
    Option(queries.remove(id)).foreach(_.stop())
  }

  /** One pipeline's status document (shared by the REST and gRPC
    * facades). */
  def statusJson(id: String): String = status(id)

  /** True when `id` is registered. */
  def isRegistered(id: String): Boolean = configs.get(id) != null

  /** True while the pipeline's streaming query (or supervisor) is
    * live — config mutations against a live pipeline are rejected by
    * the facades so status never reports "running" for a config that
    * is not what's executing. A DEGRADED supervisor (retries
    * exhausted, nothing executing) is NOT active: reconfiguring a
    * crashed pipeline is the documented intervention path. */
  def isActive(id: String): Boolean =
    Option(supervisors.get(id)).exists(_.status == "running") ||
      Option(queries.get(id)).exists(_.isActive)

  /** Registered config (null-safe). */
  def config(id: String): Option[PipelineConfig] = Option(configs.get(id))

  /** Stop + unregister; true when the pipeline existed. */
  def remove(id: String): Boolean = lockFor(id).synchronized {
    stopPipeline(id)
    configs.remove(id) != null
  }

  /** Plan document for a provisioning set (shared by REST/gRPC). */
  def planFor(ps: Seq[PipelineConfig]): String = planJson(ps)

  /** Drained inspector sample for a pipeline (shared by REST/gRPC). */
  def inspect(id: String): Seq[String] =
    Metrics.inspectorFor(id).map(_.drain()).getOrElse(Nil)

  /** The pipeline's lifecycle state string (shared by the status
    * document and the Prometheus status gauges). */
  private def stateOf(id: String): String = {
    val sup = supervisors.get(id)
    val q = queries.get(id)
    if (sup != null) sup.status
    else if (q == null) "stopped"
    else if (q.isActive) "running"
    else "terminated"
  }

  private def status(id: String): String = {
    val sup = supervisors.get(id)
    val state = stateOf(id)
    val restarts = if (sup == null) 0 else sup.restarts
    val snap = Metrics.snapshot(id)
    s"""{"id":${JsonOps.render(JsonOps.mapper.getNodeFactory.textNode(id))},"status":"$state","restarts":$restarts,"batches":${snap.batches},"inputRows":${snap.inputRows},"rowsPerSecond":${snap.lastRowsPerSecond}}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  private def respondYaml(ex: HttpExchange, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/x-yaml")
    ex.sendResponseHeaders(200, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  /** Terraform-style diff of a provisioning file against the registered
    * state (reference plan/apply): create / update / unchanged, plus
    * registered pipelines the file does not manage.
    */
  private def planJson(ps: Seq[PipelineConfig]): String = {
    val (create, existing) = ps.partition(p => configs.get(p.id) == null)
    val (unchanged, update) = existing.partition(p => configs.get(p.id) == p)
    val unmanaged = registered.filterNot(id => ps.exists(_.id == id)).sorted
    def ids(xs: Seq[PipelineConfig]) = xs.map(p => s""""${p.id}"""").mkString("[", ",", "]")
    s"""{"create":${ids(create)},"update":${ids(update)},""" +
      s""""unchanged":${ids(unchanged)},""" +
      s""""unmanaged":${unmanaged.map(s => s""""$s"""").mkString("[", ",", "]")}}"""
  }

  def start(port: Int): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/v1/pipelines", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath.stripPrefix("/v1/pipelines")
          .stripPrefix("/").split("/").filter(_.nonEmpty)
        (ex.getRequestMethod, path.toList) match {
          case ("GET", Nil) =>
            val items = registered.map(status).mkString("[", ",", "]")
            respond(ex, 200, items)
          case ("POST", Nil) | ("POST", "import" :: Nil) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val ps = Pipeline.fromYaml(body)
            // Same invariant as /apply: a RUNNING pipeline's config is
            // never swapped under it. Reject the whole import if any
            // id it would CHANGE is active; ids whose config is
            // identical pass through (idempotent re-import is fine).
            val activeChanged = ps.filter(p =>
              isActive(p.id) && configs.get(p.id) != p).map(_.id)
            if (activeChanged.nonEmpty)
              respond(ex, 409, s"""{"error":"pipelines running; stop before import: ${
                activeChanged.sorted.mkString(", ")}"}""")
            else {
              // creates register; existing-id updates go through
              // mutate(), which rechecks isActive inside the per-id
              // monitor (a start racing this import loses cleanly)
              ps.foreach { p =>
                if (configs.get(p.id) == null) register(p)
                else if (configs.get(p.id) != p) mutate(p.id)(_ => p)
              }
              respond(ex, 201, s"""{"created":[${ps.map(p => s""""${p.id}"""").mkString(",")}]}""")
            }
          case ("GET", "export" :: Nil) =>
            val ps = registered.sorted.flatMap(id => Option(configs.get(id)))
            respondYaml(ex, Pipeline.toYaml(ps))
          case ("GET", id :: "export" :: Nil) =>
            val cfg = configs.get(id)
            if (cfg == null) respond(ex, 404, """{"error":"not found"}""")
            else respondYaml(ex, Pipeline.toYaml(Seq(cfg)))
          case ("POST", "plan" :: Nil) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            respond(ex, 200, planJson(Pipeline.fromYaml(body)))
          case ("POST", "apply" :: Nil) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val ps = Pipeline.fromYaml(body)
            val plan = planJson(ps)
            // Same invariant as the gRPC facade: a RUNNING pipeline's
            // config is never swapped under it (status must describe
            // what's executing). Reject the whole apply if any changed
            // pipeline is active — stop it first, then re-apply.
            val activeChanged = ps.filter(p =>
              isActive(p.id) && configs.get(p.id) != p).map(_.id)
            if (activeChanged.nonEmpty)
              respond(ex, 409, s"""{"error":"pipelines running; stop before apply: ${
                activeChanged.sorted.mkString(", ")}","plan":$plan}""")
            else {
              // creates go through register; updates through mutate(),
              // which rechecks isActive inside the per-id monitor (a
              // start racing this apply loses cleanly with a 400)
              ps.foreach { p =>
                if (configs.get(p.id) == null) register(p)
                else if (configs.get(p.id) != p) mutate(p.id)(_ => p)
              }
              respond(ex, 200, plan)
            }
          case ("DELETE", id :: Nil) =>
            stopPipeline(id)
            val existed = configs.remove(id) != null
            respond(ex, if (existed) 200 else 404,
              s"""{"deleted":${existed}}""")
          case ("POST", id :: "start" :: Nil) =>
            // ?supervise=true → recovery loop instead of a bare query
            if (Option(ex.getRequestURI.getQuery).exists(_.contains("supervise=true")))
              superviseStart(id)
            else startPipeline(id)
            respond(ex, 200, status(id))
          case ("POST", id :: "stop" :: Nil) =>
            stopPipeline(id)
            respond(ex, 200, status(id))
          case ("GET", id :: "status" :: Nil) =>
            respond(ex, 200, status(id))
          case ("GET", id :: "inspect" :: Nil) =>
            val sample = Metrics.inspectorFor(id).map(_.drain()).getOrElse(Nil)
            respond(ex, 200, sample.mkString("[", ",", "]"))
          // DLQ config (reference parity: GetDLQ/UpdateDLQ at
          // GET/PUT /v1/pipelines/{id}/dead-letter-queue —
          // proto/api/v1/api.proto:520-531)
          case ("GET", id :: "dead-letter-queue" :: Nil) =>
            config(id) match {
              case None => respond(ex, 404, """{"error":"not found"}""")
              case Some(cfg) => respond(ex, 200, cfg.dlq match {
                case Some(q) =>
                  s"""{"dlq":{"plugin":${JsonOps.render(JsonOps.mapper.getNodeFactory.textNode(q.plugin))},"windowSize":${q.windowSize},"windowNackThreshold":${q.windowNackThreshold}}}"""
                case None => """{"dlq":null}"""
              })
            }
          case ("PUT", id :: "dead-letter-queue" :: Nil) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val n = JsonOps.parse(body)
            val d = Option(n.get("dlq")).getOrElse(n) // {dlq:{...}} or bare
            // mutate() holds the same running-pipeline invariant as the
            // gRPC facade: a live query keeps its old DLQ config
            mutate(id)(cfg => cfg.copy(dlq = Some(DlqConfig(
              plugin = Option(d.get("plugin")).map(_.asText("builtin:log"))
                .getOrElse("builtin:log"),
              windowSize = Option(d.get("windowSize")).map(_.asInt(0)).getOrElse(0),
              windowNackThreshold = Option(d.get("windowNackThreshold"))
                .map(_.asInt(0)).getOrElse(0)))))
            val q = config(id).get.dlq.get
            respond(ex, 200,
              s"""{"dlq":{"plugin":${JsonOps.render(JsonOps.mapper.getNodeFactory.textNode(q.plugin))},"windowSize":${q.windowSize},"windowNackThreshold":${q.windowNackThreshold}}}""")
          case _ => respond(ex, 404, """{"error":"not found"}""")
        }
      } catch {
        case e: Exception =>
          respond(ex, 400, s"""{"error":${JsonOps.render(
            JsonOps.mapper.getNodeFactory.textNode(e.getMessage))}}""")
      }
    })
    // Prometheus scrape endpoint (reference parity: the runtime serves
    // promhttp at /metrics — pkg/conduit/runtime.go:51,73). Plain text
    // exposition format rendered from the engine's own counters, no
    // client library.
    server.createContext("/metrics", (ex: HttpExchange) => {
      try {
        val body = Metrics.prometheus(registered.map(id => id -> stateOf(id)))
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        os.write(bytes); os.close()
      } catch {
        case e: Exception => respond(ex, 500, s"""{"error":${JsonOps.render(
          JsonOps.mapper.getNodeFactory.textNode(e.getMessage))}}""")
      }
    })
    // Connector/processor resource routes (reference parity: the
    // gateway's /v1/connectors and /v1/processors HTTP bindings,
    // api.proto:770-1103) — bridged onto the SAME handler maps the
    // gRPC services run (GrpcControlPlane.invokeUnary), so the REST
    // and gRPC views of a pipeline's topology cannot drift. Streaming
    // inspect stays on /v1/pipelines/{id}/inspect and the gRPC stream.
    val facade = new GrpcControlPlane(this)
    def jtext(s: String): String =
      JsonOps.render(JsonOps.mapper.getNodeFactory.textNode(s))
    def restResource(base: String, service: String, noun: String,
                     hasValidate: Boolean,
                     inspectRoutes: Map[String, String]): Unit =
      server.createContext(base, (ex: HttpExchange) => {
        try {
          val path = java.net.URLDecoder.decode(
            ex.getRequestURI.getPath, "UTF-8").stripPrefix(base)
            .stripPrefix("/").split("/").filter(_.nonEmpty).toList
          def q(k: String): String = Option(ex.getRequestURI.getQuery)
            .flatMap(_.split("&").find(_.startsWith(s"$k=")))
            .map(s => java.net.URLDecoder.decode(
              s.stripPrefix(s"$k="), "UTF-8")).getOrElse("")
          def body(): String = new String(
            ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          def bodyWithId(id: String): String = {
            val n = JsonOps.parseOrEmpty(body())
              .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            n.put("id", id)
            JsonOps.render(n)
          }
          (ex.getRequestMethod, path) match {
            case ("GET", Nil) =>
              respond(ex, 200, facade.invokeUnary(service, s"List${noun}s",
                s"""{"pipeline_id":${jtext(q("pipeline_id"))}}"""))
            case ("GET", id :: Nil) =>
              respond(ex, 200, facade.invokeUnary(service, s"Get$noun",
                s"""{"id":${jtext(id)}}"""))
            // proto inspect bindings (api.proto:795,1016,1027) bridged
            // onto the SAME gRPC stream handlers, first drained
            // payload: ?limit= / ?duration_ms= pass through (REST
            // defaults duration_ms low — a GET should return, not
            // hold the connection open like the gRPC stream)
            case ("GET", id :: sub :: Nil) if inspectRoutes.contains(sub) =>
              val limit = Some(q("limit")).filter(_.matches("\\d+"))
                .getOrElse("100")
              val dur = Some(q("duration_ms")).filter(_.matches("\\d+"))
                .getOrElse("200")
              val msgs = facade.invokeStreamCollect(service,
                inspectRoutes(sub),
                s"""{"id":${jtext(id)},"limit":$limit,"duration_ms":$dur}""")
              respond(ex, 200, msgs.mkString("[", ",", "]"))
            case ("POST", "validate" :: Nil) if hasValidate =>
              respond(ex, 200,
                facade.invokeUnary(service, s"Validate$noun", body()))
            case ("POST", "validate" :: Nil) =>
              // deliberate: the reference proto defines validation for
              // connectors only (api.proto has no ValidateProcessor) —
              // say so instead of a generic unknown-method fall-through
              respond(ex, 404, s"""{"error":"validation is defined for """ +
                s"""connectors only; ${noun.toLowerCase}s have no """ +
                """validate RPC"}""")
            case ("POST", Nil) =>
              respond(ex, 200,
                facade.invokeUnary(service, s"Create$noun", body()))
            case ("PUT", id :: Nil) =>
              respond(ex, 200,
                facade.invokeUnary(service, s"Update$noun", bodyWithId(id)))
            case ("DELETE", id :: Nil) =>
              respond(ex, 200, facade.invokeUnary(service, s"Delete$noun",
                s"""{"id":${jtext(id)}}"""))
            case _ => respond(ex, 404, """{"error":"not found"}""")
          }
        } catch {
          case e: NoSuchElementException =>
            respond(ex, 404, s"""{"error":${jtext(
              String.valueOf(e.getMessage))}}""")
          case e: Exception =>
            respond(ex, 400, s"""{"error":${jtext(
              String.valueOf(e.getMessage))}}""")
        }
      })
    ControlPlane.Resources.foreach(r =>
      restResource(r.base, r.service, r.noun, r.hasValidate, r.inspectRoutes))

    // OpenAPI document + explorer (reference parity: the runtime
    // mounts its swagger JSON + UI at /openapi —
    // pkg/http/openapi/openapi.go:31, pkg/conduit/runtime.go:974-983,
    // advertised in the startup log at runtime.go:661). The document
    // is generated from the SAME route table the resource handlers
    // above are registered from (OpenApi.routes reads
    // ControlPlane.Resources), so it cannot drift from the server.
    server.createContext("/openapi.json", (ex: HttpExchange) =>
      respond(ex, 200,
        OpenApi.documentJson(graft.ops.PluginCatalog.Version)))
    server.createContext("/openapi", (ex: HttpExchange) => {
      val bytes = OpenApi.explorerHtml.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
      ex.sendResponseHeaders(200, bytes.length)
      val os = ex.getResponseBody
      os.write(bytes); os.close()
    })

    // Health endpoint (reference parity: the gateway maps the gRPC
    // health service to GET /healthz[?service=X] —
    // pkg/conduit/runtime.go:946 WithHealthzEndpoint). SERVING for the
    // server and every served API group; unknown services are 404.
    server.createContext("/healthz", (ex: HttpExchange) => {
      val svc = Option(ex.getRequestURI.getQuery)
        .flatMap(_.split("&").find(_.startsWith("service=")))
        .map(_.stripPrefix("service=")).getOrElse("")
      val known = Set("", "PipelineService", "ConnectorService",
        "ProcessorService", "InformationService").map(s =>
        if (s.isEmpty) s else s"api.v1.$s") ++
        Set("PipelineService", "ConnectorService", "ProcessorService",
          "InformationService")
      if (svc.isEmpty || known.contains(svc))
        respond(ex, 200, """{"status":"SERVING"}""")
      else respond(ex, 404, s"""{"error":"service '$svc' not found"}""")
    })
    // Processor-plugin discovery (reference parity: ListProcessorPlugins,
    // GET /v1/processors/plugins with an optional name-regex filter —
    // proto/api/v1/api.proto:1132-1137, spec shape :221-239): the
    // generated catalogue rendered as ProcessorPluginSpecifications
    // JSON, so a client can enumerate the ~100 named plugins and their
    // parameter maps without reading source.
    server.createContext("/v1/processors/plugins", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "GET")
          respond(ex, 404, """{"error":"not found"}""")
        else {
          val nameRe = Option(ex.getRequestURI.getQuery).toSeq
            .flatMap(_.split("&")).find(_.startsWith("name="))
            .map(q => java.net.URLDecoder.decode(q.drop(5), "UTF-8"))
          respond(ex, 200, graft.ops.PluginCatalog.specsJson(nameRe))
        }
      } catch {
        case e: Exception => respond(ex, 400, s"""{"error":${JsonOps.render(
          JsonOps.mapper.getNodeFactory.textNode(e.getMessage))}}""")
      }
    })
    // Connector-plugin discovery (reference parity: ListConnectorPlugins,
    // GET /v1/connectors/plugins — proto/api/v1/api.proto:921-926, spec
    // shape :196-218 with source_params / destination_params).
    server.createContext("/v1/connectors/plugins", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "GET")
          respond(ex, 404, """{"error":"not found"}""")
        else {
          val nameRe = Option(ex.getRequestURI.getQuery).toSeq
            .flatMap(_.split("&")).find(_.startsWith("name="))
            .map(q => java.net.URLDecoder.decode(q.drop(5), "UTF-8"))
          respond(ex, 200, graft.ops.PluginCatalog.connectorSpecsJson(nameRe))
        }
      } catch {
        case e: Exception => respond(ex, 400, s"""{"error":${JsonOps.render(
          JsonOps.mapper.getNodeFactory.textNode(e.getMessage))}}""")
      }
    })
    // Runtime information (reference parity: InformationService.GetInfo,
    // GET /info — proto/api/v1/api.proto:1202-1209).
    server.createContext("/info", (ex: HttpExchange) => {
      respond(ex, 200,
        s"""{"version":"${graft.ops.PluginCatalog.Version}","os":"${
          System.getProperty("os.name").toLowerCase}","arch":"${
          System.getProperty("os.arch")}"}""")
    })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    scala.jdk.CollectionConverters.EnumerationHasAsScala(queries.keys()).asScala
      .foreach(stopPipeline)
    if (server != null) server.stop(0)
  }
}

object ControlPlane {
  /** One gRPC-bridged REST resource: the base path, the gRPC service
    * its handlers live on, the noun its method names are built from,
    * whether the proto defines a Validate RPC for it (connectors
    * only), and its inspect sub-routes (sub-path → stream method).
    * `start()` registers handlers from this table and
    * [[OpenApi.routes]] renders the document from it — one
    * definition, two views.
    */
  final case class ResourceDef(base: String, service: String, noun: String,
                               hasValidate: Boolean,
                               inspectRoutes: Map[String, String])

  val Resources: Seq[ResourceDef] = Seq(
    ResourceDef("/v1/connectors", GrpcControlPlane.ConnectorServiceName,
      "Connector", hasValidate = true,
      inspectRoutes = Map("inspect" -> "InspectConnector")),
    ResourceDef("/v1/processors", GrpcControlPlane.ProcessorServiceName,
      "Processor", hasValidate = false,
      inspectRoutes = Map("inspect-in" -> "InspectProcessorIn",
        "inspect-out" -> "InspectProcessorOut")))
}

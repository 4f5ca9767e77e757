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
  *   POST   /v1/pipelines/{id}/start    start streaming query
  *   POST   /v1/pipelines/{id}/stop     stop query
  *   GET    /v1/pipelines/{id}/status   status + metrics snapshot
  *   GET    /v1/pipelines/{id}/inspect  drained inspector sample
  */
class ControlPlane(spark: SparkSession, checkpointRoot: String) {
  private val configs = new ConcurrentHashMap[String, PipelineConfig]()
  private val queries = new ConcurrentHashMap[String, StreamingQuery]()
  private var server: HttpServer = _

  def registered: Seq[String] =
    scala.jdk.CollectionConverters.EnumerationHasAsScala(configs.keys()).asScala.toSeq

  def register(p: PipelineConfig): Unit = configs.put(p.id, p)

  def startPipeline(id: String): StreamingQuery = {
    val cfg = configs.get(id)
    require(cfg != null, s"unknown pipeline: $id")
    Metrics.inspector(id) // attach a tap
    val q = Runner.start(spark, cfg, s"$checkpointRoot/$id",
      Trigger.ProcessingTime("1 second"))
    queries.put(id, q)
    q
  }

  def stopPipeline(id: String): Unit =
    Option(queries.remove(id)).foreach(_.stop())

  private def status(id: String): String = {
    val q = queries.get(id)
    val state =
      if (q == null) "stopped"
      else if (q.isActive) "running"
      else "terminated"
    val snap = Metrics.snapshot(id)
    s"""{"id":${JsonOps.render(JsonOps.mapper.getNodeFactory.textNode(id))},"status":"$state","batches":${snap.batches},"inputRows":${snap.inputRows},"rowsPerSecond":${snap.lastRowsPerSecond}}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
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
          case ("POST", Nil) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val ps = Pipeline.fromYaml(body)
            ps.foreach(register)
            respond(ex, 201, s"""{"created":[${ps.map(p => s""""${p.id}"""").mkString(",")}]}""")
          case ("POST", id :: "start" :: Nil) =>
            startPipeline(id)
            respond(ex, 200, status(id))
          case ("POST", id :: "stop" :: Nil) =>
            stopPipeline(id)
            respond(ex, 200, status(id))
          case ("GET", id :: "status" :: Nil) =>
            respond(ex, 200, status(id))
          case ("GET", id :: "inspect" :: Nil) =>
            val sample = Metrics.inspectorFor(id).map(_.drain()).getOrElse(Nil)
            respond(ex, 200, sample.mkString("[", ",", "]"))
          case _ => respond(ex, 404, """{"error":"not found"}""")
        }
      } catch {
        case e: Exception =>
          respond(ex, 400, s"""{"error":${JsonOps.render(
            JsonOps.mapper.getNodeFactory.textNode(e.getMessage))}}""")
      }
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

package graft.pipeline

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.JsonNode
import org.sparkproject.connect.grpc.{CallOptions, ManagedChannel, MethodDescriptor, Server, ServerCallHandler, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.inprocess.{InProcessChannelBuilder, InProcessServerBuilder}
import org.sparkproject.connect.grpc.netty.NettyServerBuilder
import org.sparkproject.connect.grpc.stub.{ClientCalls, ServerCalls, StreamObserver}

import graft.functions.JsonOps

/** gRPC facade over [[ControlPlane]] — the engine's analogue of the
  * reference's `api.v1.PipelineService`
  * (`proto/api/v1/api.proto:318`: List/Create/Get/Delete/Start/Stop/
  * DLQ/Export/Import/Plan/Apply; implementations
  * `pkg/http/api/pipeline_v1.go` delegating to the orchestrator).
  * Here each RPC delegates to the same [[ControlPlane]] the REST
  * facade wraps — one registry, two wire surfaces, exactly the
  * reference's grpc-gateway arrangement in reverse.
  *
  * ==Wire format (documented deviation)==
  * Method names and semantics mirror the proto service, but message
  * bodies travel as the messages' JSON mapping (a custom gRPC
  * marshaller — the `application/grpc` framing with a JSON codec)
  * instead of protobuf binary. The container has no protoc and the
  * only gRPC runtime on the classpath is the one Spark Connect
  * shades, so hand-rolled binary codecs would be all risk and no
  * fidelity: the reference itself serves this exact JSON shape over
  * its grpc-gateway HTTP mirror. Pipeline specs cross the wire as
  * provisioning YAML in a `"yaml"` field (the reference's Export/
  * Import vocabulary), statuses as the same documents the REST
  * facade serves.
  *
  * Scale note: this is a control plane — requests touch the driver's
  * registry and streaming-query handles only, never data. The shaded
  * Netty transport serves real sockets ([[serve]]); tests and
  * embedded use get the in-process transport ([[serveInProcess]]).
  */
class GrpcControlPlane(cp: ControlPlane) {
  import GrpcControlPlane._

  private var server: Server = _

  // ---- handlers -----------------------------------------------------

  private def node(s: String): JsonNode = JsonOps.parseOrEmpty(s)
  private def text(n: JsonNode, field: String): String =
    Option(n.get(field)).map(_.asText("")).getOrElse("")
  private def jstr(s: String): String =
    JsonOps.render(JsonOps.mapper.getNodeFactory.textNode(s))

  private def requireId(n: JsonNode): String = {
    val id = text(n, "id")
    require(id.nonEmpty, "missing field: id")
    require(cp.isRegistered(id), s"unknown pipeline: $id")
    id
  }

  /** Pipelines named by a request: a provisioning `yaml` field, or a
    * minimal `config` object (the proto's Pipeline.Config analogue —
    * name/description only; connectors arrive via yaml or Apply).
    */
  private def pipelinesOf(n: JsonNode): Seq[PipelineConfig] = {
    val yaml = text(n, "yaml")
    if (yaml.nonEmpty) Pipeline.fromYaml(yaml)
    else {
      val cfg = n.get("config")
      require(cfg != null, "missing field: yaml or config")
      val name = Option(cfg.get("name")).map(_.asText("")).getOrElse("")
      require(name.nonEmpty, "config.name is required")
      Seq(PipelineConfig(id = name, name = name))
    }
  }

  private val handlers: Map[String, String => String] = Map(
    "ListPipelines" -> { _ =>
      s"""{"pipelines":${cp.registered.sorted.map(cp.statusJson)
        .mkString("[", ",", "]")}}"""
    },
    "CreatePipeline" -> { req =>
      val ps = pipelinesOf(node(req))
      ps.foreach { p =>
        require(!cp.isRegistered(p.id), s"already exists: ${p.id}")
        cp.register(p)
      }
      s"""{"pipeline":${cp.statusJson(ps.head.id)}}"""
    },
    "GetPipeline" -> { req =>
      s"""{"pipeline":${cp.statusJson(requireId(node(req)))}}"""
    },
    "UpdatePipeline" -> { req =>
      val n = node(req)
      val id = requireId(n)
      val ps = pipelinesOf(n)
      require(ps.size == 1 && ps.head.id == id,
        s"update body must describe pipeline $id")
      cp.register(ps.head)
      s"""{"pipeline":${cp.statusJson(id)}}"""
    },
    "DeletePipeline" -> { req =>
      val id = text(node(req), "id")
      require(id.nonEmpty, "missing field: id")
      require(cp.remove(id), s"unknown pipeline: $id")
      "{}"
    },
    "StartPipeline" -> { req =>
      val n = node(req)
      val id = requireId(n)
      if (Option(n.get("supervise")).exists(_.asBoolean(false)))
        cp.superviseStart(id)
      else cp.startPipeline(id)
      "{}"
    },
    "StopPipeline" -> { req =>
      cp.stopPipeline(requireId(node(req)))
      "{}"
    },
    "GetDLQ" -> { req =>
      val id = requireId(node(req))
      val d = cp.config(id).flatMap(_.dlq)
      d match {
        case Some(q) =>
          s"""{"dlq":{"plugin":${jstr(q.plugin)},"windowSize":${q.windowSize},"windowNackThreshold":${q.windowNackThreshold}}}"""
        case None => """{"dlq":null}"""
      }
    },
    "UpdateDLQ" -> { req =>
      val n = node(req)
      val id = requireId(n)
      val d = Option(n.get("dlq")).getOrElse(
        throw new IllegalArgumentException("missing field: dlq"))
      val cfg = cp.config(id).get
      cp.register(cfg.copy(dlq = Some(DlqConfig(
        plugin = Option(d.get("plugin")).map(_.asText("builtin:log"))
          .getOrElse("builtin:log"),
        windowSize = Option(d.get("windowSize")).map(_.asInt(0)).getOrElse(0),
        windowNackThreshold = Option(d.get("windowNackThreshold"))
          .map(_.asInt(0)).getOrElse(0)))))
      handlersDlqEcho(id)
    },
    "ExportPipeline" -> { req =>
      val id = requireId(node(req))
      s"""{"yaml":${jstr(Pipeline.toYaml(Seq(cp.config(id).get)))}}"""
    },
    "ImportPipeline" -> { req =>
      val ps = pipelinesOf(node(req))
      ps.foreach(cp.register)
      s"""{"ids":${ps.map(p => jstr(p.id)).mkString("[", ",", "]")}}"""
    },
    "PlanPipeline" -> { req =>
      s"""{"plan":${cp.planFor(pipelinesOf(node(req)))}}"""
    },
    "ApplyPipeline" -> { req =>
      val ps = pipelinesOf(node(req))
      val plan = cp.planFor(ps)
      ps.foreach(cp.register)
      s"""{"plan":$plan}"""
    })

  private def handlersDlqEcho(id: String): String =
    handlers("GetDLQ")(s"""{"id":${jstr(id)}}""")

  private def serviceDefinition(): ServerServiceDefinition = {
    val b = ServerServiceDefinition.builder(ServiceName)
    handlers.foreach { case (name, fn) =>
      b.addMethod(methodOf(name), unaryHandler(fn))
    }
    b.build()
  }

  private def unaryHandler(fn: String => String): ServerCallHandler[String, String] =
    ServerCalls.asyncUnaryCall(new ServerCalls.UnaryMethod[String, String] {
      override def invoke(request: String,
                          observer: StreamObserver[String]): Unit = {
        try {
          observer.onNext(fn(request))
          observer.onCompleted()
        } catch {
          case e: IllegalArgumentException =>
            observer.onError(Status.INVALID_ARGUMENT
              .withDescription(String.valueOf(e.getMessage))
              .asRuntimeException())
          case e: Exception =>
            observer.onError(Status.INTERNAL
              .withDescription(String.valueOf(e.getMessage))
              .asRuntimeException())
        }
      }
    })

  /** Serve on a real TCP port (shaded Netty transport); returns the
    * bound port (pass 0 for ephemeral). */
  def serve(port: Int): Int = {
    server = NettyServerBuilder.forPort(port)
      .addService(serviceDefinition()).build().start()
    server.getPort
  }

  /** Serve over the in-process transport under `name` (tests,
    * embedded runtimes — the reference's embedded-API analogue). */
  def serveInProcess(name: String): Unit = {
    server = InProcessServerBuilder.forName(name).directExecutor()
      .addService(serviceDefinition()).build().start()
  }

  def stop(): Unit = if (server != null) server.shutdownNow()
}

object GrpcControlPlane {
  val ServiceName = "api.v1.PipelineService"

  /** gRPC marshaller for the JSON codec: message bytes are UTF-8
    * JSON, surfaced to handlers as strings. */
  private object JsonMarshaller extends MethodDescriptor.Marshaller[String] {
    override def stream(value: String): InputStream =
      new ByteArrayInputStream(value.getBytes(UTF_8))
    override def parse(stream: InputStream): String =
      new String(stream.readAllBytes(), UTF_8)
  }

  /** Descriptor for `api.v1.PipelineService/<name>` — shared by the
    * server and [[client]] so both ends agree on the codec. */
  def methodOf(name: String): MethodDescriptor[String, String] =
    MethodDescriptor.newBuilder[String, String]()
      .setType(MethodDescriptor.MethodType.UNARY)
      .setFullMethodName(
        MethodDescriptor.generateFullMethodName(ServiceName, name))
      .setRequestMarshaller(JsonMarshaller)
      .setResponseMarshaller(JsonMarshaller)
      .build()

  /** Minimal blocking client (one unary call per invocation). */
  final class Client(channel: ManagedChannel) {
    def call(method: String, requestJson: String): String =
      ClientCalls.blockingUnaryCall(
        channel, methodOf(method), CallOptions.DEFAULT, requestJson)
    def close(): Unit = channel.shutdownNow()
  }

  def inProcessClient(name: String): Client =
    new Client(InProcessChannelBuilder.forName(name).directExecutor().build())
}

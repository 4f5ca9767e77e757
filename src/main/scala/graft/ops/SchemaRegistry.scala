package graft.ops

import java.util.concurrent.ConcurrentHashMap

import graft.functions.JsonOps

/** Minimal Confluent-compatible schema-registry client (reference
  * `pkg/schemaregistry/client.go:83,127`): resolve an Avro schema by id
  * (`GET /schemas/ids/{id}`) or by subject latest version
  * (`GET /subjects/{subject}/versions/latest`). Resolution happens once
  * on the driver at processor-build time and is cached for the session
  * (the reference caches after first download too) — executors only
  * ever see the resolved schema text baked into the expression, so no
  * registry traffic from tasks. Reuses the pluggable [[HttpTransport]]
  * so tests stub the registry with a local server.
  */
object SchemaRegistry {
  private val cache = new ConcurrentHashMap[String, (Int, String)]()

  /** (schemaId, schemaJson) for an id or a subject's latest version. */
  def resolve(baseUrl: String, subject: Option[String], id: Option[Int],
              transport: HttpTransport = HttpTransport.Default): (Int, String) = {
    val url = id match {
      case Some(i) => s"${baseUrl.stripSuffix("/")}/schemas/ids/$i"
      case None =>
        val s = subject.getOrElse(throw new IllegalArgumentException(
          "schema registry: need sdk.schema.subject or sdk.schema.id"))
        s"${baseUrl.stripSuffix("/")}/subjects/$s/versions/latest"
    }
    cache.computeIfAbsent(url, { u =>
      val resp = transport.send("GET", u,
        Map("Accept" -> "application/vnd.schemaregistry.v1+json"), Array.emptyByteArray)
      if (resp.status >= 400)
        throw new RuntimeException(s"schema registry: $u returned ${resp.status}")
      val node = JsonOps.parse(new String(resp.body, "UTF-8"))
      val schema = Option(node.get("schema")).map(_.asText()).getOrElse(
        throw new RuntimeException(s"schema registry: no schema in response from $u"))
      val resolvedId = Option(node.get("id")).map(_.asInt())
        .orElse(id).getOrElse(throw new RuntimeException(
          s"schema registry: no id in response from $u"))
      (resolvedId, schema)
    })
  }

  private val registered = new ConcurrentHashMap[String, Int]()

  /** Register a schema under a subject (`POST /subjects/{subject}/
    * versions`, the Confluent API the reference's CreateSchema speaks —
    * `impl/avro/internal/encoder.go:80-88`) and return its id. Cached
    * per (url, subject, schema) for the JVM: on a cluster each executor
    * registers a distinct schema at most once, and the registry dedups
    * identical schema text to the same id, so re-registration across
    * executors is idempotent (the standard Confluent-serializer
    * client-side-cache pattern).
    */
  def register(baseUrl: String, subject: String, schemaJson: String,
               transport: HttpTransport = HttpTransport.Default): Int = {
    val url = s"${baseUrl.stripSuffix("/")}/subjects/$subject/versions"
    registered.computeIfAbsent(s"$url|$schemaJson", { _ =>
      val body = JsonOps.mapper.getNodeFactory.objectNode()
      body.put("schema", schemaJson)
      body.put("schemaType", "AVRO")
      val resp = transport.send("POST", url,
        Map("Content-Type" -> "application/vnd.schemaregistry.v1+json"),
        JsonOps.render(body).getBytes("UTF-8"))
      if (resp.status >= 400)
        throw new RuntimeException(s"schema registry: $url returned ${resp.status}")
      val node = JsonOps.parse(new String(resp.body, "UTF-8"))
      Option(node.get("id")).map(_.asInt()).getOrElse(throw new RuntimeException(
        s"schema registry: no id in response from $url"))
    })
  }

  /** Test hook: drop cached resolutions. */
  def clearCache(): Unit = { cache.clear(); registered.clear() }
}

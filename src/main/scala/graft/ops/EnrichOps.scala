package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types.StructType

import graft.functions.JsonOps
import graft.model.{Cdc, Ref}
import graft.model.Ref._

/** Pluggable HTTP transport so enrichment processors are testable
  * without network (and swappable for an async client at scale).
  */
trait HttpTransport extends Serializable {
  def send(method: String, url: String, headers: Map[String, String],
           body: Array[Byte]): HttpTransport.Response
}

object HttpTransport {
  final case class Response(status: Int, body: Array[Byte])

  /** Default java.net implementation — one connection per call; a
    * partition reuses the JVM-level connection pool.
    */
  object Default extends HttpTransport {
    override def send(method: String, url: String, headers: Map[String, String],
                      body: Array[Byte]): Response = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      // bounded: a hung endpoint must fail the record (→ DLQ), never
      // stall the micro-batch forever
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestMethod(method)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      if (body != null && body.nonEmpty) {
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        os.write(body); os.close()
      }
      val status = conn.getResponseCode
      val in = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val bytes = if (in == null) Array.emptyByteArray else in.readAllBytes()
      Response(status, bytes)
    }
  }
}

/** Record-level template/reference evaluation for the enrichment
  * processors (they run in `mapPartitions`, outside Catalyst).
  */
object RecordTemplates {
  private val tmpl = """\{\{(.*?)\}\}""".r

  def getRef(row: Row, ref: Ref): String = ref match {
    case OperationRef => row.getAs[String](Cdc.Operation)
    case PositionRef => Option(row.getAs[Array[Byte]](Cdc.Position))
      .map(new String(_, "UTF-8")).orNull
    case MetadataRef(Seq(k)) =>
      Option(row.getAs[Map[String, String]](Cdc.Metadata)).flatMap(_.get(k)).orNull
    case MetadataRef(_) => null
    case KeyRef(Seq()) => row.getAs[String](Cdc.Key)
    case KeyRef(rest) => sub(row.getAs[String](Cdc.Key), rest)
    case PayloadBeforeRef(rest) =>
      if (rest.isEmpty) row.getAs[String](Cdc.PayloadBefore)
      else sub(row.getAs[String](Cdc.PayloadBefore), rest)
    case PayloadAfterRef(rest) =>
      if (rest.isEmpty) row.getAs[String](Cdc.PayloadAfter)
      else sub(row.getAs[String](Cdc.PayloadAfter), rest)
    case PayloadRef => row.getAs[String](Cdc.PayloadAfter)
  }

  private def sub(json: String, path: Seq[String]): String = {
    if (json == null) return null
    JsonOps.get(JsonOps.parseOrEmpty(json), path) match {
      case Some(n) if n.isTextual => n.asText()
      case Some(n) if n.isNull => null
      case Some(n) => JsonOps.render(n)
      case None => null
    }
  }

  private val printfForm = """^printf\s+"%s"\s+(\S+)$""".r

  /** Evaluate `text with {{ .Payload.After.x }} refs` against a row;
    * the reference's common `{{ printf "%s" .Ref }}` form passes
    * through to the bare reference.
    */
  def render(template: String, row: Row): String =
    tmpl.replaceAllIn(template, m => {
      val body = m.group(1).trim match {
        case printfForm(ref) => ref
        case other => other
      }
      java.util.regex.Matcher.quoteReplacement(
        Option(getRef(row, Ref.parse(body))).getOrElse(""))
    })

  /** Set a value (raw JSON if parseable, else string) at a ref. */
  def setRef(row: Row, ref: Ref, value: String, schema: StructType): Row = {
    def setJson(json: String, path: Seq[String]): String =
      if (path.isEmpty) value
      else JsonOps.render(JsonOps.set(
        JsonOps.parseOrEmpty(if (json == null) "{}" else json), path,
        try JsonOps.parse(value) catch {
          case _: Exception => JsonOps.mapper.getNodeFactory.textNode(value)
        }))
    val values = row.toSeq.toArray
    ref match {
      case OperationRef =>
        values(schema.fieldIndex(Cdc.Operation)) = value
      case MetadataRef(Seq(k)) =>
        val idx = schema.fieldIndex(Cdc.Metadata)
        val m = Option(row.getAs[Map[String, String]](Cdc.Metadata)).getOrElse(Map.empty)
        values(idx) = m + (k -> value)
      case KeyRef(_) =>
        val idx = schema.fieldIndex(Cdc.Key)
        values(idx) = setJson(row.getString(idx), ref.sub)
      case PayloadBeforeRef(_) =>
        val idx = schema.fieldIndex(Cdc.PayloadBefore)
        values(idx) = setJson(row.getString(idx), ref.sub)
      case _ =>
        val idx = schema.fieldIndex(Cdc.PayloadAfter)
        values(idx) = setJson(row.getString(idx), ref.sub)
    }
    new GenericRowWithSchema(values, schema)
  }

  def setError(row: Row, msg: String, schema: StructType): Row = {
    val values = row.toSeq.toArray
    values(schema.fieldIndex(Cdc.Error)) = msg
    new GenericRowWithSchema(values, schema)
  }
}

/** `webhook.http` — per-record templated HTTP call with exponential
  * backoff on 5xx, response body written to a field ref (reference
  * `impl/webhook/http.go:40-77,203`). Runs as `mapPartitions`: one
  * transport per partition, rows streamed through it (SURVEY §2.5).
  */
case class WebhookHttp(settings: Map[String, String],
                       transport: HttpTransport = HttpTransport.Default)
    extends Processor {
  val plugin = "webhook.http"
  private val urlTemplate = settings("request.url")
  private val method = settings.getOrElse("request.method", "GET")
  private val bodyTemplate = settings.getOrElse("request.body", "")
  private val headers = settings.collect {
    case (k, v) if k.startsWith("headers.") => k.stripPrefix("headers.") -> v
  } ++ settings.get("request.contentType").map("Content-Type" -> _)
  private val responseBodyRef = Ref.parse(
    settings.getOrElse("response.body", ".Payload.After"))
  private val responseStatusRef =
    settings.get("response.status").map(Ref.parse)
  private val retryCount = settings.getOrElse("backoffRetry.count", "0").toInt
  private val retryMinMs = parseDuration(settings.getOrElse("backoffRetry.min", "100ms"))
  private val retryMaxMs = parseDuration(settings.getOrElse("backoffRetry.max", "5s"))
  private val retryFactor = settings.getOrElse("backoffRetry.factor", "2").toDouble

  private def parseDuration(s: String): Long = s.trim match {
    case d if d.endsWith("ms") => d.dropRight(2).toLong
    case d if d.endsWith("s") => d.dropRight(1).toLong * 1000
    case d => d.toLong
  }

  override def transform(df: DataFrame): DataFrame = run(df, None)

  /** Single-scan conditional: the condition is evaluated as a column
    * and misses stream through the SAME mapPartitions untouched — no
    * split/union double-scan of the source, and no HTTP call for rows
    * that fail the condition.
    */
  override def transformConditional(df: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame = run(df, Some(cond))

  private def run(df: DataFrame,
                  cond: Option[org.apache.spark.sql.Column]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    val base0 = Cdc.withErrorChannel(df)
    val base = cond.map(c => base0.withColumn("_cond", coalesce(c, lit(false))))
      .getOrElse(base0)
    val schema = base.schema
    val names = schema
    val condIdx = cond.map(_ => schema.fieldIndex("_cond"))
    val t = transport
    val (u, m, b, h) = (urlTemplate, method, bodyTemplate, headers)
    val (rbRef, rsRef) = (responseBodyRef, responseStatusRef)
    val (rc, rMin, rMax, rFac) = (retryCount, retryMinMs, retryMaxMs, retryFactor)
    implicit val enc = Encoders.row(schema)
    val mapped = base.mapPartitions { rows =>
      rows.map { row =>
        if (condIdx.exists(i => !row.getBoolean(i))) row
        else try {
          val url = RecordTemplates.render(u, row)
          val body = RecordTemplates.render(b, row).getBytes("UTF-8")
          var attempt = 0
          var resp = t.send(m, url, h, body)
          while (resp.status >= 500 && attempt < rc) {
            val delay = math.min(rMax.toDouble, rMin * math.pow(rFac, attempt)).toLong
            Thread.sleep(delay)
            attempt += 1
            resp = t.send(m, url, h, body)
          }
          if (resp.status >= 400)
            RecordTemplates.setError(row, s"webhook.http: status ${resp.status}", names)
          else {
            // raw response bytes: a whole-slot target becomes RawData
            // (the plain string); a structured sub-field renders bytes
            // the way Go's json.Marshal does — base64 (reference
            // behavior, see webhook golden vectors)
            val value =
              if (rbRef.sub.isEmpty) new String(resp.body, "UTF-8")
              else java.util.Base64.getEncoder.encodeToString(resp.body)
            var out = RecordTemplates.setRef(row, rbRef, value, names)
            rsRef.foreach(r =>
              out = RecordTemplates.setRef(out, r, resp.status.toString, names))
            out
          }
        } catch {
          case e: Exception =>
            RecordTemplates.setError(row, s"webhook.http: ${e.getMessage}", names)
        }
      }
    }
    condIdx.map(_ => mapped.drop("_cond")).getOrElse(mapped)
  }
}

/** The LLM enrichment family (`openai.embed`, `openai.textgen`,
  * `cohere.command`, `cohere.embed`, `cohere.rerank`,
  * `ollama.request` — reference §2.5): one engine, per-plugin request
  * shaping. Each reads a field ref, POSTs a JSON request, extracts the
  * per-record result from the response, writes it back to a field ref.
  * The HTTP boundary is the same pluggable transport as webhook.http,
  * so tests run with a fake and production points at the real endpoint.
  *
  * Batching + retry (reference `impl/cohere/embed.go:159`): the embed
  * endpoints accept arrays, so the partition iterator is consumed in
  * `batchSize` groups — ONE request per group, results distributed by
  * index. 429/5xx retry with exponential backoff (`backoffRetry.*`,
  * same knobs as webhook.http); an exhausted retry errors every record
  * of the group to the DLQ, not the whole task. At 1M records/batch a
  * per-record request is a rate-limit death sentence; batch-of-96 cuts
  * the request count 96×.
  */
case class LlmProcessor(pluginName: String, settings: Map[String, String],
                        transport: HttpTransport = HttpTransport.Default)
    extends Processor {
  val plugin = pluginName

  /** `buildBody` takes the whole batch; `extract(resp, i)` pulls record
    * i's result. Plugins whose API is single-input run with maxBatch=1
    * through the same path.
    */
  private case class Shape(url: String, buildBody: Seq[String] => String,
                           extract: (com.fasterxml.jackson.databind.JsonNode, Int) =>
                             Option[com.fasterxml.jackson.databind.JsonNode],
                           maxBatch: Int)

  private def arr(items: Seq[String]) = {
    val a = JsonOps.mapper.getNodeFactory.arrayNode()
    items.foreach(a.add)
    a
  }

  private def path(n: com.fasterxml.jackson.databind.JsonNode, segs: Seq[String]) =
    segs.foldLeft(Option(n)) {
      case (Some(x), seg) if x.isArray && seg.forall(_.isDigit) => Option(x.get(seg.toInt))
      case (Some(x), seg) => Option(x.get(seg))
      case (None, _) => None
    }

  private def shape: Shape = pluginName match {
    case "openai.embed" => Shape(
      settings.getOrElse("url", "https://api.openai.com/v1/embeddings"),
      ins => JsonOps.render(obj(
        "model" -> txt(settings.getOrElse("model", "text-embedding-3-small")),
        "input" -> arr(ins))),
      (n, i) => path(n, Seq("data", i.toString, "embedding")),
      maxBatch = 96)
    case "openai.textgen" => Shape(
      settings.getOrElse("url", "https://api.openai.com/v1/chat/completions"),
      ins => JsonOps.render(obj("model" -> txt(settings.getOrElse("model", "gpt-4o-mini")),
        "messages" -> JsonOps.parse(
          s"""[{"role":"user","content":${JsonOps.render(txt(ins.head))}}]"""))),
      (n, _) => path(n, Seq("choices", "0", "message", "content")),
      maxBatch = 1)
    case "cohere.command" => Shape(
      settings.getOrElse("url", "https://api.cohere.ai/v1/chat"),
      ins => JsonOps.render(obj("message" -> txt(ins.head))),
      (n, _) => path(n, Seq("text")),
      maxBatch = 1)
    case "cohere.embed" => Shape(
      settings.getOrElse("url", "https://api.cohere.ai/v1/embed"),
      ins => JsonOps.render(obj("texts" -> arr(ins))),
      (n, i) => path(n, Seq("embeddings", i.toString)),
      maxBatch = 96) // the reference's cohere maxBatchSize
    case "cohere.rerank" => Shape(
      settings.getOrElse("url", "https://api.cohere.ai/v1/rerank"),
      ins => JsonOps.render(obj("query" -> txt(settings.getOrElse("query", "")),
        "documents" -> arr(ins))),
      (n, _) => path(n, Seq("results")), // rank list per record
      maxBatch = 1)
    case "ollama.request" => Shape(
      settings.getOrElse("url", "http://localhost:11434/api/generate"),
      ins => JsonOps.render(obj("model" -> txt(settings.getOrElse("model", "llama3")),
        "prompt" -> txt(ins.head), "stream" -> JsonOps.parse("false"))),
      (n, _) => path(n, Seq("response")),
      maxBatch = 1)
    case other => throw new IllegalArgumentException(s"unknown LLM plugin: $other")
  }

  private def obj(fields: (String, com.fasterxml.jackson.databind.JsonNode)*) = {
    val o = JsonOps.mapper.getNodeFactory.objectNode()
    fields.foreach { case (k, v) => o.set[com.fasterxml.jackson.databind.JsonNode](k, v) }
    o
  }
  private def txt(s: String) = JsonOps.mapper.getNodeFactory.textNode(s)

  private val inputRef = Ref.parse(settings.getOrElse("field", ".Payload.After"))
  private val outputRef = Ref.parse(
    settings.getOrElse("result.field", ".Payload.After.result"))

  private def parseDuration(s: String): Long = s.trim match {
    case d if d.endsWith("ms") => d.dropRight(2).toLong
    case d if d.endsWith("s") => d.dropRight(1).toLong * 1000
    case d => d.toLong
  }

  override def transform(df: DataFrame): DataFrame = run(df, None)

  /** Single-scan conditional (same shape as webhook.http): misses pass
    * through the partition iterator untouched — no request for them,
    * no split/union re-scan of the source.
    */
  override def transformConditional(df: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame = run(df, Some(cond))

  private def run(df: DataFrame,
                  cond: Option[org.apache.spark.sql.Column]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    val base0 = Cdc.withErrorChannel(df)
    val base = cond.map(c => base0.withColumn("_cond", coalesce(c, lit(false))))
      .getOrElse(base0)
    val schema = base.schema
    val names = schema
    val condIdx = cond.map(_ => schema.fieldIndex("_cond"))
    val t = transport
    val sh = shape
    val (inRef, outRef) = (inputRef, outputRef)
    val batchSize = math.max(1, math.min(sh.maxBatch,
      settings.getOrElse("batchSize", sh.maxBatch.toString).toInt))
    val retryCount = settings.getOrElse("backoffRetry.count", "0").toInt
    val retryMinMs = parseDuration(settings.getOrElse("backoffRetry.min", "100ms"))
    val retryMaxMs = parseDuration(settings.getOrElse("backoffRetry.max", "5s"))
    val retryFactor = settings.getOrElse("backoffRetry.factor", "2").toDouble
    val auth = settings.get("apiKey").map(k => Map("Authorization" -> s"Bearer $k"))
      .getOrElse(Map.empty) + ("Content-Type" -> "application/json")
    implicit val enc = Encoders.row(schema)
    val mapped = base.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        // condition misses stream through; only hits go in the request
        val (group, pass) = condIdx match {
          case Some(i) => chunk.partition(_.getBoolean(i))
          case None => (chunk, Seq.empty[Row])
        }
        if (group.isEmpty) pass
        else pass ++ (try {
          val ins = group.map(r => Option(RecordTemplates.getRef(r, inRef)).getOrElse(""))
          val body = sh.buildBody(ins).getBytes("UTF-8")
          var attempt = 0
          var resp = t.send("POST", sh.url, auth, body)
          while ((resp.status == 429 || resp.status >= 500) && attempt < retryCount) {
            val delay = math.min(retryMaxMs.toDouble,
              retryMinMs * math.pow(retryFactor, attempt)).toLong
            Thread.sleep(delay)
            attempt += 1
            resp = t.send("POST", sh.url, auth, body)
          }
          if (resp.status >= 400)
            group.map(RecordTemplates.setError(_, s"$pluginName: status ${resp.status}", names))
          else {
            val node = JsonOps.parse(new String(resp.body, "UTF-8"))
            group.zipWithIndex.map { case (row, i) =>
              sh.extract(node, i) match {
                case Some(r) =>
                  RecordTemplates.setRef(row, outRef,
                    if (r.isTextual) r.asText() else JsonOps.render(r), names)
                case None =>
                  RecordTemplates.setError(row, s"$pluginName: empty result", names)
              }
            }
          }
        } catch {
          case e: Exception =>
            group.map(RecordTemplates.setError(_, s"$pluginName: ${e.getMessage}", names))
        })
      }
    }
    condIdx.map(_ => mapped.drop("_cond")).getOrElse(mapped)
  }
}

package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.functions.JsonOps
import graft.model.Cdc

/** `custom.javascript` — run a user JavaScript `process(record)`
  * function over every record (reference
  * `pkg/plugin/processor/builtin/impl/custom/javascript.go:151`:
  * goja-executed `process()` that returns the — possibly modified —
  * record, returns `null` to filter it, or throws to error it; with
  * `Record()` / `RawData()` / `StructuredData()` / `logger` helpers in
  * scope).
  *
  * The reference embeds goja, a Go JavaScript interpreter. The JVM
  * here ships no JS engine, so the script runs in a Node.js
  * SUBPROCESS, one per partition: records stream through
  * `mapPartitions` as newline-delimited JSON envelopes on the child's
  * stdin and come back in order on its stdout — the classic
  * pipe-transform shape, so the operator is executor-local and
  * driver-free at any scale. The user source is evaluated inside a
  * `vm` context (no Node globals leak in, and the mandatory
  * `process` entrypoint cannot collide with Node's own `process`),
  * which also mirrors goja's clean-sandbox scoping.
  *
  * Record view (the reference's `jsRecord`): `Position` (byte
  * Buffer), `Operation`, `Metadata` (string map), `Key`, and
  * `Payload.Before/After` — JSON payloads arrive PARSED (structured
  * data), non-JSON strings arrive raw. On return, objects re-render
  * through `JSON.stringify` (canonical field order preserved; note
  * JS number formatting normalizes `1.0` to `1`). Returning `null`
  * filters the record; a thrown error sets `_error` on the ORIGINAL
  * record so the DLQ receives what the script saw.
  *
  * Typed-struct payload frames are normalized to canonical-JSON
  * strings first (the dynamic-record path is the reference's JS
  * surface). Scripts are pipeline configuration — the same trust the
  * reference extends them.
  *
  * ==Binary-payload contract (UTF-8 constraint)==
  * The reference keeps `RawData` as `[]byte` end-to-end; this engine's
  * dynamic record carries payload slots as `StringType` (FIXTURES.md
  * §1), with a lossless binary sibling for the KEY only (`key_raw`).
  * A script that returns `RawData` PAYLOAD bytes that are not valid
  * UTF-8 is therefore LOSSY on the payload slot: the bytes round-trip
  * through `new String(bytes, UTF_8)` and invalid sequences become
  * U+FFFD replacement characters. Key returns are exact regardless
  * (the raw bytes land in `key_raw` untouched). Scripts producing
  * binary payloads should base64- or hex-encode them (the goja
  * examples that matter — text transforms over raw strings — are
  * UTF-8 by construction and round-trip exactly).
  */
case class JsProcessor(script: String) extends Processor {
  val plugin = "custom.javascript"

  override def transform(df: DataFrame): DataFrame = {
    // dynamic-record surface: payload/key slots as JSON strings
    val norm = Seq(Cdc.Key, Cdc.PayloadBefore, Cdc.PayloadAfter)
      .foldLeft(df) { (d, c) =>
        d.schema(c).dataType match {
          case _: StructType => d.withColumn(c, to_json(col(c)))
          case StringType => d
          case _ => d.withColumn(c, col(c).cast("string"))
        }
      }
    val base = Cdc.withErrorChannel(norm)
      .select((Cdc.columns :+ Cdc.Error).map(col): _*)
    val schema = base.schema
    val src = script
    base.mapPartitions { rows =>
      JsProcessor.runPartition(src, rows)
    }(Encoders.row(schema))
  }
}

object JsProcessor {

  /** Build the processor from reference-parity settings: exactly one
    * of `script` (inline) or `script.path` (a .js file). */
  def fromSettings(s: Map[String, String]): JsProcessor = {
    val inline = s.get("script").filter(_.nonEmpty)
    val path = s.get("script.path").filter(_.nonEmpty)
    require(!(inline.isDefined && path.isDefined),
      "custom.javascript: only one of: [script, script.path] should be provided")
    val src = inline.orElse(path.map(p =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), UTF_8)))
    require(src.isDefined,
      "custom.javascript: one of: [script, script.path] needs to be provided")
    JsProcessor(src.get)
  }

  // row layout of the normalized frame (see transform's select)
  private val IPos = 0; private val IOp = 1; private val IMeta = 2
  private val IKeyRaw = 3; private val IKey = 4; private val IBefore = 5
  private val IAfter = 6; private val IErr = 7

  private[ops] def runPartition(script: String,
                                rows: Iterator[Row]): Iterator[Row] =
    PipeTransform.run(harnessSource(script), "custom.javascript", rows,
      envelope, decode)

  /** One request line: base64 bytes, raw strings — the harness parses
    * payload/key JSON itself so non-JSON strings survive verbatim. */
  private[ops] def envelope(r: Row): String = {
    val o = JsonOps.mapper.createObjectNode()
    val pos = r.get(IPos).asInstanceOf[Array[Byte]]
    if (pos == null) o.putNull("p")
    else o.put("p", Base64.getEncoder.encodeToString(pos))
    o.put("o", r.getString(IOp))
    val m = o.putObject("m")
    val meta = r.getMap[String, String](IMeta)
    if (meta != null) meta.foreach { case (k, v) => m.put(k, v) }
    val kr = r.get(IKeyRaw).asInstanceOf[Array[Byte]]
    if (kr == null) o.putNull("kr")
    else o.put("kr", Base64.getEncoder.encodeToString(kr))
    o.put("k", r.getString(IKey))
    o.put("b", r.getString(IBefore))
    o.put("a", r.getString(IAfter))
    JsonOps.render(o)
  }

  /** One response line → Some(row) for results/errors, None for
    * filtered records. */
  private[ops] def decode(line: String, original: Row): Option[Row] = {
    val n = JsonOps.parse(line)
    if (n.has("f")) None
    else if (n.has("e")) Some(Row(
      original.get(IPos), original.get(IOp), original.get(IMeta),
      original.get(IKeyRaw), original.get(IKey), original.get(IBefore),
      original.get(IAfter), n.get("e").asText()))
    else {
      val r = n.get("r").asInstanceOf[ObjectNode]
      def b64(field: String): Array[Byte] = {
        val v = r.get(field)
        if (v == null || v.isNull) null
        else Base64.getDecoder.decode(v.asText())
      }
      // slot = {s: "..."} for string/JSON, {raw: b64} for RawData
      def slot(field: String): (String, Array[Byte]) = {
        val v = r.get(field)
        if (v == null || v.isNull) (null, null)
        else if (v.has("raw")) {
          val bytes = Base64.getDecoder.decode(v.get("raw").asText())
          (new String(bytes, UTF_8), bytes)
        } else (v.get("s").asText(), null)
      }
      val meta = {
        val mNode = r.get("m")
        val b = Map.newBuilder[String, String]
        if (mNode != null && mNode.isObject)
          mNode.properties().forEach { e =>
            val v: JsonNode = e.getValue
            b += e.getKey -> (if (v.isTextual) v.asText() else v.toString)
          }
        b.result()
      }
      val (k, kr) = slot("k")
      val (before, _) = slot("b")
      val (after, _) = slot("a")
      Some(Row(
        b64("p"),
        Option(r.get("o")).filterNot(_.isNull).map(_.asText()).orNull,
        meta, kr, k, before, after, null))
    }
  }

  /** The Node-side harness: vm-sandboxed user script + the reference's
    * helper surface, lockstep NDJSON loop. */
  private def harnessSource(userScript: String): String = {
    // embed the user source as a JSON string literal — no escaping
    // pitfalls, arbitrary quotes/newlines survive
    val srcLit = JsonOps.mapper.writeValueAsString(userScript)
    s"""'use strict';
       |const vm = require('vm');
       |const readline = require('readline');
       |const USER_SRC = $srcLit;
       |
       |// ---- reference helper surface (javascript.go newRuntime) ----
       |function Record() { return { Position: null, Operation: '',
       |  Metadata: {}, Key: null, Payload: { Before: null, After: null } }; }
       |function RawData(s) {
       |  return Buffer.from(s === undefined ? '' : String(s), 'utf8'); }
       |function StructuredData() { return {}; }
       |const mkLevel = (lvl) => () => ({
       |  Msg: (m) => process.stderr.write('[custom.javascript:' + lvl + '] ' + m + '\\n'),
       |  Msgf: (f, ...a) => process.stderr.write('[custom.javascript:' + lvl + '] ' + f + ' ' + a.join(' ') + '\\n'),
       |});
       |const logger = { Info: mkLevel('info'), Debug: mkLevel('debug'),
       |  Warn: mkLevel('warn'), Error: mkLevel('error') };
       |
       |const sandbox = { Record, RawData, StructuredData, logger,
       |  Buffer, JSON, Math, console: { log: (...a) =>
       |    process.stderr.write('[custom.javascript] ' + a.join(' ') + '\\n') } };
       |vm.createContext(sandbox);
       |vm.runInContext(USER_SRC, sandbox);
       |const fn = sandbox.process;
       |if (typeof fn !== 'function') {
       |  process.stderr.write('custom.javascript: script must define function process(record)\\n');
       |  process.exit(3);
       |}
       |
       |// structured slots (JSON objects/arrays) arrive parsed; raw
       |// slots arrive as byte Buffers — opencdc's StructuredData /
       |// RawData split, so reference scripts (e.g. the golden
       |// example's String.fromCharCode over Payload.After) run as-is
       |function parseSlot(s) {
       |  if (s === null || s === undefined) return null;
       |  try {
       |    const v = JSON.parse(s);
       |    if (v !== null && typeof v === 'object') return v;
       |  } catch (e) {}
       |  return Buffer.from(s, 'utf8');
       |}
       |function ser(v) {
       |  if (v === null || v === undefined) return null;
       |  if (Buffer.isBuffer(v)) return { raw: v.toString('base64') };
       |  if (typeof v === 'string') return { s: v };
       |  return { s: JSON.stringify(v) };
       |}
       |
       |const rl = readline.createInterface({ input: process.stdin,
       |  terminal: false });
       |rl.on('line', (line) => {
       |  let out;
       |  try {
       |    const env = JSON.parse(line);
       |    const rec = {
       |      Position: env.p ? Buffer.from(env.p, 'base64') : null,
       |      Operation: env.o,
       |      Metadata: env.m || {},
       |      Key: env.k !== null && env.k !== undefined ? parseSlot(env.k)
       |        : (env.kr ? Buffer.from(env.kr, 'base64') : null),
       |      Payload: { Before: parseSlot(env.b), After: parseSlot(env.a) },
       |    };
       |    const res = fn(rec);
       |    if (res === null || res === undefined) out = { f: 1 };
       |    else out = { r: {
       |      p: res.Position
       |        ? Buffer.from(res.Position).toString('base64') : null,
       |      o: res.Operation === undefined ? null : res.Operation,
       |      m: res.Metadata || {},
       |      k: ser(res.Key),
       |      b: ser(res.Payload ? res.Payload.Before : null),
       |      a: ser(res.Payload ? res.Payload.After : null),
       |    } };
       |  } catch (err) {
       |    out = { e: String((err && err.message) || err) };
       |  }
       |  process.stdout.write(JSON.stringify(out) + '\\n');
       |});
       |""".stripMargin
  }
}

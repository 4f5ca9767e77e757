package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.functions.JsonOps
import graft.model.Cdc

/** `custom.wasm` — run a user WebAssembly module over every record's
  * payload bytes (the standalone-WASM-processor capability of the
  * reference, `pkg/plugin/processor/standalone`: user code compiled
  * to wasm, executed sandboxed, one record in → one record out /
  * filter / error).
  *
  * ==Deviation, documented==
  * The reference hosts wazero and speaks its processor-SDK protobuf
  * command protocol to the module. The JVM ships no wasm runtime, so
  * the module runs on Node's built-in `WebAssembly` inside the same
  * per-partition subprocess harness as [[JsProcessor]] — and the ABI
  * is the minimal byte-transform contract instead of the protobuf
  * protocol (which would require the reference's Go SDK on the guest
  * side):
  *
  *  - exports: `memory`, `alloc(len: i32) -> i32`,
  *    `process(ptr: i32, len: i32) -> i64`
  *  - the harness writes the record's slot bytes at `alloc(len)`,
  *    calls `process`, and reads the result from the packed return
  *    `(ptr << 32) | len`
  *  - returning `-1` (all-ones i64) FILTERS the record; a trap sets
  *    `_error` on the ORIGINAL record — the reference's
  *    single/filter/error vocabulary
  *
  * Lifecycle: the module COMPILES once per partition and
  * INSTANTIATES per record — fresh linear memory each call, so a
  * leaky guest allocator cannot poison a 10⁹-record partition, and
  * guest state cannot leak across records (the reference's processors
  * are per-record pure too). The harness grows memory when a record
  * outsizes the module's initial pages.
  *
  * Scale shape: identical to [[JsProcessor]] — executor-local pipe
  * transform via `mapPartitions`, NDJSON lockstep with a bounded
  * pending queue, no driver involvement, linear at any scale.
  *
  * ==Binary-output contract (UTF-8 constraint)==
  * The transformed slot is a `StringType` column (FIXTURES.md §1), so
  * module OUTPUT bytes that are not valid UTF-8 are lossy (invalid
  * sequences become U+FFFD) — same contract as [[JsProcessor]]'s
  * RawData payload returns. Modules emitting binary should base64-
  * or hex-encode their output bytes.
  */
case class WasmProcessor(wasmB64: String, field: String) extends Processor {
  require(WasmProcessor.Slots.contains(field),
    s"custom.wasm: field must be one of ${WasmProcessor.Slots.keys.mkString(", ")}")
  val plugin = "custom.wasm"

  override def transform(df: DataFrame): DataFrame = {
    val slot = WasmProcessor.Slots(field)
    // dynamic-record surface (the JsProcessor normalization): the
    // transformed slot as a JSON/raw string
    val norm = df.schema(slot).dataType match {
      case _: StructType => df.withColumn(slot, to_json(col(slot)))
      case StringType => df
      case _ => df.withColumn(slot, col(slot).cast("string"))
    }
    val base = Cdc.withErrorChannel(norm)
    val schema = base.schema
    val slotIdx = schema.fieldIndex(slot)
    val errIdx = schema.fieldIndex(Cdc.Error)
    val b64 = wasmB64
    base.mapPartitions { rows =>
      WasmProcessor.runPartition(b64, slotIdx, errIdx, rows)
    }(Encoders.row(schema))
  }
}

object WasmProcessor {

  /** Transformable top-level record slots (config name → column). */
  val Slots: Map[String, String] = Map(
    ".Payload.After" -> Cdc.PayloadAfter,
    ".Payload.Before" -> Cdc.PayloadBefore,
    ".Key" -> Cdc.Key)

  /** Reference-parity settings: exactly one of `wasm.base64` (inline)
    * or `wasm.path` (a .wasm file); optional `field` slot. */
  def fromSettings(s: Map[String, String]): WasmProcessor = {
    val inline = s.get("wasm.base64").filter(_.nonEmpty)
    val path = s.get("wasm.path").filter(_.nonEmpty)
    require(!(inline.isDefined && path.isDefined),
      "custom.wasm: only one of: [wasm.base64, wasm.path] should be provided")
    val b64 = inline.orElse(path.map(p => Base64.getEncoder.encodeToString(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))))
    require(b64.isDefined,
      "custom.wasm: one of: [wasm.base64, wasm.path] needs to be provided")
    WasmProcessor(b64.get, s.getOrElse("field", ".Payload.After"))
  }

  private[ops] def runPartition(wasmB64: String, slotIdx: Int, errIdx: Int,
                                rows: Iterator[Row]): Iterator[Row] =
    PipeTransform.run(harnessSource(wasmB64), "custom.wasm", rows,
      r => {
        val v = r.getString(slotIdx)
        if (v == null) "null"
        else "\"" + Base64.getEncoder.encodeToString(v.getBytes(UTF_8)) + "\""
      },
      (line, original) => decode(line, original, slotIdx, errIdx))

  /** {r: b64} → transformed slot; {f:1} → filtered; {e: msg} → error
    * on the original record. */
  private def decode(line: String, original: Row,
                     slotIdx: Int, errIdx: Int): Option[Row] = {
    val n = JsonOps.parse(line)
    if (n.has("f")) None
    else if (n.has("e")) {
      val vals = (0 until original.length)
        .map(i => if (i == errIdx) n.get("e").asText() else original.get(i))
      Some(Row(vals: _*))
    } else {
      val out = if (n.get("r").isNull) null
        else new String(Base64.getDecoder.decode(n.get("r").asText()), UTF_8)
      val vals = (0 until original.length)
        .map(i => if (i == slotIdx) out else original.get(i))
      Some(Row(vals: _*))
    }
  }

  private def harnessSource(wasmB64: String): String = {
    s"""'use strict';
       |const readline = require('readline');
       |const WASM = Buffer.from('$wasmB64', 'base64');
       |// NOT named `module`: redeclaring the CJS wrapper's `module`
       |// is a CJS parse error, which flips Node's module-syntax
       |// detection to ESM and drops `require` from scope
       |let wasmModule;
       |try { wasmModule = new WebAssembly.Module(WASM); }
       |catch (e) {
       |  process.stderr.write('custom.wasm: invalid module: ' + e + '\\n');
       |  process.exit(3);
       |}
       |const PAGE = 65536;
       |function run(inputB64) {
       |  const input = Buffer.from(inputB64, 'base64');
       |  const inst = new WebAssembly.Instance(wasmModule, {});
       |  const { memory, alloc, process: proc } = inst.exports;
       |  if (!memory || typeof alloc !== 'function' || typeof proc !== 'function')
       |    throw new Error('module must export memory, alloc(i32)->i32, ' +
       |      'process(i32,i32)->i64');
       |  const ptr = alloc(input.length);
       |  const need = ptr + input.length;
       |  if (need > memory.buffer.byteLength)
       |    memory.grow(Math.ceil((need - memory.buffer.byteLength) / PAGE));
       |  new Uint8Array(memory.buffer, ptr, input.length).set(input);
       |  const packed = proc(ptr, input.length);
       |  if (packed === -1n) return null;                       // filter
       |  const outPtr = Number(packed >> 32n);
       |  const outLen = Number(packed & 0xffffffffn);
       |  if (outPtr + outLen > memory.buffer.byteLength)
       |    throw new Error('process returned out-of-bounds (ptr=' + outPtr +
       |      ', len=' + outLen + ')');
       |  return Buffer.from(memory.buffer, outPtr, outLen).toString('base64');
       |}
       |const rl = readline.createInterface({ input: process.stdin,
       |  terminal: false });
       |rl.on('line', (line) => {
       |  let out;
       |  try {
       |    const inB64 = JSON.parse(line);
       |    if (inB64 === null) out = { r: null };              // null slot passes
       |    else {
       |      const res = run(inB64);
       |      out = res === null ? { f: 1 } : { r: res };
       |    }
       |  } catch (err) {
       |    out = { e: String((err && err.message) || err) };
       |  }
       |  process.stdout.write(JSON.stringify(out) + '\\n');
       |});
       |""".stripMargin
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** Catalyst expressions over canonical-JSON string columns.
  *
  * These are the "custom `Expression` earns its keep" cases from
  * SURVEY §4: the reference's field processors mutate dynamic payloads
  * at a sub-path, which Spark's built-in `functions` cannot express for
  * schemaless JSON strings (`withField` needs a typed struct). They are
  * `CodegenFallback` — the JSON parse dominates, codegen would not pay.
  * Everything around them (filters, projections, joins) stays inside
  * WholeStageCodegen.
  */
object JsonExpressions {
  private val F = JsonNodeFactory.instance

  private def str(v: Any): String =
    if (v == null) null else v.asInstanceOf[UTF8String].toString
  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** field.set — set a (string-rendered) value at a JSON sub-path,
    * creating missing intermediates; null/absent document becomes a
    * fresh object (reference `field/set.go:89-106`). When `rawJson` the
    * value is parsed and grafted as a JSON subtree instead of a string.
    */
  case class JsonSetField(left: Expression, right: Expression,
                          path: Seq[String], rawJson: Boolean = false)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_set_field"
    override def eval(input: InternalRow): Any = {
      val json = left.eval(input).asInstanceOf[UTF8String]
      val value = right.eval(input).asInstanceOf[UTF8String]
      val valueNode =
        if (value == null) F.nullNode()
        else if (rawJson) JsonOps.parseOrEmpty(value.getBytes)
        else F.textNode(value.toString)
      if (path.isEmpty) {
        // whole-slot assignment: the rendered value replaces the slot
        if (value == null) null
        else if (rawJson) UTF8String.fromBytes(JsonOps.renderBytes(valueNode))
        else value
      } else {
        val root = if (json == null) F.objectNode()
          else JsonOps.parseOrEmpty(json.getBytes)
        UTF8String.fromBytes(JsonOps.renderBytes(JsonOps.set(root, path, valueNode)))
      }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** field.exclude — drop sub-paths (reference `field/exclude.go:83`). */
  case class JsonDropFields(child: Expression, paths: Seq[Seq[String]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_drop_fields"
    override def nullSafeEval(v: Any): Any = {
      var node = JsonOps.parseOrEmpty(v.asInstanceOf[UTF8String].toString)
      paths.foreach { p => node = JsonOps.drop(node, p) }
      utf8(JsonOps.render(node))
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** field.rename — rename fields preserving order
    * (reference `field/rename.go:114`).
    */
  case class JsonRenameFields(child: Expression, renames: Seq[(Seq[String], String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_rename_fields"
    override def nullSafeEval(v: Any): Any = {
      var node = JsonOps.parseOrEmpty(v.asInstanceOf[UTF8String].toString)
      renames.foreach { case (p, n) => node = JsonOps.rename(node, p, n) }
      utf8(JsonOps.render(node))
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** field.convert — cast the node at a sub-path via the reference's
    * string-intermediary rules (`field/convert.go:105-153`). Returns
    * `struct(value, error)` so a failed parse flows to the DLQ channel
    * instead of throwing (SURVEY §7 "every transform must be total").
    */
  case class JsonConvertField(child: Expression, path: Seq[String], targetType: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("value", StringType), StructField("error", StringType)))
    override def nullable: Boolean = false
    override def prettyName: String = "json_convert_field"
    override def eval(input: InternalRow): Any = {
      val v = str(child.eval(input))
      if (v == null) return new GenericInternalRow(Array[Any](null, null))
      val root = JsonOps.parseOrEmpty(v)
      if (path.nonEmpty && JsonOps.get(root, path).isEmpty)
        return new GenericInternalRow(Array[Any](utf8(v), null))
      val target = if (path.isEmpty) root else JsonOps.get(root, path).orNull
      JsonOps.convert(target, targetType) match {
        case Right(converted) =>
          val out = JsonOps.render(JsonOps.set(root, path, converted))
          new GenericInternalRow(Array[Any](utf8(out), null))
        case Left(err) =>
          new GenericInternalRow(Array[Any](utf8(v), utf8(err)))
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** json.decode — parse the (raw string) node at a sub-path into a
    * structured subtree; whole-slot parse canonicalizes the document
    * (reference `impl/json/decode.go:78`). Malformed JSON yields
    * `struct(value=original, error=msg)` → DLQ, mirroring ErrorRecord.
    */
  case class JsonParseField(child: Expression, path: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("value", StringType), StructField("error", StringType)))
    override def nullable: Boolean = false
    override def prettyName: String = "json_parse_field"
    override def eval(input: InternalRow): Any = {
      val v = str(child.eval(input))
      if (v == null) return new GenericInternalRow(Array[Any](null, null))
      try {
        if (path.isEmpty) {
          new GenericInternalRow(Array[Any](utf8(JsonOps.render(JsonOps.parse(v))), null))
        } else {
          val root = JsonOps.parseOrEmpty(v)
          JsonOps.get(root, path) match {
            case None => new GenericInternalRow(Array[Any](utf8(v), null))
            case Some(n) =>
              val text = if (n.isTextual) n.asText() else JsonOps.render(n)
              val parsed = JsonOps.parse(text)
              val out = JsonOps.render(JsonOps.set(root, path, parsed))
              new GenericInternalRow(Array[Any](utf8(out), null))
          }
        }
      } catch {
        case e: Exception =>
          new GenericInternalRow(Array[Any](utf8(v), utf8(s"failed to decode JSON: ${e.getMessage}")))
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Extract the node at a sub-path as its canonical JSON text, or null.
    * Unlike `get_json_object` this keeps string values quoted when
    * `raw=false`; with `raw=true` string nodes render unquoted (the
    * reference's RawData rendering, used by unwrap.debezium keys).
    */
  case class JsonGetField(child: Expression, path: Seq[String], raw: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_get_field"
    override def nullSafeEval(v: Any): Any = {
      val root = JsonOps.parseOrEmpty(v.asInstanceOf[UTF8String].toString)
      JsonOps.get(root, path) match {
        case Some(n) if n.isNull => null
        case Some(n) if raw && n.isTextual => utf8(n.asText())
        case Some(n) => utf8(JsonOps.render(n))
        case None => null
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** split — the array at the sub-path, one output element per array
    * entry, each the full document with the element replacing the array
    * (reference `impl/split.go:91-120`). Null when the field is not an
    * array (the processor turns that into an error record).
    */
  case class JsonSplitField(child: Expression, path: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType)
    override def nullable: Boolean = true
    override def prettyName: String = "json_split_field"
    override def nullSafeEval(v: Any): Any = {
      val root = JsonOps.parseOrEmpty(v.asInstanceOf[UTF8String].toString)
      JsonOps.get(root, path) match {
        case Some(arr) if arr.isArray =>
          val out = new Array[Any](arr.size())
          var i = 0
          while (i < arr.size()) {
            out(i) = utf8(JsonOps.render(JsonOps.set(root, path, arr.get(i))))
            i += 1
          }
          new GenericArrayData(out)
        case _ => null
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** One-parse Debezium envelope extraction:
    * struct(before, after, op, source, ts_ms) from the envelope JSON —
    * six `get_json_object` calls would parse the document six times
    * per row (reference semantics in `impl/unwrap/debezium.go:98+`).
    */
  case class DebeziumParts(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("before", StringType), StructField("after", StringType),
      StructField("op", StringType), StructField("source", StringType),
      StructField("ts_ms", StringType),
      // the source object flattened to a string map IN THE SAME PARSE —
      // the unwrap's metadata merge needs it as a map, and a separate
      // from_json(source) would be a second Jackson pass per record
      StructField("source_map", MapType(StringType, StringType))))
    override def nullable: Boolean = true
    override def prettyName: String = "debezium_parts"
    override def nullSafeEval(v: Any): Any = {
      val root = JsonOps.parseOrEmpty(v.asInstanceOf[UTF8String].getBytes)
      val payload = root.get("payload")
      def field(name: String): UTF8String = {
        if (payload == null) return null
        val n = payload.get(name)
        if (n == null || n.isNull) null
        else if (n.isTextual) utf8(n.asText())
        else if (n.isValueNode) utf8(n.asText())
        else UTF8String.fromBytes(JsonOps.renderBytes(n))
      }
      val srcMap: Any = {
        val n = if (payload == null) null else payload.get("source")
        if (n == null || !n.isObject) null
        else {
          val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
          val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
          val it = n.fields()
          while (it.hasNext) {
            val e = it.next()
            keys += utf8(e.getKey)
            val vn = e.getValue
            vals += (if (vn == null || vn.isNull) null
              else if (vn.isValueNode) utf8(vn.asText())
              else UTF8String.fromBytes(JsonOps.renderBytes(vn)))
          }
          new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray),
            new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray))
        }
      }
      new GenericInternalRow(Array[Any](
        field("before"), field("after"), field("op"), field("source"),
        field("ts_ms"), srcMap))
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** One-pass Debezium metadata merge (replaces a chain of five
    * interpreted map HOFs — map_filter, 2× map_contains_key,
    * map_concat, from_json — that cost ~15 µs/record):
    * existing metadata minus source-shadowed keys (minus readAt when
    * ts_ms supplies it), plus `opencdc.readAt` = ts_ms·10⁶ ns, plus
    * the flattened source (source wins), in exactly that key order.
    */
  case class DebeziumMetaMerge(meta: Expression, srcMap: Expression, tsMs: Expression)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = meta
    override def second: Expression = srcMap
    override def third: Expression = tsMs
    override def dataType: DataType = MapType(StringType, StringType)
    override def nullable: Boolean = false
    override def prettyName: String = "debezium_meta_merge"
    override def eval(input: InternalRow): Any = {
      val m = meta.eval(input).asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val s = srcMap.eval(input).asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ts = tsMs.eval(input).asInstanceOf[UTF8String]
      val srcKeys = new java.util.HashSet[UTF8String]()
      if (s != null) {
        var i = 0
        while (i < s.numElements()) { srcKeys.add(s.keyArray().getUTF8String(i)); i += 1 }
      }
      val readAt = utf8("opencdc.readAt")
      val tsLong: java.lang.Long =
        if (ts == null) null
        else try java.lang.Long.valueOf(ts.toString.trim.toLong)
        catch { case _: NumberFormatException => null }
      val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
      val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
      if (m != null) {
        var i = 0
        while (i < m.numElements()) {
          val k = m.keyArray().getUTF8String(i)
          val drop = srcKeys.contains(k) || (tsLong != null && k == readAt)
          if (!drop) {
            keys += k
            vals += (if (m.valueArray().isNullAt(i)) null
              else m.valueArray().getUTF8String(i))
          }
          i += 1
        }
      }
      if (tsLong != null && !srcKeys.contains(readAt)) {
        keys += readAt
        vals += utf8((tsLong * 1000000L).toString)
      }
      if (s != null) {
        var i = 0
        while (i < s.numElements()) {
          keys += s.keyArray().getUTF8String(i)
          vals += (if (s.valueArray().isNullAt(i)) null
            else s.valueArray().getUTF8String(i))
          i += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray))
    }
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
      copy(meta = f, srcMap = s, tsMs = t)
  }

  /** Render a full OpenCDC record as its wire JSON (the reference's
    * JSON rendering, FIXTURES.md §1): position base64, structured
    * key/payload embedded as trees, raw strings as JSON strings.
    */
  case class CdcToJson(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.size == 7, "position, operation, metadata, key_raw, key, before, after")
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "cdc_to_json"
    override def eval(input: InternalRow): Any = {
      val F = JsonNodeFactory.instance
      val root = F.objectNode()
      val pos = children(0).eval(input)
      root.set[com.fasterxml.jackson.databind.JsonNode]("position",
        if (pos == null) F.nullNode()
        else F.textNode(java.util.Base64.getEncoder.encodeToString(pos.asInstanceOf[Array[Byte]])))
      val op = children(1).eval(input)
      root.set[com.fasterxml.jackson.databind.JsonNode]("operation",
        if (op == null) F.nullNode() else F.textNode(op.toString))
      val meta = children(2).eval(input)
      if (meta == null) root.set[com.fasterxml.jackson.databind.JsonNode]("metadata", F.nullNode())
      else {
        val m = meta.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val node = F.objectNode()
        val keys = m.keyArray()
        val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          node.put(keys.getUTF8String(i).toString,
            if (vals.isNullAt(i)) null else vals.getUTF8String(i).toString)
          i += 1
        }
        root.set[com.fasterxml.jackson.databind.JsonNode]("metadata", node)
      }
      def slot(v: Any): com.fasterxml.jackson.databind.JsonNode =
        if (v == null) F.nullNode()
        else JsonOps.parseOrEmpty(v.asInstanceOf[UTF8String].toString)
      // raw-only keys (key_raw bytes, no structured key) render as the
      // reference renders RawData: the UTF-8 string
      val keyNode = children(4).eval(input) match {
        case null => children(3).eval(input) match {
          case null => F.nullNode()
          case raw => F.textNode(new String(raw.asInstanceOf[Array[Byte]], "UTF-8"))
        }
        case k => slot(k)
      }
      root.set[com.fasterxml.jackson.databind.JsonNode]("key", keyNode)
      val payload = F.objectNode()
      payload.set[com.fasterxml.jackson.databind.JsonNode]("before", slot(children(5).eval(input)))
      payload.set[com.fasterxml.jackson.databind.JsonNode]("after", slot(children(6).eval(input)))
      root.set[com.fasterxml.jackson.databind.JsonNode]("payload", payload)
      utf8(JsonOps.render(root))
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  // ---- Column-level API ----------------------------------------------
  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  def jsonSet(json: Column, path: Seq[String], value: Column,
              rawJson: Boolean = false): Column =
    col(JsonSetField(ex(json), ex(value), path, rawJson))
  def jsonDrop(json: Column, paths: Seq[Seq[String]]): Column =
    col(JsonDropFields(ex(json), paths))
  def jsonRename(json: Column, renames: Seq[(Seq[String], String)]): Column =
    col(JsonRenameFields(ex(json), renames))
  def jsonConvert(json: Column, path: Seq[String], targetType: String): Column =
    col(JsonConvertField(ex(json), path, targetType))
  def jsonGet(json: Column, path: Seq[String], raw: Boolean = false): Column =
    col(JsonGetField(ex(json), path, raw))
  def jsonParse(json: Column, path: Seq[String]): Column =
    col(JsonParseField(ex(json), path))
  def jsonSplit(json: Column, path: Seq[String]): Column =
    col(JsonSplitField(ex(json), path))
  def cdcToJson(cols: Seq[Column]): Column = col(CdcToJson(cols.map(ex)))
  def debeziumParts(env: Column): Column = col(DebeziumParts(ex(env)))
  def debeziumMetaMerge(meta: Column, srcMap: Column, tsMs: Column): Column =
    col(DebeziumMetaMerge(ex(meta), ex(srcMap), ex(tsMs)))
}

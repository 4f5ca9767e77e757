package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Pure JSON-document manipulation used by the field/codec processors.
  *
  * The reference mutates dynamic `map[string]any` payloads in place
  * (`opencdc.StructuredData`); our payloads are canonical-JSON strings,
  * so each processor becomes a total function `String => String`
  * evaluated inside a Catalyst expression (see [[JsonExpressions]]).
  * Jackson keeps object-key insertion order, matching the reference's
  * behavior of preserving field order on set/rename.
  */
object JsonOps {
  val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  def parse(s: String): JsonNode = mapper.readTree(s)
  def parse(b: Array[Byte]): JsonNode = mapper.readTree(b)
  def render(n: JsonNode): String = mapper.writeValueAsString(n)
  def renderBytes(n: JsonNode): Array[Byte] = mapper.writeValueAsBytes(n)

  /** Parse leniently: null/empty → empty object; non-JSON → TextNode. */
  def parseOrEmpty(s: String): JsonNode =
    if (s == null || s.trim.isEmpty) F.objectNode()
    else try parse(s) catch { case _: Exception => F.textNode(s) }

  /** Byte-level lenient parse (hot path: avoids UTF8String → String). */
  def parseOrEmpty(b: Array[Byte]): JsonNode =
    if (b == null || b.length == 0) F.objectNode()
    else try parse(b) catch {
      case _: Exception => F.textNode(new String(b, "UTF-8"))
    }

  def get(root: JsonNode, path: Seq[String]): Option[JsonNode] = {
    var cur = root
    for (seg <- path) {
      if (cur == null || !cur.isObject) return None
      cur = cur.get(seg)
    }
    Option(cur)
  }

  /** Set `value` at `path`, creating intermediate objects (reference
    * `field/set.go:59` create-if-missing). Returns a new tree.
    */
  def set(root: JsonNode, path: Seq[String], value: JsonNode): JsonNode = {
    if (path.isEmpty) return value
    val base: ObjectNode =
      if (root != null && root.isObject) root.deepCopy[ObjectNode]()
      else F.objectNode()
    var cur = base
    for (seg <- path.dropRight(1)) {
      val next = cur.get(seg)
      if (next != null && next.isObject) cur = next.asInstanceOf[ObjectNode]
      else { val o = F.objectNode(); cur.set(seg, o); cur = o }
    }
    cur.set(path.last, value)
    base
  }

  /** Remove the node at `path` (no-op when absent). */
  def drop(root: JsonNode, path: Seq[String]): JsonNode = {
    if (root == null || !root.isObject || path.isEmpty) return root
    val base = root.deepCopy[ObjectNode]()
    var cur: ObjectNode = base
    for (seg <- path.dropRight(1)) {
      cur.get(seg) match {
        case o: ObjectNode => cur = o
        case _ => return base
      }
    }
    cur.remove(path.last)
    base
  }

  /** Rename the field at `path` to `newName` (keeps field order by
    * rebuilding the object; reference `field/rename.go:114`).
    */
  def rename(root: JsonNode, path: Seq[String], newName: String): JsonNode = {
    if (root == null || !root.isObject || path.isEmpty) return root
    val base = root.deepCopy[ObjectNode]()
    var cur: ObjectNode = base
    for (seg <- path.dropRight(1)) {
      cur.get(seg) match {
        case o: ObjectNode => cur = o
        case _ => return base
      }
    }
    val oldName = path.last
    if (cur.has(oldName)) {
      val rebuilt = F.objectNode()
      val it = cur.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey == oldName) rebuilt.set(newName, e.getValue)
        else rebuilt.set(e.getKey, e.getValue)
      }
      cur.removeAll()
      cur.setAll(rebuilt: ObjectNode)
    }
    base
  }

  /** Go-style minimal decimal rendering of a double: matches
    * `strconv.FormatFloat(v, 'f', -1, 64)` (reference
    * `field/convert.go:139`) — shortest round-trip digits, no exponent.
    */
  def goFloatString(d: Double): String = {
    if (d.isNaN || d.isInfinite) return d.toString
    val bd = new java.math.BigDecimal(java.lang.Double.toString(d))
    bd.stripTrailingZeros.toPlainString match {
      case s if s.startsWith(".") => "0" + s
      case s if s.startsWith("-.") => "-0" + s.drop(1)
      case s => s
    }
  }

  /** Go RFC3339Nano: 9 fractional digits with trailing zeros trimmed. */
  def rfc3339Nano(epochNanos: Long): String = {
    val inst = java.time.Instant.ofEpochSecond(
      Math.floorDiv(epochNanos, 1000000000L),
      Math.floorMod(epochNanos, 1000000000L))
    formatInstant(inst)
  }

  def formatInstant(inst: java.time.Instant): String = {
    val base = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      .format(inst)
    val nanos = inst.getNano
    if (nanos == 0) base + "Z"
    else {
      val frac = f"$nanos%09d".reverse.dropWhile(_ == '0').reverse
      s"$base.${frac}Z"
    }
  }

  /** The reference's two-step convert: any → string → target type
    * (`field/convert.go:105-153`). Returns Left(error) on parse failure
    * (reference emits an ErrorRecord → DLQ).
    */
  def convert(node: JsonNode, targetType: String): Either[String, JsonNode] = {
    val s = toGoString(node, targetType)
    targetType match {
      case "string" => Right(F.textNode(s))
      case "int" =>
        try Right(F.numberNode(java.lang.Long.parseLong(s)))
        catch { case _: Exception => Left(s"""strconv.Atoi: parsing "$s": invalid syntax""") }
      case "float" =>
        try Right(F.numberNode(java.lang.Double.parseDouble(s)))
        catch { case _: Exception => Left(s"""strconv.ParseFloat: parsing "$s": invalid syntax""") }
      case "bool" =>
        parseGoBool(s).map(b => F.booleanNode(b))
          .toRight(s"""strconv.ParseBool: parsing "$s": invalid syntax""")
      case "time" =>
        try Right(F.textNode(rfc3339Nano(java.lang.Long.parseLong(s))))
        catch {
          case _: NumberFormatException =>
            try {
              val inst = java.time.OffsetDateTime.parse(s).toInstant
              Right(F.textNode(formatInstant(inst)))
            } catch { case _: Exception => Left(s"cannot parse time: $s") }
        }
      case other => Left(s"""undefined type "$other"""")
    }
  }

  /** Mirror of the reference `toString` (`field/convert.go:128-147`):
    * bools become "1"/"0" when the target is numeric.
    */
  private def toGoString(node: JsonNode, targetType: String): String = node match {
    case null => ""
    case n if n.isTextual => n.asText()
    case n if n.isBoolean =>
      if (targetType == "int" || targetType == "float") { if (n.asBoolean()) "1" else "0" }
      else n.asBoolean().toString
    case n if n.isIntegralNumber => n.asLong().toString
    case n if n.isFloatingPointNumber => goFloatString(n.asDouble())
    case n if n.isNull => "<nil>"
    case n => render(n)
  }

  /** Go strconv.ParseBool accepted forms. */
  private def parseGoBool(s: String): Option[Boolean] = s match {
    case "1" | "t" | "T" | "TRUE" | "true" | "True" => Some(true)
    case "0" | "f" | "F" | "FALSE" | "false" | "False" => Some(false)
    case _ => None
  }

  /** Canonical re-rendering (parse + minimal render) for comparisons. */
  def canonical(s: String): String =
    if (s == null) null else render(parse(s))
}

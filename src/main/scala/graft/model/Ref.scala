package graft.model

/** Field-reference ("query path") compiler.
  *
  * The reference addresses record sub-fields with a dotted path DSL
  * rooted at the record: `.Payload.After.department`, `.Key.id`,
  * `.Metadata.foo`, `.Operation`, `.Position`
  * (`sdk.NewReferenceResolver`, used by every field processor — e.g.
  * reference `pkg/plugin/processor/builtin/impl/field/set.go:81-106`).
  *
  * We compile a path to a [[Ref]]: which record slot it addresses plus
  * the JSON sub-path inside that slot. Spark-side resolution happens in
  * the processors (JSON expressions for payload/key slots, map ops for
  * metadata, plain columns for operation/position).
  */
sealed trait Ref {
  /** JSON sub-path inside the slot ('a.b.c'); empty = the whole slot. */
  def sub: Seq[String]
}

object Ref {
  case object OperationRef extends Ref { val sub = Nil }
  case object PositionRef extends Ref { val sub = Nil }
  /** `.Metadata` or `.Metadata.<key>` — only one level deep (map). */
  final case class MetadataRef(sub: Seq[String]) extends Ref
  final case class KeyRef(sub: Seq[String]) extends Ref
  final case class PayloadBeforeRef(sub: Seq[String]) extends Ref
  final case class PayloadAfterRef(sub: Seq[String]) extends Ref
  /** Bare `.Payload` — both images; valid for exclude (reference
    * `field/exclude.go` "Exclude all fields in payload").
    */
  case object PayloadRef extends Ref { val sub = Nil }

  /** Parse a reference path. Accepts the same grammar as the reference
    * resolver: a leading `.`, then `Operation | Position | Metadata |
    * Key | Payload.Before | Payload.After`, then dotted sub-fields.
    * A bare `.Payload` is rejected (the reference requires Before/After).
    */
  def parse(path: String): Ref = {
    val trimmed = path.trim
    require(trimmed.startsWith("."), s"field reference must start with '.': $path")
    val parts = splitPath(trimmed.drop(1))
    parts match {
      case Seq("Operation") => OperationRef
      case Seq("Position") => PositionRef
      case "Metadata" +: rest =>
        // metadata is a flat map whose keys may themselves contain
        // dots (opencdc.readAt, clone.index): join the remainder
        MetadataRef(if (rest.isEmpty) Nil else Seq(rest.mkString(".")))
      case "Key" +: rest => KeyRef(rest)
      case Seq("Payload") => PayloadRef
      case "Payload" +: "Before" +: rest => PayloadBeforeRef(rest)
      case "Payload" +: "After" +: rest => PayloadAfterRef(rest)
      case _ => throw new IllegalArgumentException(s"unresolvable field reference: $path")
    }
  }

  /** Split on '.' honoring bracket syntax `["a.b"]` for keys that
    * themselves contain dots (superset of the reference grammar).
    */
  private[model] def splitPath(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inBracket = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inBracket) {
        if (c == '"' && i + 1 < s.length && s.charAt(i + 1) == ']') {
          inBracket = false; i += 1
        } else cur.append(c)
      } else c match {
        case '.' => out += cur.result(); cur.clear()
        case '[' if i + 1 < s.length && s.charAt(i + 1) == '"' =>
          // bracket access may follow a segment directly
          // (`.Metadata["a.b"]`): flush the segment first
          out += cur.result(); cur.clear()
          inBracket = true; i += 1
        case other => cur.append(other)
      }
      i += 1
    }
    out += cur.result()
    out.result().filter(_.nonEmpty)
  }
}

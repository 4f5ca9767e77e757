package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.model.Ref

/** Property tests for the two most-reused pieces of semantics: the
  * field-reference resolver (SURVEY §1.4 — "build it once,
  * property-test it hard") and the JSON set/get/drop/rename algebra.
  */
class PropertySpec extends AnyFunSuite {
  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private val seg = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
  private val path = Gen.nonEmptyListOf(seg).map(_.take(4))

  test("seq-gram escaping is injective: distinct sequences, distinct grams") {
    // the pure-Scala mirror of frequentNgrams' per-token escaping +
    // '>' join: if two token sequences render to the same gram string,
    // they must BE the same sequence (the ADVICE-4 collision fix)
    def esc(s: String) = s.replace("\\", "\\\\").replace(">", "\\>")
    def gram(toks: List[String]) = toks.map(esc).mkString(">")
    val tok = Gen.listOfN(6,
      Gen.oneOf(Gen.alphaLowerChar, Gen.const('>'), Gen.const('\\')))
      .map(_.mkString)
    val seqs = Gen.listOfN(3, tok)
    check(Prop.forAll(seqs, seqs) { (a, b) =>
      (gram(a) == gram(b)) == (a == b)
    })
  }

  test("Ref: payload paths round-trip through parse") {
    check(Prop.forAll(path) { p =>
      val ref = Ref.parse((".Payload.After" +: p).mkString("."))
      ref == Ref.PayloadAfterRef(p)
    })
  }

  test("Ref: metadata path keeps dotted tail as one key") {
    check(Prop.forAll(path) { p =>
      Ref.parse((".Metadata" +: p).mkString(".")) ==
        Ref.MetadataRef(Seq(p.mkString(".")))
    })
  }

  test("Ref: bracket syntax escapes dots") {
    assert(Ref.parse(""".Payload.After.["a.b"].c""") ==
      Ref.PayloadAfterRef(Seq("a.b", "c")))
  }

  test("JsonOps: set then get returns the value") {
    val value = Gen.alphaNumStr.map(_.take(16))
    check(Prop.forAll(path, value) { (p, v) =>
      val F = JsonOps.mapper.getNodeFactory
      val tree = JsonOps.set(F.objectNode(), p, F.textNode(v))
      JsonOps.get(tree, p).exists(n => n.isTextual && n.asText() == v)
    })
  }

  test("JsonOps: set then drop removes the path") {
    check(Prop.forAll(path) { p =>
      val F = JsonOps.mapper.getNodeFactory
      val tree = JsonOps.set(F.objectNode(), p, F.textNode("x"))
      JsonOps.get(JsonOps.drop(tree, p), p).isEmpty
    })
  }

  test("JsonOps: rename preserves the value under the new name") {
    check(Prop.forAll(path, seg) { (p, newName) =>
      Prop.propBoolean(p.last != newName) ==> {
        val F = JsonOps.mapper.getNodeFactory
        val tree = JsonOps.set(F.objectNode(), p, F.textNode("v"))
        val renamed = JsonOps.rename(tree, p, newName)
        JsonOps.get(renamed, p.dropRight(1) :+ newName)
          .exists(_.asText() == "v") &&
          JsonOps.get(renamed, p).isEmpty
      }
    })
  }

  test("JsonOps: set is independent of sibling keys (order preserved)") {
    val F = JsonOps.mapper.getNodeFactory
    val tree = JsonOps.parse("""{"a":1,"b":2,"c":3}""")
    val out = JsonOps.set(tree, Seq("b"), F.numberNode(9L))
    assert(JsonOps.render(out) == """{"a":1,"b":9,"c":3}""")
  }

  test("convert: reference Go-string semantics") {
    import graft.functions.JsonOps.convert
    val F = JsonOps.mapper.getNodeFactory
    assert(convert(F.numberNode(1), "bool") == Right(F.booleanNode(true)))
    assert(convert(F.booleanNode(true), "int") == Right(F.numberNode(1L)))
    assert(convert(F.numberNode(123.345), "string") == Right(F.textNode("123.345")))
    assert(convert(F.textNode("123"), "int") == Right(F.numberNode(123L)))
    assert(convert(F.numberNode(1704198896123456789L), "time") ==
      Right(F.textNode("2024-01-02T12:34:56.123456789Z")))
    assert(convert(F.textNode("abc"), "int").isLeft)
    // float → int errors (Go strconv.Atoi on "123.4")
    assert(convert(F.numberNode(123.4), "int").isLeft)
  }
}

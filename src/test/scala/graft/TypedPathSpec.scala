package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Cdc
import graft.ops._

/** The typed fast path must agree with the dynamic-JSON path: the same
  * processor chain over `Cdc.wrapTyped` (struct payload, zero Jackson)
  * and `Cdc.wrap` (canonical-JSON payload) projects identical values.
  */
class TypedPathSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private def table = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "click", 10.5, "{\"k\": 7}", "alpha"),
      (2L, "view", 20.0, "{\"k\": 8}", "beta"),
      (3L, "purchase", 30.25, "{\"k\": 9}", "gamma")
    ).toDF("id", "event_type", "value", "props", "name")
  }

  private def chain(df: org.apache.spark.sql.DataFrame) = {
    val p1 = Registry.create("json.decode",
      Map("field" -> ".Payload.After.props", "schema" -> "k INT"))
    val p2 = Registry.create("field.set",
      Map("field" -> ".Payload.After.flagged", "value" -> "{{ .Payload.After.event_type }}!"))
    val p3 = Registry.create("field.rename", Map("mapping" -> ".Payload.After.value:amount"))
    val p4 = Registry.create("field.exclude", Map("fields" -> ".Payload.After.name"))
    val p5 = Registry.create("filter", Map.empty)
    p5(p4(p3(p2(p1(df)))), condition = Some("""{{ eq .Payload.After.event_type "view" }}"""))
  }

  test("typed chain matches the JSON chain value-for-value") {
    val json = chain(Cdc.wrap(table, "id", "t")).select(
      get_json_object(col(Cdc.Key), "$.id").cast("long").as("id"),
      get_json_object(col(Cdc.PayloadAfter), "$.flagged").as("flagged"),
      get_json_object(col(Cdc.PayloadAfter), "$.amount").cast("double").as("amount"),
      get_json_object(col(Cdc.PayloadAfter), "$.props.k").cast("int").as("k"))
    val typedOut = chain(Cdc.wrapTyped(table, "id", "t")).select(
      get_json_object(col(Cdc.Key), "$.id").cast("long").as("id"),
      col("payload_after.flagged").as("flagged"),
      col("payload_after.amount").cast("double").as("amount"),
      col("payload_after.props.k").cast("int").as("k"))
    assert(typedOut.collect().toSet == json.collect().toSet)
    assert(typedOut.count() == 2) // "view" filtered out
    // the exclude removed `name` from the SCHEMA, not just the value
    val fields = chain(Cdc.wrapTyped(table, "id", "t"))
      .schema("payload_after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(!fields.contains("name") && fields.contains("flagged"))
  }

  test("typed plan contains no Jackson expressions") {
    val plan = chain(Cdc.wrapTyped(table, "id", "t"))
      .queryExecution.optimizedPlan.toString
    for (tag <- Seq("json_set_field", "json_drop_fields", "json_rename_fields",
        "json_parse_field", "json_get_field", "get_json_object"))
      assert(!plan.contains(tag), s"typed plan still uses $tag")
  }

  test("typed field.convert: cast failure routes to _error") {
    val recs = Cdc.wrapTyped(table, "id", "t")
    val ok = Registry.create("field.convert",
      Map("field" -> ".Payload.After.value", "type" -> "string"))(recs)
    assert(ok.select(col("payload_after.value")).schema.head.dataType ==
      org.apache.spark.sql.types.StringType)
    assert(Cdc.failed(ok).count() == 0)
    val bad = Registry.create("field.convert",
      Map("field" -> ".Payload.After.event_type", "type" -> "int"))(recs)
    assert(Cdc.failed(bad).count() == 3) // "click" etc. don't parse as int
  }

  test("typed condition on an absent field degrades to false, not AnalysisException") {
    val cond = Some("""{{ eq .Payload.After.nonexistent "x" }}""")
    // JSON path: get_json_object → null → condition false, all bypass
    val json = Registry.create("filter", Map.empty)(Cdc.wrap(table, "id", "t"), cond)
    // typed path used to fail ANALYSIS on the missing struct field
    val typed = Registry.create("filter", Map.empty)(Cdc.wrapTyped(table, "id", "t"), cond)
    assert(json.count() == 3 && typed.count() == 3,
      "absent-field condition must bypass every record on both paths")
    // and a path through a scalar intermediate degrades the same way
    val scalar = Registry.create("filter", Map.empty)(
      Cdc.wrapTyped(table, "id", "t"), Some("""{{ eq .Payload.After.name.deep "x" }}"""))
    assert(scalar.count() == 3)
  }

  test("typed rename of an absent field is a no-op") {
    val recs = Cdc.wrapTyped(table, "id", "t")
    val out = Registry.create("field.rename",
      Map("mapping" -> ".Payload.After.nope:other"))(recs)
    assert(out.schema("payload_after").dataType == recs.schema("payload_after").dataType)
  }

  test("typed split explodes an array field with split.index metadata") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("x"))).toDF("id", "words")
    val recs = Cdc.wrapTyped(df, "id", "t")
    val out = Registry.create("split", Map("field" -> ".Payload.After.words"))(recs)
    val rows = out.select(
      get_json_object(col(Cdc.Key), "$.id").cast("long").as("id"),
      col(Cdc.Metadata).getItem("split.index").cast("int").as("i"),
      col("payload_after.words").as("w")).as[(Long, Int, String)].collect().toSet
    assert(rows == Set((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c"), (2L, 0, "x")))
    // non-array field → every record becomes an error record
    val err = Registry.create("split", Map("field" -> ".Payload.After.id"))(recs)
    assert(Cdc.failed(err).count() == 2)
  }

  test("typed base64 round-trips a string field") {
    val recs = Cdc.wrapTyped(table, "id", "t")
    val enc = Registry.create("base64.encode", Map("field" -> ".Payload.After.name"))(recs)
    assert(enc.select(col("payload_after.name")).as[String].collect().toSet ==
      Set("YWxwaGE=", "YmV0YQ==", "Z2FtbWE="))
    val dec = Registry.create("base64.decode", Map("field" -> ".Payload.After.name"))(enc)
    assert(dec.select(col("payload_after.name")).as[String].collect().toSet ==
      Set("alpha", "beta", "gamma"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonOps
import graft.model.Cdc
import graft.pipeline.{ConnectorConfig, Runner}
import graft.sources.GeneratorConfig

/** Generator config parity with the reference: multi-collection
  * (`collections.<name>.format.options.*` / `.operations`) and burst
  * rate shaping (`burst.generateTime`/`burst.sleepTime`).
  */
class GeneratorSpec extends AnyFunSuite {
  lazy val spark = Spark.session

  test("multi-collection: per-collection fields and operations, round-robin") {
    val recs = Runner.source(spark, ConnectorConfig("g", "builtin:generator", Map(
      "recordCount" -> "40",
      "collections.users.format.options.id" -> "int",
      "collections.users.format.options.name" -> "string",
      "collections.users.operations" -> "create",
      "collections.orders.format.options.id" -> "int",
      "collections.orders.operations" -> "create,update")),
      streaming = false).collect()
    assert(recs.length == 40)
    val byColl = recs.groupBy(_.getAs[Map[String, String]](Cdc.Metadata)("opencdc.collection"))
    assert(byColl.keySet == Set("users", "orders"))
    assert(byColl("users").length == 20 && byColl("orders").length == 20)
    // users payloads have name, orders don't
    assert(byColl("users").forall(r =>
      JsonOps.parse(r.getAs[String](Cdc.PayloadAfter)).has("name")))
    assert(byColl("orders").forall(r =>
      !JsonOps.parse(r.getAs[String](Cdc.PayloadAfter)).has("name")))
    // orders alternate create/update per the operations cycle
    assert(byColl("orders").map(_.getAs[String](Cdc.Operation)).toSet ==
      Set("create", "update"))
  }

  test("burst shaping: records accrue only during generate windows") {
    val cfg = GeneratorConfig(Map(
      "rate" -> "100", "burst.generateTime" -> "1s", "burst.sleepTime" -> "1s"))
    assert(cfg.availableAt(0) == 0)
    assert(cfg.availableAt(1000) == 100)  // one full generate window
    assert(cfg.availableAt(1500) == 100)  // mid-sleep: nothing accrues
    assert(cfg.availableAt(2000) == 100)  // sleep ends
    assert(cfg.availableAt(2500) == 150)  // second window half done
    assert(cfg.availableAt(4000) == 200)  // two full cycles
    // recordCount caps the total
    val capped = GeneratorConfig(Map(
      "rate" -> "100", "burst.generateTime" -> "1s", "burst.sleepTime" -> "1s",
      "recordCount" -> "120"))
    assert(capped.availableAt(60000) == 120)
  }
}

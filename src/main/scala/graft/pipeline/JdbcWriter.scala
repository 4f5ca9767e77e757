package graft.pipeline

import java.sql.DriverManager

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.JsonOps
import graft.model.Cdc

/** JDBC destination: per-record keyed upsert (the reference's postgres
  * destination semantics — `create|update|snapshot` upsert the row,
  * `delete` removes it by key). Update-then-insert keeps it portable
  * across dialects without MERGE; executed per partition with one
  * connection and prepared-statement reuse.
  *
  * Settings: `url`, `table`, `key` (payload field = key column).
  * Target columns are the payload's fields; idempotent by key, which
  * upgrades at-least-once delivery to effectively-once (SURVEY §2.7).
  */
object JdbcWriter {
  /** Config-supplied identifiers are interpolated into SQL; the control
    * plane accepts YAML from users, so reject anything that isn't a
    * plain (possibly qualified) identifier — quoting is not portable
    * across dialects' case-folding rules, validation is.
    */
  private[pipeline] val identPattern = "[A-Za-z_][A-Za-z0-9_$]*(\\.[A-Za-z_][A-Za-z0-9_$]*)*".r
  def checkIdent(s: String, what: String): String = {
    require(identPattern.matches(s), s"$what is not a valid SQL identifier: $s")
    s
  }

  /** Mark records whose payload field names would fail [[checkIdent]]
    * with `_error` so the runner routes them to the DLQ. Field names
    * are DATA here (they become column names), so a bad one is a
    * per-record fault, not a task failure — the engine's error-channel
    * contract. Typed payloads carry their field names in the SCHEMA,
    * so those are validated once, driver-side, at plan time.
    */
  def validate(df: DataFrame): DataFrame = {
    val base = Cdc.withErrorChannel(df)
    if (Cdc.isTypedSlot(df, Cdc.PayloadAfter)) {
      df.schema(Cdc.PayloadAfter).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.foreach(checkIdent(_, "payload field"))
      base
    } else {
      val badField: Column = exists(
        json_object_keys(col(Cdc.PayloadAfter)),
        k => !k.rlike("^" + identPattern.regex + "$"))
      base.withColumn(Cdc.Error,
        when(col(Cdc.Error).isNull && col(Cdc.Operation) =!= "delete" &&
          coalesce(badField, lit(false)),
          concat(lit("jdbc: payload field is not a valid SQL identifier: "),
            array_join(filter(json_object_keys(col(Cdc.PayloadAfter)),
              k => !k.rlike("^" + identPattern.regex + "$")), ", ")))
          .otherwise(col(Cdc.Error)))
    }
  }

  def write(df: DataFrame, settings: Map[String, String]): Unit = {
    val url = settings("url")
    val table = checkIdent(settings("table"), "table")
    val keyCol = checkIdent(settings.getOrElse("key", "id"), "key")
    df.select(col(Cdc.Operation), col(Cdc.PayloadAfter), col(Cdc.Key))
      .foreachPartition { (rows: Iterator[Row]) =>
        val conn = DriverManager.getConnection(url)
        conn.setAutoCommit(false)
        // prepared statements cached by shape — one parse per
        // partition per column set, not one per record
        val stmtCache = scala.collection.mutable.Map.empty[String, java.sql.PreparedStatement]
        def prepared(sql: String): java.sql.PreparedStatement =
          stmtCache.getOrElseUpdate(sql, conn.prepareStatement(sql))
        try {
          rows.foreach { r =>
            val op = r.getString(0)
            if (op == "delete") {
              val keyNode = JsonOps.parseOrEmpty(r.getString(2))
              val keyVal = jsonValue(keyNode.get(keyCol))
              val del = prepared(s"DELETE FROM $table WHERE $keyCol = ?")
              del.setObject(1, keyVal); del.execute()
            } else if (r.getString(1) != null) {
              val payload = JsonOps.parseOrEmpty(r.getString(1))
              if (payload.isObject) {
                val fields = scala.jdk.CollectionConverters
                  .IteratorHasAsScala(payload.fieldNames()).asScala.toSeq
                // payload keys are DATA and get interpolated as column
                // names — a non-identifier is a per-record fault, never
                // a task failure: [[validate]] already routed it to the
                // DLQ in the runner path, so skip it here (SQL
                // injection guard stays intact either way)
                if (fields.forall(identPattern.matches)) {
                val values = fields.map(f => jsonValue(payload.get(f)))
                val keyIdx = fields.indexOf(keyCol)
                val setCols = fields.zipWithIndex.filter(_._1 != keyCol)
                // update first …
                var updated = 0
                if (keyIdx >= 0 && setCols.nonEmpty) {
                  val up = prepared(
                    s"UPDATE $table SET ${setCols.map(_._1 + " = ?").mkString(", ")} WHERE $keyCol = ?")
                  setCols.zipWithIndex.foreach { case ((_, vi), i) =>
                    up.setObject(i + 1, values(vi))
                  }
                  up.setObject(setCols.size + 1, values(keyIdx))
                  updated = up.executeUpdate()
                }
                // … insert when absent
                if (updated == 0) {
                  val ins = prepared(
                    s"INSERT INTO $table (${fields.mkString(", ")}) VALUES (${fields.map(_ => "?").mkString(", ")})")
                  values.zipWithIndex.foreach { case (v, i) => ins.setObject(i + 1, v) }
                  ins.execute()
                }
                }
              }
            }
          }
          conn.commit()
        } finally {
          stmtCache.values.foreach(st => try st.close() catch { case _: Exception => () })
          conn.close()
        }
      }
  }

  private def jsonValue(n: com.fasterxml.jackson.databind.JsonNode): AnyRef = n match {
    case null => null
    case x if x.isNull => null
    case x if x.isIntegralNumber => java.lang.Long.valueOf(x.asLong())
    case x if x.isFloatingPointNumber => java.lang.Double.valueOf(x.asDouble())
    case x if x.isBoolean => java.lang.Boolean.valueOf(x.asBoolean())
    case x if x.isTextual => x.asText()
    case x => JsonOps.render(x)
  }
}

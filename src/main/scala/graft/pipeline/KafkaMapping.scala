package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.JsonExpressions
import graft.model.Cdc
import graft.ops.Conditions

/** `builtin:kafka` record mapping, factored out of the runner so the
  * projections are unit-testable without a broker (the spec runs them
  * over hand-built frames with Spark's kafka source/sink schemas).
  *
  * Reference connector surface (conduit-connector-kafka, llms-full.txt
  * §kafka): source reads a comma-separated `topics` list from
  * `servers`; destination produces to a per-record `topic` resolved
  * from a Go template (default `{{ index .Metadata
  * "opencdc.collection" }}`) with the opencdc/json record as the
  * message value. Spark's kafka format handles the consumer group /
  * partition assignment / offset bookkeeping that the reference
  * manages by hand.
  */
object KafkaMapping {

  /** The reference destination's default topic template. */
  val DefaultTopicTemplate = """{{ index .Metadata "opencdc.collection" }}"""

  /** Reference settings → Spark kafka reader options. `kafka.*`-prefixed
    * settings pass through verbatim (Spark's own escape hatch to any
    * consumer/producer property).
    */
  def sourceOptions(settings: Map[String, String]): Map[String, String] = {
    val passthrough = settings.filter { case (k, _) => k.startsWith("kafka.") }
    val mapped = Map.newBuilder[String, String]
    settings.get("servers").foreach(s => mapped += "kafka.bootstrap.servers" -> s)
    settings.get("topics").foreach(t => mapped += "subscribe" -> t)
    settings.get("readFromBeginning").foreach(b =>
      mapped += "startingOffsets" -> (if (b == "true") "earliest" else "latest"))
    mapped.result() ++ passthrough
  }

  /** Producer-side options (no `subscribe`; topic rides per record). */
  def sinkOptions(settings: Map[String, String]): Map[String, String] = {
    val passthrough = settings.filter { case (k, _) => k.startsWith("kafka.") }
    settings.get("servers")
      .map(s => Map("kafka.bootstrap.servers" -> s)).getOrElse(Map.empty) ++ passthrough
  }

  /** Spark kafka source schema (topic, partition, offset, key, value,
    * timestamp, …) → CDC records. Position encodes the kafka coordinate
    * `topic-partition@offset` (the reference's position shape for
    * kafka); the topic becomes `opencdc.collection` so downstream
    * routing (including the destination's default topic template)
    * works out of the box.
    */
  def fromKafka(df: DataFrame): DataFrame =
    df.select(
      to_binary(concat(col("topic"), lit("-"), col("partition").cast("string"),
        lit("@"), col("offset").cast("string")), lit("utf-8")).as(Cdc.Position),
      lit("create").as(Cdc.Operation),
      map(lit("opencdc.collection"), col("topic")).as(Cdc.Metadata),
      col("key").as(Cdc.KeyRaw),
      col("key").cast("string").as(Cdc.Key),
      lit(null).cast("string").as(Cdc.PayloadBefore),
      col("value").cast("string").as(Cdc.PayloadAfter))

  /** CDC records → Spark kafka sink frame (topic, key, value). The
    * message value is the opencdc/json rendering (the reference's
    * default `sdk.record.format`); the key prefers the raw key bytes
    * and falls back to the canonical-JSON key. Topic is resolved per
    * record from the template — a record with no resolvable topic
    * (null template result) fails the write, which is the reference
    * behavior for an empty topic.
    */
  def toKafka(df: DataFrame, topicTemplate: String = DefaultTopicTemplate): DataFrame = {
    val topic = Conditions.template(topicTemplate, Conditions.typedSlots(df))
    df.select(
      topic.as("topic"),
      coalesce(col(Cdc.KeyRaw), to_binary(col(Cdc.Key), lit("utf-8"))).as("key"),
      to_binary(JsonExpressions.cdcToJson(Cdc.columns.map(col)), lit("utf-8")).as("value"))
  }
}

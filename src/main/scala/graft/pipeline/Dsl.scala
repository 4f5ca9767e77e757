package graft.pipeline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Pipeline configuration — same shape as the reference's provisioning
  * model (`pkg/provisioning/config/parser.go:30-62`: Pipeline{ID,
  * Status, Name, Connectors, Processors, DLQ}; Connector{Type, Plugin,
  * Settings, Processors}; Processor{Plugin, Settings, Condition,
  * Workers}; DLQ{Plugin, Settings, WindowSize, WindowNackThreshold}),
  * buildable from the fluent Scala DSL (the reference's embedded
  * builder, `builder.go:99-369`) or the YAML files the reference
  * provisions from (`version: 2.x` pipelines).
  */
final case class ProcessorConfig(
    id: String,
    plugin: String,
    settings: Map[String, String] = Map.empty,
    condition: Option[String] = None,
    workers: Int = 1)

final case class ConnectorConfig(
    id: String,
    plugin: String,
    settings: Map[String, String] = Map.empty,
    processors: Seq[ProcessorConfig] = Nil)

final case class DlqConfig(
    plugin: String = "builtin:log",
    settings: Map[String, String] = Map.empty,
    windowSize: Int = 0,
    windowNackThreshold: Int = 0)

final case class PipelineConfig(
    id: String,
    name: String = "",
    sources: Seq[ConnectorConfig] = Nil,
    processors: Seq[ProcessorConfig] = Nil,
    destinations: Seq[ConnectorConfig] = Nil,
    dlq: Option[DlqConfig] = None) {

  def source(id: String, plugin: String, settings: (String, String)*): PipelineConfig =
    copy(sources = sources :+ ConnectorConfig(id, plugin, settings.toMap))
  def processor(id: String, plugin: String, settings: (String, String)*): PipelineConfig =
    copy(processors = processors :+ ProcessorConfig(id, plugin, settings.toMap))
  def processorWhen(id: String, plugin: String, condition: String,
                    settings: (String, String)*): PipelineConfig =
    copy(processors = processors :+
      ProcessorConfig(id, plugin, settings.toMap, Some(condition)))
  def destination(id: String, plugin: String, settings: (String, String)*): PipelineConfig =
    copy(destinations = destinations :+ ConnectorConfig(id, plugin, settings.toMap))
  def withDlq(plugin: String, windowSize: Int, nackThreshold: Int,
              settings: (String, String)*): PipelineConfig =
    copy(dlq = Some(DlqConfig(plugin, settings.toMap, windowSize, nackThreshold)))
}

object Pipeline {
  /** Fluent entry point: `Pipeline("p1").source(...).processor(...)`. */
  def apply(id: String): PipelineConfig = PipelineConfig(id)

  private lazy val yaml = new ObjectMapper(new YAMLFactory())

  /** Parse the reference's pipeline YAML (`version: 2.x` schema, e.g.
    * `examples/pipelines/file-to-file.yaml`). Multiple pipelines per
    * file supported.
    */
  def fromYaml(text: String): Seq[PipelineConfig] = {
    val root = yaml.readTree(text)
    val pipelines = Option(root.get("pipelines"))
      .map(_.elements().asScala.toSeq).getOrElse(Nil)
    pipelines.map(parsePipeline)
  }

  private def str(n: JsonNode, field: String, default: String = ""): String =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText()).getOrElse(default)

  private def settingsOf(n: JsonNode): Map[String, String] =
    Option(n.get("settings")).filterNot(_.isNull).map { s =>
      s.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)

  private def parseProcessor(n: JsonNode): ProcessorConfig =
    ProcessorConfig(
      id = str(n, "id"),
      plugin = str(n, "plugin"),
      settings = settingsOf(n),
      condition = Option(n.get("condition")).filterNot(_.isNull).map(_.asText()),
      workers = Option(n.get("workers")).map(_.asInt(1)).getOrElse(1))

  private def parseConnector(n: JsonNode): (String, ConnectorConfig) = {
    val procs = Option(n.get("processors")).map(_.elements().asScala.toSeq)
      .getOrElse(Nil).map(parseProcessor)
    (str(n, "type"),
      ConnectorConfig(str(n, "id"), str(n, "plugin"), settingsOf(n), procs))
  }

  private def parsePipeline(n: JsonNode): PipelineConfig = {
    val connectors = Option(n.get("connectors")).map(_.elements().asScala.toSeq)
      .getOrElse(Nil).map(parseConnector)
    val processors = Option(n.get("processors")).map(_.elements().asScala.toSeq)
      .getOrElse(Nil).map(parseProcessor)
    val dlq = Option(n.get("dead-letter-queue")).filterNot(_.isNull).map { d =>
      DlqConfig(
        plugin = str(d, "plugin", "builtin:log"),
        settings = settingsOf(d),
        windowSize = Option(d.get("window-size")).map(_.asInt(0)).getOrElse(0),
        windowNackThreshold =
          Option(d.get("window-nack-threshold")).map(_.asInt(0)).getOrElse(0))
    }
    PipelineConfig(
      id = str(n, "id"),
      name = str(n, "name"),
      sources = connectors.filter(_._1 == "source").map(_._2),
      destinations = connectors.filter(_._1 == "destination").map(_._2),
      processors = processors,
      dlq = dlq)
  }
}

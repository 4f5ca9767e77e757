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
    dlq: Option[DlqConfig] = None,
    ordered: String = "") {

  /** Strict per-source delivery order (reference §2.7 single-source
    * total ordering): each micro-batch is sorted by position and
    * written through one task. Costs parallelism at the sink —
    * partition-parallel (order-narrowed) delivery is the default.
    */
  def withOrderedDelivery: PipelineConfig = copy(ordered = "global")

  /** Keyed delivery order (reference §2.7 per-key ordering, SURVEY
    * §7): records sharing a key stay in position order relative to
    * each other, but distinct keys deliver in parallel — the batch is
    * hash-repartitioned by key and sorted (key, position) within each
    * partition. This is the scale mode: parallelism = shuffle
    * partitions instead of the global mode's single writer task,
    * which is exactly the per-entity guarantee CDC consumers need
    * (all changes to row X in order; rows X and Y unordered).
    */
  def withKeyOrderedDelivery: PipelineConfig = copy(ordered = "key")

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

  /** Render pipelines back to the v2 provisioning YAML — the inverse
    * of [[fromYaml]] (reference Export/Import round trip,
    * `proto/api/v1/api.proto` PipelineService.Export).
    */
  def toYaml(ps: Seq[PipelineConfig]): String = {
    val f = yaml.getNodeFactory
    def settingsNode(m: Map[String, String]) = {
      val o = f.objectNode()
      m.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
      o
    }
    def procNode(p: ProcessorConfig) = {
      val o = f.objectNode()
      o.put("id", p.id); o.put("plugin", p.plugin)
      if (p.settings.nonEmpty) o.set[JsonNode]("settings", settingsNode(p.settings))
      p.condition.foreach(o.put("condition", _))
      if (p.workers != 1) o.put("workers", p.workers)
      o
    }
    def connNode(tpe: String, c: ConnectorConfig) = {
      val o = f.objectNode()
      o.put("type", tpe); o.put("id", c.id); o.put("plugin", c.plugin)
      if (c.settings.nonEmpty) o.set[JsonNode]("settings", settingsNode(c.settings))
      if (c.processors.nonEmpty) {
        val arr = f.arrayNode(); c.processors.foreach(p => arr.add(procNode(p)))
        o.set[JsonNode]("processors", arr)
      }
      o
    }
    val root = f.objectNode()
    root.put("version", "2.2")
    val arr = f.arrayNode()
    ps.foreach { p =>
      val o = f.objectNode()
      o.put("id", p.id)
      if (p.name.nonEmpty) o.put("name", p.name)
      o.put("status", "running")
      // "true" (not "global") for the single-writer mode: round-trip
      // compatibility with configs written before the keyed mode
      if (p.ordered == "global") o.put("ordered", "true")
      else if (p.ordered.nonEmpty) o.put("ordered", p.ordered)
      val conns = f.arrayNode()
      p.sources.foreach(c => conns.add(connNode("source", c)))
      p.destinations.foreach(c => conns.add(connNode("destination", c)))
      o.set[JsonNode]("connectors", conns)
      if (p.processors.nonEmpty) {
        val procs = f.arrayNode(); p.processors.foreach(pr => procs.add(procNode(pr)))
        o.set[JsonNode]("processors", procs)
      }
      p.dlq.foreach { d =>
        val dn = f.objectNode()
        dn.put("plugin", d.plugin)
        if (d.settings.nonEmpty) dn.set[JsonNode]("settings", settingsNode(d.settings))
        if (d.windowSize != 0) dn.put("window-size", d.windowSize)
        if (d.windowNackThreshold != 0) dn.put("window-nack-threshold", d.windowNackThreshold)
        o.set[JsonNode]("dead-letter-queue", dn)
      }
      arr.add(o)
    }
    root.set[JsonNode]("pipelines", arr)
    yaml.writerWithDefaultPrettyPrinter().writeValueAsString(root)
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
      dlq = dlq,
      ordered = str(n, "ordered") match {
        case "true" | "global" => "global"
        case "key"             => "key"
        case "" | "false"      => ""
        case other =>
          throw new IllegalArgumentException(
            s"unknown ordered value '$other' (expected one of: true, false, global, key)")
      })
  }
}

package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.analytics.SplitMix64
import graft.model.Cdc

/** The `builtin:generator` source as a DataSource V2 MicroBatchStream
  * (reference spec: field types `int|string|time|bool|duration`, `rate`
  * records/s, `recordCount`, `operations` — reference `llms-full.txt:
  * 123-223`). Produces OpenCDC records deterministically from the
  * record index via splitmix64, so any executor can regenerate any
  * offset range: offsets are plain record counts, restart-safe.
  *
  * Options:
  *   `format.options.<name>` = int|string|time|bool|duration
  *   `recordCount` — total records (default unbounded)
  *   `rate`        — records/second cap (default unlimited)
  *   `operations`  — comma-separated cycle (default "create")
  *   `collection`  — metadata opencdc.collection value
  */
class GeneratorSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "conduit-generator"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Cdc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GeneratorTable(properties.asScala.toMap)
}

class GeneratorTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "conduit-generator"
  override def schema(): StructType = Cdc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Cdc.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GeneratorStream(options)
        override def toBatch: Batch = new GeneratorBatch(options)
      }
    }
}

case class CountOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

/** One collection's record shape (reference multi-collection mode:
  * `collections.<name>.format.options.*` / `.operations`).
  */
case class CollectionSpec(name: String, fields: Seq[(String, String)],
                          operations: Seq[String])

object GeneratorConfig {
  private def duration(s: String): Long = s.trim match {
    case d if d.endsWith("ms") => d.dropRight(2).toLong
    case d if d.endsWith("s") => d.dropRight(1).toLong * 1000
    case d => d.toLong
  }

  def apply(options: Map[String, String]): GeneratorConfig = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    val collPat = """collections\.([^.]+)\.format\.options\.(.+)""".r
    val opsPat = """collections\.([^.]+)\.operations""".r
    val collFields = lower.toSeq.collect {
      case (collPat(c, f), v) => (c, f, v)
    }.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).sortBy(_._1)).toMap
    val collOps = lower.collect { case (opsPat(c), v) => c -> v }
    val collections =
      if (collFields.nonEmpty)
        collFields.toSeq.sortBy(_._1).map { case (name, fields) =>
          CollectionSpec(name, fields,
            collOps.getOrElse(name, "create").split(",").map(_.trim).toSeq)
        }
      else {
        val fields = lower.collect {
          case (k, v) if k.startsWith("format.options.") =>
            k.stripPrefix("format.options.") -> v
        }.toSeq.sortBy(_._1)
        Seq(CollectionSpec(
          lower.getOrElse("collection", "generator"),
          if (fields.nonEmpty) fields else Seq("id" -> "int", "name" -> "string"),
          lower.getOrElse("operations", "create").split(",").map(_.trim).toSeq))
      }
    GeneratorConfig(
      collections = collections,
      recordCount = lower.get("recordcount").map(_.trim.toLong).filter(_ > 0),
      rate = lower.get("rate").map(_.trim.toDouble).filter(_ > 0),
      burstGenerateMs = lower.get("burst.generatetime").map(duration),
      burstSleepMs = lower.get("burst.sleeptime").map(duration))
  }
}

case class GeneratorConfig(collections: Seq[CollectionSpec],
                           recordCount: Option[Long], rate: Option[Double],
                           burstGenerateMs: Option[Long],
                           burstSleepMs: Option[Long]) {
  /** Deterministic OpenCDC record for a global index; indexes
    * round-robin across collections (reference multi-collection mode).
    */
  def record(i: Long): InternalRow = {
    val spec = collections((i % collections.size).toInt)
    val payload = new StringBuilder("{")
    spec.fields.zipWithIndex.foreach { case ((name, tpe), fi) =>
      if (fi > 0) payload.append(',')
      payload.append('"').append(name).append("\":")
      val r = SplitMix64.mix(i * 1000003L + fi)
      tpe match {
        case "int" => payload.append(math.abs(r % 1000000L))
        case "bool" => payload.append(if ((r & 1L) == 0L) "false" else "true")
        case "time" => payload.append('"')
          .append(graft.functions.JsonOps.rfc3339Nano(1600000000000000000L + math.abs(r % 100000000000L)))
          .append('"')
        case "duration" => payload.append('"').append(math.abs(r % 10000L)).append("ms\"")
        case _ => payload.append("\"string ").append(java.lang.Long.toHexString(r)).append('"')
      }
    }
    payload.append('}')
    // cycle operations over the collection's own record sequence
    val op = spec.operations(((i / collections.size) % spec.operations.size).toInt)
    new GenericInternalRow(Array[Any](
      i.toString.getBytes("UTF-8"), // position = record index
      UTF8String.fromString(op),
      ArrayBasedMapData(
        Array[Any](UTF8String.fromString("opencdc.collection")),
        Array[Any](UTF8String.fromString(spec.name))),
      null,
      UTF8String.fromString(s"""{"id":$i}"""),
      null,
      UTF8String.fromString(payload.result())))
  }

  /** Records available after `elapsedMs` under rate + burst shaping:
    * generation only accrues inside `burst.generateTime` windows,
    * separated by `burst.sleepTime` pauses (reference burst mode).
    */
  def availableAt(elapsedMs: Long): Long = {
    val byRate = (rate, burstGenerateMs, burstSleepMs) match {
      case (None, _, _) => Long.MaxValue
      case (Some(r), Some(gen), Some(sleep)) if gen > 0 && sleep >= 0 =>
        val cycle = gen + sleep
        val active = (elapsedMs / cycle) * gen + math.min(elapsedMs % cycle, gen)
        (r * active / 1000.0).toLong
      case (Some(r), _, _) => (r * elapsedMs / 1000.0).toLong
    }
    math.min(recordCount.getOrElse(Long.MaxValue), byRate)
  }
}

case class GeneratorInputPartition(start: Long, end: Long) extends InputPartition

class GeneratorPartitionReaderFactory(config: GeneratorConfig)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GeneratorInputPartition]
    new PartitionReader[InternalRow] {
      private var i = gp.start - 1
      override def next(): Boolean = { i += 1; i < gp.end }
      override def get(): InternalRow = config.record(i)
      override def close(): Unit = ()
    }
  }
}

/** Micro-batch stream: the offset is simply "records emitted so far".
  * `latestOffset` advances by rate×elapsed (or recordCount), each
  * batch splits its range into `defaultParallelism` partitions.
  */
class GeneratorStream(options: Map[String, String]) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  private val config = GeneratorConfig(options)
  private val startMs = System.currentTimeMillis()
  private val maxPerBatch = options
    .map { case (k, v) => k.toLowerCase -> v }
    .getOrElse("maxrecordsperbatch", "1000000").toLong

  private var availableNowTarget: Option[Long] = None
  private def target(): Long =
    config.availableAt(System.currentTimeMillis() - startMs)
  // AvailableNow pins the drain target so multiple capped batches run
  // to completion instead of one batch at the first latestOffset
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(config.recordCount.getOrElse(target()))
  override def initialOffset(): Offset = CountOffset(0)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")
  // SupportsAdmissionControl: advance from the engine-provided start —
  // correct across checkpoint restarts (no driver-local state rewind)
  override def latestOffset(start: Offset, limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val from = start.asInstanceOf[CountOffset].count
    val t = availableNowTarget.getOrElse(target())
    CountOffset(math.max(from, math.min(t, from + maxPerBatch)))
  }
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = CountOffset(target())
  override def deserializeOffset(json: String): Offset = CountOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].count
    val e = end.asInstanceOf[CountOffset].count
    val n = math.max(1, math.min(32, (e - s) / 10000 + 1)).toInt
    val step = math.max(1, (e - s) / n)
    (s until e by step).map(b =>
      GeneratorInputPartition(b, math.min(e, b + step))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GeneratorPartitionReaderFactory(config)
}

/** Bounded batch read (recordCount required) — lets the generator be
  * used in plain batch pipelines and benchmarks.
  */
class GeneratorBatch(options: Map[String, String]) extends Batch {
  private val config = GeneratorConfig(options)
  private val total = config.recordCount.getOrElse(
    throw new IllegalArgumentException("generator batch read requires recordCount"))
  override def planInputPartitions(): Array[InputPartition] = {
    val n = 32
    val step = math.max(1, total / n)
    (0L until total by step).map(b =>
      GeneratorInputPartition(b, math.min(total, b + step))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GeneratorPartitionReaderFactory(config)
}

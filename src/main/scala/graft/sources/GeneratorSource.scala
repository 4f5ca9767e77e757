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

object GeneratorConfig {
  def apply(options: Map[String, String]): GeneratorConfig = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    val fields = lower.collect {
      case (k, v) if k.startsWith("format.options.") =>
        k.stripPrefix("format.options.") -> v
    }.toSeq.sortBy(_._1)
    GeneratorConfig(
      fields = if (fields.nonEmpty) fields else Seq("id" -> "int", "name" -> "string"),
      recordCount = lower.get("recordcount").map(_.trim.toLong).filter(_ > 0),
      rate = lower.get("rate").map(_.trim.toDouble).filter(_ > 0),
      operations = lower.getOrElse("operations", "create").split(",").map(_.trim).toSeq,
      collection = lower.getOrElse("collection", "generator"))
  }
}

case class GeneratorConfig(fields: Seq[(String, String)], recordCount: Option[Long],
                           rate: Option[Double], operations: Seq[String],
                           collection: String) {
  /** Deterministic OpenCDC record for a global index. */
  def record(i: Long): InternalRow = {
    val payload = new StringBuilder("{")
    fields.zipWithIndex.foreach { case ((name, tpe), fi) =>
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
    val op = operations((i % operations.size).toInt)
    new GenericInternalRow(Array[Any](
      i.toString.getBytes("UTF-8"), // position = record index
      UTF8String.fromString(op),
      ArrayBasedMapData(
        Array[Any](UTF8String.fromString("opencdc.collection")),
        Array[Any](UTF8String.fromString(collection))),
      null,
      UTF8String.fromString(s"""{"id":$i}"""),
      null,
      UTF8String.fromString(payload.result())))
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
  private def target(): Long = {
    val elapsed = (System.currentTimeMillis() - startMs) / 1000.0
    val byRate = config.rate.map(r => (r * elapsed).toLong).getOrElse(Long.MaxValue)
    math.min(config.recordCount.getOrElse(Long.MaxValue), byRate)
  }
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

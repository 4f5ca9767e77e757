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

import graft.model.Cdc

/** True file tail — the reference's `builtin:file` source follows ONE
  * append-only file (`tail -f` semantics); Spark's built-in file
  * stream follows a directory of new files. This DSv2 stream closes
  * that gap: the offset is the BYTE position consumed so far, each
  * micro-batch reads the appended range, and only complete lines are
  * consumed (a partially-written last line stays beyond the offset
  * until its newline arrives — exactly how tail behaves on a writer
  * mid-line). Restart from the checkpoint resumes at the committed
  * byte offset: no loss, no re-read.
  *
  * A single file is inherently one reader's worth of I/O, so each
  * batch is one partition — parallelism in a tail pipeline comes from
  * the processors downstream (Spark repartitions after the scan).
  * Truncation (offset > file length) restarts from 0, matching tail's
  * `-F` reopen behavior.
  *
  * Options: `path` (one file), `collection` (metadata), `charset`
  * (default UTF-8), `maxBytesPerBatch` (default 64 MiB).
  */
class FileTailSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "conduit-file-tail"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Cdc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FileTailTable(properties.asScala.toMap)
}

case class FileTailConfig(path: String, collection: String, charset: String,
                          maxBytes: Long)

object FileTailConfig {
  def apply(options: Map[String, String]): FileTailConfig = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    FileTailConfig(
      path = lower("path"),
      collection = lower.getOrElse("collection", "file"),
      charset = lower.getOrElse("charset", "UTF-8"),
      maxBytes = lower.getOrElse("maxbytesperbatch", (64L * 1024 * 1024).toString).toLong)
  }
}

class FileTailTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"conduit-file-tail:${options.getOrElse("path", "?")}"
  override def schema(): StructType = Cdc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Cdc.schema
        override def toMicroBatchStream(checkpoint: String): MicroBatchStream =
          new FileTailStream(FileTailConfig(options))
      }
    }
}

case class FileTailPartition(path: String, fromByte: Long, toByte: Long)
    extends InputPartition

class FileTailReaderFactory(config: FileTailConfig) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[FileTailPartition]
    new PartitionReader[InternalRow] {
      private lazy val lines: Iterator[(Long, String)] = {
        val raf = new java.io.RandomAccessFile(part.path, "r")
        try {
          raf.seek(part.fromByte)
          val buf = new Array[Byte]((part.toByte - part.fromByte).toInt)
          raf.readFully(buf)
          // the range always ends at a newline (the stream only offers
          // complete lines), so a simple split is loss-free
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
          var lineStart = 0
          var i = 0
          while (i < buf.length) {
            if (buf(i) == '\n') {
              out += ((part.fromByte + lineStart,
                new String(buf, lineStart, i - lineStart, config.charset)
                  .stripSuffix("\r")))
              lineStart = i + 1
            }
            i += 1
          }
          out.iterator
        } finally raf.close()
      }
      private var current: (Long, String) = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        current = lines.next(); true
      }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        current._1.toString.getBytes("UTF-8"), // position = byte offset
        UTF8String.fromString("create"),
        ArrayBasedMapData(
          Array[Any](UTF8String.fromString("opencdc.collection")),
          Array[Any](UTF8String.fromString(config.collection))),
        null,
        null,
        null,
        UTF8String.fromString(current._2)))
      override def close(): Unit = ()
    }
  }
}

/** Byte-offset micro-batch stream over one append-only file. */
class FileTailStream(config: FileTailConfig) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** Last byte (exclusive) of the final COMPLETE line at or below
    * `cap` — a partial trailing line is left for a later batch.
    */
  private def completeUpTo(cap: Long): Long = {
    val f = new java.io.File(config.path)
    if (!f.exists()) return 0L
    val len = math.min(f.length(), cap)
    if (len <= 0) return 0L
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      // scan back from the cap for the last newline
      var pos = len - 1
      val chunk = new Array[Byte](8192)
      while (pos >= 0) {
        val from = math.max(0L, pos - chunk.length + 1)
        val n = (pos - from + 1).toInt
        raf.seek(from)
        raf.readFully(chunk, 0, n)
        var i = n - 1
        while (i >= 0) {
          if (chunk(i) == '\n') return from + i + 1
          i -= 1
        }
        pos = from - 1
      }
      0L
    } finally raf.close()
  }

  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(completeUpTo(Long.MaxValue))
  override def initialOffset(): Offset = CountOffset(0)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val from = start.asInstanceOf[CountOffset].count
    val fileLen = new java.io.File(config.path).length()
    if (from > fileLen) return CountOffset(0) // truncated: reopen at 0
    // Always respect maxBytesPerBatch — under Trigger.AvailableNow the
    // pinned target is only an upper bound, and the drain spreads over
    // as many batches as needed (a single unbounded batch would
    // allocate the whole appended range in one reader buffer).
    val capped = completeUpTo(from + config.maxBytes)
    val target = availableNowTarget.fold(capped)(t => math.min(t, capped))
    CountOffset(math.max(from, target))
  }
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = CountOffset(completeUpTo(Long.MaxValue))
  override def deserializeOffset(json: String): Offset = CountOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].count
    val e = end.asInstanceOf[CountOffset].count
    if (e <= s) Array.empty
    else Array(FileTailPartition(config.path, s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FileTailReaderFactory(config)
}

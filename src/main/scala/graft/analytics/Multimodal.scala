package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract
  * / frame-sample as `mapPartitions` batch operators.
  *
  * The Spark-side plumbing is real (schema, encoders, partition-batch
  * shape, deterministic output); the actual media decode is STUBBED —
  * codec libraries are not in this container — behind
  * [[MediaCodecStub]], which produces a deterministic fake so tests
  * can assert the pipeline end-to-end. Swap the stub for a real codec
  * (javacv / ffmpeg bindings) without touching any operator.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime: String, n_bytes: Long,
                      content: Array[Byte])

  /** Extracted features for one media item. */
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           sha256_prefix: String, feature: Array[Float])

  /** Deterministic fake decoder: "features" are derived from the byte
    * content via FNV hashing. Replace with a real codec at the `???`
    * boundary in production.
    */
  object MediaCodecStub {
    /** STUB: a real implementation would decode the image/audio frame
      * here. Deterministic fake: 8 floats folded from the content hash.
      */
    def decodeFeatures(content: Array[Byte]): Array[Float] = {
      val h = Hashing.fnv1a(content)
      Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xff).toFloat / 255.0f))
    }

    /** STUB: frame sampling — returns `n` synthetic "frame" payloads
      * (byte slices), preserving the batch-per-partition shape a real
      * ffmpeg-backed sampler would use.
      */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val step = math.max(1, content.length / math.max(n, 1))
      (0 until math.min(n, content.length)).map { i =>
        content.slice(i * step, math.min(content.length, i * step + step))
      }
    }
  }

  /** Wrap the documents table as a fake media table (binary payloads)
    * — the stand-in for an image/audio corpus in this container.
    */
  def fakeMediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        lit("application/octet-stream").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("text").cast("binary").as("content"))

  /** Feature extraction over partition-sized batches: one decoder init
    * per partition (the expensive part with a real codec), streaming
    * rows through it — the Scala analogue of `mapInPandas` batches.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real codec would be initialized once per partition here
      rows.map { r =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(r.content)
        MediaFeatures(r.media_id, r.mime, r.n_bytes,
          digest.take(8).map("%02x".format(_)).mkString,
          MediaCodecStub.decodeFeatures(r.content))
      }
    }.toDF()
  }

  /** Frame sampling: 1 → N rows per media item via flatMap batches. */
  def sampleFrames(media: DataFrame, framesPerItem: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      MediaCodecStub.sampleFrames(r.content, framesPerItem).zipWithIndex.map {
        case (frame, idx) => (r.media_id, idx, frame.length.toLong)
      }
    }.toDF("media_id", "frame_index", "frame_bytes")
  }
}

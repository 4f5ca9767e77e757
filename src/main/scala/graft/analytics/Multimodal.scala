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

    /** Perceptual hash of the decoded media — aHash shape: 64 cells,
      * bit c set iff cell c's mean exceeds the global mean (compared
      * by exact integer cross-multiplication, no float rounding).
      * STUB decode: the "64-pixel downsample" is the content's 64
      * byte-slice sums — locality-preserving exactly like a real
      * image decode (a local byte edit perturbs one cell; it does NOT
      * shift the rest), which is the property perceptual dedup needs.
      * A real implementation replaces the slice sums with an 8×8
      * grayscale resize and keeps everything else.
      */
    def perceptualHash(content: Array[Byte]): Long = {
      val n = content.length
      if (n == 0) return 0L
      var tot = 0L
      var i = 0
      while (i < n) { tot += content(i) & 0xff; i += 1 }
      var h = 0L
      var c = 0
      while (c < 64) {
        val st = c * n / 64
        val en = (c + 1) * n / 64
        var cs = 0L
        var j = st
        while (j < en) { cs += content(j) & 0xff; j += 1 }
        if (cs * n > tot * (en - st)) h |= (1L << c)
        c += 1
      }
      h
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

  /** Perceptual 64-bit hash per media item — the signature side of
    * [[nearDupMedia]]; same partition-batch shape as
    * [[extractFeatures]] (a real codec initializes once per
    * partition).
    */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => (r.media_id, MediaCodecStub.perceptualHash(r.content)))
    }.toDF("media_id", "phash")
  }

  /** Perceptual near-duplicate media pairs: aHash signatures through
    * the shared 64-bit banding engine ([[Dedup.hamming64Pairs]] —
    * 4×16-bit bands, pigeonhole-complete for maxHamming ≤ 3, bounded
    * buckets, exact bit_count verify). The image-dedup counterpart of
    * SimHash text dedup: 8 bytes/item shuffle regardless of payload
    * size, so a 100 TB media store dedups on a ~1 GB signature table.
    */
  def nearDupMedia(media: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = 4096): DataFrame =
    Dedup.hamming64Pairs(perceptualHashes(media), "media_id", "phash",
      maxHamming, maxBucket)

  /** Incremental perceptual dedup: a batch of arriving media checked
    * against a media history — cross-side candidates only (no
    * intra-batch, no intra-history pairs), the ingest-triage twin of
    * [[nearDupMedia]]. Output: (batch_id, hist_id, hamming).
    */
  def nearDupMediaIncrement(batch: DataFrame, history: DataFrame,
                            maxHamming: Int = 3,
                            maxBucket: Int = 4096): DataFrame =
    Dedup.crossHamming64Pairs(perceptualHashes(batch),
      perceptualHashes(history), "media_id", "phash", maxHamming, maxBucket)

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

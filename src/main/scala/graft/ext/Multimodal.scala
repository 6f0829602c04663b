package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2b): image/audio/video as opaque
  * `binary` columns plus typed metadata, with decode / feature-extract /
  * resize / frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing is real — schemas, encoders, partition-level
  * batched processing via `mapPartitions` (the Scala analogue of
  * `mapInPandas`: one iterator per partition, amortized per-batch setup, no
  * per-row codec init, no driver collect). The codec itself is a STUB: this
  * container has no image/audio libraries, so `FakeCodec` derives
  * deterministic pseudo-metadata/features from the bytes. Swapping in a real
  * codec (javacv, TwelveMonkeys, ffmpeg-cli) changes only `FakeCodec`'s
  * body — every signature, schema, and plan shape stays.
  */
object Multimodal {

  /** Typed metadata for a decoded media blob. */
  case class MediaMeta(mediaId: Long, nBytes: Long, format: String,
                       width: Int, height: Int, nFrames: Int)

  /** Fixed-size embedding extracted from a media blob. */
  case class MediaFeatures(mediaId: Long, features: Array[Float])

  /** A media row: id + opaque payload. */
  case class MediaBlob(mediaId: Long, payload: Array[Byte])

  /** Resize output: new dimensions + resized payload. */
  case class ResizedMedia(mediaId: Long, width: Int, height: Int,
                          nBytes: Long, payload: Array[Byte])

  /** STUB codec — deterministic fakes in place of a real decoder.
    * Every value is a pure function of the payload bytes, so tests and
    * oracle queries are reproducible.
    */
  object FakeCodec {
    private val formats = Array("jpeg", "png", "webp")
    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(id, n, formats((n % 3).toInt),
        width = (n % 640).toInt + 1, height = (n % 480).toInt + 1,
        nFrames = (n % 24).toInt + 1)
    }
    /** Fake resize: aspect-preserving clamp of the fake dimensions into
      * (maxW, maxH), payload truncated by the area ratio — deterministic,
      * monotone, never upscales (scale capped at 1).
      */
    def resize(id: Long, bytes: Array[Byte], maxW: Int, maxH: Int): ResizedMedia = {
      val m = decodeMeta(id, bytes)
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      val w = math.max(1, math.floor(m.width * scale).toInt)
      val h = math.max(1, math.floor(m.height * scale).toInt)
      // empty payloads keep 0 bytes — max(1,...) would break the
      // nBytes == payload.length invariant on a 0-byte take
      val keep =
        if (bytes.isEmpty) 0
        else math.max(1, math.floor(bytes.length * scale * scale).toInt)
      ResizedMedia(id, w, h, keep.toLong, bytes.take(keep))
    }

    /** Fake feature extractor: `dim` rolling byte sums, L1-normalized. */
    def extractFeatures(id: Long, bytes: Array[Byte], dim: Int): MediaFeatures = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xFF); i += 1 }
      val s = acc.sum.max(1.0f)
      var j = 0
      while (j < dim) { acc(j) /= s; j += 1 }
      MediaFeatures(id, acc)
    }
  }

  /** Build a media table from any (id, string payload) source — the
    * zero-dependency stand-in for reading real image bytes; payload bytes
    * are the UTF-8 encoding of the string column.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("mediaId"),
      col(payloadCol).cast("binary").as("payload"))

  /** Decode metadata per blob. Batched per partition: codec "setup" happens
    * once per partition iterator, not per row — the shape that matters when
    * the real codec has expensive init.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      // real impl: open codec context here, close via iterator completion
      it.map(b => FakeCodec.decodeMeta(b.mediaId, b.payload))
    }
  }

  /** Feature extraction per blob → fixed-dim float vector, ready for
    * [[SimSearch]] over the resulting `features` column.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      it.map(b => FakeCodec.extractFeatures(b.mediaId, b.payload, dim))
    }
  }

  /** Resize every blob into a bounding box, batched per partition like
    * [[decodeMeta]] (real impl: one scaler context per partition).
    */
  def resize(spark: SparkSession, media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      it.map(b => FakeCodec.resize(b.mediaId, b.payload, maxW, maxH))
    }
  }

  /** Frame sampling for video-like payloads: every `stride`-th byte-block
    * index, capped at the decoded frame count — returns (mediaId, frameIdx)
    * rows. Real impl would emit decoded frame tensors; the plan shape
    * (generator → rows, no shuffle) is identical.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    decodeMeta(spark, media)
      .select(col("mediaId"),
        explode(sequence(lit(0), col("nFrames") - 1, lit(stride))).as("frameIdx"))
  }
}

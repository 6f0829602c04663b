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
  * per-row codec init, no driver collect). Codecs are pluggable behind
  * [[Multimodal.MediaCodec]]:
  *
  *   - [[Multimodal.ImageIoCodec]] — a REAL image codec on `javax.imageio`
  *     (JDK built-in, zero added dependencies): decodes JPEG/PNG/GIF/BMP
  *     bytes to true dimensions and format, resizes through Graphics2D
  *     with bilinear filtering and re-encodes PNG, and extracts grid-mean
  *     luminance features from the decoded pixels.
  *   - [[Multimodal.FakeCodec]] — the deterministic stub (metadata as a
  *     pure function of the byte length) kept for video-style frame
  *     sampling (no JDK video codec exists) and for fixtures where the
  *     oracle must reproduce the values without a decoder.
  *
  *   - [[Multimodal.WavCodec]] — a REAL audio codec on
  *     `javax.sound.sampled` (JDK built-in, headless-safe): parses
  *     RIFF/WAVE containers to true sample rate / channels / frame count
  *     and decodes 16-bit PCM to samples for feature extraction (RMS,
  *     zero-crossing rate, peak).
  *
  * Video stays stubbed — the JDK ships no video codec; swapping in
  * javacv/ffmpeg changes only a codec implementation, never a signature,
  * schema, or plan shape.
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

  /** Pluggable codec contract; implementations must be serializable (they
    * ship inside mapPartitions closures).
    */
  trait MediaCodec extends Serializable {
    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta
    def resize(id: Long, bytes: Array[Byte], maxW: Int, maxH: Int): ResizedMedia
    def extractFeatures(id: Long, bytes: Array[Byte], dim: Int): MediaFeatures
  }

  /** REAL image codec on `javax.imageio` (JDK built-in). Undecodable
    * payloads yield `format = "undecodable"` with zeroed dimensions rather
    * than an exception — a corrupt blob in a 100 TB corpus must not kill
    * the job; filter on the format column downstream.
    */
  object ImageIoCodec extends MediaCodec {
    // byte-array inputs never need ImageIO's temp-FILE cache streams — the
    // default useCache=true creates and deletes a disk-backed cache file
    // per image, pure wasted I/O in a per-row hot loop (per-JVM setting,
    // applied once at object init on each executor)
    javax.imageio.ImageIO.setUseCache(false)

    private def reader(bytes: Array[Byte]):
        Option[(javax.imageio.ImageReader, javax.imageio.stream.ImageInputStream)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) { val r = readers.next(); r.setInput(iis); Some((r, iis)) }
      else { iis.close(); None }
    }

    // NonFatal, not just IOException: JDK ImageIO plugins throw
    // RuntimeExceptions (ArrayIndexOutOfBounds, CMMException, …) on
    // malformed files — any of those escaping would fail the task and kill
    // the job, exactly what the undecodable contract forbids
    private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }

    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta =
      (try reader(bytes)
      catch { case scala.util.control.NonFatal(_) => None }) match {
        case Some((r, iis)) =>
          try MediaMeta(id, bytes.length.toLong,
            r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            r.getWidth(0), r.getHeight(0),
            // allowSearch: GIFs report true frame counts; single-frame
            // formats report 1
            math.max(r.getNumImages(true), 1))
          catch { case scala.util.control.NonFatal(_) => undecodable(id, bytes) }
          finally { r.dispose(); iis.close() }
        case None => undecodable(id, bytes)
      }

    private def undecodable(id: Long, bytes: Array[Byte]): MediaMeta =
      MediaMeta(id, bytes.length.toLong, "undecodable", 0, 0, 0)

    /** Aspect-preserving clamp into (maxW, maxH), never upscaling; bilinear
      * Graphics2D scale, PNG re-encode (lossless — the library must not
      * silently degrade payloads it only resized).
      */
    def resize(id: Long, bytes: Array[Byte], maxW: Int, maxH: Int): ResizedMedia = {
      val img = readImage(bytes)
      if (img == null) return ResizedMedia(id, 0, 0, 0L, Array.empty[Byte])
      val scale = math.min(1.0,
        math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
      val w = math.max(1, math.floor(img.getWidth * scale).toInt)
      val h = math.max(1, math.floor(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      val payload = bos.toByteArray
      ResizedMedia(id, w, h, payload.length.toLong, payload)
    }

    /** Grid-mean luminance features: the decoded image is partitioned into
      * `dim` vertical strips and each strip's mean luma (Rec. 601) becomes
      * one component, L1-normalized — a real, content-dependent embedding
      * (solid colors, gradients and textures separate), cheap enough for a
      * scan-side pass.
      */
    def extractFeatures(id: Long, bytes: Array[Byte], dim: Int): MediaFeatures = {
      val img = readImage(bytes)
      if (img == null) return MediaFeatures(id, new Array[Float](dim))
      val acc = new Array[Float](dim)
      val counts = new Array[Int](dim)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = 0.299f * ((rgb >> 16) & 0xFF) +
            0.587f * ((rgb >> 8) & 0xFF) + 0.114f * (rgb & 0xFF)
          val bin = math.min(dim - 1, x * dim / w)
          acc(bin) += luma; counts(bin) += 1
          x += 1
        }
        y += 1
      }
      var j = 0
      while (j < dim) { if (counts(j) > 0) acc(j) /= counts(j); j += 1 }
      val s = math.max(acc.sum, 1e-9f)
      j = 0
      while (j < dim) { acc(j) /= s; j += 1 }
      MediaFeatures(id, acc)
    }
  }

  /** STUB codec — deterministic fakes in place of a real decoder.
    * Every value is a pure function of the payload bytes, so tests and
    * oracle queries are reproducible.
    */
  object FakeCodec extends MediaCodec {
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

  /** Deterministic REAL-image media table: each id becomes an actual PNG
    * (encoded with `javax.imageio` inside the partition) whose dimensions
    * and fill are pure arithmetic in the id — so an oracle can predict the
    * decoded width/height WITHOUT a decoder, and a decode gate proves the
    * true encode→decode round-trip. Width = id%64+16, height = id%48+16,
    * horizontal gradient seeded by id.
    */
  def syntheticImageTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (id % 64).toInt + 16
        val h = (id % 48).toInt + 16
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          val c = ((id * 31 + x * 7) % 256).toInt
          var y = 0
          while (y < h) { img.setRGB(x, y, (c << 16) | (c << 8) | c); y += 1 }
          x += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaBlob(id, bos.toByteArray)
      }
    }.toDF("mediaId", "payload")
  }

  /** Deterministic 8×4 STRIPED grayscale PNGs for gating
    * [[extractFeatures]]: four 2-px vertical strips whose gray values are a
    * rotation (by id) of (10, 40, 60, 90). Per strip, every pixel's
    * Rec. 601 luma is the same value L(v) ≈ v (the coefficients sum to 1),
    * and the strip values always sum to 200 — so the L1-normalized grid
    * feature for strip j is v_j/200 ∈ {0.05, 0.2, 0.3, 0.45} up to float
    * accumulation noise (≲1e-6, bounded well inside a round-4 grid step of
    * 5e-5): the oracle predicts the feature vector with pure id arithmetic
    * while the engine truly decodes pixels — a hash match proves the
    * decode → luma → strip-binning → normalization pipeline end to end,
    * and the rotation proves strips are read at their true x positions.
    */
  def syntheticStripeImageTable(spark: SparkSession, df: DataFrame,
                                idCol: String): DataFrame = {
    import spark.implicits._
    val stripVals = Array(10, 40, 60, 90)
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val img = new java.awt.image.BufferedImage(8, 4,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < 8) {
          val v = stripVals(((id + x / 2) % 4).toInt)
          var y = 0
          while (y < 4) { img.setRGB(x, y, (v << 16) | (v << 8) | v); y += 1 }
          x += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaBlob(id, bos.toByteArray)
      }
    }.toDF("mediaId", "payload")
  }

  /** Decode metadata per blob. Batched per partition: codec "setup" happens
    * once per partition iterator, not per row — the shape that matters when
    * the real codec has expensive init.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame,
                 codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      // real impl: open codec context here, close via iterator completion
      it.map(b => codec.decodeMeta(b.mediaId, b.payload))
    }
  }

  /** Feature extraction per blob → fixed-dim float vector, ready for
    * [[SimSearch]] over the resulting `features` column.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int,
                      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      it.map(b => codec.extractFeatures(b.mediaId, b.payload, dim))
    }
  }

  /** Perceptual (average-hash family) image fingerprint: bit j is set iff
    * the j-th luma profile bin exceeds the image's mean bin — the aHash
    * rule over [[MediaCodec.extractFeatures]]'s decoded-pixel profile.
    * Because the profile is L1-normalized (Σf = 1), "above the mean bin"
    * is exactly `f_j > 1/dim` — scale-invariant, so re-encoded or
    * brightness-scaled copies of an image hash identically. `dim ≤ 64`
    * bits packed into one BIGINT.
    *
    * Undecodable payloads produce the all-zero profile and hash 0 — they
    * cluster with each other, not with real images; filter on
    * [[decodeMeta]]'s format column upstream if that matters.
    *
    * Output: (id, phash). Scan-side per-row work, no shuffle.
    */
  def perceptualHashes(spark: SparkSession, media: DataFrame, dim: Int = 8,
                       codec: MediaCodec = FakeCodec): DataFrame = {
    require(dim >= 1 && dim <= 64, "phash packs into one 64-bit word")
    val bits = (0 until dim).map(j =>
      when(element_at(col("features"), j + 1) > lit(1.0 / dim), lit(1L << j))
        .otherwise(lit(0L))).reduce(_ + _)
    extractFeatures(spark, media, dim, codec).toDF()
      .select(col("mediaId").as("id"), bits.as("phash"))
  }

  /** Near-duplicate IMAGE pairs by perceptual hash: the text SimHash
    * machinery verbatim ([[Dedup.simhashPairsFromFps]] — pigeonhole
    * banding on 16-bit chunks, bucket join, exact `bit_count` verify) over
    * [[perceptualHashes]] fingerprints. The multimodal member of the
    * near-dup family: re-encoded/resized copies of an image land within a
    * few bits of each other while distinct images are far.
    */
  def perceptualDupPairs(spark: SparkSession, media: DataFrame, dim: Int = 8,
                         maxHamming: Int = 3,
                         codec: MediaCodec = FakeCodec): DataFrame =
    Dedup.simhashPairsFromFps(
      perceptualHashes(spark, media, dim, codec)
        .withColumnRenamed("phash", "simhash"), maxHamming)

  /** Resize every blob into a bounding box, batched per partition like
    * [[decodeMeta]] (real impl: one scaler context per partition).
    */
  def resize(spark: SparkSession, media: DataFrame, maxW: Int, maxH: Int,
             codec: MediaCodec = FakeCodec): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      it.map(b => codec.resize(b.mediaId, b.payload, maxW, maxH))
    }
  }

  /** Frame sampling for video-like payloads: every `stride`-th byte-block
    * index, capped at the decoded frame count — returns (mediaId, frameIdx)
    * rows. Real impl would emit decoded frame tensors; the plan shape
    * (generator → rows, no shuffle) is identical.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    import spark.implicits._
    decodeMeta(spark, media, codec)
      .select(col("mediaId"),
        explode(sequence(lit(0), col("nFrames") - 1, lit(stride))).as("frameIdx"))
  }

  /** Deterministic REAL multi-frame media table: each id becomes an actual
    * ANIMATED GIF (written frame-by-frame with `javax.imageio`'s sequence
    * writer inside the partition) with `id % 24 + 1` frames of 16×16
    * id-seeded solid color — the frame count is pure arithmetic in the id,
    * so a frame-sampling oracle can predict the sampled indices WITHOUT a
    * decoder while the engine really parses the multi-frame container
    * ([[ImageIoCodec.decodeMeta]]'s `getNumImages(allowSearch = true)`
    * walks the actual GIF frame blocks). This is the honest JDK-only stand-
    * in for video frame sampling: a true video codec (H.264 …) is the one
    * thing the JDK does not ship.
    */
  def syntheticGifTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val nFrames = (id % 24).toInt + 1
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(16, 16,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val c = ((id * 37 + f * 11) % 256).toInt
            val g = img.createGraphics()
            try {
              g.setColor(new java.awt.Color(c, c, c))
              g.fillRect(0, 0, 16, 16)
            } finally g.dispose()
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
        MediaBlob(id, bos.toByteArray)
      }
    }.toDF("mediaId", "payload")
  }

  // ----- audio (REAL RIFF/WAVE via javax.sound.sampled) ---------------------

  /** Typed metadata for a decoded audio blob. `nSamples` is the per-channel
    * frame count; `durationMs` is floor(nSamples * 1000 / sampleRate).
    */
  case class AudioMeta(mediaId: Long, nBytes: Long, format: String,
                       sampleRate: Int, channels: Int, nSamples: Long,
                       durationMs: Long)

  /** Scalar features over the decoded PCM: root-mean-square amplitude,
    * sign-change count, and peak absolute sample value.
    */
  case class AudioFeatures(mediaId: Long, rms: Double, zeroCrossings: Long,
                           peak: Int)

  /** Pluggable audio codec; serializable for mapPartitions closures. */
  trait AudioCodec extends Serializable {
    def decodeMeta(id: Long, bytes: Array[Byte]): AudioMeta
    /** Mono 16-bit samples, or None when the payload is not decodable
      * 16-bit PCM (corrupt container, compressed encoding, multi-channel).
      */
    def decodePcm(id: Long, bytes: Array[Byte]): Option[Array[Short]]
  }

  /** REAL audio codec on `javax.sound.sampled` (JDK built-in; container
    * parsing needs no audio device, so it is headless/executor-safe).
    * Corrupt or unsupported payloads yield `format = "undecodable"` /
    * `None` rather than an exception — same crash-safety contract as
    * [[ImageIoCodec]].
    */
  object WavCodec extends AudioCodec {
    import javax.sound.sampled.AudioSystem

    def decodeMeta(id: Long, bytes: Array[Byte]): AudioMeta =
      try {
        val aff = AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val f = aff.getFormat
        val frames = aff.getFrameLength.toLong
        AudioMeta(id, bytes.length.toLong,
          aff.getType.toString.toLowerCase(java.util.Locale.ROOT),
          f.getSampleRate.toInt, f.getChannels, frames,
          frames * 1000L / f.getSampleRate.toInt)
      } catch { case scala.util.control.NonFatal(_) =>
        AudioMeta(id, bytes.length.toLong, "undecodable", 0, 0, 0L, 0L)
      }

    def decodePcm(id: Long, bytes: Array[Byte]): Option[Array[Short]] =
      try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          val pcm16 = f.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16 && f.getChannels == 1
          if (!pcm16) None
          else {
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              val lo = raw(2 * i) & 0xff
              val hi = raw(2 * i + 1).toInt
              out(i) = (if (f.isBigEndian) (lo << 8) | (hi & 0xff)
                        else (hi << 8) | lo).toShort
              i += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic REAL-audio media table: each id becomes an actual
    * RIFF/WAVE payload (encoded with `javax.sound.sampled` inside the
    * partition) holding a 16-bit mono PCM sawtooth with
    * `k = id%8+1` exact periods of 256 samples at
    * `sampleRate = 8000*(id%3+1)` — sample(i) = ((i mod 256) - 128) * 64.
    * Whole periods make every feature a closed form an oracle can state
    * WITHOUT a decoder (RMS = 64*sqrt(5461.5), zero crossings = 2k-1,
    * peak = 8192), so a hash match proves the true encode→decode
    * round-trip, exactly like [[syntheticImageTable]] does for PNG.
    */
  def syntheticWavTable(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val sampleRate = 8000 * ((id % 3).toInt + 1)
        val n = 256 * ((id % 8).toInt + 1)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = ((i % 256) - 128) * 64
          pcm(2 * i) = (s & 0xff).toByte        // little-endian
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sampleRate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaBlob(id, bos.toByteArray)
      }
    }.toDF("mediaId", "payload")
  }

  /** Decode audio metadata per blob — partition-batched like [[decodeMeta]]. */
  def decodeAudioMeta(spark: SparkSession, media: DataFrame,
                      codec: AudioCodec = WavCodec): Dataset[AudioMeta] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      it.map(b => codec.decodeMeta(b.mediaId, b.payload))
    }
  }

  /** RMS / zero-crossing / peak features over the decoded PCM. Undecodable
    * payloads surface as (NaN-free) zero rows with `peak = -1` so they are
    * filterable without poisoning float aggregates downstream.
    */
  def audioFeatures(spark: SparkSession, media: DataFrame,
                    codec: AudioCodec = WavCodec): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      it.map { b =>
        codec.decodePcm(b.mediaId, b.payload) match {
          case Some(s) if s.nonEmpty =>
            var sumSq = 0.0; var zc = 0L; var peak = 0; var i = 0
            while (i < s.length) {
              val v = s(i).toInt
              sumSq += v.toDouble * v
              if (math.abs(v) > peak) peak = math.abs(v)
              if (i > 0 && ((s(i - 1) < 0 && v >= 0) || (s(i - 1) >= 0 && v < 0)))
                zc += 1
              i += 1
            }
            AudioFeatures(b.mediaId, math.sqrt(sumSq / s.length), zc, peak)
          case _ => AudioFeatures(b.mediaId, 0.0, 0L, -1)
        }
      }
    }
  }
}

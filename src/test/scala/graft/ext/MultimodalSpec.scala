package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMediaTable(
    Tables.documents(spark, sfDir).limit(20), "doc_id", "text")

  test("decodeMeta is deterministic and byte-derived") {
    val m1 = Multimodal.decodeMeta(spark, media).collect().sortBy(_.mediaId)
    val m2 = Multimodal.decodeMeta(spark, media).collect().sortBy(_.mediaId)
    assert(m1.toSeq === m2.toSeq)
    m1.foreach { m =>
      assert(m.width === (m.nBytes % 640).toInt + 1)
      assert(m.height === (m.nBytes % 480).toInt + 1)
      assert(Set("jpeg", "png", "webp").contains(m.format))
    }
  }

  test("extractFeatures emits fixed-dim L1-normalized vectors") {
    val feats = Multimodal.extractFeatures(spark, media, dim = 16).collect()
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3)
    }
  }

  test("resize clamps into the box, preserves aspect, never upscales") {
    val metas = Multimodal.decodeMeta(spark, media).collect()
      .map(m => m.mediaId -> m).toMap
    val out = Multimodal.resize(spark, media, maxW = 64, maxH = 64).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val m = metas(r.mediaId)
      assert(r.width <= 64 && r.height <= 64 && r.width >= 1 && r.height >= 1)
      assert(r.width <= m.width && r.height <= m.height, "no upscaling")
      assert(r.nBytes <= m.nBytes && r.payload.length.toLong === r.nBytes)
      // aspect preserved within floor rounding
      val scale = math.min(1.0, math.min(64.0 / m.width, 64.0 / m.height))
      assert(r.width === math.max(1, math.floor(m.width * scale).toInt))
      assert(r.height === math.max(1, math.floor(m.height * scale).toInt))
    }
    val again = Multimodal.resize(spark, media, 64, 64).collect()
      .map(r => r.mediaId -> ((r.width, r.height, r.nBytes))).toMap
    out.foreach(r => assert(again(r.mediaId) === ((r.width, r.height, r.nBytes)),
      "deterministic"))
    // empty payload: nBytes == payload.length must hold at zero too
    import spark.implicits._
    val empty = Multimodal.asMediaTable(Seq((9L, "")).toDF("id", "t"), "id", "t")
    val r0 = Multimodal.resize(spark, empty, 64, 64).head()
    assert(r0.nBytes === 0L && r0.payload.length === 0)
  }

  test("sampleFrames emits stride-spaced frame indices within bounds") {
    val metas = Multimodal.decodeMeta(spark, media).collect()
      .map(m => m.mediaId -> m.nFrames).toMap
    val frames = Multimodal.sampleFrames(spark, media, stride = 6).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val (id, idx) = (r.getLong(0), r.getInt(1))
      assert(idx % 6 === 0 && idx < metas(id))
    }
  }

  test("ImageIoCodec decodes a REAL PNG: true dimensions, format, 1 frame") {
    val ids = Seq(5L, 100L, 163L).toDF("id")
    val media = Multimodal.syntheticImageTable(spark, ids, "id")
    val metas = Multimodal.decodeMeta(spark, media, Multimodal.ImageIoCodec)
      .collect().map(m => m.mediaId -> m).toMap
    for (id <- Seq(5L, 100L, 163L)) {
      val m = metas(id)
      assert(m.format === "png")
      assert(m.width === (id % 64).toInt + 16, s"id $id width")
      assert(m.height === (id % 48).toInt + 16, s"id $id height")
      assert(m.nFrames === 1)
      assert(m.nBytes > 0)
    }
  }

  test("ImageIoCodec resize: payload is a REAL PNG that re-decodes to the " +
    "claimed (clamped, aspect-preserved) dimensions; small images untouched") {
    val ids = Seq(47L, 2L).toDF("id") // 47 → 63×15... (47%64+16=63, 47%48+16=63x... compute in-test
    val media = Multimodal.syntheticImageTable(spark, ids, "id")
    val out = Multimodal.resize(spark, media, maxW = 32, maxH = 32,
      codec = Multimodal.ImageIoCodec).collect().map(r => r.mediaId -> r).toMap
    for (id <- Seq(47L, 2L)) {
      val w0 = (id % 64).toInt + 16; val h0 = (id % 48).toInt + 16
      val scale = math.min(1.0, math.min(32.0 / w0, 32.0 / h0))
      val r = out(id)
      assert(r.width === math.max(1, math.floor(w0 * scale).toInt))
      assert(r.height === math.max(1, math.floor(h0 * scale).toInt))
      // the resized payload must itself be a decodable PNG of those dims
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth === r.width && img.getHeight === r.height)
    }
  }

  test("ImageIoCodec: corrupt bytes are 'undecodable', never an exception; " +
    "features are content-dependent") {
    val junk = Seq((1L, "this is not an image".getBytes("UTF-8")))
      .toDF("mediaId", "payload")
    val m = Multimodal.decodeMeta(spark, junk, Multimodal.ImageIoCodec).head()
    assert(m.format === "undecodable" && m.width === 0 && m.nFrames === 0)
    // dark (id 0 gradient) vs other gradient phase → different features
    val media = Multimodal.syntheticImageTable(spark, Seq(3L, 40L).toDF("id"), "id")
    val f = Multimodal.extractFeatures(spark, media, dim = 8,
      codec = Multimodal.ImageIoCodec).collect().map(x => x.mediaId -> x.features).toMap
    assert(f(3L).toSeq !== f(40L).toSeq, "different images, different features")
    assert(math.abs(f(3L).sum - 1.0f) < 1e-3, "L1 normalized")
  }

  test("syntheticGifTable writes REAL animated GIFs: decoded frame count " +
    "matches the generator and sampleFrames strides within it") {
    // ids 0 (1 frame), 13 (14 frames), 23 (24 frames)
    val media = Multimodal.syntheticGifTable(spark, Seq(0L, 13L, 23L).toDF("id"), "id")
    val metas = Multimodal.decodeMeta(spark, media, Multimodal.ImageIoCodec)
      .collect().map(m => m.mediaId -> m).toMap
    Seq(0L, 13L, 23L).foreach { id =>
      assert(metas(id).format === "gif")
      assert(metas(id).nFrames === (id % 24).toInt + 1, s"id $id")
      assert(metas(id).width === 16 && metas(id).height === 16)
    }
    val sampled = Multimodal.sampleFrames(spark, media, stride = 6,
        codec = Multimodal.ImageIoCodec)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sampled(0L) === Seq(0))
    assert(sampled(13L) === Seq(0, 6, 12))
    assert(sampled(23L) === Seq(0, 6, 12, 18))
  }

  test("WavCodec decodes a REAL RIFF/WAVE: header fields match the generator") {
    // id 5: rate 8000*(5%3+1)=24000, k=(5%8)+1=6 periods -> 1536 samples
    val media = Multimodal.syntheticWavTable(spark, Seq(5L).toDF("id"), "id")
    val m = Multimodal.decodeAudioMeta(spark, media).head()
    assert(m.format === "wave")
    assert(m.sampleRate === 24000 && m.channels === 1)
    assert(m.nSamples === 1536L)
    assert(m.durationMs === 1536L * 1000 / 24000)
  }

  test("WavCodec PCM round-trip: decoded samples equal the sawtooth formula") {
    val media = Multimodal.syntheticWavTable(spark, Seq(2L).toDF("id"), "id")
    val payload = media.select("payload").head().getAs[Array[Byte]](0)
    val pcm = Multimodal.WavCodec.decodePcm(2L, payload).get
    assert(pcm.length === 256 * ((2 % 8) + 1))
    pcm.zipWithIndex.foreach { case (s, i) =>
      assert(s === (((i % 256) - 128) * 64).toShort, s"sample $i")
    }
  }

  test("audioFeatures: RMS/zero-crossings/peak hit the whole-period closed forms") {
    val media = Multimodal.syntheticWavTable(spark, Seq(0L, 7L).toDF("id"), "id")
    val f = Multimodal.audioFeatures(spark, media)
      .collect().map(x => x.mediaId -> x).toMap
    Seq(0L, 7L).foreach { id =>
      val k = (id % 8) + 1
      assert(f(id).zeroCrossings === 2 * k - 1, s"id $id")
      assert(f(id).peak === 8192)
      assert(math.abs(f(id).rms - 64 * math.sqrt(5461.5)) < 1e-9)
    }
  }

  test("WavCodec: corrupt bytes are 'undecodable'/None, never an exception") {
    val junk = Seq((1L, "this is not audio".getBytes("UTF-8")))
      .toDF("mediaId", "payload")
    val m = Multimodal.decodeAudioMeta(spark, junk).head()
    assert(m.format === "undecodable" && m.sampleRate === 0 && m.nSamples === 0L)
    assert(Multimodal.WavCodec.decodePcm(1L, "junk".getBytes("UTF-8")).isEmpty)
    val feats = Multimodal.audioFeatures(spark, junk).head()
    assert(feats.peak === -1, "undecodable rows are filterable, not poisonous")
  }

  test("perceptualHashes: same-rotation stripe images hash identically, " +
    "rotations differ by >= 4 bits; undecodable hashes 0") {
    import spark.implicits._
    val ids = (0L until 16L).toDF("doc_id")
    val media = Multimodal.syntheticStripeImageTable(spark, ids, "doc_id")
    val hashes = Multimodal.perceptualHashes(spark, media, dim = 8,
        codec = Multimodal.ImageIoCodec)
      .as[(Long, Long)].collect().toMap
    (0L until 16L).foreach { id =>
      assert(hashes(id) === hashes(id % 4), s"rotation class must share a hash: $id")
    }
    val classes = (0L until 4L).map(hashes)
    assert(classes.distinct.size === 4)
    for (a <- classes; b <- classes if a != b)
      assert(java.lang.Long.bitCount(a ^ b) >= 4,
        s"distinct rotations must be >= 4 bits apart: $a vs $b")
    val junk = Seq((99L, "not an image".getBytes("UTF-8"))).toDF("mediaId", "payload")
    assert(Multimodal.perceptualHashes(spark, junk, dim = 8,
      codec = Multimodal.ImageIoCodec).as[(Long, Long)].head()._2 === 0L)
  }

  test("perceptualDupPairs keeps exactly the same-rotation pairs at maxHamming 3") {
    import spark.implicits._
    val ids = (0L until 12L).toDF("doc_id")
    val media = Multimodal.syntheticStripeImageTable(spark, ids, "doc_id")
    val pairs = Multimodal.perceptualDupPairs(spark, media, dim = 8, maxHamming = 3,
        codec = Multimodal.ImageIoCodec)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 12L; b <- 0L until 12L if a < b && a % 4 == b % 4
    } yield (a, b)).toSet
    assert(pairs === expected)
  }
}

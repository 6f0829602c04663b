package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class MultimodalSpec extends AnyFunSuite with SparkSpec {

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
}

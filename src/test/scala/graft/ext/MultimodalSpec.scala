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

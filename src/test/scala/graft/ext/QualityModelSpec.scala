package graft.ext

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualityModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Independent JDK-digest reimplementation of the bucket + mean-logit
    * contract (the spec twin of the md5 portable base word).
    */
  private def expectedQNum(text: String, w: Array[Long], biasUnits: Long): (Long, Long) = {
    // NB: a blank doc tokenizes to one EMPTY token (split semantics shared
    // with the oracle's regexp_split_to_array(trim(...))) — it still votes
    val toks = text.trim.split("\\s+")
    val md = MessageDigest.getInstance("MD5")
    val sum = toks.map { t =>
      val hex = md.digest(t.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      val word = java.lang.Long.parseUnsignedLong(hex, 16)
      w(((word & 2147483647L) % w.length).toInt)
    }.sum
    (biasUnits * toks.length + sum, toks.length.toLong)
  }

  test("score matches an independent digest-based reimplementation") {
    val w = QualityModel.defaultWeights(64)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark spark spark spark"),
      (3L, "a"),
    ).toDF("doc_id", "text")
    val out = QualityModel.score(docs, "doc_id", "text", w, biasUnits = 25)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    for ((id, text) <- Seq(1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "spark spark spark spark", 3L -> "a")) {
      val (qn, n) = expectedQNum(text, w, 25)
      assert(out(id)._1 === qn, s"q_num doc $id")
      assert(out(id)._2 === n, s"n_tokens doc $id")
      assert(out(id)._3 === qn.toDouble / (QualityModel.WeightScale * n), s"q_score doc $id")
      assert(out(id)._4 === (qn >= 0), s"keep flag doc $id")
    }
  }

  test("blank document matches the empty-token contract (split parity with the oracle)") {
    val w = QualityModel.defaultWeights(8)
    val out = QualityModel.score(Seq((1L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", w, biasUnits = -125)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    val (qn, n) = expectedQNum("   ", w, -125)
    assert(out.map(r => (r._1, r._2, r._3, r._5)).toSeq === Seq((1L, qn, n, qn >= 0)))
  }

  test("default weights are reproducible and span both signs") {
    val w = QualityModel.defaultWeights(64)
    assert(w.toSeq === QualityModel.defaultWeights(64).toSeq)
    assert(w.exists(_ > 0) && w.exists(_ < 0))
    assert(w.forall(x => x >= -500L && x <= 500L))
  }
}

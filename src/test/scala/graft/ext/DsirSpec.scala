package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** DSIR importance scoring: target-like documents must outrank
  * target-unlike ones, the integer scoring must be partitioning-stable,
  * and the log variant must agree with the scaled variant on ORDER.
  */
class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // two sharply separated domains: "target" docs repeat one bigram
  // vocabulary, "other" docs a disjoint one
  private def corpus = (
    (1L to 20L).map(i => (i, "alpha beta alpha beta alpha beta", "en")) ++
    (21L to 40L).map(i => (i, "gamma delta gamma delta gamma delta", "xx")) ++
    Seq((41L, "alpha beta gamma delta", "xx"))  // mixed doc
  ).toDF("doc_id", "text", "lang")

  test("target-domain docs score higher than off-domain docs; mixed in between") {
    val docs = corpus
    val scores = Dsir.importanceScores(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", 256)
      .select($"id", ($"w_sum_scaled".cast("double") / $"n_grams").as("avg"))
      .as[(Long, Double)].collect().toMap
    val target = (1L to 20L).map(scores).head
    val off = (21L to 40L).map(scores).head
    val mixed = scores(41L)
    assert(target > mixed && mixed > off,
      s"expected target $target > mixed $mixed > off $off")
  }

  test("scaled scores are partitioning-stable; log variant ranks identically") {
    val docs = corpus
    val a = Dsir.importanceScores(docs, docs.filter($"lang" === "en"), "doc_id", "text", 256)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val b = Dsir.importanceScores(docs.repartition(7), docs.filter($"lang" === "en"),
        "doc_id", "text", 256)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
    val rankScaled = a.sortBy { case (id, n, w) => (-(w.toDouble / n), id) }.map(_._1)
    val logw = Dsir.importanceLogWeights(docs, docs.filter($"lang" === "en"),
        "doc_id", "text", 256)
      .select($"id", ($"log_w" / $"n_grams").as("avg"))
      .as[(Long, Double)].collect().toSeq
    val rankLog = logw.sortBy { case (id, avg) => (-avg, id) }.map(_._1)
    // per-bucket monotone map ⇒ per-doc AVERAGE ranks agree on this corpus
    // (docs are single-domain or the even mix — no cross-bucket ties)
    assert(rankScaled === rankLog)
  }

  test("importanceScoresWithin ≡ the two-corpus form when target ⊆ corpus") {
    val docs = corpus
    val general = Dsir.importanceScores(docs, docs.filter($"lang" === "en"),
        "doc_id", "text", 256)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val within = Dsir.importanceScoresWithin(docs, $"lang" === "en",
        "doc_id", "text", 256)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(within === general)
  }

  test("resampleTop takes the m most target-like docs deterministically") {
    val docs = corpus
    val scored = Dsir.importanceScores(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", 256)
    val top = Dsir.resampleTop(scored, 20).select("id").as[Long].collect().toSet
    assert(top === (1L to 20L).toSet, "the 20 pure-target docs outrank all others")
  }
}

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

  // --- property: scaled and log variants rank-agree on well-separated fixtures ---
  //
  // Randomized fixtures (deterministic seeds): two disjoint bigram
  // vocabularies T and O, pure-T docs, pure-O docs, and mixed docs built as
  // one T-block + one O-block with total block count fixed (so every mixed
  // doc has the same gram count and the single cross-boundary bigram
  // contributes identically to each). Per-bucket the scaled score is a
  // monotone map of the likelihood ratio, so per-doc AVERAGES must order
  // identically under both variants wherever the scaled order is strict
  // (integer quantization may tie what log keeps strict — ties may resolve
  // either way, strict INVERSIONS are the bug being pinned). Fixtures with
  // a cross-class md5 bucket collision are regenerated: a collision merges
  // a T gram with an O gram and the separation premise itself is void.
  private def jvmBucket(gram: String, b: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map(x => f"$x%02x").mkString, 16) % b
  }

  test("property: log and scaled variants never strictly invert; classes separate (6 seeds)") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val numBuckets = if (rnd.nextBoolean()) 4096 else 65536

      // regenerate vocab until no cross-class bucket collision
      var tWords: Seq[String] = null; var oWords: Seq[String] = null
      var ok = false
      while (!ok) {
        tWords = Seq.fill(2)(s"t${rnd.alphanumeric.take(6).mkString.toLowerCase}")
        oWords = Seq.fill(2)(s"o${rnd.alphanumeric.take(6).mkString.toLowerCase}")
        val tGrams = Seq(s"${tWords(0)} ${tWords(1)}", s"${tWords(1)} ${tWords(0)}")
        val oGrams = Seq(s"${oWords(0)} ${oWords(1)}", s"${oWords(1)} ${oWords(0)}")
        val tb = tGrams.map(jvmBucket(_, numBuckets)).toSet
        val ob = oGrams.map(jvmBucket(_, numBuckets)).toSet
        ok = tWords.distinct.size == 2 && oWords.distinct.size == 2 &&
          (tb intersect ob).isEmpty
      }
      val tPhrase = s"${tWords(0)} ${tWords(1)}"
      val oPhrase = s"${oWords(0)} ${oWords(1)}"
      def rep(p: String, n: Int) = Seq.fill(n)(p).mkString(" ")

      val nT = 3 + rnd.nextInt(5)
      val nO = 3 + rnd.nextInt(5)
      val fracs = rnd.shuffle(Seq(2, 4, 6, 8)).take(2 + rnd.nextInt(3)) // tenths
      var id = 0L
      def nextId() = { id += 1; id }
      val rows =
        (1 to nT).map(_ => (nextId(), rep(tPhrase, 4 + rnd.nextInt(6)), "en")) ++
        (1 to nO).map(_ => (nextId(), rep(oPhrase, 4 + rnd.nextInt(6)), "xx")) ++
        fracs.map(f => (nextId(), rep(tPhrase, f) + " " + rep(oPhrase, 10 - f), "xx"))
      val docs = rows.toDF("doc_id", "text", "lang")
      val targetSel = docs.filter($"lang" === "en")

      val scaled = Dsir.importanceScores(docs, targetSel, "doc_id", "text", numBuckets)
        .select($"id", ($"w_sum_scaled".cast("double") / $"n_grams").as("avg"))
        .as[(Long, Double)].collect().toMap
      val logw = Dsir.importanceLogWeights(docs, targetSel, "doc_id", "text", numBuckets)
        .select($"id", ($"log_w" / $"n_grams").as("avg"))
        .as[(Long, Double)].collect().toMap
      assert(scaled.keySet === logw.keySet, s"seed $seed: id sets diverge")

      // (a) no strict inversion between the two score families
      val ids = scaled.keySet.toSeq.sorted
      for (i <- ids; j <- ids if i < j) {
        val ds = scaled(i) - scaled(j)
        val dl = logw(i) - logw(j)
        assert(!(ds > 0.5 && dl < -1e-9) && !(ds < -0.5 && dl > 1e-9),
          s"seed $seed: strict inversion on ($i,$j): scaled Δ=$ds log Δ=$dl")
      }

      // (b) the separation premise holds strictly, under BOTH variants:
      // pure-target > every mixed (in descending fraction order) > pure-off
      val tIds = rows.take(nT).map(_._1)
      val oIds = rows.slice(nT, nT + nO).map(_._1)
      val mIdsByFrac = rows.drop(nT + nO).map(_._1).zip(fracs).sortBy(-_._2).map(_._1)
      for (m <- Seq(scaled, logw)) {
        val chain = tIds.map(m).min +: mIdsByFrac.map(m) :+ oIds.map(m).max
        assert(chain.zip(chain.tail).forall { case (a, b) => a > b },
          s"seed $seed: separation chain not strictly decreasing: $chain")
      }
    }
  }

  test("resampleTop takes the m most target-like docs deterministically") {
    val docs = corpus
    val scored = Dsir.importanceScores(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", 256)
    val top = Dsir.resampleTop(scored, 20).select("id").as[Long].collect().toSet
    assert(top === (1L to 20L).toSet, "the 20 pure-target docs outrank all others")
  }
}

package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Sequence packing + corpus-LM scoring (SURVEY.md §2b training-batch
  * assembly).
  */
class PackSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("packSequences: spans, boundaries, and per-shard restart") {
    // one shard: 3+4+5 tokens at seqLen 4 → doc1 [0,2], doc2 [3,6], doc3 [7,11]
    val df = Seq(
      (1L, "a b c"),
      (2L, "a b c d"),
      (3L, "a b c d e"),
      (4L, "x y"), // second shard restarts at offset 0
    ).toDF("id", "text")
    val out = Pack.packSequences(df, "id", "text", seqLen = 4,
        shardCol = when($"id" <= 3, 0L).otherwise(1L))
      .select("id", "shard", "n_tokens", "start_seq", "end_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 0L, 3L, 0L, 0L, 1L)))
    assert(out(2L) === ((2L, 0L, 4L, 0L, 1L, 2L)), "tokens 3..6 straddle seqs 0 and 1")
    assert(out(3L) === ((3L, 0L, 5L, 1L, 2L, 2L)))
    assert(out(4L) === ((4L, 1L, 2L, 0L, 0L, 1L)), "new shard packs from zero")
  }

  test("packSequences: exact-boundary doc does not bleed into the next sequence") {
    val df = Seq((1L, "a b c d"), (2L, "e f")).toDF("id", "text")
    val out = Pack.packSequences(df, "id", "text", seqLen = 4, shardCol = lit(0L))
      .select("id", "start_seq", "end_seq")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((0L, 0L)), "doc filling seq 0 exactly ends in seq 0")
    assert(out(2L) === ((1L, 1L)))
  }

  test("bigramLmScores: hand-computed MLE probabilities") {
    // corpus: "a b" ×2, "a c" ×1 → c(a)=3, c(b)=1, c(c)=1,
    // c("a b")=2, c("a c")=1; p(b|a)=2/3, p(c|a)=1/3
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val out = Pack.bigramLmScores(df, "id", "text")
      .select("id", "n_bigrams", "p_sum_scaled")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pAB = math.round(2.0 / 3.0 * 1e9)
    val pAC = math.round(1.0 / 3.0 * 1e9)
    assert(out(1L) === ((1L, pAB)))
    assert(out(2L) === ((1L, pAB)))
    assert(out(3L) === ((1L, pAC)))
  }

  test("bigramLmScores: broadcast path and unbounded-vocab fallback agree exactly") {
    val df = (0L until 60L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 5} end"))
      .toDF("id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "n_bigrams", "p_sum_scaled", "lm_avg_scaled")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val bcast = Pack.bigramLmScores(df, "id", "text")
    val fallback = Pack.bigramLmScores(df, "id", "text", maxBroadcastTypes = 0L)
    assert(rows(bcast) === rows(fallback),
      "size-gated paths must be bit-identical (integer-scaled before summing)")
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "small probability table must broadcast onto the un-shuffled bigram stream")
  }

  test("bigramLmScores: trailing-empty token (text ending in tab) keeps its real bigram") {
    // "abc\t" tokenizes as ["abc", ""] (SQL trim strips 0x20 only; the \s+
    // split keeps the trailing empty token) — its REAL positional bigram is
    // the trailing-space string "abc ", which string-shape sentinel
    // tagging would misclassify and silently drop from the probability
    // table. Structural (last-position) tagging must keep it:
    // cu(abc) = 2, c("abc ") = 1 → doc 1 scores p = 1/2.
    val df = Seq((1L, "abc\t"), (2L, "abc x")).toDF("id", "text")
    val out = Pack.bigramLmScores(df, "id", "text")
      .select("id", "n_bigrams", "p_sum_scaled")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val half = math.round(0.5 * 1e9)
    assert(out.get(1L) === Some((1L, half)),
      "the real trailing-space bigram must survive sentinel filtering")
    assert(out.get(2L) === Some((1L, half)))
  }

  test("bigramLmScores: docs with fewer than two tokens get no row") {
    val df = Seq((1L, "solo"), (2L, "two tokens")).toDF("id", "text")
    val ids = Pack.bigramLmScores(df, "id", "text").select("id").as[Long].collect()
    assert(ids.toSeq === Seq(2L))
  }

  test("weightedKeep: allow-list drop, determinism, and rate monotonicity") {
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val kept = Splits.weightedKeep(df, "id", "source", rates)
      .select("id", "source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("src3", 0) === 0, "unlisted source dropped")
    assert(bySrc.getOrElse("src2", 0) === 0, "rate-0 source dropped")
    assert(bySrc("src0") === 100, "rate 1.0 keeps every key")
    // rate >= 1.0 must be literal TRUE, not a strict digest compare — a
    // `< 'ffffffff'` threshold silently drops ~1-in-2^32 keys at scale
    assert(Splits.oracleKeepPredicate("id", "source", rates).contains("THEN TRUE"),
      "rate-1.0 oracle arm must be literal TRUE")
    assert(bySrc.getOrElse("src1", 0) > 20 && bySrc("src1") < 80,
      s"rate 0.5 keeps about half, got ${bySrc.get("src1")}")
    val again = Splits.weightedKeep(df, "id", "source", rates)
      .select("id", "source").as[(Long, String)].collect()
    assert(kept.sorted.toSeq === again.sorted.toSeq, "digest decision is stable")
  }
}

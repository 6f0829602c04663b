package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def train(corpus: Seq[String], k: Int): Seq[String] =
    Bpe.trainMerges(spark, corpus.toDF("text"), "text", k)
      .orderBy("rank").select("pair").as[String].collect().toSeq

  test("hand corpus: counts weight by word frequency, ties break lexicographically") {
    // low×3, lower×1, lowest×1: (l,o)=(o,w)=5 tie -> lex picks "l o";
    // then (lo,w)=5; then (low,e)=2; then the 1-count tie -> "lowe r"
    val rules = train(Seq("low low low", "lower lowest"), 4)
    assert(rules === Seq("l o", "lo w", "low e", "lowe r"))
  }

  test("adjacent occurrences both merge in one pass (the (tok) encoding's point)") {
    // "aaaa" -> (a)(a)(a)(a): merging "a a" must yield (aa)(aa) — a
    // boundary-sharing rendering merges only the first pair and the
    // second rule would come out "a a"/"aa a" instead of "aa aa"
    val rules = train(Seq("aaaa"), 2)
    assert(rules === Seq("a a", "aa aa"))
  }

  test("encodeCounts: merges shrink unit counts; non-alpha tokens count 1") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "low low 42!"), (2L, "lower")).toDF("doc_id", "text")
    // rules (l,o) then (lo,w): "low" -> (low) = 1 unit; "lower" -> (low)(e)(r) = 3
    val got = Bpe.encodeCounts(docs, "doc_id", "text", Seq("l o", "lo w"))
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L + 1L + 1L), (2L, 3L))) // low, low, "42!"
    // no rules: every char is a unit
    val raw = Bpe.encodeCounts(docs, "doc_id", "text", Seq.empty)
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(raw === Seq((1L, 3L + 3L + 1L), (2L, 5L)))
  }

  test("merge budget past exhaustion stops early instead of crashing") {
    // "ab" x1: one learnable pair, then every word is a single symbol
    assert(train(Seq("ab"), 5) === Seq("a b"))
    // an empty/filtered-out corpus learns nothing
    assert(train(Seq("42 99 !!"), 3) === Seq.empty)
  }

  test("distributed fallback learns the same rules as the driver fast path") {
    // driverMaxVocab=0 forces the distributed loop; default takes the
    // in-memory loop — same greedy, same tie-break, same merge semantics
    val corpus = Seq("low low low lower lowest", "newest newest widest",
      "aaaa abab low newest", "wide wider widest newest")
    val k = 6
    val dist = Bpe.trainMerges(spark, corpus.toDF("text"), "text", k, driverMaxVocab = 0L)
      .orderBy("rank").select("pair").as[String].collect().toSeq
    assert(dist === train(corpus, k))
  }

  test("non-alphabetic and case-folded words: filtered and merged consistently") {
    // "Ab AB ab" all fold to "ab"; "x9" and "!" are dropped by the
    // alphabetic filter, so the only learnable pair is (a,b)
    val rules = train(Seq("Ab AB ab x9 !"), 1)
    assert(rules === Seq("a b"))
  }
}

package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** tokenEntropy and bm25TopK semantics on hand-checkable corpora. */
class TextRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("tokenEntropy: hand examples") {
    val df = Seq(
      (1L, "a a a a"),  // degenerate: H = 0
      (2L, "a a b b"),  // two-symbol uniform: H = 1
      (3L, "a b c d"),  // four-symbol uniform: H = 2
    ).toDF("doc_id", "text")
    val h = TextOps.tokenEntropy(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(h(1L) === 0.0 && h(2L) === 1.0 && h(3L) === 2.0)
  }

  test("bm25TopK: hand-computed scores, tf saturation direction") {
    // N=2, df(x)=2, avgdl=2 → idf = ln(1 + 0.5/2.5) = ln(1.2); with
    // k1=1.2, b=0.75 and dl=avgdl the norm term is 1, so
    // d1 (tf=1): ln(1.2)·2.2/(1+1.2) = ln(1.2)
    // d2 (tf=2): ln(1.2)·4.4/(2+1.2) = ln(1.2)·1.375
    val df = Seq((1L, "x y"), (2L, "x x")).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(df, "doc_id", "text", Seq("x"), k = 10)
      .as[(Long, Double)].collect().toMap
    val idf = math.log(1.2)
    assert(math.abs(out(1L) - BigDecimal(idf).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(2L) - BigDecimal(idf * 1.375).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(2L) > out(1L), "higher tf of a query term ranks higher")
  }

  test("bm25TopK: docs without any query term score 0 and k caps output") {
    val df = Seq(
      (1L, "spark rules the cluster"), (2L, "nothing relevant here at all"),
      (3L, "spark spark again"), (4L, "also irrelevant"),
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(df, "doc_id", "text", Seq("spark"), k = 3)
      .as[(Long, Double)].collect()
    assert(out.length == 3, "limit k")
    val m = out.toMap
    assert(m(3L) > m(1L), "both hits outrank the zero docs; higher tf first")
    assert(m.filterKeys(Set(2L, 4L).contains).values.forall(_ == 0.0))
  }
}

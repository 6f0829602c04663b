package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("tokenBudgetPerGroup: greedy prefix per group, overshoot ≤ one doc") {
    val df = (1L to 50L).map(i => (i, s"src${i % 2}", 100L)).toDF("doc_id", "source", "n")
    val kept = Sampling.tokenBudgetPerGroup(df, "source", "doc_id", "n", budget = 1000L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // uniform 100-token docs, 1000 budget → exactly 10 per source
    assert(kept === Map("src0" -> 10L, "src1" -> 10L))
    // non-uniform: budget line crossed mid-doc keeps that doc (overshoot)
    val df2 = Seq((1L, "s", 600L), (2L, "s", 600L), (3L, "s", 600L)).toDF("doc_id", "source", "n")
    val total = Sampling.tokenBudgetPerGroup(df2, "source", "doc_id", "n", budget = 1000L)
      .agg(org.apache.spark.sql.functions.sum($"n")).as[Long].head()
    assert(total === 1200L, "second doc crosses the line and is kept; third is not")
  }

  test("tokenBudgetPerGroup: deterministic across repartitionings") {
    val df = (1L to 200L).map(i => (i, s"src${i % 3}", (i % 7) * 10 + 10)).toDF("doc_id", "source", "n")
    val a = Sampling.tokenBudgetPerGroup(df, "source", "doc_id", "n", 500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.tokenBudgetPerGroup(df.repartition(13), "source", "doc_id", "n", 500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }
}

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

  test("qualityBucketSample: equal-population tiers, per-tier rates, keep-all top") {
    // scores 1..300 → fences at 100.something and 200.something; tier 2
    // (top third) keeps everything, tier 0 keeps nothing, tier 1 thins
    val df = (1L to 300L).map(i => (i, i.toDouble)).toDF("doc_id", "score")
    val out = Sampling.qualityBucketSample(df, "score", "doc_id", Seq(0.0, 0.5, 1.0))
      .select("doc_id", "bucket").as[(Long, Long)].collect().toSeq
    val byBucket = out.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    assert(!byBucket.contains(0L), "rate 0.0 keeps nothing from the bottom tier")
    assert(byBucket(2L).size === 100, "rate 1.0 keeps the whole top tier")
    assert(byBucket(2L).forall(_ >= 201L), "top tier is the top-score third")
    val mid = byBucket.getOrElse(1L, Seq.empty)
    assert(mid.nonEmpty && mid.size < 100, "rate 0.5 thins the middle tier")
    assert(mid.forall(id => id >= 101L && id <= 200L))
  }

  test("qualityBucketSample: fence-equal rows take the lower tier; NULL scores drop") {
    // all-tied scores: both fences equal the value, every row's tier is 0
    val tied = (1L to 30L).map(i => (i, 5.0)).toDF("doc_id", "score")
    val t = Sampling.qualityBucketSample(tied, "score", "doc_id", Seq(1.0, 1.0, 1.0))
      .select("bucket").distinct().as[Long].collect().toSeq
    assert(t === Seq(0L), "fence-equal rows go below every fence")
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("doc_id", "score")
    val kept = Sampling.qualityBucketSample(withNull, "score", "doc_id", Seq(1.0))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L), "NULL score is outside every band")
  }

  test("qualityBucketSample: deterministic across repartitionings") {
    val df = (1L to 400L).map(i => (i, (i % 37).toDouble)).toDF("doc_id", "score")
    val a = Sampling.qualityBucketSample(df, "score", "doc_id", Seq(0.3, 0.7))
      .select("doc_id", "bucket").as[(Long, Long)].collect().sorted.toSeq
    val b = Sampling.qualityBucketSample(df.repartition(11), "score", "doc_id", Seq(0.3, 0.7))
      .select("doc_id", "bucket").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b && a.nonEmpty)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TopKPairsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKPairs.topKPairs($"s", $"id", k).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "e")))
      .select($"g", $"e.score", $"e.id", ($"pos" + 1).as("rank"))
      .as[(Long, Double, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))

  test("keeps the k best per group, ordered (score desc, id asc)") {
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.7, 11L), (1L, 0.95, 12L), (1L, 0.1, 13L),
      (2L, 0.5, 20L),
    ).toDF("g", "s", "id")
    val out = topk(df, 2)
    assert(out === Seq((1L, 0.95, 12L, 1), (1L, 0.9, 10L, 2), (2L, 0.5, 20L, 1)))
  }

  test("equal scores tie-break on ascending id") {
    val df = Seq((1L, 0.5, 30L), (1L, 0.5, 10L), (1L, 0.5, 20L)).toDF("g", "s", "id")
    assert(topk(df, 2).map(_._3) === Seq(10L, 20L))
  }

  test("parity with the row_number window form across a real shuffle") {
    // many partitions force partial heaps through serialize/merge
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      // duplicate scores on purpose: rint to a coarse grid
      (i % 23L, math.rint(rnd.nextDouble() * 50) / 50, i.toLong)
    }
    val df = rows.toDF("g", "s", "id").repartition(16)
    val viaAgg = topk(df, 7)
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"id".asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 7)
      .select($"g", $"s", $"id", $"rank")
      .as[(Long, Double, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(viaAgg === viaWindow)
  }

  test("NaN scores rank first (Spark desc-sort placement) and never poison the heap") {
    // NaN arriving FIRST used to block all later candidates at the heap root
    val df = Seq((1L, Double.NaN, 99L), (1L, 0.1, 1L), (1L, 0.9, 2L), (1L, 0.95, 3L))
      .toDF("g", "s", "id").coalesce(1)
    val out = topk(df, 2)
    assert(out.map(_._3) === Seq(99L, 3L), "NaN first, then the true best")
    // parity with the window form's NaN placement
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"id".asc)
    val viaWindow = df.withColumn("r", row_number().over(w)).filter($"r" <= 2)
      .orderBy($"r").select($"id").as[Long].collect().toSeq
    assert(viaWindow === out.map(_._3))
  }

  test("null scores are skipped; all-null group emits an empty array") {
    val df = Seq[(Long, Option[Double], Long)](
      (1L, Some(0.4), 1L), (1L, None, 2L), (2L, None, 3L),
    ).toDF("g", "s", "id")
    val out = topk(df, 3)
    assert(out === Seq((1L, 0.4, 1L, 1)), "null never outranks; empty group vanishes")
  }

  test("map-side partial aggregation is in the plan (no sort of candidates)") {
    val df = Seq((1L, 0.5, 10L)).toDF("g", "s", "id").repartition(4)
    val agg = df.groupBy("g").agg(TopKPairs.topKPairs($"s", $"id", 3).as("tk"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs"), s"no partial aggregate:\n$plan")
    assert(!plan.contains("Sort "), s"window-style sort crept in:\n$plan")
  }
}

package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** globalIndex: quantile-bucketed two-phase numbering must equal the
  * single-partition `row_number() OVER (ORDER BY k)` baseline exactly —
  * while never planning an `Exchange SinglePartition` itself.
  */
class IndexOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("globalIndex == global row_number baseline on orders") {
    val got = IndexOps.globalIndex(orders, "o_orderkey")
      .select($"o_orderkey", $"idx")
    val want = orders.select($"o_orderkey",
      row_number().over(Window.orderBy($"o_orderkey")).cast("long").as("idx"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("index is contiguous 1..n") {
    val idx = IndexOps.globalIndex(orders, "o_orderkey").select($"idx")
      .as[Long].collect().sorted
    assert(idx.head == 1L && idx.last == idx.length.toLong
      && idx.length == orders.count())
  }

  test("data path never serializes through one task") {
    val plan = IndexOps.globalIndex(orders, "o_orderkey")
      .queryExecution.executedPlan.toString
    // the DATA takes: bucket assignment (narrow) -> broadcast join with the
    // offsets relation -> row_number window PARTITIONED BY BUCKET. The only
    // SinglePartition exchange allowed is the offsets side-relation (the
    // running sum over <= numBuckets count rows — 64 longs, not data).
    assert("SinglePartition".r.findAllIn(plan).size <= 1,
      s"global numbering must not serialize data through one task:\n$plan")
    assert(plan.contains("partitionspec=[__gx_bucket") ||
      plan.contains("[partitionspec=[__gx_bucket") ||
      plan.toLowerCase.contains("__gx_bucket"),
      s"row_number window must be partitioned by the range bucket:\n$plan")
    // and the broadcast side really is broadcast (no shuffle of the data to
    // meet a 64-row relation)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"offsets relation must broadcast:\n$plan")
  }

  test("globalIndexBy == composite row_number baseline (mixed directions, ties on first key)") {
    // frequency-style shape: heavy ties on the first key so the second
    // (string, asc) genuinely decides — the vocab id-assignment contract
    val df = Seq(("the", 3L), ("cat", 2L), ("sat", 2L), ("dog", 1L),
      ("ran", 1L), ("ant", 2L), ("zzz", 3L)).toDF("term", "n")
    val got = IndexOps.globalIndexBy(df, Seq($"n".desc, $"term".asc),
      outName = "id", numBuckets = 3)
      .select($"term", $"id").as[(String, Long)].collect().toMap
    val want = df.select($"term", row_number().over(
      Window.orderBy($"n".desc, $"term".asc)).cast("long").as("id"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got("the") == 1L && got("zzz") == 2L && got("ant") == 3L)
  }

  test("globalIndexBy data path never serializes through one task") {
    val df = orders.select($"o_orderkey", $"o_custkey")
    val plan = IndexOps.globalIndexBy(df,
      Seq($"o_custkey".desc, $"o_orderkey".asc))
      .queryExecution.executedPlan.toString
    // same contract as globalIndex: the only SinglePartition exchange
    // allowed is the offsets side (running sum over <= numBuckets counts);
    // the data rides the frozen range buckets
    assert("SinglePartition".r.findAllIn(plan).size <= 1,
      s"composite global numbering must not serialize data through one task:\n$plan")
    assert(plan.toLowerCase.contains("__gx_bucket"),
      s"row_number window must be partitioned by the range bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"offsets relation must broadcast:\n$plan")
  }

  test("globalIndexBy degenerate shapes: numBuckets=1, buckets >> rows, empty") {
    val tiny = Seq(5L -> "a", 3L -> "b", 3L -> "a").toDF("k", "s")
    val order = Seq($"k".desc, $"s".asc)
    for (b <- Seq(1, 1000))
      assert(IndexOps.globalIndexBy(tiny, order, numBuckets = b)
        .select($"k", $"s", $"idx").as[(Long, String, Long)].collect()
        .sortBy(_._3).toSeq == Seq((5L, "a", 1L), (3L, "a", 2L), (3L, "b", 3L)))
    assert(IndexOps.globalIndexBy(tiny.filter($"k" < 0), order).count() == 0L)
  }

  test("degenerate shapes: numBuckets=1, buckets >> rows, empty input") {
    val tiny = Seq(5L, 3L, 9L).toDF("k")
    assert(IndexOps.globalIndex(tiny, "k", numBuckets = 1)
      .select($"k", $"idx").as[(Long, Long)].collect().sortBy(_._2)
      .toSeq == Seq((3L, 1L), (5L, 2L), (9L, 3L)))
    assert(IndexOps.globalIndex(tiny, "k", numBuckets = 1000)
      .select($"k", $"idx").as[(Long, Long)].collect().sortBy(_._2)
      .toSeq == Seq((3L, 1L), (5L, 2L), (9L, 3L)))
    assert(IndexOps.globalIndex(tiny.filter($"k" < 0), "k").count() == 0L)
  }
}

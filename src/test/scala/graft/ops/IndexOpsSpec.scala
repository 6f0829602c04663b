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

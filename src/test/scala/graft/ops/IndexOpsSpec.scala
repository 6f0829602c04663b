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

  test("plan has no SinglePartition exchange") {
    val plan = IndexOps.globalIndex(orders, "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global numbering must not serialize through one task:\n$plan")
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

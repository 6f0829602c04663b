package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Bucket-decomposed point-in-interval join: boundary semantics, no
  * duplicate pairs across interval-covered buckets, equivalence with the
  * naive theta join.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("inclusive lo, exclusive hi, empty intervals match nothing") {
    val points = Seq(5L, 10L, 14L, 15L).toDF("p").withColumn("pid", col("p"))
    val intervals = Seq(
      (1L, 10L, 15L),  // [10, 15)
      (2L, 20L, 20L),  // empty
      (3L, 30L, 25L),  // inverted -> empty
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", width = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 1L), (14L, 1L)),
      "lo inclusive, hi exclusive; empty/inverted intervals dropped")
  }

  test("interval spanning many buckets yields each pair exactly once") {
    val points = spark.range(0, 100).toDF("p")
    val intervals = Seq((1L, 10L, 90L)).toDF("iid", "lo", "hi") // spans ~20 width-4 buckets
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", width = 4)
    assert(out.count() === 80, "points 10..89, once each — no cross-bucket dupes")
    assert(out.select("p").distinct().count() === 80)
  }

  test("equivalent to the naive theta join on dense random-ish data") {
    val points = spark.range(0, 500).toDF("p")
      .withColumn("p", pmod(col("p") * 2654435761L, lit(1000L)))
    val intervals = spark.range(0, 60).toDF("iid")
      .withColumn("lo", pmod(col("iid") * 40503L, lit(950L)))
      .withColumn("hi", col("lo") + pmod(col("iid") * 69069L, lit(60L)))
    val fast = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", width = 16)
      .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(fast === naive)
    assert(naive.nonEmpty, "fixture actually exercises matches")
  }
}

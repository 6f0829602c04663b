package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}
import graft.ops.AggOps

/** KLL quantile sketches and theta set-operation sketches: merge semantics,
  * accuracy vs exact answers, and the serialization path (repartitioning
  * forces partial buffers through serialize/deserialize/merge).
  */
class MergeSketchesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("KLL: merged rollup quantiles track exact quantiles within rank bound") {
    val li = Tables.lineitem(spark, sfDir)
    val deciles = (1 to 9).map(_ / 10.0)
    val probs = deciles.map(_ - 0.05) ++ deciles.map(_ + 0.05)
    val approx = AggOps.kllRollupQuantiles(
      AggOps.kllSketches(li, Seq("l_returnflag", "l_linestatus"), "l_extendedprice"),
      Seq("l_returnflag"), deciles)
    val exact = li.groupBy("l_returnflag")
      .agg(PercentileCompact.percentileCompact(col("l_extendedprice"), probs).as("e"))
    val rows = approx.join(exact, Seq("l_returnflag"))
      .select("l_returnflag", "quantiles", "e")
      .collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val q = r.getSeq[Double](1)
      val e = r.getSeq[Double](2)
      (0 until 9).foreach { i =>
        assert(e(i) <= q(i) && q(i) <= e(i + 9),
          s"decile ${i + 1} of ${r.getString(0)}: ${q(i)} outside [${e(i)}, ${e(i + 9)}]")
      }
    }
  }

  test("KLL: rollup of fine sketches == sketch built directly on the rollup key") {
    // merge is lossless over sketch STATE: merging per-(flag,status)
    // sketches must give the same sketch contents as one per-flag pass
    // (same values fed in either way; KLL merge is deterministic given
    // identical inputs only up to compaction randomness, so compare the
    // extracted quantiles against the exact values' bound instead of bytes)
    val li = Tables.lineitem(spark, sfDir).repartition(7) // force partial merges
    val direct = AggOps.kllRollupQuantiles(
      AggOps.kllSketches(li, Seq("l_returnflag"), "l_extendedprice"),
      Seq("l_returnflag"), Seq(0.5))
    val rolled = AggOps.kllRollupQuantiles(
      AggOps.kllSketches(li, Seq("l_returnflag", "l_linestatus"), "l_extendedprice"),
      Seq("l_returnflag"), Seq(0.5))
    val exact = li.groupBy("l_returnflag")
      .agg(PercentileCompact.percentileCompact(col("l_extendedprice"),
        Seq(0.45, 0.55)).as("e"))
    val joined = direct.withColumnRenamed("quantiles", "qd")
      .join(rolled.withColumnRenamed("quantiles", "qr"), Seq("l_returnflag"))
      .join(exact, Seq("l_returnflag")).collect()
    joined.foreach { r =>
      val qd = r.getSeq[Double](1)(0); val qr = r.getSeq[Double](2)(0)
      val e = r.getSeq[Double](3)
      assert(e(0) <= qd && qd <= e(1), s"direct median $qd outside [${e(0)}, ${e(1)}]")
      assert(e(0) <= qr && qr <= e(1), s"rolled median $qr outside [${e(0)}, ${e(1)}]")
    }
  }

  test("KLL: all-NULL group yields NULL quantiles; NULL values skipped") {
    val df = Seq((1, Some(1.0)), (1, Some(2.0)), (1, None: Option[Double]),
      (2, None), (2, None)).toDF("g", "v")
    val out = AggOps.kllRollupQuantiles(
      AggOps.kllSketches(df, Seq("g"), "v"), Seq("g"), Seq(0.5))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(2).isEmpty)         // empty sketch -> NULL array
    assert(out(1).isDefined)       // NULL input rows skipped, not poisoning
  }

  test("theta: pairwise overlap/diff/union are exact under nominal entries") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L),
      ("c", 9L)).toDF("k", "uid")
    val got = AggOps.thetaOverlaps(
      AggOps.thetaSketches(df, Seq("k"), "uid"), "k")
      .orderBy("key_a", "key_b")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got === Array(
      ("a", "b", 2L, 1L, 4L),   // {1,2,3} vs {2,3,4}
      ("a", "c", 0L, 3L, 4L),   // disjoint
      ("b", "c", 0L, 3L, 4L)))
  }

  test("theta trailing distinct: RANGE frame honors bucket gaps; counts exact under saturation") {
    val df = Seq(
      (1L, 10L), (1L, 11L),
      (2L, 11L), (2L, 12L),
      // bucket 3 missing entirely — a gap the RANGE frame must respect
      (4L, 13L),
      (5L, 10L), (5L, 13L)).toDF("day", "uid")
    val got = AggOps.thetaTrailingDistinct(df, "day", "uid", trailing = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 2L,   // {10,11}
      2L -> 3L,   // {10,11} ∪ {11,12}
      4L -> 1L,   // bucket 3 absent: frame [3,4] holds only {13}
      5L -> 2L))  // {13} ∪ {10,13} = {10,13}
  }

  test("theta: sketches merge across partitions (serialize path) and union-agg rolls up") {
    import graft.functions.ThetaSketchOps._
    val ev = Tables.events(spark, sfDir).repartition(7)
    val exact = ev.select(countDistinct(col("user_id"))).as[Long].head()
    // fine sketches per event_type, union-rolled to one global sketch
    val rolled = AggOps.thetaSketches(ev, Seq("event_type"), "user_id")
      .agg(thetaEstimate(thetaUnionAgg(col("theta_sketch"))).as("est"))
      .as[Double].head()
    assert(math.round(rolled) === exact)
  }
}

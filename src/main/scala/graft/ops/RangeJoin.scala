package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: every (point, interval) pair with
  * `lo <= p < hi` — the time-range/IP-range/bin lookup operator the
  * reference era of engines special-cases (DuckDB's IEJoin) and Spark
  * expresses only as a theta join, which plans as a broadcast
  * nested-loop — O(|points| × |intervals|) compares regardless of
  * selectivity.
  *
  * Scale path here: BUCKET DECOMPOSITION. Points hash to their
  * `p div width` bucket; each interval replicates to every bucket it
  * covers; an equi-join on the bucket id then only compares co-bucketed
  * pairs, and the exact predicate filters the boundary stragglers. Every
  * matching pair meets in EXACTLY one bucket (the point's), so no dedup
  * pass is needed. Cost: one shuffle each side on the bucket key +
  * interval replication by ceil(len/width) — tunable: `width` ≈ the median
  * interval length keeps replication ~2× while bounding bucket fan-in.
  * Degenerate giant intervals (≫ width) are the skew knob to watch; cap
  * them upstream or raise `width`.
  */
object RangeJoin {

  /** @param points    side with the point column (all columns kept)
    * @param intervals side with [lo, hi) columns (all columns kept; column
    *                  names must be disjoint from `points`)
    * @param pointCol  integral point column on `points`
    * @param loCol     inclusive lower bound on `intervals`
    * @param hiCol     exclusive upper bound; empty intervals (hi <= lo)
    *                  match nothing
    * @param width     bucket width in the column's units (> 0)
    *
    * Bucket ids are computed as `floor(p / width)` in double arithmetic —
    * exact for |values| < 2^53 (every epoch-day/second/micro magnitude);
    * beyond that pre-scale the column.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val p = col(pointCol)
    val lo = col(loCol)
    val hi = col(hiCol)
    def bucketOf(c: Column): Column = floor(c.cast("long") / width).cast("long")

    val bucketedPoints = points.withColumn("__bucket", bucketOf(p))
    val bucketedIntervals = intervals
      .filter(hi > lo) // empty intervals cover no bucket
      .withColumn("__bucket",
        explode(sequence(bucketOf(lo), bucketOf(hi - 1))))

    bucketedPoints
      .join(bucketedIntervals, Seq("__bucket"))
      .filter(p >= lo && p < hi)
      .drop("__bucket")
  }
}

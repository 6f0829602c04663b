package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row numbering at scale.
  *
  * `row_number() OVER (ORDER BY k)` with no PARTITION BY is the classic
  * scale-killer: Spark plans it as `Exchange SinglePartition` and funnels the
  * entire dataset through one task. This operator produces the IDENTICAL
  * output with a quantile-bucketed two-phase plan:
  *
  *   1. one pass computes ~`numBuckets` approximate quantile boundaries of
  *      the order key (sketch-sized driver state, not data);
  *   2. each row is assigned a contiguous range bucket by comparing against
  *      the broadcast boundary literals (no shuffle);
  *   3. a narrow `groupBy(bucket).count` yields per-bucket row counts
  *      (≤ numBuckets rows to the driver), whose running sum gives each
  *      bucket's global offset;
  *   4. `row_number` partitioned BY BUCKET (a ~1/numBuckets slice, not the
  *      world) plus the bucket's offset is the global index.
  *
  * The output is exactly the global rank regardless of where the sampled
  * boundaries land: buckets are contiguous ranges of the order key, every
  * row is assigned with the same boundary literals in both phases, and
  * within-bucket numbering is offset by the exact count of all earlier
  * buckets. Quantile error only skews bucket SIZES (bounded by
  * `relativeError`), never the result.
  */
object IndexOps {

  /** 1-based contiguous index in `orderCol` order. `orderCol` must be a
    * non-null numeric column and a total order (unique values) — equal keys
    * would make the global rank ambiguous on any engine.
    *
    * The input plan is EXECUTED THREE TIMES (quantile sketch, exact bucket
    * counts, final query): `df` must be deterministic across actions —
    * parquet scans and pure transforms are; `rand()`, unstable sampling, or
    * a source mutating between actions are not, and would silently gap or
    * duplicate indices. For such inputs pass `stabilize = true`, which
    * materializes the bucketed relation once (localCheckpoint) and derives
    * all three passes from the frozen copy.
    */
  /** `relativeError` only skews bucket BALANCE (a 0.01 error on a 1/64
    * boundary misplaces ≤1% of rows into the neighbor bucket), never the
    * output — the exact per-bucket counts correct any sketch error. The
    * default is deliberately loose: a tighter sketch costs a slower
    * first pass for no output difference.
    */
  def globalIndex(df: DataFrame, orderCol: String, outName: String = "idx",
                  numBuckets: Int = 64, relativeError: Double = 0.01,
                  stabilize: Boolean = false): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    if (stabilize) {
      // freeze ONCE up front: the sketch, the counts and the final pass all
      // read the same materialized rows, so a non-deterministic input
      // cannot disagree with itself between actions
      return globalIndex(df.localCheckpoint(), orderCol, outName,
        numBuckets, relativeError, stabilize = false)
    }
    // phase 1: boundary sketch. Distinct-sorted; duplicate quantiles (heavy
    // hitters / tiny inputs) would only create empty buckets, drop them.
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
    val boundaries =
      if (numBuckets == 1) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, relativeError).distinct.sorted
    // bucket = number of boundaries strictly below the key. Rows equal to a
    // boundary all land in the same bucket, so ranges stay contiguous.
    val bucketOf = boundaries.foldLeft(lit(0))((acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0))
    val withBucket = df.withColumn("__gx_bucket", bucketOf)
    // phase 2: exact per-bucket counts -> running offsets (driver state is
    // <= numBuckets longs; the data itself never leaves the executors)
    val counts = withBucket.groupBy("__gx_bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (b, n) => val o = b -> acc; acc += n; o }.toMap
    }
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.toSeq.sortBy(_._1).flatMap { case (b, o) =>
          Seq(lit(b), lit(o)) }: _*),
        col("__gx_bucket"))
    val w = Window.partitionBy("__gx_bucket").orderBy(col(orderCol).asc)
    withBucket
      .withColumn(outName, offsetExpr + row_number().over(w).cast("long"))
      .drop("__gx_bucket")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a pipeline runs before it
  * trusts an input (null rates, cardinalities, value ranges). One row per
  * profiled column, long format:
  * (column, n_rows, n_null, n_distinct, min_value, max_value) with the
  * extrema rendered as strings so heterogeneous column types share one
  * schema.
  *
  * Shape at 100 TB: one aggregation PER COLUMN, each over a single-column
  * pruned scan (`groupBy(col)` partial-aggregates map-side, so the shuffle
  * carries one row per distinct value per partition — not full rows), then
  * a union of k one-row results. This deliberately avoids the single-pass
  * `k × count(DISTINCT ...)` form: Catalyst plans multiple distincts via an
  * Expand that multiplies every input row (k+1)× BEFORE the exchange, so
  * its shuffle volume is (k+1)·rows — strictly worse than k pruned
  * columnar scans whose shuffles carry only distinct values. (Measured at
  * sf0.1: 3.3 s for the Expand plan vs sub-second for this one, on the
  * same 4-column profile.)
  *
  * `n_distinct` is exact by default (it's what an oracle can gate);
  * `approxDistinct = true` swaps HLL++ for the exact grouped count when a
  * column's full-scale cardinality makes exactness a shuffle you don't
  * want to pay — that variant IS single-scan (HLL sketches merge, no
  * Expand is involved).
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String],
                approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    if (approxDistinct) {
      // sketches merge: ONE wide aggregation over ONE scan (HLL++ involves
      // no Expand), then an explode to the long format — k columns cost one
      // pass, not k
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        val v = col(c)
        Seq(count(v).as(s"__nn_$i"),
          approx_count_distinct(v).as(s"__nd_$i"),
          min(v).cast("string").as(s"__mn_$i"),
          max(v).cast("string").as(s"__mx_$i"))
      }
      val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
      return wide.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column"), col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$i")).as("n_null"),
          col(s"__nd_$i").as("n_distinct"),
          col(s"__mn_$i").as("min_value"), col(s"__mx_$i").as("max_value"))
      }: _*)).as("__s")).select(col("__s.*"))
    }
    val perCol = cols.map { c =>
      // two-level exact distinct: groupBy(v) combines map-side (shuffle =
      // distinct values per partition), the one-row rollup then derives
      // every stat from the grouped counts. count(v)/min/max ignore NULL
      // groups exactly as their direct forms do.
      df.select(col(c).as("__v")).groupBy(col("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .agg(
          coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"), // empty input: 0 groups, sum is NULL
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L)).as("n_null"),
          count(col("__v")).as("n_distinct"),
          min(col("__v")).cast("string").as("min_value"),
          max(col("__v")).cast("string").as("max_value"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }
    perCol.reduce(_ unionByName _)
  }

  /** Equi-DEPTH histogram: `b` buckets holding ~equal row counts, bounded by
    * the column's exact percentiles (the data-skew-proof sibling of the
    * equi-width `floor(x/width)` histogram — one hot region can't empty
    * every other bin).
    *
    * Shape at 100 TB: the b−1 EXACT fences come from
    * [[QuantileSelect.exactPercentiles]] (two-round distributed selection —
    * bounded state everywhere, never the whole-column value-histogram
    * aggregate built-in `percentile` pays) and are inlined as literal
    * comparisons: the bucketing pass is pure codegen'd scan + one count
    * aggregate. (A broadcast-cross-join of the one-row fence relation was
    * measured 6× slower — BroadcastNestedLoopJoin leaves whole-stage
    * codegen.) Rows equal to a fence go to the LOWER bucket (strict `<`),
    * so bucket ranges stay contiguous under ties.
    */
  /** MULTI-ACTION CONTRACT: the fence selection executes `df` 2–3 times
    * (sketch, counts+band, possible fallback) and the bucketing pass once
    * more — `df` must be deterministic across actions. Parquet scans and
    * pure transforms are; `rand()`-derived columns or unstable sampling are
    * NOT and would yield fences that disagree with the pass that bins
    * against them. For such inputs pass `stabilize = true`, which
    * materializes `df` once (localCheckpoint) and derives every pass from
    * the frozen copy — the same escape hatch as
    * [[IndexOps.globalIndex]]'s `stabilize`.
    */
  def equiDepthHistogram(df0: DataFrame, valueCol: String, b: Int,
                         stabilize: Boolean = false): DataFrame = {
    require(b >= 2, "need at least 2 buckets")
    val df = if (stabilize) df0.localCheckpoint() else df0
    val fences: Seq[Double] = QuantileSelect.exactPercentiles(
      df, valueCol, (1 until b).map(j => j.toDouble / b))
    // bucket = number of fences strictly below the value — binary-search
    // codegen expression, not a b-deep CASE WHEN fold (see SortedLowerBound)
    val bucket = graft.functions.SortedLowerBound.bucket(
      col(valueCol).cast("double"), fences.distinct.sorted)
    // NULLs are outside every percentile band (the percentile aggregate
    // already ignores them) — excluded rather than silently binned at 0
    df.filter(col(valueCol).isNotNull)
      .withColumn("bucket", bucket.cast("long"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }
}

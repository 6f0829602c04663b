package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2a W1 + §2b ranking/frames).
  *
  * Every window here partitions by a key before ordering — a global
  * (unpartitioned) window would serialize 100 TB through one task and is
  * deliberately not offered.
  */
object WindowOps {

  /** W1 — previous-value delta per key (`transform_stocks_job.py:193-199`):
    * `lag(close) over (partition by ticker order by date)`, then
    * `close - lag` as the daily variation, helper column dropped.
    *
    * `orderBy` must be a total order within each partition (add a unique
    * tie-break) so lag is deterministic.
    */
  def lagDelta(df: DataFrame, partitionKeys: Seq[String], orderBy: Seq[Column],
               valueCol: String, outName: String): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn(outName, col(valueCol) - col("__prev"))
      .drop("__prev")
  }

  /** §2b ranking — top-N rows per group under a total order (top movers per
    * sector pattern). `row_number` (not `rank`) so exactly N survive.
    */
  def topNPerGroup(df: DataFrame, partitionKeys: Seq[String], orderBy: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** §2b moving aggregate over a row frame (moving average pattern):
    * e.g. 7-row trailing mean of close per ticker.
    */
  def movingAgg(df: DataFrame, partitionKeys: Seq[String], orderBy: Seq[Column],
                agg: Column, precedingRows: Int, outName: String): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(orderBy: _*)
      .rowsBetween(-precedingRows.toLong, 0)
    df.withColumn(outName, agg.over(w))
  }

  /** Time-series resample + forward fill: snap an irregular event stream
    * onto a regular `stepSeconds` grid per key, from each key's first
    * bucket to its last, carrying the latest observed value forward across
    * gaps — the quote-series gap-fill every market pipeline runs before
    * indicators (a bar with no trades inherits the previous close).
    *
    * Per bucket the LAST event wins (`epochSecCol` desc, then `valueCol`
    * desc as the tie-break — total for numeric values). The first buckets
    * of a key are never NULL: the spine starts at the key's first
    * observation.
    *
    * Shape at 100 TB: one aggregate for bucket-last values, one tiny
    * per-key span aggregate whose `sequence()` explode GENERATES the spine
    * (spine rows are never shuffled as input), an equi-join back, and one
    * key-window fill. Everything keys on (key, bucket) — no range join,
    * no driver loop.
    */
  def resampleFfill(df: DataFrame, keyCol: String, epochSecCol: String,
                    valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    // floor semantics via subtract-pmod (exact long arithmetic): `div`
    // truncates toward zero, so pre-epoch (negative) seconds would snap to
    // the NEXT bucket and diverge from DuckDB's `//` floor division
    val bucketed = df.select(col(keyCol).as("key"),
        expr(s"CAST($epochSecCol AS BIGINT) - pmod(CAST($epochSecCol AS BIGINT), $stepSeconds)").as("bucket"),
        col(epochSecCol).cast("long").as("__s"), col(valueCol).as("__v"))
    val lastPerBucket = AggOps.dedupByKeyOrdered(bucketed, Seq("key", "bucket"),
        Seq(col("__s").desc, col("__v").desc))
      .select(col("key"), col("bucket"), col("__v"))
    val spine = lastPerBucket.groupBy("key")
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"),
        lit(stepSeconds))).as("bucket"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(lastPerBucket, Seq("key", "bucket"), "left")
      .withColumn("value_ffill", last(col("__v"), ignoreNulls = true).over(w))
      .select(col("key").as(keyCol), col("bucket"), col("value_ffill"))
  }

  /** Time-series resample + LINEAR interpolation: same grid/spine as
    * [[resampleFfill]] (per-bucket LAST observation wins), but empty buckets
    * take the straight line between the surrounding observed buckets instead
    * of carrying the previous value — pandas
    * `resample().last().interpolate()` semantics. The spine spans each key's
    * first..last OBSERVED bucket, so every empty bucket has both a previous
    * and a next observation; no extrapolation is ever produced.
    *
    * Shape at 100 TB: identical to resampleFfill (bucket-last aggregate,
    * generated spine, equi-join back) plus two frames over the SAME
    * per-key window partitioning — Catalyst evaluates both in one
    * WindowExec pair on one shuffle of (key, bucket).
    */
  def resampleInterp(df: DataFrame, keyCol: String, epochSecCol: String,
                     valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val bucketed = df.select(col(keyCol).as("key"),
        expr(s"CAST($epochSecCol AS BIGINT) - pmod(CAST($epochSecCol AS BIGINT), $stepSeconds)").as("bucket"),
        col(epochSecCol).cast("long").as("__s"), col(valueCol).as("__v"))
    val lastPerBucket = AggOps.dedupByKeyOrdered(bucketed, Seq("key", "bucket"),
        Seq(col("__s").desc, col("__v").desc))
      .select(col("key"), col("bucket"), col("__v"))
    val spine = lastPerBucket.groupBy("key")
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"),
        lit(stepSeconds))).as("bucket"))
    val back = Window.partitionBy(col("key")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Forward-looking "next observation" deliberately expressed as a RUNNING
    // frame over the DESCENDING order, not `rowsBetween(0, unboundedFollowing)`:
    // Spark's UnboundedFollowingWindowFunctionFrame re-scans the partition
    // tail for every row — O(n²) per key partition (measured 59 s vs ~2 s at
    // sf0.1). `last(...) ignoreNulls` over desc-running is semantically
    // identical to `first(...) ignoreNulls` over the following frame, and the
    // extra sort shares the same (key) shuffle partitioning.
    val fwd = Window.partitionBy(col("key")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val obsBucket = when(col("__v").isNotNull, col("bucket"))
    spine.join(lastPerBucket, Seq("key", "bucket"), "left")
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("__nv", last(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nb", last(obsBucket, ignoreNulls = true).over(fwd))
      // observed buckets: the value itself (pb == nb == bucket would divide
      // by zero); empty buckets: straight line between (pb,pv) and (nb,nv).
      // The arithmetic shape is mirrored verbatim in the DuckDB oracle so
      // both engines run the identical IEEE op sequence before rounding.
      .withColumn("value_interp",
        when(col("__v").isNotNull, col("__v"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv"))
            * (col("bucket") - col("__pb")) / (col("__nb") - col("__pb"))))
      .select(col("key").as(keyCol), col("bucket"), col("value_interp"))
  }
}

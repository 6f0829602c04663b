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
}

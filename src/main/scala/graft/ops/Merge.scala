package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC merge — apply a change batch (insert / update / delete flags) onto a
  * snapshot: the warehouse upsert primitive behind every incremental load.
  *
  * Semantics (last-write-wins within one batch is the CALLER's contract —
  * feed one row per key, e.g. via [[AggOps.dedupByKeyOrdered]] on a change
  * sequence number):
  *  - key present in `changes` with op = delete → row removed
  *  - key present with any other op → the change row replaces the snapshot
  *    row (updates) or is added (inserts — key absent from the snapshot)
  *  - key absent from `changes` → snapshot row passes through
  *
  * Shape at 100 TB: ONE anti-join of the snapshot against change keys (a
  * change batch is small relative to the snapshot — AQE broadcasts it, so
  * the snapshot never shuffles) + a union with the surviving change rows.
  * No full outer join, no window.
  */
object Merge {

  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keyCol: String, opCol: String,
                   deleteOp: String = "D"): DataFrame = {
    require(changes.columns.contains(opCol), s"changes needs an '$opCol' column")
    val kept = snapshot.join(changes.select(col(keyCol)), Seq(keyCol), "left_anti")
    val applied = changes.filter(col(opCol) =!= deleteOp).drop(opCol)
    kept.unionByName(applied)
  }

  /** SCD Type-2 version history from a change log: each change row becomes
    * a version valid from its own timestamp until the key's NEXT change
    * (`valid_to` NULL = current version). `tieCols` must make the per-key
    * order total — equal-timestamp changes would otherwise version
    * nondeterministically.
    *
    * Shape at 100 TB: one window shuffle on the dimension key. The change
    * log arrives append-only, so the window never re-reads history that a
    * production run would partition by key range.
    */
  def scd2Versions(changes: DataFrame, keyCol: String, tsCol: String,
                   tieCols: Seq[String] = Seq.empty): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Snapshot diff: classify every key as added / removed / changed between
    * two table versions, carrying old and new values side by side —
    * the audit step before any CDC apply, and the cheapest way to answer
    * "what did yesterday's load actually change".
    *
    * Unchanged rows (every compare column null-safe-equal) are dropped.
    * ONE full outer hash join on the key; comparisons are scan-side. NULL
    * vs non-NULL in a compare column IS a change (`<=>` semantics).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compare at least one column")
    val o = oldDf.select((keyCol +: compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"old_$c").toMap)
      .withColumnRenamed(keyCol, "__ko")
    val n = newDf.select((keyCol +: compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"new_$c").toMap)
      .withColumnRenamed(keyCol, "__kn")
    val same = compareCols.map(c => col(s"old_$c") <=> col(s"new_$c")).reduce(_ && _)
    o.join(n, col("__ko") === col("__kn"), "full_outer")
      .withColumn("change",
        when(col("__ko").isNull, "added")
          .when(col("__kn").isNull, "removed")
          .otherwise("changed"))
      .filter(col("__ko").isNull || col("__kn").isNull || !same)
      .withColumn(keyCol, coalesce(col("__ko"), col("__kn")))
      .drop("__ko", "__kn")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2a J1–J2).
  *
  * Scale posture: dimension sides are explicitly `broadcast()` — at 100 TB
  * the fact side must never shuffle for a kilobyte-scale dim table, and an
  * explicit hint keeps the plan stable even if stats are missing or the dim
  * grows past `spark.sql.autoBroadcastJoinThreshold`'s estimate.
  */
object JoinOps {

  /** J1 — left equi-join of a fact table with a small dimension
    * (`extract_stocks_job.py:144`: 10-row (sector,ticker,company) dim joined
    * onto every price row). Dim side broadcast → BroadcastHashJoin, zero
    * shuffle of the fact table.
    */
  def enrichWithDim(fact: DataFrame, dim: DataFrame, usingCols: Seq[String]): DataFrame =
    fact.join(broadcast(dim), usingCols, "left")

  /** J2 — attach per-group aggregates back onto detail rows
    * (`transform_stocks_job.py:177-181`: groupBy(setor).agg(...) left-joined
    * back on setor).
    *
    * Implemented as window aggregates over `Window.partitionBy(keys)` —
    * identical semantics to the reference's agg-then-self-join but ONE
    * shuffle instead of two (no separate aggregate + join exchange), which
    * is the difference between 1 and 2 full-data shuffles at 100 TB.
    */
  def withGroupAggregates(df: DataFrame, keys: Seq[String], aggs: Seq[(String, Column)]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    aggs.foldLeft(df) { case (d, (name, agg)) => d.withColumn(name, agg.over(w)) }
  }

  /** J2 (literal form) — the reference's exact shape: aggregate then
    * left-join back on the keys. Kept for fidelity tests; prefer
    * `withGroupAggregates` in pipelines.
    *
    * No broadcast hint: the aggregated side's cardinality is the GROUP-BY
    * key's, which a library caller may make arbitrarily high — a forced
    * broadcast would OOM the driver. AQE sees the aggregate's actual output
    * size at runtime and picks a broadcast join by itself whenever the side
    * is genuinely small (asserted in AggWindowSpec).
    */
  def aggJoinBack(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val agged = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    df.join(agged, keys, "left")
  }

  /** J4 — existence filter (SQL EXISTS): rows of `fact` with a match in
    * `filterRel`, fact columns only, no duplication from multiple matches.
    * No broadcast hint: the filter relation is caller-sized (often a dim,
    * sometimes another fact's keys) — AQE broadcasts it when it is actually
    * small, and a semi join never materializes the right side's columns
    * either way.
    */
  def semiJoin(fact: DataFrame, filterRel: DataFrame, usingCols: Seq[String]): DataFrame =
    fact.join(filterRel, usingCols, "left_semi")

  /** J5 — negated existence (SQL NOT EXISTS). Same shape as [[semiJoin]];
    * note `left_anti` has NOT EXISTS semantics (NULL-safe), not `NOT IN`'s
    * NULL-poisoned ones.
    */
  def antiJoin(fact: DataFrame, filterRel: DataFrame, usingCols: Seq[String]): DataFrame =
    fact.join(filterRel, usingCols, "left_anti")

  /** Incremental JOIN view maintenance (insert-only deltas): the new rows
    * of (A ∪ ΔA) ⋈ (B ∪ ΔB) are exactly
    *   ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    * — the algebraic delta rule that lets a standing join VIEW absorb a
    * daily increment at delta cost: every term has a delta on at least one
    * side (broadcast it), so the standing 100 TB relations are probed, not
    * recomputed, and the maintained view is `old ∪ this`. The companion of
    * [[graft.ops.AggOps.buildAggState]]'s aggregate maintenance, for joins.
    */
  def incrementalJoinDelta(a: DataFrame, deltaA: DataFrame,
                           b: DataFrame, deltaB: DataFrame,
                           usingCols: Seq[String]): DataFrame =
    org.apache.spark.sql.functions.broadcast(deltaA).join(b, usingCols)
      .unionByName(a.join(
        org.apache.spark.sql.functions.broadcast(deltaB), usingCols))
      .unionByName(deltaA.join(
        org.apache.spark.sql.functions.broadcast(deltaB), usingCols))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7 "100-TB posture"): salting rewrites for
  * hot keys, complementing AQE's runtime skew-join splitting.
  *
  * AQE handles skewed SORT-MERGE JOINS automatically
  * (`spark.sql.adaptive.skewJoin`), but a skewed AGGREGATION still funnels
  * every row of a hot key through one task's hash-map before spill. The
  * two-phase salted rewrite bounds per-task key volume by `buckets` at the
  * cost of a second (tiny) exchange over the pre-aggregated rows.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates.
    *
    * Phase 1 groups by (keys, salt) where salt = hash(discriminator) mod
    * `buckets` — a hot key's rows spread over `buckets` tasks. Phase 2
    * re-aggregates the per-salt partials by the real keys. Caller supplies
    * each aggregate as (outName, phase1Agg, phase2Combine) — e.g.
    * (sum, sum), (count, sum), (min, min).
    *
    * Result is row-identical to the direct groupBy (same combine algebra);
    * float sums re-associate, so round before oracle comparison as usual.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], discriminator: Column,
                      buckets: Int,
                      aggs: Seq[(String, Column => Column, Column => Column)],
                      valueCols: Seq[String]): DataFrame = {
    require(aggs.length == valueCols.length)
    val salted = df.withColumn("__salt", pmod(xxhash64(discriminator), lit(buckets.toLong)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2(col(valueCols.head)).as(s"__p_${aggs.head._1}"),
        aggs.tail.zip(valueCols.tail).map { case ((name, p1, _), v) =>
          p1(col(v)).as(s"__p_$name")
        }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (name, _, p2) =>
          p2(col(s"__p_$name")).as(name)
        }: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a moderate right side
    * (too big to broadcast, too hot to shuffle raw): left rows get a
    * per-row salt, the right side is replicated `buckets` times, and the
    * join key becomes (key, salt) — a hot key's probe rows land on
    * `buckets` tasks instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, usingCols: Seq[String],
                 discriminator: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer are NOT salt-sound: replicated right rows with
    // non-occurring salts would surface as spurious unmatched rows.
    // Normalize the way Spark's JoinType does (lowercase, strip _) so every
    // alias Spark accepts is accepted here too.
    val sound = Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
    require(sound.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti joins, not '$joinType' " +
        "(right/full outer would emit one unmatched row per salt replica)")
    val l = left.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(buckets.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    l.join(r, usingCols :+ "__salt", joinType).drop("__salt")
  }
}

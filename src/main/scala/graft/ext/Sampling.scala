package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training pipelines (SURVEY.md §2b extension
  * surface). Like [[Splits]], determinism is the point: `df.sample()` is
  * partitioning-dependent, so a rerun or a repartition changes the sample;
  * here the sample is a pure function of the data.
  */
object Sampling {

  /** Up to `perStratum` rows per stratum, chosen by md5-order of the key
    * (uniform, engine-portable) with the key itself as the tie-break —
    * the deterministic form of stratified subsampling. One shuffle on the
    * stratum key; stratum skew is bounded by the same AQE skew handling as
    * any window.
    *
    * CONTRACT: `keyCol` must be unique within each stratum. Rows sharing
    * (stratum, key) have identical sort keys, so which one ranks first is
    * partition-arrival order — exactly the instability this operator
    * exists to prevent. Dedup on the key first (A4/A5) if unsure.
    */
  def stratifiedByHash(df: DataFrame, strataCol: String, keyCol: String,
                       perStratum: Int): DataFrame = {
    require(perStratum >= 1)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Per-group TOKEN-BUDGET subsample: take rows in md5-order of the key
    * until each group's cumulative `weightCol` reaches `budget` — the
    * "N tokens per source" knob of a data recipe, where document counts
    * mean nothing and token counts are what the trainer consumes.
    *
    * A row is kept while the budget is not yet exhausted BEFORE it
    * (`cum − w < budget`), so the budget may be overshot by at most one
    * document — the standard greedy contract (taking partial documents
    * would change their content). Same determinism + uniqueness contract
    * on `keyCol` as [[stratifiedByHash]]; one shuffle on the group key.
    */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                          weightCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")).asc, col(keyCol).asc)
    df.withColumn("__cum", sum(col(weightCol)).over(w))
      .filter(col("__cum") - col(weightCol) < budget)
      .drop("__cum")
  }
}

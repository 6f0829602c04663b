package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML feature-engineering operators over training tables. */
object FeatureOps {

  /** Leave-one-out target encoding: replace a categorical column with the
    * mean of the target over OTHER rows of the same category —
    * (Σ_cat − own) / (n_cat − 1) — the standard leakage guard for mean
    * encoding (a plain category mean includes each row's own target, and a
    * model memorizes rare categories through it). Singleton categories
    * encode NULL: there is no "other rows" signal, and emitting the global
    * prior instead is a policy the caller should choose explicitly.
    *
    * Shape at 100 TB: ONE partial-aggregated groupBy over the category key
    * (cardinality-sized result) broadcast-joined back onto the fact scan —
    * the per-row arithmetic is scan-side; no window, no per-row shuffle of
    * the fact table.
    */
  def targetEncodeLoo(df: DataFrame, categoryCol: String, targetCol: String,
                      outCol: String = "te_loo"): DataFrame = {
    val stats = df.groupBy(col(categoryCol))
      .agg(sum(col(targetCol)).as("__s"), count(col(targetCol)).as("__n"))
    df.join(broadcast(stats), Seq(categoryCol))
      .withColumn(outCol,
        when(col("__n") < 2 || col(targetCol).isNull, lit(null))
          .otherwise((col("__s") - col(targetCol)) / (col("__n") - 1)))
      .drop("__s", "__n")
  }
}

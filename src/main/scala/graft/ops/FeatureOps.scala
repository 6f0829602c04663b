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

  /** Mutual information between two categorical columns — the
    * feature-selection screen (how much does knowing X tell you about Y)
    * that at 100 TB must come from ONE contingency aggregate, not
    * per-category scans: a single (x, y) groupBy count, marginals as
    * window sums over the tiny contingency relation, then
    * MI = Σ p(x,y)·ln(p(x,y)/(p(x)·p(y))) summed over its rows. NULL
    * categories participate as their own level (they carry information);
    * result is one row, in nats.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__nxy"))
    cells
      .withColumn("__n", sum(col("__nxy")).over(w.partitionBy()))
      .withColumn("__nx", sum(col("__nxy")).over(w.partitionBy(col("__x"))))
      .withColumn("__ny", sum(col("__nxy")).over(w.partitionBy(col("__y"))))
      .select(((col("__nxy") / col("__n")) *
        log((col("__nxy") * col("__n")) / (col("__nx") * col("__ny"))))
        .as("__term"))
      .agg(sum(col("__term")).as("mi_nats"))
  }

  /** Cramér's V association between two categoricals — [[mutualInformation]]'s
    * normalized companion (0..1, comparable across tables): χ² from the
    * same single contingency aggregate, V = √(χ²/(n·(min(r,c)−1))).
    */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__nxy"))
    val m = cells
      .withColumn("__n", sum(col("__nxy")).over(w.partitionBy()))
      .withColumn("__nx", sum(col("__nxy")).over(w.partitionBy(col("__x"))))
      .withColumn("__ny", sum(col("__nxy")).over(w.partitionBy(col("__y"))))
    // expected count E = nx·ny/n; observed-zero cells are ABSENT from the
    // contingency relation, so add their Σ E over missing cells via the
    // identity Σ_all E = n: chi2 = Σ_present (O−E)²/E + (n − Σ_present E)
    m.agg(
        sum(pow(col("__nxy") - col("__nx") * col("__ny") / col("__n"), 2) /
          (col("__nx") * col("__ny") / col("__n"))).as("__chiP"),
        (max(col("__n")) - sum(col("__nx") * col("__ny") / col("__n"))).as("__chiZ"),
        max(col("__n")).as("__n"),
        countDistinct(col("__x")).as("__r"),
        countDistinct(col("__y")).as("__c"))
      .select(sqrt((col("__chiP") + col("__chiZ")) /
        (col("__n") * (least(col("__r"), col("__c")) - 1))).as("cramers_v"))
  }

  /** K-fold out-of-fold target encoding — the practitioner form of
    * [[targetEncodeLoo]] (LOO is its k = n limit): each row is encoded
    * with the category mean computed over the OTHER folds,
    * (Σ_cat − Σ_cat,fold) / (n_cat − n_cat,fold). The fold column comes
    * from the caller (any deterministic assigner — `Splits.splitByHash`,
    * a key modulus, …): fold policy and encoding stay decoupled.
    *
    * One (category, fold) aggregate — cardinality × k rows — rolled up to
    * per-category totals WITHOUT rescanning the facts, both broadcast back
    * onto the scan; NULL when the out-of-fold slice is empty.
    */
  def targetEncodeKFold(df: DataFrame, categoryCol: String, targetCol: String,
                        foldCol: String, outCol: String = "te_oof"): DataFrame = {
    val perFold = df.groupBy(col(categoryCol), col(foldCol))
      .agg(sum(col(targetCol)).as("__sf"), count(col(targetCol)).as("__nf"))
    // category totals as a WINDOW over the tiny per-fold relation — sums
    // the k fold sums, so the engine-side float order is (fold partials,
    // then k-term rollup); the oracle mirrors that exact shape
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(categoryCol))
    val stats = perFold
      .withColumn("__s", sum(col("__sf")).over(w))
      .withColumn("__n", sum(col("__nf")).over(w))
    df.join(broadcast(stats), Seq(categoryCol, foldCol))
      .withColumn(outCol,
        when(col("__n") === col("__nf"), lit(null))
          .otherwise((col("__s") - col("__sf")) / (col("__n") - col("__nf"))))
      .drop("__sf", "__nf", "__s", "__n")
  }
}

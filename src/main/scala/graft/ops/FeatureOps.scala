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
    // Null-safe key (<=>): groupBy keeps NULL as its own category group, and
    // the join-back must keep those rows too — a plain equi-join would
    // silently drop every NULL-category row, diverging from the window
    // formulation that preserves all input rows.
    val stats = df.groupBy(col(categoryCol).as("__cat"))
      .agg(sum(col(targetCol)).as("__s"), count(col(targetCol)).as("__n"))
    df.join(broadcast(stats), col(categoryCol) <=> col("__cat"))
      .withColumn(outCol,
        when(col("__n") < 2 || col(targetCol).isNull, lit(null))
          .otherwise((col("__s") - col(targetCol)) / (col("__n") - 1)))
      .drop("__cat", "__s", "__n")
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
    // Level counts must mirror the χ² terms: the window partitions treat a
    // NULL category as its own level, so count it as one too — countDistinct
    // over a (isNull, value) struct (a bare countDistinct drops NULLs and
    // would overestimate V whenever NULLs are present). A degenerate table
    // (either column constant, or only NULLs → r or c = 1) has no
    // association to measure: min(r,c)−1 ≤ 0, so return NULL rather than
    // Inf/NaN.
    m.agg(
        sum(pow(col("__nxy") - col("__nx") * col("__ny") / col("__n"), 2) /
          (col("__nx") * col("__ny") / col("__n"))).as("__chiP"),
        (max(col("__n")) - sum(col("__nx") * col("__ny") / col("__n"))).as("__chiZ"),
        max(col("__n")).as("__n"),
        countDistinct(struct(col("__x").isNull, col("__x"))).as("__r"),
        countDistinct(struct(col("__y").isNull, col("__y"))).as("__c"))
      .select(when(least(col("__r"), col("__c")) > 1,
        sqrt((col("__chiP") + col("__chiZ")) /
          (col("__n") * (least(col("__r"), col("__c")) - 1)))).as("cramers_v"))
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
    // Null-safe keys, as in [[targetEncodeLoo]]: NULL category or fold rows
    // form their own groups and must survive the join-back.
    val perFold = df.groupBy(col(categoryCol).as("__cat"), col(foldCol).as("__fold"))
      .agg(sum(col(targetCol)).as("__sf"), count(col(targetCol)).as("__nf"))
    // category totals as a WINDOW over the tiny per-fold relation — sums
    // the k fold sums, so the engine-side float order is (fold partials,
    // then k-term rollup); the oracle mirrors that exact shape
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__cat"))
    val stats = perFold
      .withColumn("__s", sum(col("__sf")).over(w))
      .withColumn("__n", sum(col("__nf")).over(w))
    df.join(broadcast(stats),
        col(categoryCol) <=> col("__cat") && col(foldCol) <=> col("__fold"))
      .withColumn(outCol,
        when(col("__n") === col("__nf"), lit(null))
          .otherwise((col("__s") - col("__sf")) / (col("__n") - col("__nf"))))
      .drop("__cat", "__fold", "__sf", "__nf", "__s", "__n")
  }
}

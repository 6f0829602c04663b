package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule checking (the deequ/dbt-test pattern): a
  * set of named row predicates evaluated in ONE wide aggregation over ONE
  * scan — k rules cost one pass, not k — then exploded to a long-format
  * report (rule, n_rows, n_violations, violation_rate).
  *
  * A row VIOLATES a rule when the predicate is false OR NULL (a check that
  * cannot be evaluated did not pass — the completeness convention), so
  * `col.isNotNull` composes as a completeness rule and range rules on a
  * nullable column count its NULLs as failures unless guarded explicitly.
  */
object Quality {

  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "check at least one rule")
    val aggs = rules.zipWithIndex.map { case ((_, p), i) =>
      sum(when(p, 0L).otherwise(1L)).as(s"__v_$i")
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    wide.select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"),
        round(coalesce(col(s"__v_$i"), lit(0L)) / nullif(col("__n"), lit(0L)), 6)
          .as("violation_rate"))
    }: _*)).as("__s")).select(col("__s.*"))
  }
}

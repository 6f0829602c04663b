package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Custom optimizer rule (the `Rule[LogicalPlan]` extension point, injected
  * through the public `spark.experimental.extraOptimizations` seam):
  * rewrite un-thresholded edit-distance bounds into Catalyst's banded form,
  *
  *   levenshtein(a, b) <= k   →   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   →   levenshtein(a, b, k-1) >= 0
  *
  * The 3-arg `Levenshtein` runs an O(len·k) banded DP with early exit and
  * returns −1 above the bound — measured ~1.6× on the blocked fuzzy join
  * when applied by hand (`Dedup.fuzzyPairsBlocked`); this rule grants the
  * same win to any user predicate that wrote the naive form, including
  * ones inside join conditions. Only literal non-negative integer bounds
  * rewrite (a column bound can't become a DP band), and already-thresholded
  * calls are left alone.
  */
object ThresholdedLevenshteinRule extends Rule[LogicalPlan] {

  def register(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(this))
      em.extraOptimizations = em.extraOptimizations :+ this
  }

  /** Remove the rule from the session's extra optimizations. Callers that
    * register on a SHARED session must unregister once their plan is
    * captured (`queryExecution.optimizedPlan` is a forced lazy val, so the
    * captured plan keeps the rewrite) — otherwise every later query on the
    * session runs under a different optimizer than before, making timings
    * order-dependent.
    */
  def unregister(spark: SparkSession): Unit = {
    val em = spark.experimental
    em.extraOptimizations = em.extraOptimizations.filterNot(_ eq this)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(v: Int, IntegerType)) if v >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
      case LessThan(Levenshtein(a, b, None), Literal(v: Int, IntegerType)) if v >= 1 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(v - 1))), Literal(0))
      // symmetric literal-on-the-left spellings
      case GreaterThanOrEqual(k @ Literal(v: Int, IntegerType), Levenshtein(a, b, None)) if v >= 0 =>
        GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
    }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a pipeline runs before it
  * trusts an input (null rates, cardinalities, value ranges). One row per
  * profiled column, long format:
  * (column, n_rows, n_null, n_distinct, min_value, max_value) with the
  * extrema rendered as strings so heterogeneous column types share one
  * schema.
  *
  * Shape at 100 TB: ONE scan, ONE aggregation producing every column's
  * stats simultaneously (k columns → 4k aggregate expressions in a single
  * map-side-partial pass), then a tiny driver-free unpivot of the 1-row
  * result via stack. No per-column jobs, no collect.
  *
  * `n_distinct` is exact by default (it's what an oracle can gate);
  * `approxDistinct = true` swaps HLL++ for the count-distinct when the
  * column's cardinality at full scale makes exactness a shuffle you don't
  * want to pay.
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String],
                approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(v)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(v) else count_distinct(v))
          .as(s"__nd_$c"),
        min(v).cast("string").as(s"__mn_$c"),
        max(v).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row wide result: stack(k, 'name', n, nn, nd, mn, mx ...)
    val stackArgs = cols.map { c =>
      s"'$c', `__n_$c`, `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n_rows, n_null, n_distinct, min_value, max_value)")
  }
}

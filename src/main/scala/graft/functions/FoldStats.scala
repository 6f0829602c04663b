package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass left-fold Σx and Σx² over a double array —
  * `struct<s1: double, s2: double>`. Exists because the Bollinger-band
  * family needs CROSS-ENGINE-DETERMINISTIC frame sums (sequential fold
  * order, see `TechIndicators.bollinger`) and the `aggregate` HOF spelling
  * evaluates an interpreted lambda per element per fold — two folds over
  * every 20-element frame of every row was the gate's whole cost. This
  * kernel does both sums in one tight primitive loop; the summation ORDER
  * is identical to the two separate left folds (the s1 and s2 sequences
  * are independent), so results are bit-identical to the HOF form and to
  * DuckDB's `list_reduce` render.
  */
case class FoldStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("s1", DoubleType, nullable = false),
    StructField("s2", DoubleType, nullable = false)))
  override def prettyName: String = "fold_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < n) {
      // NULL slots are skipped like SQL SUM skips NULLs — an unguarded
      // getDouble would silently read UnsafeArrayData's zeroed slot as 0.0,
      // which is only accidentally right for s1 and wrong in spirit for
      // both. The Bollinger path's collect_list never emits nulls; this
      // guards the registered SQL surface.
      if (!arr.isNullAt(i)) {
        val x = arr.getDouble(i)
        s1 += x
        s2 += x * x
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](s1, s2))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FoldStats {
  def foldStats(c: Column): Column =
    GraftBridge.column(FoldStats(GraftBridge.expression(c)))
}

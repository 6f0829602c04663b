package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard coefficient |A∩B| / |A∪B| of two `array<bigint>` shingle/sketch
  * sets, fused into ONE expression so the intersection merge runs once per
  * evaluation.
  *
  * Why primitive: `size(array_intersect(a, b))` walks the generic
  * collection path — a boxed `OpenHashSet[Any]` per row plus an
  * intermediate result array nothing else reads. On a candidate
  * verification join (hundreds of thousands of pairs × ~50-element sets —
  * [[graft.ext.Dedup]]'s prefix and LSH verifies) that allocation was the
  * dominant cost (measured ~2 s of a 5.8 s query at sf0.1). This
  * expression copies both arrays to `long[]`, sorts, and merge-counts —
  * zero boxing, no intermediate array.
  *
  * Why fused: the earlier two-step form (an `intersect_size` expression
  * aliased to `common`, jaccard derived from the alias) looked like one
  * pass but wasn't — the threshold predicate is pushed into the verify
  * JOIN CONDITION with the alias inlined, so the plan evaluated the merge
  * twice in the condition (numerator + denominator) and a third time in
  * the output projection. Fused, the pushed predicate costs one merge per
  * candidate and the projection one merge per SURVIVING pair only.
  *
  * Arithmetic is bit-identical to the SQL form
  * `cast(c as double) / cast(sza + szb - c as double)`: same integer union
  * count, one IEEE double division — oracle comparisons are unaffected.
  * Two empty sets yield 0/0 = NaN, matching the column formulation (both
  * dedup producers filter empties out).
  *
  * Inputs are SETS (distinct elements), which both producers
  * ([[ShingleHashes]], `array_distinct`) guarantee; duplicate elements
  * would count min-multiplicity like a multiset intersect.
  *
  * CodegenFallback: per-row work (two sorts + merge) dwarfs the
  * virtual-call overhead codegen would save, same trade as
  * [[ShingleHashes]].
  */
case class LongSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> (non-null elements) inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "long_set_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0
    var j = 0
    var c = 0L
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { c += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    c.toDouble / (x.length.toLong + y.length.toLong - c).toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongSetOps {
  /** Jaccard coefficient of two `array<bigint>` set columns (one merge). */
  def jaccard(a: Column, b: Column): Column =
    GraftBridge.column(LongSetJaccard(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

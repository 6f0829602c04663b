package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cheap LOWER BOUND on the edit distance between two strings —
  * `max(|lenA−lenB|, L1(charBagA, charBagB) / 2)` over a 64-bin hashed
  * code-point histogram.
  *
  * Every edit operation moves at most one code point: it changes the
  * length by ≤1 and the bag-difference L1 by ≤2, so the bound never
  * exceeds the true distance (hash collisions only let differences
  * cancel, which WEAKENS the bound — it stays a valid lower bound).
  *
  * Purpose: a ~100-op prefilter in front of the ~1000-cell banded
  * levenshtein DP inside blocked fuzzy joins. `bound > k ⟹ dist > k`,
  * so `bag_bound(a,b) <= k AND levenshtein(a,b,k) BETWEEN 0 AND k` is
  * exactly `levenshtein(a,b) <= k` — lossless, just cheaper on the
  * (dominant) non-matching pairs.
  */
case class BagBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit_distance_bag_bound"

  override def nullSafeEval(a: Any, b: Any): Any =
    BagBound.bound(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BagBound.bound($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BagBound {

  /** 64-bin hashed code-point histogram diff bound; static so generated
    * code can call it directly. Counts only non-continuation UTF-8 bytes
    * (= code points), binned by `byte & 63`.
    */
  def bound(a: UTF8String, b: UTF8String): Int = {
    val bins = new Array[Int](64)
    val ba = a.getBytes
    val bb = b.getBytes
    var lenA = 0
    var i = 0
    while (i < ba.length) {
      val v = ba(i) & 0xFF
      if ((v & 0xC0) != 0x80) { bins(v & 63) += 1; lenA += 1 }
      i += 1
    }
    var lenB = 0
    i = 0
    while (i < bb.length) {
      val v = bb(i) & 0xFF
      if ((v & 0xC0) != 0x80) { bins(v & 63) -= 1; lenB += 1 }
      i += 1
    }
    var l1 = 0
    i = 0
    while (i < 64) { l1 += math.abs(bins(i)); i += 1 }
    math.max(math.abs(lenA - lenB), l1 >> 1)
  }

  /** Lower bound on `levenshtein(a, b)` as a Column. */
  def editBound(a: Column, b: Column): Column =
    GraftBridge.column(BagBound(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}

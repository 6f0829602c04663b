package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Myers/Hyyrö bit-parallel edit distance over 6-BIT HASHED code points —
  * a tight LOWER BOUND on `levenshtein(a, b)` at ~one word-op per character
  * instead of the banded DP's O(len·k) cell grid.
  *
  * Hashing code points to 64 bins can only merge distinct characters, so
  * the computed value is the exact edit distance of the hashed sequences —
  * ≤ the true distance (for ASCII letters the 6-bit bins are collision-free
  * in practice, so the bound is almost always exact). `bound > k ⟹
  * dist > k`: as a prefilter in front of the exact DP it is lossless.
  *
  * Only the first operand (the "pattern") must fit in one machine word;
  * inputs whose pattern exceeds 64 code points return 0 — the trivial
  * bound, which never prunes and therefore never costs correctness.
  */
case class MyersBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "edit_distance_myers_bound"

  override def nullSafeEval(a: Any, b: Any): Any =
    MyersBound.bound(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MyersBound.bound($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MyersBound {

  /** 6-bit bin of the code point starting at byte `i`; UTF-8 continuation
    * bytes are skipped by the callers (a non-continuation byte's low 6 bits
    * identify ASCII uniquely and spread multi-byte leads acceptably).
    */
  @inline private def bin(b: Byte): Int = b & 63

  /** Hashed-alphabet Myers edit distance; static so generated code calls it
    * directly. 0 (the trivial bound) when the pattern side exceeds 64 code
    * points.
    */
  def bound(a: UTF8String, b: UTF8String): Int = {
    val ba = a.getBytes
    val bb = b.getBytes
    // build Peq over the pattern's code points (non-continuation bytes)
    val peq = new Array[Long](64)
    var m = 0
    var i = 0
    while (i < ba.length) {
      val v = ba(i) & 0xFF
      if ((v & 0xC0) != 0x80) {
        if (m >= 64) return 0 // pattern too long for one word: trivial bound
        peq(v & 63) |= 1L << m
        m += 1
      }
      i += 1
    }
    if (m == 0) {
      // empty pattern: distance = |b| in code points
      var n = 0
      var j = 0
      while (j < bb.length) {
        if ((bb(j) & 0xC0) != 0x80) n += 1
        j += 1
      }
      return n
    }
    val highBit = 1L << (m - 1)
    var pv = -1L
    var mv = 0L
    var score = m
    var j = 0
    while (j < bb.length) {
      val v = bb(j) & 0xFF
      if ((v & 0xC0) != 0x80) {
        val eq = peq(v & 63)
        val xv = eq | mv
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if ((ph & highBit) != 0L) score += 1
        else if ((mh & highBit) != 0L) score -= 1
        ph = (ph << 1) | 1L
        mh = mh << 1
        pv = mh | ~(xv | ph)
        mv = ph & xv
      }
      j += 1
    }
    score
  }

  /** Lower bound on `levenshtein(a, b)` as a Column (see class doc). */
  def editBound(a: Column, b: Column): Column =
    GraftBridge.column(MyersBound(GraftBridge.expression(a),
      GraftBridge.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns, accumulated in
  * double, left-to-right.
  *
  * Why a custom Catalyst expression (SURVEY.md §4/§7): the declarative
  * equivalent — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — runs on the
  * interpreted higher-order-function path (no whole-stage codegen, per-pair
  * array allocation for the zipped intermediate). On an O(n²) similarity
  * join that difference is ~50× wall-clock. This expression participates in
  * codegen: a tight primitive loop over the two `ArrayData`, zero
  * allocation.
  *
  * The fold order (element 0 → n-1, double accumulator) exactly matches the
  * HOF formulation and DuckDB's `list_cosine_similarity` accumulation, so
  * results stay bit-identical and oracle comparisons keep passing.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // a silent min() truncation would yield a plausible-but-wrong dot for a
    // malformed embedding column; DuckDB's list_cosine_similarity errors on
    // mismatched lengths, so error parity keeps divergence impossible
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: with non-nullable children nullSafeCodeGen emits this
      // block unbraced, so fixed names would collide (duplicate declaration
      // → Janino failure → silent interpreted fallback) when the expression
      // appears more than once in one codegen scope
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 quantization of an `array<float>` embedding:
  * scale = max|v| / 127, q_i = round(v_i / scale) — the storage/bandwidth
  * step of an embedding index (4 bytes → 1 byte per dimension, max
  * dequantization error scale/2). Output struct (scale: double,
  * q: array<tinyint>).
  *
  * Native expression for the same reason as [[FloatVectorDot]]: the
  * declarative `transform(...)` form is interpreted per element. Rounding
  * is HALF AWAY FROM ZERO — what both Spark's `round` and DuckDB's
  * `round` do on doubles, so the oracle reproduces every byte (ties are
  * real: v = max|v|/2 hits x.5 exactly when the magnitudes are powers of
  * two). All-zero vectors quantize to scale 0 with q all zero. NaN inputs
  * are rejected (a NaN would silently poison scale and every element).
  */
case class FloatVectorQuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${dt.sql}")
  }
  override def dataType: DataType = types.StructType(Seq(
    types.StructField("scale", DoubleType, nullable = false),
    types.StructField("q", ArrayType(types.ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "float_vector_quantize_int8"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val d = v.getFloat(i).toDouble
      if (java.lang.Double.isNaN(d))
        throw new IllegalArgumentException(s"$prettyName: NaN at index $i")
      val a = math.abs(d)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        val d = v.getFloat(i).toDouble / scale
        // half away from zero, matching Spark/DuckDB round() on doubles
        val r = if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)
        q(i) = r.toByte // |r| <= 127 by construction of scale
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(scale, ArrayData.toArrayData(q))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Dot product of two `array<float>` columns (double result). */
  def dotF(a: Column, b: Column): Column =
    GraftBridge.column(FloatVectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm of an `array<float>` column. */
  def normF(a: Column): Column = sqrt(dotF(a, a))

  /** Symmetric int8 quantization: struct(scale, q) per vector. */
  def quantizeI8(a: Column): Column =
    GraftBridge.column(FloatVectorQuantizeInt8(GraftBridge.expression(a)))
}

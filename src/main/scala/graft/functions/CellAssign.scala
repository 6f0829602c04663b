package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Top-`take` nearest-centroid cells for an `array<float>` vector — the IVF
  * assignment step as ONE expression holding the centroid matrix, instead
  * of `nlist` literal arrays inlined into the plan.
  *
  * Why: the literal formulation materializes nlist × dim literal nodes
  * (16×64 ≈ 1k already dominates codegen compile time at toy scale;
  * a production nlist of 4096 × dim 1024 would be 4M plan nodes — simply
  * not plannable), then sorts a struct array through the interpreted
  * `array_sort`/`reverse`/`slice`/`transform` chain per row. Here the
  * matrix rides along as expression state (serialized once per task via
  * closure, like a broadcast), and assignment is a primitive loop.
  *
  * Scoring matches the literal formulation bit-for-bit: per centroid,
  * left-to-right double-accumulated dot divided by the centroid's
  * precomputed double norm; zero-norm centroids score -Infinity; ties
  * prefer the LARGER cell id (the reverse-sorted struct order the previous
  * formulation produced), so cell assignments are unchanged.
  */
case class CellAssign(child: Expression, centroids: Array[Array[Float]], take: Int)
    extends UnaryExpression with CodegenFallback {

  require(take >= 1 && take <= centroids.length,
    s"take must be in [1, ${centroids.length}]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x.toDouble * x.toDouble).sum))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nlist = centroids.length
    if (v.numElements() != centroids(0).length) // all centroids share the corpus dim
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs ${centroids(0).length})")
    val sims = new Array[Double](nlist)
    var cid = 0
    while (cid < nlist) {
      val c = centroids(cid)
      var acc = 0.0
      var i = 0
      while (i < c.length) { acc += v.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      sims(cid) = if (norms(cid) == 0.0) Double.NegativeInfinity else acc / norms(cid)
      cid += 1
    }
    // top-`take` by (sim desc, cid desc) via selection — take is tiny.
    // Double.compare, not >, so a NaN score (corrupt embedding) ranks above
    // every finite sim — the order Spark's sort gave the old array_sort
    // formulation.
    val out = new Array[Int](take)
    val used = new Array[Boolean](nlist)
    var k = 0
    while (k < take) {
      var best = -1
      var cid2 = 0
      while (cid2 < nlist) {
        if (!used(cid2) && (best < 0 || {
          val cmp = java.lang.Double.compare(sims(cid2), sims(best))
          cmp > 0 || (cmp == 0 && cid2 > best)
        })) best = cid2
        cid2 += 1
      }
      used(best) = true
      out(k) = best
      k += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CellAssign {
  /** Top-`take` IVF cell ids for a vector column. */
  def cells(vec: Column, centroids: Array[Array[Float]], take: Int): Column =
    GraftBridge.column(CellAssign(GraftBridge.expression(vec), centroids, take))
}

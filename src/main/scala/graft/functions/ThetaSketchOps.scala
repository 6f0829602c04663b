package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta sketches (Apache DataSketches, provided classpath): mergeable
  * distinct-count state that — unlike HLL — supports set INTERSECTION and
  * DIFFERENCE, not just union. That is what audience-overlap questions
  * need at 100 TB: "how many distinct users did both X and Y" cannot be
  * answered from two HLL sketches (inclusion–exclusion on estimates blows
  * up the error), but two theta sketches intersect directly with bounded
  * relative error. Below the nominal-entries threshold (default 4096) a
  * theta sketch retains every hash and its estimates are EXACT — which is
  * what lets the overlap gate be a plain hash-equality oracle; at corpus
  * scale the same code degrades gracefully to estimates.
  *
  * Pieces: [[ThetaSketchAgg]] (long values → binary compact sketch),
  * [[ThetaUnionAgg]] (binary sketches → merged binary), scalar
  * [[ThetaEstimate]], and pairwise [[ThetaIntersectEstimate]] /
  * [[ThetaANotBEstimate]].
  */
object ThetaSketchOps {

  private[functions] def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  /** `theta_sketch_agg(value)`: one theta sketch per group over a LONG
    * column (ids hash internally), as compact binary.
    */
  def thetaSketchAgg(value: Column, lgNomEntries: Int = 12): Column =
    GraftBridge.column(ThetaSketchAgg(
      GraftBridge.expression(value.cast("long")), lgNomEntries).toAggregateExpression())

  /** `theta_union_agg(sketch)`: union-merge binary sketches. */
  def thetaUnionAgg(sketch: Column, lgNomEntries: Int = 12): Column =
    GraftBridge.column(ThetaUnionAgg(
      GraftBridge.expression(sketch), lgNomEntries).toAggregateExpression())

  /** `theta_estimate(sketch)`: distinct-count estimate (exact when the
    * sketch never saturated).
    */
  def thetaEstimate(sketch: Column): Column =
    GraftBridge.column(ThetaEstimate(GraftBridge.expression(sketch)))

  /** `theta_intersect_estimate(a, b)`: |A ∩ B| estimate. */
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    GraftBridge.column(ThetaIntersectEstimate(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `theta_a_not_b_estimate(a, b)`: |A \ B| estimate. */
  def thetaANotBEstimate(a: Column, b: Column): Column =
    GraftBridge.column(ThetaANotBEstimate(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Buffer = a theta Union (it ingests raw longs AND other sketches — the
  * one DataSketches type that serves both the map-side update path and the
  * partial-merge path); result/serialized form = compact bytes. NULLs are
  * skipped; an all-NULL group yields an empty sketch (non-null).
  */
case class ThetaSketchAgg(valueExpr: Expression, lgNomEntries: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.theta.Union] {

  require(lgNomEntries >= 4 && lgNomEntries <= 26, "lgNomEntries in [4, 26]")

  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = valueExpr.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long column (cast explicitly), got ${dt.sql}")
  }

  override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  override def update(buffer: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = valueExpr.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: org.apache.datasketches.theta.Union,
                     other: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
    buffer.union(other.getResult); buffer
  }

  override def eval(buffer: org.apache.datasketches.theta.Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: org.apache.datasketches.theta.Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()
    u.union(ThetaSketchOps.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0))
}

/** Union-merge of serialized theta sketches (rollup step). */
case class ThetaUnionAgg(sketchExpr: Expression, lgNomEntries: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.theta.Union] {

  override def children: Seq[Expression] = Seq(sketchExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = sketchExpr.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary theta sketch column, got ${dt.sql}")
  }

  override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
    SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()

  override def update(buffer: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = sketchExpr.eval(input)
    if (v != null) buffer.union(ThetaSketchOps.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: org.apache.datasketches.theta.Union,
                     other: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
    buffer.union(other.getResult); buffer
  }

  override def eval(buffer: org.apache.datasketches.theta.Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: org.apache.datasketches.theta.Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgNomEntries).buildUnion()
    u.union(ThetaSketchOps.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(sketchExpr = newChildren(0))
}

/** Distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary theta sketch, got ${dt.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    ThetaSketchOps.wrap(input.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| estimate from two serialized theta sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary theta sketches, got (${l.sql}, ${r.sql})")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(ThetaSketchOps.wrap(a.asInstanceOf[Array[Byte]]))
    ix.intersect(ThetaSketchOps.wrap(b.asInstanceOf[Array[Byte]]))
    ix.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A \ B| estimate from two serialized theta sketches. */
case class ThetaANotBEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_a_not_b_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary theta sketches, got (${l.sql}, ${r.sql})")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val diff = SetOperation.builder().buildANotB()
    diff.setA(ThetaSketchOps.wrap(a.asInstanceOf[Array[Byte]]))
    diff.notB(ThetaSketchOps.wrap(b.asInstanceOf[Array[Byte]]))
    diff.getResult(true).getEstimate
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

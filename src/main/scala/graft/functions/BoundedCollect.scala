package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bounded_sorted_collect(v, cap)`: collect non-null doubles up to `cap`
  * values per group, SORTED at eval — NULL (not an OOM) past the cap.
  *
  * This is the state-discipline sibling of `collect_list` for selection
  * algorithms: [[graft.ops.QuantileSelect.groupPercentile]] collects each
  * group's percentile BAND, whose expected size is O(n_g/accuracy) — but
  * heavy ties at a fence value can inflate a band to O(n_g), and a plain
  * `collect_list` would hold every one of those doubles in the aggregation
  * buffer on exactly the whale-scale path the bounded-state contract
  * exists for. Here the buffer stops growing at `cap` (8·cap bytes max),
  * the overflow FACT is preserved through merge/serialize, and eval
  * answers NULL so the caller can raise a loud, actionable error — never
  * a silently wrong fence and never an executor OOM.
  */
final class BoundedDoubleBuf(var buf: DoubleBuf, var overflowed: Boolean)

case class BoundedSortedCollect(valueExpr: Expression, cap: Int,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedDoubleBuf] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bounded_sorted_collect"

  override def checkInputDataTypes(): TypeCheckResult = valueExpr.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column (cast explicitly), got ${dt.sql}")
  }

  override def createAggregationBuffer(): BoundedDoubleBuf =
    new BoundedDoubleBuf(new DoubleBuf(), overflowed = false)

  override def update(buffer: BoundedDoubleBuf, input: InternalRow): BoundedDoubleBuf = {
    val v = valueExpr.eval(input)
    if (v != null && !buffer.overflowed) {
      if (buffer.buf.n >= cap) buffer.overflowed = true
      else buffer.buf.add(v.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: BoundedDoubleBuf, other: BoundedDoubleBuf): BoundedDoubleBuf = {
    if (other.overflowed) buffer.overflowed = true
    if (!buffer.overflowed) {
      if (buffer.buf.n.toLong + other.buf.n > cap) buffer.overflowed = true
      else buffer.buf.merge(other.buf)
    }
    buffer
  }

  /** Sorted values, or NULL when the group overflowed `cap`. An empty group
    * evaluates to an empty array (a collected-nothing fact, not overflow).
    */
  override def eval(buffer: BoundedDoubleBuf): Any = {
    if (buffer.overflowed) return null
    val a = java.util.Arrays.copyOf(buffer.buf.arr, buffer.buf.n)
    java.util.Arrays.sort(a)
    new GenericArrayData(a)
  }

  override def serialize(buffer: BoundedDoubleBuf): Array[Byte] = {
    // n = -1 is the overflow sentinel — the fact must survive shuffles
    val n = if (buffer.overflowed) -1 else buffer.buf.n
    val bb = ByteBuffer.allocate(4 + 8 * math.max(n, 0))
    bb.putInt(n)
    var i = 0
    while (i < math.max(n, 0)) { bb.putDouble(buffer.buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedDoubleBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0) new BoundedDoubleBuf(new DoubleBuf(), overflowed = true)
    else {
      val arr = new Array[Double](math.max(n, 16))
      var i = 0
      while (i < n) { arr(i) = bb.getDouble; i += 1 }
      new BoundedDoubleBuf(new DoubleBuf(arr, n), overflowed = false)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0))
}

object BoundedSortedCollect {
  /** Sorted array of non-null values per group; NULL when the group holds
    * more than `cap` values (see class doc for the loud-error contract).
    */
  def boundedSortedCollect(v: Column, cap: Int): Column =
    GraftBridge.column(BoundedSortedCollect(
      GraftBridge.expression(v.cast("double")), cap).toAggregateExpression())
}

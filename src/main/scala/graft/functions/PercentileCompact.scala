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

/** Growable PRIMITIVE double buffer — the whole point: 8 bytes per value,
  * no boxing, O(1) amortized append, O(n+m) merge.
  */
final class DoubleBuf(var arr: Array[Double], var n: Int) {
  def this() = this(new Array[Double](16), 0)

  // growth and serialization sizes are computed in LONG and gated: past
  // ~2.6e8 values per group the 4+8n byte frame exceeds Int.MaxValue and
  // naive doubling wraps negative — fail with the real advice instead
  private def grow(needed: Long): Unit = {
    require(needed <= DoubleBuf.MaxValues,
      s"percentile_compact group exceeds ${DoubleBuf.MaxValues} values — " +
        "use QuantileSelect (bounded-state selection) for whale-scale groups")
    val target = math.min(DoubleBuf.MaxValues,
      math.max(needed, arr.length.toLong * 2)).toInt
    arr = java.util.Arrays.copyOf(arr, target)
  }

  def add(v: Double): Unit = {
    if (n == arr.length) grow(n + 1L)
    arr(n) = v
    n += 1
  }

  def merge(o: DoubleBuf): Unit = {
    if (n.toLong + o.n > arr.length) grow(n.toLong + o.n)
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }
}

object DoubleBuf {
  /** (Int.MaxValue − 8) / 8, minus frame header: the largest group a single
    * serialized buffer can carry.
    */
  val MaxValues: Long = (Int.MaxValue.toLong - 16) / 8
}

/** `percentile_compact(v, array(p…))`: EXACT percentiles with a compact
  * primitive buffer — bit-identical results to Spark's built-in exact
  * `percentile` (same `(higher−pos)·v_lo + (pos−lower)·v_hi` interpolation
  * at `pos = p·(n−1)`), at a fraction of its cost. Sole bit-level caveat:
  * a zero-valued rank always returns +0.0, where the built-in's sign is
  * insertion-order-dependent (see [[PercentileCompact.update]]).
  *
  * The built-in keeps an `OpenHashMap[AnyRef, Long]` of every distinct
  * value per group (boxed keys, ~50 B/entry, hash-probe per row); on
  * near-unique doubles that map IS the column. This buffer is a flat
  * `Array[Double]` — 8 B/value, append per row, one `Arrays.sort` at eval
  * — measured severalfold faster on near-unique data.
  *
  * State is still O(group size): the right tool up to ~10⁸ values per group
  * (~1 GB of state). Beyond that — whale-scale groups — use the
  * bounded-state two-round selection ([[graft.ops.QuantileSelect]]), which
  * returns the same bits with O(n/accuracy) state.
  */
case class PercentileCompact(valueExpr: Expression, probs: Seq[Double],
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DoubleBuf] {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "probs must be in [0, 1]")

  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "percentile_compact"

  override def checkInputDataTypes(): TypeCheckResult = valueExpr.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column (cast explicitly), got ${dt.sql}")
  }

  override def createAggregationBuffer(): DoubleBuf = new DoubleBuf()

  override def update(buffer: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = valueExpr.eval(input)
    // signed-zero normalization (Spark's own NormalizeFloatingNumbers
    // discipline): the built-in keeps -0.0 and 0.0 as distinct map keys
    // under an ordering that calls them EQUAL, so the sign it returns at a
    // zero-valued rank is insertion-order-dependent; this kernel always
    // answers +0.0 there (values are == either way)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      buffer.add(if (d == 0.0) 0.0 else d)
    }
    buffer
  }

  override def merge(buffer: DoubleBuf, other: DoubleBuf): DoubleBuf = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: DoubleBuf): Any = {
    if (buffer.n == 0) return null
    val a = java.util.Arrays.copyOf(buffer.arr, buffer.n)
    java.util.Arrays.sort(a)
    new GenericArrayData(probs.map { p =>
      val pos = p * (buffer.n - 1)
      val lower = math.floor(pos).toInt
      val higher = math.ceil(pos).toInt
      // the EQUAL-NEIGHBORS shortcut matches the built-in exactly: without
      // it, w·x + (1−w)·x loses a ulp at the extremes (0.5·minSubnormal
      // rounds to zero twice) and the answer is no longer the order
      // statistic both ranks agree on
      if (lower == higher || a(lower) == a(higher)) a(lower)
      else (higher - pos) * a(lower) + (pos - lower) * a(higher)
    })
  }

  override def serialize(buffer: DoubleBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putDouble(buffer.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileCompact =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileCompact =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0))
}

object PercentileCompact {
  /** Column wrapper: `array<double>` of exact percentiles, NULL on an
    * all-null group. Casts the input to double (the built-in does the same
    * before interpolating).
    */
  def percentileCompact(v: Column, probs: Seq[Double]): Column =
    GraftBridge.column(PercentileCompact(
      GraftBridge.expression(v.cast("double")), probs).toAggregateExpression())

  /** Single-prob convenience: a double, not a 1-array. */
  def percentileCompact(v: Column, p: Double): Column =
    percentileCompact(v, Seq(p)).getItem(0)
}

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

/** Bounded top-k heap state for [[TopKPairs]]: keeps the k best
  * (score desc, id asc) entries seen. Internally a binary min-heap rooted
  * at the WORST kept entry, so a stream of n candidates costs O(n log k)
  * and O(k) memory regardless of group size.
  */
final class TopKHeap(val k: Int) {
  require(k >= 1, "k must be >= 1")
  private[functions] val scores = new Array[Double](k)
  private[functions] val ids = new Array[Long](k)
  private[functions] var size = 0

  /** a strictly worse than b under (score desc, id asc)? Total order via
    * Double.compare: NaN ranks ABOVE every real score — the same placement
    * Spark's descending sort gives NaN — and, crucially, the comparison is
    * total (raw `<`/`==` are always false for NaN, which would let a NaN at
    * the heap root permanently reject every later candidate).
    */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }
  }

  /** Entries best-first: (score desc, id asc); NaN first, like a Spark
    * descending sort.
    */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((sa, ia), (sb, ib)) =>
        val c = java.lang.Double.compare(sa, sb)
        c > 0 || (c == 0 && ia < ib)
      }
}

/** Grouped top-k aggregate: `topk_pairs(score, id, k)` keeps each group's k
  * best (score desc, id asc) rows as `array<struct<score,id>>`, best first.
  *
  * This is the 100 TB replacement for the
  * `row_number().over(partitionBy(g).orderBy(score.desc)) <= k` pattern:
  * the window form shuffles and sorts EVERY candidate row, while this
  * aggregate keeps an O(k) heap per group on the map side — the exchange
  * carries at most k entries per group per mapper and there is no sort at
  * all. NULL scores are skipped (the window form ranks them after all real
  * values; they can differ only when a group has fewer than k non-null
  * candidates).
  */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${s.sql}, ${i.sql})")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buffer.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buffer.add(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.toSeq)

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.add(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairs {
  /** Column wrapper: per-group array of the k best (score, id) pairs. */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKPairs(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
}

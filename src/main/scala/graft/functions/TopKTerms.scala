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
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k heap with a STRING payload: keeps the k best
  * (score desc, term asc — binary UTF-8 order, Spark's own string sort)
  * entries. O(k) state, O(n log k) stream cost; the string twin of
  * [[TopKHeap]].
  */
final class TopKTermHeap(val k: Int) {
  require(k >= 1, "k must be >= 1")
  private[functions] val scores = new Array[Double](k)
  private[functions] val terms = new Array[UTF8String](k)
  private[functions] var size = 0

  /** total order via Double.compare — NaN ranks above every real score,
    * matching a Spark descending sort (see TopKHeap.worse)
    */
  private def worse(sa: Double, ta: UTF8String, sb: Double, tb: UTF8String): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ta.compareTo(tb) > 0)
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val t = terms(i); terms(i) = terms(j); terms(j) = t
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(scores(i), terms(i), scores((i - 1) / 2), terms((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < size && worse(scores(l), terms(l), scores(w), terms(w))) w = l
      if (r < size && worse(scores(r), terms(r), scores(w), terms(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def add(score: Double, term: UTF8String): Unit = {
    if (size < k) {
      scores(size) = score; terms(size) = term; size += 1; siftUp(size - 1)
    } else if (worse(scores(0), terms(0), score, term)) {
      scores(0) = score; terms(0) = term; siftDown()
    }
  }

  /** Entries best-first: (score desc, term asc). */
  def sorted: Array[(Double, UTF8String)] =
    (0 until size).map(i => (scores(i), terms(i))).toArray
      .sortWith { case ((sa, ta), (sb, tb)) =>
        val c = java.lang.Double.compare(sa, sb)
        c > 0 || (c == 0 && ta.compareTo(tb) < 0)
      }
}

/** `topk_terms(score, term, k)`: per-group k best (score desc, term asc)
  * as `array<struct<term,score>>`, best first — the string-payload sibling
  * of [[TopKPairs]], built for TF-IDF-style "top terms per document". The
  * per-group state is an O(k) heap (map-side partial), not the group's
  * full term list, and nothing sorts more than k entries.
  */
case class TopKTerms(scoreExpr: Expression, termExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKTermHeap] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(scoreExpr, termExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_terms"

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, termExpr.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, string), got (${s.sql}, ${t.sql})")
    }

  override def createAggregationBuffer(): TopKTermHeap = new TopKTermHeap(k)

  override def update(buffer: TopKTermHeap, input: InternalRow): TopKTermHeap = {
    val s = scoreExpr.eval(input)
    val t = termExpr.eval(input)
    if (s != null && t != null)
      // clone: the input row's UTF8String may be backed by reused buffers
      buffer.add(s.asInstanceOf[Double], t.asInstanceOf[UTF8String].clone())
    buffer
  }

  override def merge(buffer: TopKTermHeap, other: TopKTermHeap): TopKTermHeap = {
    var i = 0
    while (i < other.size) { buffer.add(other.scores(i), other.terms(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKTermHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (s, t) =>
      InternalRow(t, s)
    }.toSeq)

  override def serialize(buffer: TopKTermHeap): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buffer.size) { bytes += 12 + buffer.terms(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      val tb = buffer.terms(i).getBytes
      bb.putInt(tb.length)
      bb.put(tb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKTermHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKTermHeap(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      h.add(s, UTF8String.fromBytes(tb))
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTerms =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTerms =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), termExpr = newChildren(1))
}

object TopKTerms {
  /** Column wrapper: per-group array of the k best (term, score) entries,
    * (score desc, term asc), best first.
    */
  def topKTerms(score: Column, term: Column, k: Int): Column =
    GraftBridge.column(
      TopKTerms(GraftBridge.expression(score), GraftBridge.expression(term), k)
        .toAggregateExpression())
}

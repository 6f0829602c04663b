package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: at most `m` counters. Counts are LOWER
  * bounds; the classic guarantee is `true_count - N/m <= count <=
  * true_count`, so every item with true frequency above N/m is guaranteed
  * present — the candidate set is a SUPERSET of the true heavy hitters at
  * that threshold.
  */
final class FreqSketch(val m: Int) {
  require(m >= 1, "capacity must be >= 1")
  private[functions] val counts = mutable.HashMap.empty[String, Long]

  def add(item: String): Unit = {
    val cur = counts.getOrElse(item, 0L)
    if (cur > 0L || counts.size < m) counts.update(item, cur + 1L)
    else {
      // full and unseen: the classic MG step — decrement every counter by 1
      // (the new item's weight cancels against the global decrement and is
      // NOT inserted), dropping counters that reach zero
      val dead = mutable.ArrayBuffer.empty[String]
      counts.keys.toArray.foreach { k => // snapshot: no mutation mid-iteration
        val c = counts(k) - 1L
        if (c <= 0L) dead += k else counts.update(k, c)
      }
      dead.foreach(counts.remove)
    }
  }

  /** Merge another sketch: sum counters, then shrink back to `m` by
    * subtracting the (m+1)-largest count from everything (the standard
    * parallel-MG reduction — preserves the lower-bound/superset guarantee).
    */
  def merge(other: FreqSketch): Unit = {
    other.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    if (counts.size > m) {
      val sorted = counts.values.toArray.sortBy(-_)
      val cut = sorted(m) // (m+1)-th largest
      val dead = counts.collect { case (k, v) if v - cut <= 0L => k }.toArray
      dead.foreach(counts.remove)
      counts.keys.toArray.foreach(k => counts.update(k, counts(k) - cut))
    }
  }

  /** (item, lower-bound count), count desc then item asc. */
  def sorted: Array[(String, Long)] =
    counts.toArray.sortBy { case (item, c) => (-c, item) }
}

/** `freq_items(item, m)`: Misra–Gries candidate heavy hitters per group as
  * `array<struct<item,count>>` (count desc, item asc; counts are lower
  * bounds). The 100 TB shape for corpus-wide term statistics: the exact
  * `groupBy(term).count` shuffles every distinct term; this aggregate's
  * state is O(m) per partition regardless of vocabulary size, and the
  * candidates can be exactly re-counted in a second cheap pass restricted
  * to ≤ m items (see `txt_top_bigrams_approx`).
  */
case class FreqItems(itemExpr: Expression, m: Int,
                     mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] {

  require(m >= 1, "m must be >= 1")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items_mg"

  override def checkInputDataTypes(): TypeCheckResult = itemExpr.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${dt.sql}")
  }

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(m)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = itemExpr.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: FreqSketch): Any =
    new GenericArrayData(buffer.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toSeq)

  override def serialize(buffer: FreqSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, v) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new FreqSketch(m)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      s.counts.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object FreqItems {
  /** Column wrapper: Misra–Gries candidate heavy hitters with capacity m. */
  def freqItems(item: Column, m: Int): Column =
    GraftBridge.column(
      FreqItems(GraftBridge.expression(item), m).toAggregateExpression())
}

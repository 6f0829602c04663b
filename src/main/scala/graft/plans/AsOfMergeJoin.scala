package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, GenericInternalRow, IsNotNull, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS physical operator — the (c) extension
  * path of SURVEY §7: a custom `LogicalPlan` node, a `SparkStrategy`, and a
  * `SparkPlan` that declares its distribution/ordering requirements and
  * merges both sides in one pass.
  *
  * Why this exists next to [[graft.ops.AsOfJoin]] (the union+window form):
  * the window form pays a UNION of both sides through one shuffle plus
  * window-carry state over the merged relation. This exec instead tells
  * Catalyst exactly what it needs — both children hash-clustered on the
  * join key and sorted by (key, time) — and then streams the two sorted
  * iterators with a classic merge: O(1) state (one carried row), zero
  * row-widening, and the planner is free to satisfy the requirements from
  * existing partitionings (a bucketed or pre-sorted child shuffles
  * NOTHING, which the union form can never express).
  *
  * Semantics match `AsOfJoin.asOf` exactly: latest right row with
  * `rightTime <= leftTime` per key (ties visible), NULL right keys/times
  * never match (pre-filtered), NULL left keys/times get no match, all
  * carried attrs come from the SAME matched row.
  *
  * Measured trade (sf0.1, local[32], full-output materialization — the
  * round-7 honest bench): the exec WINS even on unbucketed inputs once
  * every output column is actually evaluated (1.4 s vs the window form's
  * 2.5 s — the earlier "window form wins" read was a count-pruned bench
  * that never paid the union form's row-widening). On CO-BUCKETED
  * children the exec additionally plans with ZERO exchanges
  * (AsOfMergeJoinSpec proves it) while the union form always pays its
  * full shuffle — at fact-scale inputs the exchange dominates, which is
  * why this operator exists. The merge loop itself stays interpreted
  * (type-specialized comparators, one carried row): it is not the
  * bottleneck at either scale measured.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightAttrs: Seq[Attribute],
                        rightTieBreak: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightAttrs.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, attrs, tie) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, attrs, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(leftKey: Attribute, rightKey: Attribute,
                             leftTime: Attribute, rightTime: Attribute,
                             rightAttrs: Seq[Attribute],
                             rightTieBreak: Seq[Attribute],
                             left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightAttrs.map(_.withNullability(true))

  // both sides clustered on the key: EnsureRequirements co-partitions the
  // children (and skips the exchange entirely when a child already
  // satisfies it — the bucketed-scan win)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // per-partition (key, time) order is what makes the single-pass merge
  // valid. Tie-break columns extend the RIGHT ordering only: the merge
  // consumes every right row at-or-before the probe and keeps the LAST, so
  // ascending tie-break order makes the max-tie-break row win among equal
  // (key, time) rows — folding what would otherwise be a separate
  // dedup window (its own shuffle + rank over the full right side) into
  // the sort this operator already requires.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      (Seq(rightKey, rightTime) ++ rightTieBreak).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val attrs = rightAttrs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) probes and the attr payload, bound to each side's schema
      val lkt = UnsafeProjection.create(Seq(leftKey, leftTime), lOut)
      val rkt = UnsafeProjection.create(Seq(rightKey, rightTime), rOut)
      val rPayload = UnsafeProjection.create(attrs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(attrs.length)
      val joined = new JoinedRow
      // SPECIALIZED comparators resolved once per partition: primitive
      // getLong/getInt/getUTF8String reads, no per-row boxing through the
      // interpreted ordering (measured ~3× on the merge loop)
      val keyCmp = AsOfMergeJoinExec.fieldComparator(keyDt, 0)
      val timeCmp = AsOfMergeJoinExec.fieldComparator(timeDt, 1)

      val rBuf = rIter.buffered
      // carried = the most recent right row consumed, as a COPIED (key,time)
      // probe + payload; copies are mandatory: projections and the upstream
      // sorter reuse their buffers
      var carried: InternalRow = null
      var carriedPayload: InternalRow = null
      // the CURRENT head's probe, projected once per distinct head: with
      // left ≫ right most peeks re-see the same blocking head, and rkt's
      // buffer is stable until rkt runs again (only ever on a fresh head)
      var headProbe: InternalRow = null

      // lexicographic (key, time) compare; caller guarantees non-null sides
      def cmp(a: InternalRow, b: InternalRow): Int = {
        val c = keyCmp(a, b)
        if (c != 0) c else timeCmp(a, b)
      }

      lIter.map { lRow =>
        val lkRow = lkt(lRow)
        if (lkRow.isNullAt(0) || lkRow.isNullAt(1)) {
          // NULL left key/time: no match by contract
          resultProj(joined(lRow, nullPayload))
        } else {
          // advance the right side through every row at-or-before (key, time);
          // right NULL key/time rows were pre-filtered by the logical build
          var advancing = true
          while (advancing && rBuf.hasNext) {
            if (headProbe == null) headProbe = rkt(rBuf.head)
            if (cmp(headProbe, lkRow) <= 0) {
              carried = headProbe.copy()
              carriedPayload = rPayload(rBuf.next()).copy()
              headProbe = null
            } else advancing = false
          }
          val matched = carriedPayload != null && keyCmp(carried, lkRow) == 0
          resultProj(joined(lRow, if (matched) carriedPayload else nullPayload))
        }
      }
    }
  }
}

object AsOfMergeJoinExec {
  /** Field comparator specialized to the physical type: primitive reads for
    * the long/int-backed and string types (the overwhelmingly common as-of
    * keys), Spark's SQL total order for floating point (NaN above all,
    * −0.0 = 0.0), interpreted ordering as the general fallback. Both input
    * rows are non-null at ordinal `i` by construction.
    */
  private[plans] def fieldComparator(
      dt: org.apache.spark.sql.types.DataType, i: Int): (InternalRow, InternalRow) => Int = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (a, b) => java.lang.Long.compare(a.getLong(i), b.getLong(i))
      case IntegerType | DateType =>
        (a, b) => java.lang.Integer.compare(a.getInt(i), b.getInt(i))
      case ShortType => (a, b) => java.lang.Short.compare(a.getShort(i), b.getShort(i))
      case ByteType => (a, b) => java.lang.Byte.compare(a.getByte(i), b.getByte(i))
      case DoubleType => (a, b) =>
        org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(a.getDouble(i), b.getDouble(i))
      case FloatType => (a, b) =>
        org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareFloats(a.getFloat(i), b.getFloat(i))
      case StringType =>
        (a, b) => a.getUTF8String(i).compareTo(b.getUTF8String(i))
      case other =>
        val ord = TypeUtils.getInterpretedOrdering(other)
        (a, b) => ord.compare(a.get(i, other), b.get(i, other))
    }
  }
}

/** Library entry point: builds the logical node from analyzed children,
  * registers the strategy on the session (idempotent), and hands back a
  * DataFrame. Column-name based, like every other graft operator.
  */
object AsOfMergeJoin {

  def registerStrategy(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
  }

  /** `rightTieBreak`: right columns ordering equal (key, time) rows — the
    * LAST row in ascending tie-break order wins (max tie-break), matching
    * [[graft.ops.AsOfJoin.asOf]]'s parameter of the same name. Folds the
    * caller's pre-dedup (`dedupByKeyOrdered` = shuffle + rank + filter over
    * the full right side) into the sort this operator already requires.
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightAttrs: Seq[String],
           rightTieBreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    registerStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlanRaw = right.queryExecution.analyzed
    // SELF-JOIN guard: if the right plan shares exprIds with the left
    // (events as-of'd to themselves), BindReferences would silently bind
    // the right attrs to LEFT ordinals — built-in Join nodes get exprId
    // dedup from the analyzer, a custom node must do it itself. Re-alias
    // the right side with fresh exprIds.
    val rPlan =
      if (lPlan.output.map(_.exprId).toSet
          .intersect(rPlanRaw.output.map(_.exprId).toSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlanRaw.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          rPlanRaw)
      else rPlanRaw
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    val rk = attr(rPlan, rightKey)
    val rt = attr(rPlan, rightTime)
    require(attr(lPlan, leftKey).dataType == rk.dataType,
      "as-of key types must match")
    require(attr(lPlan, leftTime).dataType == rt.dataType,
      "as-of time types must match")
    // the merge loop carries the matched key across iterator steps; atomic
    // values are immutable (UTF8String explicitly cloned) but array/struct
    // keys would alias the projection's reused buffer — reject them rather
    // than corrupt silently
    def atomic(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.ArrayType
           | _: org.apache.spark.sql.types.MapType
           | _: org.apache.spark.sql.types.StructType => false
      case _ => true
    }
    require(atomic(rk.dataType),
      s"as-of join key must be an atomic type, got ${rk.dataType.sql}")
    require(atomic(rt.dataType),
      s"as-of time must be an atomic type, got ${rt.dataType.sql}")
    // EXPLICIT column pruning: a custom logical node is opaque to
    // Catalyst's ColumnPruning rule, so without this Project the right side
    // drags its FULL schema through scan, exchange and sort (measured 3× on
    // the child cost — the parquet scan read every column). Only the key,
    // the time and the carried attrs may flow into the merge.
    val rAttrs = rightAttrs.map(attr(rPlan, _))
    val rTie = rightTieBreak.map(attr(rPlan, _))
    rTie.foreach(a => require(atomic(a.dataType),
      s"as-of tie-break column must be an atomic type, got ${a.dataType.sql}"))
    val rPruned = org.apache.spark.sql.catalyst.plans.logical.Project(
      (Seq(rk, rt) ++ rAttrs ++ rTie).distinct, rPlan)
    // SQL ASOF contract: NULL-key/time right rows can never be "the most
    // recent" — drop them before the merge (same as the window form)
    val rFiltered = Filter(And(IsNotNull(rk), IsNotNull(rt)), rPruned)
    val node = AsOfJoinNode(lPlan, rFiltered,
      attr(lPlan, leftKey), rk, attr(lPlan, leftTime), rt, rAttrs, rTie)
    GraftPlanShim.ofRows(spark, node)
  }
}

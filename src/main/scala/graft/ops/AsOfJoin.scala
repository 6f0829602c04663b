package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single right
  * row with the same key and the greatest right-time ≤ left-time — the
  * canonical training-data operation for joining events against
  * slowly-updated reference data without leakage from the future.
  *
  * Spark lacks the operator; per the engine's preference order this is
  * COMPOSED from built-ins (no custom physical node needed): tag and union
  * both sides, one window pass per key ordered by (time, side) carrying
  * `last(right attrs, ignoreNulls)` forward, then keep left rows. Exactly
  * ONE shuffle on the key (the window exchange) — the same cost envelope as
  * a single co-partitioned join at 100 TB, versus the naive
  * join-then-filter-then-rank which shuffles the full pair blow-up of every
  * key's history.
  *
  * Ties (right-time == left-time) match, mirroring ASOF JOIN `>=` semantics
  * in DuckDB/Pandas. For a deterministic result the right side must be
  * unique per (key, time) — either pre-dedup with
  * [[AggOps.dedupByKeyOrdered]] (same contract as DuckDB, whose ASOF picks
  * an arbitrary row among equal times), or pass `rightTieBreak`: the carry
  * window already totally orders each key's history, so a tie-break key
  * folds the dedup INTO the one existing window pass — the separate
  * dedup's shuffle + rank over the full right side disappears.
  */
object AsOfJoin {

  /** @param left        fact side (kept in full)
    * @param right       reference side (attached)
    * @param leftKey     join key column name on `left`
    * @param rightKey    join key column name on `right`
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param rightAttrs  right columns to carry onto left rows
    * @param tolerance   optional max-staleness predicate `(leftTime,
    *                    matchedRightTime) => keep`: when it evaluates false
    *                    (or NULL) the match is DISCARDED — the left row
    *                    stays with NULL attrs, exactly like no-match. The
    *                    carried struct remembers the matched row's time, so
    *                    this is a post-carry column test: no second window,
    *                    no join, zero extra shuffles.
    * @param rightTieBreak right attr names (⊆ `rightAttrs`) ordering equal
    *                    (key, time) right rows; the LAST row in ascending
    *                    tie-break order wins (so e.g. `Seq("version")`
    *                    keeps the max version — what
    *                    `dedupByKeyOrdered(desc)` would keep). Empty =
    *                    caller guarantees uniqueness, as before.
    */
  /** @param direction "backward" (default: greatest right-time ≤ left-time
    *                   — the leakage-safe form), "forward" (least
    *                   right-time ≥ left-time), or "nearest" (whichever of
    *                   the two is closer in time; exact-distance ties take
    *                   the BACKWARD match). pandas `merge_asof` parity.
    *                   Forward/nearest look into the future by definition —
    *                   reference-data repair jobs, not training joins.
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightAttrs: Seq[String],
           tolerance: Option[(Column, Column) => Column] = None,
           rightTieBreak: Seq[String] = Nil,
           direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns.toSeq

    // SQL ASOF equality semantics: NULL = NULL is NO match, and a NULL-time
    // reference row is never "the most recent". Window.partitionBy would
    // group NULL keys together and happily match them — pre-dropping
    // unmatchable right rows restores the SQL contract. (NULL-key/time LEFT
    // rows stay, and get no match: their partition has no right rows, and a
    // NULL left time sorts first, before any carried value.)
    val matchableRight = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)

    // one unified schema: left payload + ONE nullable struct of right attrs
    // + (key, t, side). A single struct (not per-attr columns) is carried
    // forward so all attributes always come from the SAME matched right row
    // — per-attr last(ignoreNulls) would skip a legitimately-NULL attribute
    // on the matched row and stitch values from different rows.
    // the matched row's own time rides inside the struct as __rt so a
    // tolerance predicate can test staleness after the carry
    val rStructCols = rightAttrs.map(col) :+ col(rightTime).as("__rt")
    val rStructDt = right.select(struct(rStructCols: _*)).schema.head.dataType
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(rStructDt).as("__r"): _*)
    val r = matchableRight
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rStructCols: _*).as("__r"): _*)

    // right rows sort BEFORE left rows at equal __t (side 0 < 1), so a
    // same-timestamp right row is visible to the left row — ASOF >= ties.
    // The tie-break keys ride inside the carried struct (left rows read
    // them as NULL — irrelevant, __side already separates the sides): the
    // last-in-order right row among equal times is the one `last()`
    // carries, which IS the keep-max dedup — at the cost of extra sort
    // keys in the one existing window sort, not a separate pass.
    // backward: ascending-time scan, carry the last right row seen.
    // forward: the SAME carry under a DESCENDING-time scan — "last seen
    // from +∞ downward" IS the least right-time ≥ left-time. In both, right
    // rows order before left rows at equal time (ties match, >= / <=
    // semantics) and the tie-break stays ascending (last = max wins).
    def carryWindow(timeOrd: Column) = Window.partitionBy(col("__k"))
      .orderBy(timeOrd +: col("__side").asc +:
        rightTieBreak.map(a => col("__r").getField(a).asc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // asc is NULLS FIRST, so a NULL-time left row precedes every right row in
    // the backward scan and carries no match; the descending scan must pin
    // NULLS FIRST explicitly (desc defaults to NULLS LAST, which would sort a
    // NULL-time left row after all right rows and hand it the earliest one).
    val wB = carryWindow(col("__t").asc)
    val wF = carryWindow(col("__t").desc_nulls_first)

    val unioned = l.unionByName(r)
    val carried = direction match {
      case "backward" => unioned
        .withColumn("__c", last(col("__r"), ignoreNulls = true).over(wB))
      case "forward" => unioned
        .withColumn("__c", last(col("__r"), ignoreNulls = true).over(wF))
      case "nearest" =>
        // both carries in one pass over the union: same key exchange, two
        // in-partition sorts; per row keep the temporally closer match,
        // exact ties -> backward. Distances in double seconds; NTZ times
        // route through TimestampType first (the direct double cast is
        // disallowed) — wall-clock-preserving under the UTC sessions here.
        import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}
        def secs(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
          case TimestampType | TimestampNTZType => c.cast(TimestampType).cast("double")
          case _: NumericType => c.cast("double")
          case other => throw new IllegalArgumentException(
            s"nearest as-of needs timestamp or numeric times, got ${other.sql}")
        }
        val lt = secs(col("__t"), left.schema(leftTime).dataType)
        val rtOf = (c: Column) =>
          secs(c.getField("__rt"), right.schema(rightTime).dataType)
        val both = unioned
          .withColumn("__cb", last(col("__r"), ignoreNulls = true).over(wB))
          .withColumn("__cf", last(col("__r"), ignoreNulls = true).over(wF))
        val db = abs(lt - rtOf(col("__cb")))
        val df = abs(rtOf(col("__cf")) - lt)
        both.withColumn("__c",
            when(col("__cb").isNull, col("__cf"))
              .when(col("__cf").isNull, col("__cb"))
              .when(df < db, col("__cf"))
              .otherwise(col("__cb")))
          .drop("__cb", "__cf")
    }

    val matched = tolerance match {
      case None => col("__c")
      // when(pred, __c) with no otherwise: false OR NULL predicate → NULL
      // struct → every attr NULL, indistinguishable from no-match
      case Some(pred) => when(pred(col("__t"), col("__c").getField("__rt")), col("__c"))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightAttrs.map(a => matched.getField(a).as(a)): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * parquet min/max data skipping.
  *
  * A single-column sort gives perfect pruning on that column and none on any
  * other; interleaving the bits of two quantized dimensions into one sort key
  * gives every file a NARROW range in BOTH dimensions, so a filter on either
  * column (or both) skips most files at scan time. This is the standard
  * layout trick for large fact tables queried along more than one axis
  * (time × key, geo × time, …).
  *
  * Scale shape: computing the z-value is a pure per-row projection (no
  * shuffle); the layout itself is ONE range repartition by z-value + an
  * in-partition sort — exactly what a sorted single-column write costs, with
  * strictly better two-axis skipping. At 100 TB pick `numPartitions` so each
  * output file lands near the rowgroup-friendly 128 MB–1 GB band.
  *
  * The bit-interleave formula is GENERATED once and rendered per dialect
  * ([[zvalueSparkSql]] / [[zvalueDuckSql]]) so the Spark column and the
  * DuckDB oracle can never drift. Inputs must already be quantized to
  * non-negative integers below 2^bits — quantization (modulo, epoch-day,
  * rank bucketing) is the caller's choice and happens in plain SQL on both
  * sides.
  */
object ZOrder {

  /** Morton interleave for Spark SQL (`shiftleft`/`shiftright` functions). */
  def zvalueSparkSql(a: String, b: String, bits: Int): String =
    render(a, b, bits, (e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)")

  /** The SAME interleave for DuckDB (`<<`/`>>` operators). */
  def zvalueDuckSql(a: String, b: String, bits: Int): String =
    render(a, b, bits, (e, n) => s"(($e) << $n)", (e, n) => s"(($e) >> $n)")

  /** Spark Column form of [[zvalueSparkSql]]. */
  def zvalue(a: String, b: String, bits: Int): Column = expr(zvalueSparkSql(a, b, bits))

  private def render(a: String, b: String, bits: Int,
                     shl: (String, Int) => String,
                     shr: (String, Int) => String): String = {
    require(bits > 0 && bits <= 31, "bits per dimension must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      // bit i of a lands at position 2i, bit i of b at 2i+1
      Seq(shl(s"(${shr(s"($a)", i)} & 1)", 2 * i),
        shl(s"(${shr(s"($b)", i)} & 1)", 2 * i + 1))
    }
    terms.mkString("(", " | ", ")")
  }

  /** Physically cluster `df` by z-value: one range shuffle (partition
    * boundaries from a sampled range of the z key, so the curve is split
    * into contiguous chunks) + in-partition sort. Writing the result yields
    * one file per partition with tight min/max on every interleaved
    * dimension.
    */
  def layout(df: DataFrame, z: Column, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
}

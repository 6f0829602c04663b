package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The fused jaccard expression must be bit-identical to the SQL
  * formulation it replaced (`cast(|A∩B| as double) / cast(|A|+|B|-|A∩B| as
  * double)` over `array_intersect`) — the dedup oracle gates hash-compare
  * doubles, so any drift here breaks them.
  */
class LongSetJaccardSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("b", ArrayType(LongType, containsNull = false), nullable = true)))

  private def df(rows: Seq[(Seq[Long], Seq[Long])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) =>
        Row(if (a == null) null else a, if (b == null) null else b)
      }, 2), schema)

  test("matches size(array_intersect)/union arithmetic bit-for-bit") {
    val rows = Seq[(Seq[Long], Seq[Long])](
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),          // 2/4
      (Seq(5L), Seq(5L)),                          // identical singletons
      (Seq(1L, 2L), Seq(3L, 4L)),                  // disjoint → 0.0
      (Seq(-9L, 0L, 7L, 8L, 100L), Seq(0L, 8L)),   // subset
      ((1L to 50L), (26L to 75L)))                 // 25/75 — inexact double
    val got = df(rows)
      .select(LongSetOps.jaccard(col("a"), col("b")).as("j"))
      .collect().map(_.getDouble(0))
    val want = df(rows)
      .select((size(array_intersect(col("a"), col("b"))).cast("double") /
        (size(col("a")) + size(col("b")) -
          size(array_intersect(col("a"), col("b")))).cast("double")).as("j"))
      .collect().map(_.getDouble(0))
    got.zip(want).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToRawLongBits(g) ===
        java.lang.Double.doubleToRawLongBits(w), s"got $g want $w")
    }
  }

  test("null input propagates null; element order is immaterial") {
    val out = df(Seq((null, Seq(1L, 2L)), (Seq(1L, 2L), null)))
      .select(LongSetOps.jaccard(col("a"), col("b")).as("j")).collect()
    assert(out.forall(_.isNullAt(0)))
    val shuffled = df(Seq((Seq(3L, 1L, 2L), Seq(2L, 4L, 3L))))
      .select(LongSetOps.jaccard(col("a"), col("b")).as("j"))
      .collect().head.getDouble(0)
    assert(shuffled === 0.5) // {2,3} of {1,2,3,4}
  }

  test("rejects non-set-typed input") {
    val bad = spark.range(1).select(array(lit("x")).as("a"), array(lit("y")).as("b"))
    val e = intercept[Exception] {
      bad.select(LongSetOps.jaccard(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"))
  }
}

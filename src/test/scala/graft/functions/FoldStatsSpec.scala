package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FoldStatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("fold_stats computes sequential Σx and Σx²") {
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("a")
    val r = df.select(FoldStats.foldStats(col("a")).as("st"))
      .select(col("st.s1"), col("st.s2")).as[(Double, Double)].head()
    assert(r === ((6.0, 14.0)))
  }

  test("fold_stats skips NULL array slots instead of reading them as 0.0") {
    val df = Seq(Seq(Some(2.0), None, Some(4.0))).toDF("a")
    val r = df.select(FoldStats.foldStats(col("a")).as("st"))
      .select(col("st.s1"), col("st.s2")).as[(Double, Double)].head()
    assert(r === ((6.0, 20.0)), "NULL slot must be skipped, not folded as 0")
  }
}

package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Deterministic hash splitting: total, disjoint, stable, and close to the
  * requested fractions.
  */
class SplitsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("every row gets exactly one split; fractions within tolerance") {
    val df = Splits.byHash(Tables.documents(spark, sfDir), "doc_id", fr)
    val counts = df.groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(total === Tables.documents(spark, sfDir).count())
    // 500 docs: binomial sd for p=0.8 is ~9 rows; 5 sd tolerance
    assert(math.abs(counts("train") - 0.8 * total) < 45,
      s"train fraction off: ${counts("train")}/$total")
  }

  test("assignment is stable across runs and independent of partitioning") {
    val d = Tables.documents(spark, sfDir)
    val once = Splits.byHash(d, "doc_id", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val again = Splits.byHash(d.repartition(7), "doc_id", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(once === again, "randomSplit-style instability defeats the operator's point")
  }

  test("salt decorrelates; fractions must sum to 1") {
    val d = Tables.documents(spark, sfDir)
    val a = Splits.byHash(d, "doc_id", fr).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Splits.byHash(d, "doc_id", fr, salt = "fold2").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a !== b, "salted split should differ")
    intercept[IllegalArgumentException] {
      Splits.byHash(d, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("violation = predicate false OR NULL; rates exact") {
    val df = Seq(Some(5.0), Some(50.0), Some(-1.0), None).toDF("v")
    val out = Quality.check(df, Seq(
      "v_positive" -> ($"v" > 0),        // -1 fails, NULL fails -> 2
      "v_complete" -> $"v".isNotNull))   // NULL fails -> 1
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("v_positive") === ((4L, 2L, 0.5)))
    assert(out("v_complete") === ((4L, 1L, 0.25)))
  }

  test("k rules cost ONE scan (single wide aggregation)") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rep = Quality.check(df, Seq(
      "a" -> ($"l_quantity" > 0), "b" -> ($"l_discount" <= 1), "c" -> $"l_tax".isNotNull))
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val nScans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(nScans == 1, s"expected exactly one scan for 3 rules, saw $nScans:\n$plan")
  }

  test("empty input: zero rows, zero violations, NULL rate (0/0)") {
    val df = Seq.empty[Option[Double]].toDF("v")
    val r = Quality.check(df, Seq("p" -> ($"v" > 0))).head()
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.isNullAt(3))
  }
}

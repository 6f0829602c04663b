package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FeatureOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("LOO encoding excludes the row's own target; singletons and NULL targets are NULL") {
    val df = Seq(
      ("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(30.0)),
      ("b", Some(5.0)),                    // singleton -> NULL
      ("c", Some(1.0)), ("c", None),       // NULL target -> NULL, and it
                                           // doesn't count toward n
    ).toDF("cat", "y")
    val got = FeatureOps.targetEncodeLoo(df, "cat", "y")
      .select("cat", "y", "te_loo")
      .as[(String, Option[Double], Option[Double])].collect().toSet
    assert(got === Set(
      ("a", Some(10.0), Some(25.0)),  // (20+30)/2 — own 10 excluded
      ("a", Some(20.0), Some(20.0)),
      ("a", Some(30.0), Some(15.0)),
      ("b", Some(5.0), None),
      ("c", Some(1.0), None),         // the NULL row doesn't make it a pair
      ("c", None, None)))
  }
}

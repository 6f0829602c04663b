package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FeatureOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("mutual information: 0 for independent, ln(2) for a 2-level bijection") {
    // perfectly dependent: y = x over two equiprobable levels -> MI = ln 2
    val dep = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q")).toDF("x", "y")
    val miDep = FeatureOps.mutualInformation(dep, "x", "y").as[Double].head()
    assert(math.abs(miDep - math.log(2.0)) < 1e-12)
    // independent uniform 2x2 -> every cell p=1/4 = px*py -> MI = 0
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")).toDF("x", "y")
    val miInd = FeatureOps.mutualInformation(ind, "x", "y").as[Double].head()
    assert(math.abs(miInd) < 1e-12)
  }

  test("Cramér's V: 1 for a bijection, 0 for independence; empty cells handled") {
    val dep = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q")).toDF("x", "y")
    assert(math.abs(FeatureOps.cramersV(dep, "x", "y").as[Double].head() - 1.0) < 1e-12)
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")).toDF("x", "y")
    assert(math.abs(FeatureOps.cramersV(ind, "x", "y").as[Double].head()) < 1e-12)
    // the bijection case above already exercises ABSENT cells ((a,q),(b,p)
    // never occur): V=1 is only reached because their expected counts fold
    // in through the sum-of-expectations identity
  }

  test("Cramér's V: NULL is a level (matches χ² terms); degenerate tables give NULL") {
    // y = (x is null): perfect association, but only if NULL counts as a level
    val dep = Seq((Some("a"), "p"), (Some("a"), "p"),
      (Option.empty[String], "q"), (Option.empty[String], "q")).toDF("x", "y")
    assert(math.abs(FeatureOps.cramersV(dep, "x", "y")
      .as[Option[Double]].head().get - 1.0) < 1e-12)
    // constant x -> min(r,c)-1 = 0: no association measurable -> NULL, not Inf
    val const = Seq(("a", "p"), ("a", "q")).toDF("x", "y")
    assert(FeatureOps.cramersV(const, "x", "y").as[Option[Double]].head().isEmpty)
    // all-NULL x is a single level too -> NULL
    val allNull = Seq((Option.empty[String], "p"), (Option.empty[String], "q")).toDF("x", "y")
    assert(FeatureOps.cramersV(allNull, "x", "y").as[Option[Double]].head().isEmpty)
  }

  test("target encodings keep NULL-category rows (null-safe join-back)") {
    val df = Seq(
      (Option.empty[String], 10.0), (Option.empty[String], 20.0),
      (Some("a"), 5.0), (Some("a"), 7.0),
    ).toDF("cat", "y")
    val loo = FeatureOps.targetEncodeLoo(df, "cat", "y")
      .select("cat", "y", "te_loo")
      .as[(Option[String], Double, Option[Double])].collect().toSet
    assert(loo === Set(
      (None, 10.0, Some(20.0)), (None, 20.0, Some(10.0)),
      (Some("a"), 5.0, Some(7.0)), (Some("a"), 7.0, Some(5.0))),
      "NULL category is its own group and every input row survives")
    val kf = FeatureOps.targetEncodeKFold(
        df.withColumn("fold", (col("y") > 10.0).cast("int")), "cat", "y", "fold")
      .select("cat", "y", "te_oof")
      .as[(Option[String], Double, Option[Double])].collect().toSet
    assert(kf.map(_._1).contains(None) && kf.size === 4,
      "k-fold join-back keeps NULL-category rows too")
  }

  test("k-fold OOF encoding uses only other folds; single-fold categories are NULL") {
    val df = Seq(
      // cat "a": fold 0 holds {10}, fold 1 holds {20, 30}
      ("a", 0, 10.0), ("a", 1, 20.0), ("a", 1, 30.0),
      // cat "b": one fold only -> out-of-fold slice empty -> NULL
      ("b", 0, 5.0), ("b", 0, 7.0),
    ).toDF("cat", "fold", "y")
    val got = FeatureOps.targetEncodeKFold(df, "cat", "y", "fold")
      .select("cat", "fold", "y", "te_oof")
      .as[(String, Int, Double, Option[Double])].collect().toSet
    assert(got === Set(
      ("a", 0, 10.0, Some(25.0)),  // mean of fold 1 = (20+30)/2
      ("a", 1, 20.0, Some(10.0)),  // mean of fold 0
      ("a", 1, 30.0, Some(10.0)),
      ("b", 0, 5.0, None),
      ("b", 0, 7.0, None)))
  }

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

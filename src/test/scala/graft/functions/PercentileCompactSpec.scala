package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The compact buffer must be BIT-IDENTICAL to the built-in exact
  * `percentile` — that equivalence is what lets the MAD/winsorize gates
  * keep their DuckDB oracles after dropping the boxed value-histogram.
  */
class PercentileCompactSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import PercentileCompact.percentileCompact

  private val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("grouped, near-unique + ties + nulls: identical to built-in") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 40000).map { i =>
      val v =
        if (rng.nextDouble() < 0.05) None
        else if (rng.nextDouble() < 0.3) Some((rng.nextInt(7) * 11).toDouble)
        else Some(rng.nextDouble() * 1e5 - 5e4)
      (s"g${i % 5}", v)
    } ++ Seq(("gnull", Option.empty[Double]), ("gsolo", Some(42.0)))
    val df = rows.toDF("g", "v")
    val ps = probs.mkString("array(", ",", ")")
    val got = df.groupBy("g")
      .agg(percentileCompact(col("v"), probs).as("q"))
      .as[(String, Option[Seq[Double]])].collect().toMap
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, $ps)").as("q"))
      .as[(String, Option[Seq[Double]])].collect().toMap
    assert(got === want)
    assert(got("gnull").isEmpty, "all-null group is NULL like the built-in")
    assert(got("gsolo").contains(probs.map(_ => 42.0)))
  }

  test("single-prob convenience returns a scalar double") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val got = df.agg(percentileCompact(col("v"), 0.5)).head().getDouble(0)
    assert(got === 500.5)
  }

  test("empty input: NULL") {
    val df = Seq.empty[Double].toDF("v")
    assert(df.agg(percentileCompact(col("v"), 0.5)).head().isNullAt(0))
  }

  test("casts non-double input like the built-in (long column)") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val got = df.agg(percentileCompact(col("v"), Seq(0.5))).head().getSeq[Double](0)
    assert(got === Seq(2.5))
  }

  test("SQL registration: percentile_compact(v, array(...)) works, " +
    "including the natural un-suffixed (decimal-literal) probs spelling") {
    graft.GraftExtensions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("pc_sql")
    for (probs <- Seq("array(0.25D, 0.75D)", "array(0.25, 0.75)")) {
      val got = spark.sql(
        s"SELECT percentile_compact(CAST(v AS DOUBLE), $probs) FROM pc_sql")
        .head().getSeq[Double](0)
      val want = spark.sql(
        s"SELECT percentile(v, array(0.25D, 0.75D)) FROM pc_sql")
        .head().getSeq[Double](0)
      assert(got === want, s"probs spelling $probs")
    }
  }

  test("survives shuffle-side serialization (many partitions, tiny groups)") {
    val rng = new scala.util.Random(9)
    val df = (1 to 5000).map(i => (i % 97, rng.nextDouble())).toDF("g", "v")
      .repartition(32)
    val got = df.groupBy("g").agg(percentileCompact(col("v"), 0.5).as("m"))
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("m"))
    assert(got.as[(Int, Double)].collect().toMap ===
      want.as[(Int, Double)].collect().toMap)
  }
}

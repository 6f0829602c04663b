package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property battery over GENERATED inputs for both percentile kernels: the
  * compact buffer and the two-round selection must agree bit-for-bit with
  * the built-in exact `percentile` on whatever value distribution shows up
  * — magnitude extremes, subnormals, signed zeros, dense ties, tiny and
  * unbalanced groups. (The fixed-seed unit specs cover the shapes we
  * thought of; this covers the ones we didn't.)
  */
class PercentilePropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import PercentileCompact.percentileCompact

  private val probs = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
  private val probsSql = probs.mkString("array(", ",", ")")

  // finite doubles only (the built-in's NaN placement is its own contract,
  // documented out of scope for both kernels), but deliberately nasty:
  // magnitude extremes, subnormals, ±0.0, and heavy tie mass
  private val nastyDouble: Gen[Double] = Gen.frequency(
    4 -> Gen.choose(-1e3, 1e3),
    2 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0),
    2 -> Gen.choose(-5, 5).map(_.toDouble), // tie mass
    1 -> Gen.oneOf(1e300, -1e300, 1e-300, -1e-300, Double.MinPositiveValue),
    1 -> Gen.choose(-1e9, 1e9))

  test("compact aggregate ≡ built-in on 20 generated distributions") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), nastyDouble))
    (0 until 20).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default.withSize(200), Seed(7L + i)).get
      val df = xs.toDF("g", "v").repartition(7)
      val got = df.groupBy("g").agg(percentileCompact(col("v"), probs).as("q"))
        .as[(Int, Seq[Double])].collect().toMap
      val want = df.groupBy("g").agg(expr(s"percentile(v, $probsSql)").as("q"))
        .as[(Int, Seq[Double])].collect().toMap
      assert(got.keySet === want.keySet, s"case $i")
      // compare via bits — except zero's sign: the BUILT-IN's sign at a
      // zero-valued rank is insertion-order-dependent (boxed -0.0/0.0 map
      // keys under an ordering that calls them equal); the kernels answer
      // a deterministic +0.0, so normalize the reference side only
      def bits(d: Double): Long =
        java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
      got.foreach { case (k, vs) =>
        assert(vs.map(java.lang.Double.doubleToLongBits) === want(k).map(bits),
          s"case $i group $k")
      }
    }
  }

  test("two-round selection ≡ built-in on 10 generated distributions") {
    val gen = Gen.nonEmptyListOf(nastyDouble)
    (0 until 10).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default.withSize(500), Seed(91L + i)).get
      val df = xs.toDF("v").repartition(5)
      df.createOrReplaceTempView("pp_sel")
      val got = graft.ops.QuantileSelect.exactPercentiles(df, "v", probs)
      val want = spark.sql(s"SELECT percentile(v, $probsSql) FROM pp_sel")
        .head().getSeq[Double](0)
      def bits(d: Double): Long =
        java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
      assert(got.map(java.lang.Double.doubleToLongBits) === want.map(bits),
        s"case $i")
    }
  }
}

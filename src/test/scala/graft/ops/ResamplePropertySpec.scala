package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The round-7 generate-form resamplers (sequence()-explode of per-interval
  * grid rows — no spine aggregate, no join-back) must be ROW-IDENTICAL to
  * the reference spine-join formulation on generated inputs, including the
  * shapes the rewrite argued about in prose: NULL values winning a bucket
  * (empty-bucket semantics), duplicate timestamps, pre-epoch seconds,
  * single-observation keys, and keys whose every value is NULL.
  */
class ResamplePropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val step = 100L

  /** The pre-rewrite reference: bucket-last via ordered dedup, spine from a
    * per-key min/max aggregate, left join back, ignoreNulls window fills.
    */
  private def ffillReference(df: DataFrame): DataFrame = {
    val bucketed = df.select(col("k").as("key"),
      expr(s"CAST(s AS BIGINT) - pmod(CAST(s AS BIGINT), $step)").as("bucket"),
      col("s").cast("long").as("__s"), col("v").as("__v"))
    val lastPerBucket = AggOps.dedupByKeyOrdered(bucketed, Seq("key", "bucket"),
        Seq(col("__s").desc, col("__v").desc))
      .select(col("key"), col("bucket"), col("__v"))
    val spine = lastPerBucket.groupBy("key")
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"), lit(step))).as("bucket"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(lastPerBucket, Seq("key", "bucket"), "left")
      .withColumn("value_ffill", last(col("__v"), ignoreNulls = true).over(w))
      .select(col("key").as("k"), col("bucket"), col("value_ffill"))
  }

  private def interpReference(df: DataFrame): DataFrame = {
    val bucketed = df.select(col("k").as("key"),
      expr(s"CAST(s AS BIGINT) - pmod(CAST(s AS BIGINT), $step)").as("bucket"),
      col("s").cast("long").as("__s"), col("v").as("__v"))
    val lastPerBucket = AggOps.dedupByKeyOrdered(bucketed, Seq("key", "bucket"),
        Seq(col("__s").desc, col("__v").desc))
      .select(col("key"), col("bucket"), col("__v"))
    val spine = lastPerBucket.groupBy("key")
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"), lit(step))).as("bucket"))
    val back = Window.partitionBy(col("key")).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(col("key")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val obsBucket = when(col("__v").isNotNull, col("bucket"))
    spine.join(lastPerBucket, Seq("key", "bucket"), "left")
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(back))
      .withColumn("__nv", last(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nb", last(obsBucket, ignoreNulls = true).over(fwd))
      .withColumn("value_interp",
        when(col("__v").isNotNull, col("__v"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv"))
            * (col("bucket") - col("__pb")) / (col("__nb") - col("__pb"))))
      .select(col("key").as("k"), col("bucket"), col("value_interp"))
  }

  private def genEvents(seed: Long): Seq[(Long, Long, Option[Double])] = {
    val gen = Gen.listOfN(80, for {
      k <- Gen.choose(0L, 3L)
      s <- Gen.frequency(
        8 -> Gen.choose(-500L, 2500L),
        2 -> Gen.oneOf(-500L, 0L, 99L, 100L, 2500L)) // boundary mass
      v <- Gen.frequency(
        7 -> Gen.choose(-100.0, 100.0).map(Option(_)),
        2 -> Gen.const(Option.empty[Double]), // NULL values
        1 -> Gen.oneOf(Option(0.0), Option(-0.0)))
    } yield (k, s, v))
    gen.apply(Gen.Parameters.default, Seed(seed)).get
  }

  private def rows(df: DataFrame): Set[(Long, Long, Option[Double])] =
    df.as[(Long, Long, Option[Double])].collect().toSet

  test("generate-form ffill ≡ spine-join reference on 12 generated inputs " +
    "(nulls, duplicate timestamps, pre-epoch, single-obs keys)") {
    (0 until 12).foreach { i =>
      val df = genEvents(100L + i).toDF("k", "s", "v").repartition(5)
      val got = rows(WindowOps.resampleFfill(df, "k", "s", "v", step))
      val want = rows(ffillReference(df))
      assert(got === want, s"case $i diverged")
    }
  }

  test("generate-form interp ≡ spine-join reference on 12 generated inputs") {
    (0 until 12).foreach { i =>
      val df = genEvents(900L + i).toDF("k", "s", "v").repartition(5)
      val got = rows(WindowOps.resampleInterp(df, "k", "s", "v", step))
      val want = rows(interpReference(df))
      assert(got === want, s"case $i diverged")
    }
  }

  test("all-null-value key: every grid row NULL, span still from observed buckets") {
    val df = Seq((1L, 50L, Option.empty[Double]), (1L, 350L, Option.empty[Double]),
      (2L, 0L, Option(5.0))).toDF("k", "s", "v")
    val got = rows(WindowOps.resampleFfill(df, "k", "s", "v", step))
    assert(got === Set((1L, 0L, None), (1L, 100L, None), (1L, 200L, None),
      (1L, 300L, None), (2L, 0L, Some(5.0))))
    val gotI = rows(WindowOps.resampleInterp(df, "k", "s", "v", step))
    assert(gotI === Set((1L, 0L, None), (1L, 100L, None), (1L, 200L, None),
      (1L, 300L, None), (2L, 0L, Some(5.0))))
  }
}

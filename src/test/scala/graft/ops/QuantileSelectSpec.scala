package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Two-round distributed selection must be BIT-IDENTICAL to the built-in
  * exact `percentile` aggregate — that equivalence is what lets the
  * equi-depth / MAD gates keep their DuckDB oracles after dropping the
  * value-histogram aggregate.
  */
class QuantileSelectSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)

  private def builtin(dfName: String, valueCol: String): Seq[Double] = {
    val ps = probs.mkString("array(", ",", ")")
    spark.sql(s"SELECT percentile(CAST($valueCol AS DOUBLE), $ps) FROM $dfName")
      .head().getSeq[Double](0)
  }

  test("near-unique doubles: selection == built-in percentile, bitwise") {
    val rng = new scala.util.Random(7)
    val df = (1 to 50000).map(_ => rng.nextDouble() * 1e6 - 5e5).toDF("v")
    df.createOrReplaceTempView("qs_uniq")
    val got = QuantileSelect.exactPercentiles(df, "v", probs)
    assert(got === builtin("qs_uniq", "v"))
  }

  test("heavy ties + nulls: identical to built-in (fallback path tolerated)") {
    val rng = new scala.util.Random(11)
    // 90% of mass on 5 tied values → every bracket lands inside a tie run
    val vals = (1 to 20000).map { _ =>
      if (rng.nextDouble() < 0.9) Some((rng.nextInt(5) * 10).toDouble)
      else if (rng.nextDouble() < 0.05) None
      else Some(rng.nextDouble() * 100)
    }
    val df = vals.toDF("v")
    df.createOrReplaceTempView("qs_ties")
    val got = QuantileSelect.exactPercentiles(df, "v", probs)
    assert(got === builtin("qs_ties", "v"))
  }

  test("coarse sketch vs small band cap: adaptive accuracy retry stays " +
    "exact (never the value-histogram fallback at scale)") {
    val rng = new scala.util.Random(17)
    val df = (1 to 50000).map(_ => rng.nextDouble() * 1e6).toDF("v")
    df.createOrReplaceTempView("qs_retry")
    // accuracy 100 → expected band ≈ 8n/100 = 4000 rows per fence, over the
    // 2000 cap: the first round must re-sketch finer, not give up
    val got = QuantileSelect.exactPercentiles(df, "v", probs,
      accuracy = 100, bandCap = 2000)
    assert(got === builtin("qs_retry", "v"))
  }

  test("tiny n (below sketch resolution): still exact") {
    val df = Seq(3.0, 1.0, 2.0).toDF("v")
    df.createOrReplaceTempView("qs_tiny")
    assert(QuantileSelect.exactPercentiles(df, "v", probs) ===
      builtin("qs_tiny", "v"))
    assert(QuantileSelect.exactPercentiles(Seq.empty[Double].toDF("v"), "v",
      Seq(0.5)) === Seq.empty)
  }

  test("grouped: fence relation == built-in grouped percentile, incl. " +
    "all-null and singleton groups") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 30000).map { i =>
      (s"g${i % 7}", Some(rng.nextDouble() * 1000))
    } ++ Seq(("gnull", Option.empty[Double]), ("gnull", Option.empty[Double]),
      ("gsolo", Some(42.0)))
    val df = rows.toDF("g", "v")
    val got = QuantileSelect.groupPercentile(df, Seq("g"), col("v"), 0.5, "med")
      .as[(String, Option[Double])].collect().toMap
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("med"))
      .as[(String, Option[Double])].collect().toMap
    assert(got === want)
    assert(got("gnull").isEmpty, "all-null group yields NULL like the built-in")
    assert(got("gsolo").contains(42.0))
  }

  test("grouped: NULL group-key group is kept, like the built-in") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (Option.empty[String], 10.0), (Option.empty[String], 20.0)).toDF("g", "v")
    val got = QuantileSelect.groupPercentile(df, Seq("g"), col("v"), 0.5, "med")
      .as[(Option[String], Double)].collect().toMap
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("med"))
      .as[(Option[String], Double)].collect().toMap
    assert(got === want)
    assert(got(None) === 15.0, "NULL-key group must not be dropped by the fence join")
  }

  test("grouped heavy ties: constant group matches built-in") {
    val df = ((1 to 1000).map(_ => ("c", 7.0)) ++
      (1 to 1000).map(i => ("m", i.toDouble))).toDF("g", "v")
    val got = QuantileSelect.groupPercentile(df, Seq("g"), col("v"), 0.5, "med")
      .as[(String, Double)].collect().toMap
    assert(got === Map("c" -> 7.0, "m" -> 500.5))
  }

  test("grouped band overflow raises the loud bandCap error, never OOM or " +
    "a wrong fence") {
    // constant group: every row is IN the band, so a tiny cap must trip —
    // across partitions, so the overflow fact must survive merge/shuffle
    val df = (1 to 5000).map(_ => ("c", 7.0)).toDF("g", "v").repartition(8)
    val e = intercept[Exception] {
      QuantileSelect.groupPercentile(df, Seq("g"), col("v"), 0.5, "med",
        bandCap = 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("bandCap")),
      s"expected the actionable bandCap message, got: $e")
  }

  test("bounded collect: cap respected per group, others unaffected") {
    import graft.functions.BoundedSortedCollect.boundedSortedCollect
    val df = ((1 to 500).map(i => ("big", i.toDouble)) ++
      Seq(("small", 2.0), ("small", 1.0))).toDF("g", "v").repartition(4)
    val got = df.groupBy("g")
      .agg(boundedSortedCollect(col("v"), 100).as("band"))
      .as[(String, Option[Seq[Double]])].collect().toMap
    assert(got("big").isEmpty, "over-cap group must evaluate to NULL")
    assert(got("small") === Some(Seq(1.0, 2.0)), "sorted, unaffected")
  }
}

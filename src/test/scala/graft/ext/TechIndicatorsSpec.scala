package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TechIndicatorsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def series(vs: Double*) =
    vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "t", "v")

  test("ema: recursive fold e0=x0, e=αx+(1-α)e; bounded frame truncates warm-up") {
    val out = TechIndicators.ema(series(1.0, 2.0, 3.0), "k", Seq("t"), "v",
        alpha = 0.5, span = 30)
      .orderBy("t").select("ema").as[Double].collect()
    assert(out.toSeq === Seq(1.0, 1.5, 2.25))
    // span=2: each row's fold sees only (prev, current) — row 2 restarts
    // from x1 as its seed, not the full-history EMA
    val truncated = TechIndicators.ema(series(1.0, 2.0, 3.0), "k", Seq("t"), "v",
        alpha = 0.5, span = 2)
      .orderBy("t").select("ema").as[Double].collect()
    assert(truncated.toSeq === Seq(1.0, 1.5, 2.5)) // fold([3], seed 2)
  }

  test("rsi: all-up 100, all-down 0, flat NULL; first row's delta is 0") {
    val up = TechIndicators.rsi(series(1, 2, 3, 4), "k", Seq("t"), "v", period = 14)
      .orderBy("t").select("rsi").as[Option[Double]].collect()
    assert(up.head.isEmpty)       // no movement yet -> ag+al=0 -> NULL
    assert(up.tail.forall(_.contains(100.0)))
    val down = TechIndicators.rsi(series(4, 3, 2, 1), "k", Seq("t"), "v", period = 14)
      .orderBy("t").select("rsi").as[Option[Double]].collect()
    assert(down.tail.forall(_.contains(0.0)))
    val flat = TechIndicators.rsi(series(5, 5, 5), "k", Seq("t"), "v", period = 14)
      .select("rsi").as[Option[Double]].collect()
    assert(flat.forall(_.isEmpty))
  }

  test("macd: constant series gives 0; rising series gives positive") {
    val const = TechIndicators.macd(series(Seq.fill(30)(7.0): _*), "k", Seq("t"), "v")
      .select("macd").as[Double].collect()
    assert(const.forall(m => math.abs(m) < 1e-12))
    val rising = TechIndicators.macd(series((1 to 30).map(_.toDouble): _*),
        "k", Seq("t"), "v")
      .orderBy("t").select("macd").as[Double].collect()
    assert(rising.last > 0) // fast EMA rides closer to the latest (highest) price
  }

  test("bollinger: constant series collapses bands onto the mean; n=1 NULL sd") {
    val out = TechIndicators.bollinger(series(5, 5, 5, 5), "k", Seq("t"), "v",
        period = 3, k = 2.0)
      .orderBy("t").select("bb_mid", "bb_up", "bb_dn")
      .as[(Double, Option[Double], Option[Double])].collect()
    assert(out.head._2.isEmpty && out.head._3.isEmpty) // single-row frame
    out.tail.foreach { case (mid, up, dn) =>
      assert(mid === 5.0 && up.contains(5.0) && dn.contains(5.0))
    }
    // hand case: frame [1, 3] -> mean 2, s2=10, var=(10-8)/1=2
    val hand = TechIndicators.bollinger(series(1, 3), "k", Seq("t"), "v",
        period = 2, k = 1.0)
      .orderBy("t").select("bb_up").as[Option[Double]].collect().last
    assert(math.abs(hand.get - (2.0 + math.sqrt(2.0))) < 1e-12)
  }

  test("bollinger: windowed sums are BIT-IDENTICAL to the collect_list fold at sf0.1") {
    // Spark evaluates bounded sliding frames by re-running the aggregate
    // buffer over the frame in row order per output row — a left fold. This
    // pins the windowed form (shipped) against the fold form (the DuckDB
    // oracle's shape) EXACTLY, not rounded, on the full sf0.1 events table:
    // any future engine change to frame evaluation order must fail here
    // before it corrupts the oracle gate.
    //
    // SPARK-VERSION DEPENDENCY (keep this test mandatory): the bit-parity
    // rests on SlidingWindowFunctionFrame (Spark 4.1.x) re-accumulating
    // the bounded frame sequentially. If an upgrade switches bounded
    // frames to retract- or tree-based accumulation, float association
    // order changes and cross-engine hashes can flip at rounding-grid
    // midpoints with no other symptom — a failure HERE after a Spark bump
    // means fin_bollinger (and any windowed-sum-vs-fold gate) must move
    // back to the explicit collect_list+fold form, not that this test is
    // stale.
    val events = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, 0)
    val vals = collect_list(col("value")).over(w)
    val st = graft.functions.FoldStats.foldStats(vals)
    val mismatches = TechIndicators.bollinger(events, "user_id",
        Seq("ts", "event_id"), "value", period = 20, k = 2.0)
      .withColumn("f_s1", st.getField("s1"))
      .withColumn("f_s2", st.getField("s2"))
      .withColumn("w_s1", sum(col("value")).over(w))
      .withColumn("w_s2", sum(col("value") * col("value")).over(w))
      // null-safe inequality: =!= is NULL for (0.0, NULL), silently passing
      // the one divergent shape (all-NULL frame: fold 0.0 vs windowed NULL)
      .filter(!(col("f_s1") <=> col("w_s1")) || !(col("f_s2") <=> col("w_s2")))
      .count()
    assert(mismatches === 0L,
      "windowed frame sums must fold sequentially, bit-identical to collect_list+fold")
  }

  test("drawdown: distance from the running peak; zero peak guards NULL") {
    val out = TechIndicators.drawdown(series(10, 5, 20, 10), "k", Seq("t"), "v")
      .orderBy("t").select("drawdown").as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(0.0), Some(0.5), Some(0.0), Some(0.5)))
    val zero = TechIndicators.drawdown(series(0.0, -1.0), "k", Seq("t"), "v")
      .orderBy("t").select("drawdown").as[Option[Double]].collect()
    assert(zero.head.isEmpty) // peak 0 -> division guarded
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** A1–A5 aggregation, W1 window, J2 agg-join-back semantics — including the
  * SURVEY.md §5 property checks (dedup idempotence, window-agg ≡ agg-join,
  * lag-delta telescoping).
  */
class AggWindowSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ≥2 tickers × ≥3 dates, out-of-order rows (FIXTURES.md §A2)
  private def quotes = Seq(
    ("ITUB4.SA", "Banks", "2024-05-03", 29.0, 300L),
    ("ITUB4.SA", "Banks", "2024-05-01", 27.0, 100L),
    ("ITUB4.SA", "Banks", "2024-05-02", 28.0, 200L),
    ("PETR4.SA", "Energy", "2024-05-02", 41.0, 20L),
    ("PETR4.SA", "Energy", "2024-05-01", 40.0, 10L),
  ).toDF("ticker", "sector", "date", "close", "volume")

  test("W1 lagDelta handles out-of-order input per key") {
    val out = WindowOps.lagDelta(quotes, Seq("ticker"), Seq($"date".asc), "close", "var")
      .select("ticker", "date", "var").orderBy("ticker", "date").collect()
    val itub = out.filter(_.getString(0) == "ITUB4.SA").map(r => Option(r.get(2)))
    assert(itub.toSeq === Seq(None, Some(1.0), Some(1.0)))
  }

  test("W1 lag-delta telescoping: sum of deltas = last - first close per key") {
    val deltas = WindowOps.lagDelta(quotes, Seq("ticker"), Seq($"date".asc), "close", "var")
    val sums = deltas.groupBy("ticker").agg(sum("var").as("s"))
      .as[(String, Double)].collect().toMap
    assert(sums("ITUB4.SA") === 2.0 && sums("PETR4.SA") === 1.0)
  }

  test("A1+J2: window-agg form ≡ reference agg-then-join form") {
    val viaWindow = JoinOps.withGroupAggregates(quotes, Seq("sector"),
        Seq("media" -> avg($"close"), "total" -> sum($"volume")))
      .select("ticker", "date", "media", "total")
    val viaJoin = JoinOps.aggJoinBack(quotes, Seq("sector"),
        Seq(avg($"close").as("media"), sum($"volume").as("total")))
      .select("ticker", "date", "media", "total")
    assert(viaWindow.orderBy("ticker", "date").collect().toSeq ===
           viaJoin.orderBy("ticker", "date").collect().toSeq)
  }

  test("J2 aggJoinBack: AQE broadcasts a small aggregated side by itself") {
    // no static broadcast() hint (a high-cardinality groupBy would OOM the
    // driver if forced); AQE must still pick BHJ for sector-sized keys
    val out = JoinOps.aggJoinBack(quotes, Seq("sector"), Seq(avg($"close").as("media")))
    out.collect() // run so AQE finalizes the physical plan
    val finalPlan = out.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"expected AQE to choose a broadcast join, got:\n$finalPlan")
  }

  test("A5 dedupByKeyOrdered keeps the row_number=1 survivor deterministically") {
    val dups = Seq(("l1", "t-late", "2024-05-02"), ("l1", "t-early", "2024-05-01"),
      ("l2", "x", "2024-05-01")).toDF("link", "title", "d")
    val out = AggOps.dedupByKeyOrdered(dups, Seq("link"), Seq($"d".asc, $"title".asc))
      .orderBy("link").as[(String, String, String)].collect()
    assert(out.toSeq === Seq(("l1", "t-early", "2024-05-01"), ("l2", "x", "2024-05-01")))
  }

  test("A4/A5 dedup idempotence (property, scalacheck-generated inputs)") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.alphaStr.map(_.take(3))))
    (0 until 10).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default, Seed(42L + i)).get
      val df = xs.toDF("k", "v")
      val once = AggOps.distinctRows(df)
      assert(AggOps.distinctRows(once).count() === once.count())
      val keyed = AggOps.dedupByKeyOrdered(df, Seq("k"), Seq($"v".asc))
      assert(AggOps.dedupByKeyOrdered(keyed, Seq("k"), Seq($"v".asc)).count() === keyed.count())
    }
  }

  test("HLL approx_count_distinct within rsd of exact on testdata") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val approx = AggOps.approxDistinct(li, Seq.empty, "l_partkey", rsd = 0.05)
      .head().getLong(0).toDouble
    val exact = li.select(countDistinct($"l_partkey")).head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.15)
  }

  test("approx_percentile tracks exact per-group quantiles within tolerance") {
    val o = graft.Tables.orders(spark, sfDir)
    val approx = o.groupBy("o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)").as("p"))
      .select($"o_orderpriority", $"p".getItem(0).as("p50"), $"p".getItem(1).as("p95"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = o.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.95))").as("p"))
      .select($"o_orderpriority", $"p".getItem(0).as("p50"), $"p".getItem(1).as("p95"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"$k p95: $a95 vs $e95")
    }
  }

  test("hll sketches: union of fine sketches == direct sketch, both near exact") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val merged = AggOps.hllMergeEstimate(
        AggOps.hllSketches(li, Seq("l_returnflag", "l_linestatus"), "l_partkey"),
        Seq("l_returnflag"))
      .as[(String, Long)].collect().toMap
    // direct one-level sketch of the same rollup: union over sketch state
    // is exact, so the two paths must agree EXACTLY, not just approximately
    val direct = AggOps.hllMergeEstimate(
        AggOps.hllSketches(li, Seq("l_returnflag"), "l_partkey"),
        Seq("l_returnflag"))
      .as[(String, Long)].collect().toMap
    assert(merged === direct, "sketch union must be lossless over sketch state")
    val exact = li.groupBy("l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n).toDouble / n < 0.05,
        s"estimate ${merged(k)} vs exact $n for $k")
    }
  }

  test("resampleFfill: grid spans first..last bucket, gaps carry last value") {
    // key 1: events at t=0 (v=1.0), t=250 (v=3.0) with step 100 →
    // buckets 0,100,200: 100 is a GAP (fills 1.0), 200 takes 3.0.
    // In-bucket tie at t=0: later event (t=50, v=2.0) wins bucket 0.
    val df = Seq(
      (1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 250L, 3.0),
      (2L, 500L, 9.0),
    ).toDF("k", "s", "v")
    val out = WindowOps.resampleFfill(df, "k", "s", "v", stepSeconds = 100)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 0L)) === 2.0, "latest event in the bucket wins")
    assert(out((1L, 100L)) === 2.0, "gap bucket inherits the previous value")
    assert(out((1L, 200L)) === 3.0)
    assert(out((2L, 500L)) === 9.0)
    assert(out.size === 4, "no buckets outside each key's span")
  }

  test("resampleFfill: pre-epoch timestamps bucket with FLOOR semantics") {
    // t=-150 must snap to -200, not -100: `div` truncates toward zero and
    // would put a pre-1970 event in the NEXT bucket (and diverge from the
    // DuckDB oracle's `//` floor division)
    val df = Seq((1L, -150L, 5.0), (1L, 40L, 7.0)).toDF("k", "s", "v")
    val out = WindowOps.resampleFfill(df, "k", "s", "v", stepSeconds = 100)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, -200L)) === 5.0, "negative epoch floors DOWN to its bucket")
    assert(out((1L, -100L)) === 5.0, "gap carries forward across the epoch")
    assert(out((1L, 0L)) === 7.0, "t=40 floors to bucket 0")
    assert(out.size === 3)
  }

  test("agg-state merge == direct aggregate; keys in one side pass through") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("c", 7.0)).toDF("g", "v")
    val s1 = AggOps.buildAggState(df.filter($"v" <= 3.0), Seq("g"), "v") // a only
    val s2 = AggOps.buildAggState(df.filter($"v" > 3.0), Seq("g"), "v")  // b, c
    val merged = AggOps.mergeAggState(s1, s2, Seq("g"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val direct = AggOps.buildAggState(df, Seq("g"), "v")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(merged === direct)
    assert(merged("a") === ((2L, 4.0, 1.0, 3.0)), "overlapping key: counts and sums add")
    assert(merged("c") === ((1L, 7.0, 7.0, 7.0)), "one-sided key passes through")
    // associativity: ((s1 ⊕ s2) ⊕ s2') == direct over the tripled 'a' slice
    val s3 = AggOps.buildAggState(Seq(("a", 5.0)).toDF("g", "v"), Seq("g"), "v")
    val chained = AggOps.mergeAggState(AggOps.mergeAggState(s1, s2, Seq("g")), s3, Seq("g"))
      .filter($"g" === "a").as[(String, Long, Double, Double, Double)].head()
    assert(chained === (("a", 3L, 9.0, 1.0, 5.0)))
  }

  test("agg-state merge ≡ direct (property: random values, random split)") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 4), Gen.choose(-100, 100)))
    (0 until 5).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default, Seed(7L + i)).get
        .map { case (g, v) => (s"g$g", v.toDouble) }
      val df = xs.toDF("g", "v")
      val split = xs.indices.map(_ % 2 == 0)
      val left = xs.zip(split).collect { case (x, true) => x }.toDF("g", "v")
      val right = xs.zip(split).collect { case (x, false) => x }.toDF("g", "v")
      val m = AggOps.mergeAggState(
        AggOps.buildAggState(left, Seq("g"), "v"),
        AggOps.buildAggState(right, Seq("g"), "v"), Seq("g"))
        .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
      val d = AggOps.buildAggState(df, Seq("g"), "v")
        .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
      assert(m === d, s"seed ${7 + i}")
    }
  }

  test("globalIndex property: contiguous 1..n and order-preserving on random keys") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-1000000L, 1000000L)).map(_.distinct)
    (0 until 5).foreach { i =>
      val keys = gen.apply(Gen.Parameters.default, Seed(21L + i)).get
      val out = IndexOps.globalIndex(keys.toDF("k"), "k", numBuckets = 7)
        .as[(Long, Long)].collect().sortBy(_._2)
      assert(out.map(_._2).toSeq === (1L to keys.length).toSeq, s"seed ${21 + i}: not contiguous")
      assert(out.map(_._1).toSeq === keys.sorted.toSeq, s"seed ${21 + i}: order broken")
    }
  }

  test("resampleInterp: observed buckets exact, gaps on the straight line") {
    // key 1: observed buckets 0 (v=2.0 — later event in bucket wins) and
    // 300 (v=8.0); gaps at 100, 200 interpolate to 4.0, 6.0.
    val df = Seq(
      (1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 350L, 8.0),
      (2L, 500L, 9.0),
    ).toDF("k", "s", "v")
    val out = WindowOps.resampleInterp(df, "k", "s", "v", stepSeconds = 100)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 0L)) === 2.0, "observed bucket keeps its (last) value")
    assert(out((1L, 100L)) === 4.0, "1/3 of the way from 2.0 to 8.0")
    assert(out((1L, 200L)) === 6.0, "2/3 of the way")
    assert(out((1L, 300L)) === 8.0)
    assert(out((2L, 500L)) === 9.0, "single-observation key: just itself")
    assert(out.size === 5, "no extrapolation outside each key's span")
  }

  test("incrementalJoinDelta: old view + delta == full join, no row lost or doubled") {
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "av")
    val da = Seq((2L, "da2"), (4L, "da4")).toDF("k", "av")    // matches base b AND delta b
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    val db = Seq((3L, "db3"), (4L, "db4")).toDF("k", "bv")
    val full = a.unionByName(da).join(b.unionByName(db), Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq
    val maintained = a.join(b, Seq("k"))
      .unionByName(graft.ops.JoinOps.incrementalJoinDelta(a, da, b, db, Seq("k")))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(maintained === full)
    // every quadrant fired: base-base (1), delta-base (2,da2,b2),
    // base-delta (3), delta-delta (4)
    assert(full.map(_._1).distinct === Seq(1L, 2L, 3L, 4L))
  }
}

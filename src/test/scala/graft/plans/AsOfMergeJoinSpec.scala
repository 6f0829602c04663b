package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}
import graft.ops.{AggOps, AsOfJoin}

/** The custom-physical-operator as-of join must be row-identical to the
  * union+window form on every contract point, and its plan must be the
  * declared shape: the custom exec fed by clustered+sorted children.
  */
class AsOfMergeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hand fixture: ties visible, per-key carry, no-match rows NULL") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 11:00:00"), 2.0),
      ("B", ts("2024-01-01 10:30:00"), 9.0),
    ).toDF("k", "t", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 09:59:00"), 10L), // before any quote -> null
      ("A", ts("2024-01-01 10:00:00"), 11L), // tie -> 10:00 quote visible
      ("A", ts("2024-01-01 10:59:59"), 12L),
      ("A", ts("2024-01-01 12:00:00"), 13L),
      ("B", ts("2024-01-01 11:00:00"), 14L),
      ("C", ts("2024-01-01 11:00:00"), 15L), // no key -> null
    ).toDF("k", "t", "qty")
    val out = AsOfMergeJoin.asOf(trades, quotes, "k", "k", "t", "t", Seq("px"))
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(10L -> None, 11L -> Some(1.0), 12L -> Some(1.0),
      13L -> Some(2.0), 14L -> Some(9.0), 15L -> None))
  }

  test("rightTieBreak: max tie-break row wins among equal (key, time); " +
    "folded form ≡ explicit pre-dedup") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0, 7L),
      ("A", ts("2024-01-01 10:00:00"), 2.0, 9L), // same (k,t): max ver wins
      ("A", ts("2024-01-01 10:00:00"), 3.0, 8L),
      ("A", ts("2024-01-01 11:00:00"), 4.0, 1L),
    ).toDF("k", "t", "px", "ver")
    val trades = Seq(
      ("A", ts("2024-01-01 10:30:00"), 10L),
      ("A", ts("2024-01-01 11:30:00"), 11L),
    ).toDF("k", "t", "qty")
    val out = AsOfMergeJoin.asOf(trades, quotes, "k", "k", "t", "t",
        Seq("px", "ver"), rightTieBreak = Seq("ver"))
      .select("qty", "px", "ver").as[(Long, Double, Long)].collect().toSet
    assert(out === Set((10L, 2.0, 9L), (11L, 4.0, 1L)),
      "ALL carried attrs must come from the max-tie-break row")

    // testdata scale: folded tie-break ≡ dedupByKeyOrdered pre-dedup
    val ordersRaw = Tables.orders(spark, sfDir)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val folded = AsOfMergeJoin.asOf(events, ordersRaw, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"),
      rightTieBreak = Seq("o_orderkey"))
    val dedupFirst = AsOfMergeJoin.asOf(events,
      AggOps.dedupByKeyOrdered(ordersRaw, Seq("o_custkey", "o_orderdate"),
        Seq($"o_orderkey".desc)),
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
    assert(folded.exceptAll(dedupFirst).isEmpty && dedupFirst.exceptAll(folded).isEmpty,
      "tie-break fold must be row-identical to the explicit pre-dedup")
  }

  test("merge exec ≡ union+window form on testdata (events × orders)") {
    // o_orderdate parquet-reads as TIMESTAMP_NTZ; the merge exec's contract
    // demands identical time types (UTC session: the cast is identity)
    val orders = AggOps.dedupByKeyOrdered(Tables.orders(spark, sfDir),
      Seq("o_custkey", "o_orderdate"), Seq($"o_orderkey".desc))
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val window = AsOfJoin.asOf(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
    val merge = AsOfMergeJoin.asOf(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
    assert(merge.count() === events.count(), "exactly the left rows")
    assert(merge.exceptAll(window).isEmpty && window.exceptAll(merge).isEmpty,
      "custom exec must be row-identical to the window form")
  }

  test("SELF as-of join (shared exprIds): right attrs carry RIGHT values, " +
    "not left-side ordinal aliases") {
    // one DataFrame on both sides — without the fresh-exprId re-alias,
    // BindReferences silently binds the right payload to left ordinals
    val ev = Seq(
      ("A", 10L, 100.0),
      ("A", 20L, 200.0),
      ("A", 30L, 300.0),
    ).toDF("k", "t", "v")
    val lagged = ev.withColumn("t", col("t") + 5) // probe strictly after each row
    val out = AsOfMergeJoin.asOf(lagged, ev, "k", "k", "t", "t", Seq("v"))
    // output has two 'v' columns (left then right payload) — read by position
    val rows = out.collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(rows === Set((15L, 100.0, 100.0), (25L, 200.0, 200.0), (35L, 300.0, 300.0)))
    // and a DERIVED self side (where left v was shifted) must not leak left values
    val shifted = ev.withColumn("v", col("v") * 10)
    val out2 = AsOfMergeJoin.asOf(shifted, ev, "k", "k", "t", "t", Seq("v"))
    val got = out2.collect().map(r => (r.getDouble(2), r.getDouble(3))).toSet
    assert(got === Set((1000.0, 100.0), (2000.0, 200.0), (3000.0, 300.0)),
      "right payload must be the ORIGINAL values, not the shifted left ones")
  }

  test("merge loop keeps within 2x of the codegen'd window form on " +
    "unbucketed sf inputs (specialized comparators)") {
    val orders = AggOps.dedupByKeyOrdered(Tables.orders(spark, sfDir),
      Seq("o_custkey", "o_orderdate"), Seq($"o_orderkey".desc))
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .localCheckpoint()
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
      .localCheckpoint()
    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (codegen compile out of the measurement), then
    // take the MIN of two timed runs per path — a single run flakes on GC
    // pauses / co-scheduled load, and min-of-N is the standard antidote
    AsOfJoin.asOf(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey")).count()
    AsOfMergeJoin.asOf(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey")).count()
    def minOf2(f: => Double): Double = math.min(f, f)
    val tw = minOf2(timeIt(AsOfJoin.asOf(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey")).count()))
    val tm = minOf2(timeIt(AsOfMergeJoin.asOf(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_orderkey")).count()))
    assert(tm <= tw * 2.0 + 0.5,
      f"merge exec $tm%.2f s vs window $tw%.2f s — interpreted-loop regression")
  }

  test("plan shape: custom exec present, children clustered and sorted") {
    val quotes = Seq(("A", 10L, 1.0)).toDF("k", "t", "px")
    val trades = Seq(("A", 11L, 5L)).toDF("k", "t", "qty")
    val df = AsOfMergeJoin.asOf(trades, quotes, "k", "k", "t", "t", Seq("px"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsOfMergeJoin"), s"custom exec missing:\n$p")
    assert(p.contains("Sort"), s"EnsureRequirements must insert the (key,time) sorts:\n$p")
    assert(!p.contains("Window") && !p.contains("Union"),
      s"the whole point: no union, no window state:\n$p")
  }

  test("right side is column-pruned to key+time+attrs all the way into the " +
    "parquet scan (custom nodes are opaque to ColumnPruning — the builder " +
    "must prune)") {
    val orders = Tables.orders(spark, sfDir)
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val df = AsOfMergeJoin.asOf(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate", Seq("o_totalprice"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val ordersScan = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("o_custkey")).mkString
    assert(ordersScan.nonEmpty, s"orders scan not found:\n$p")
    assert(!ordersScan.contains("o_comment") && !ordersScan.contains("o_clerk"),
      s"unused order columns leaked into the scan: $ordersScan")
  }

  test("the exec's raison d'être: co-bucketed children join with ZERO exchanges") {
    // the union+window form can NEVER elide its shuffle (the union of both
    // sides has no pre-existing partitioning); the custom exec declares
    // ClusteredDistribution per child, so bucketed tables satisfy it as-is
    spark.sql("CREATE DATABASE IF NOT EXISTS asof_db")
    Seq("trades_b", "quotes_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS asof_db.$t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"asof_db.db/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    Tables.events(spark, sfDir).select($"user_id", $"ts", $"value")
      .write.bucketBy(8, "user_id").sortBy("user_id", "ts")
      .saveAsTable("asof_db.trades_b")
    Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderdate".cast("timestamp").as("o_orderdate"), $"o_totalprice")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey", "o_orderdate")
      .saveAsTable("asof_db.quotes_b")
    val df = AsOfMergeJoin.asOf(
      spark.table("asof_db.trades_b"), spark.table("asof_db.quotes_b"),
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_totalprice"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"),
      s"co-bucketed as-of must read bucket-local, shuffle NOTHING:\n$p")
    assert(p.contains("AsOfMergeJoin") && p.contains("Bucketed: true"),
      s"custom exec over bucketed scans expected:\n$p")
    assert(df.count() === spark.table("asof_db.trades_b").count())
  }

  test("NULL left key gets no match; NULL-attr right rows carry as NULL") {
    val quotes = Seq((Some("A"), 10L, Option.empty[Double]),
      (Some("A"), 5L, Some(1.0))).toDF("k", "t", "px")
    val trades = Seq((Some("A"), 20L, 1L), (Option.empty[String], 20L, 2L))
      .toDF("k", "t", "qty")
    val out = AsOfMergeJoin.asOf(trades, quotes, "k", "k", "t", "t", Seq("px"))
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === None, "matched row's own NULL px stays NULL (no backfill)")
    assert(out(2L) === None, "NULL left key never matches")
  }
}

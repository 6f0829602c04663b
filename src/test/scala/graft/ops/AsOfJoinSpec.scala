package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf attaches latest right row at-or-before left time, per key") {
    val quotes = Seq( // (key, time, px)
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 11:00:00"), 2.0),
      ("B", ts("2024-01-01 10:30:00"), 9.0),
    ).toDF("k", "t", "px")
    val trades = Seq( // (key, time, qty)
      ("A", ts("2024-01-01 09:59:00"), 10L), // before any quote -> null
      ("A", ts("2024-01-01 10:00:00"), 11L), // tie -> matches 10:00 quote
      ("A", ts("2024-01-01 10:59:59"), 12L), // -> 10:00 quote
      ("A", ts("2024-01-01 12:00:00"), 13L), // -> 11:00 quote
      ("B", ts("2024-01-01 11:00:00"), 14L), // -> B's quote
      ("C", ts("2024-01-01 11:00:00"), 15L), // no key match -> null
    ).toDF("k", "t", "qty")

    val out = AsOfJoin.asOf(trades, quotes,
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      rightAttrs = Seq("px"))
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap

    assert(out(10L).isEmpty, "no quote yet")
    assert(out(11L).contains(1.0), ">= tie matches")
    assert(out(12L).contains(1.0))
    assert(out(13L).contains(2.0))
    assert(out(14L).contains(9.0))
    assert(out(15L).isEmpty, "unknown key stays null")
  }

  test("asOf directions: forward takes the next quote, nearest the closer side (ties backward)") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 12:00:00"), 2.0),
    ).toDF("k", "t", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 09:00:00"), 10L), // before all: fwd/near -> 1.0, back -> null
      ("A", ts("2024-01-01 10:30:00"), 11L), // back 1.0; fwd 2.0; nearer to 10:00 -> 1.0
      ("A", ts("2024-01-01 11:30:00"), 12L), // nearer to 12:00 -> 2.0
      ("A", ts("2024-01-01 11:00:00"), 13L), // EXACT midpoint: tie -> backward 1.0
      ("A", ts("2024-01-01 13:00:00"), 14L), // after all: fwd -> null, near -> 2.0
    ).toDF("k", "t", "qty")
    def run(d: String) = AsOfJoin.asOf(trades, quotes, "k", "k", "t", "t",
      Seq("px"), direction = d)
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap
    val fwd = run("forward")
    assert(fwd(10L).contains(1.0) && fwd(11L).contains(2.0) &&
      fwd(13L).contains(2.0) && fwd(14L).isEmpty)
    val near = run("nearest")
    assert(near(10L).contains(1.0), "only a future quote exists")
    assert(near(11L).contains(1.0) && near(12L).contains(2.0))
    assert(near(13L).contains(1.0), "equidistant tie must take the backward match")
    assert(near(14L).contains(2.0), "only a past quote exists")
  }

  test("asOf: NULL left time matches nothing in every direction") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 12:00:00"), 2.0),
    ).toDF("k", "t", "px")
    val trades = Seq(
      ("A", Option(ts("2024-01-01 11:00:00")), 10L),
      ("A", Option.empty[Timestamp], 11L), // NULL time: never "at or before"/"at or after" anything
    ).toDF("k", "t", "qty")
    for (d <- Seq("backward", "forward", "nearest")) {
      val out = AsOfJoin.asOf(trades, quotes, "k", "k", "t", "t",
        Seq("px"), direction = d)
        .select("qty", "px").as[(Long, Option[Double])].collect().toMap
      assert(out(11L).isEmpty, s"NULL left time must carry no match (direction=$d)")
      assert(out(10L).nonEmpty, s"non-null row still matches (direction=$d)")
    }
  }

  test("asOf takes ALL attrs from the matched row — a NULL attr stays NULL") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(1.0), Some(100L)),
      ("A", ts("2024-01-01 11:00:00"), None, Some(200L)), // px unknown here
    ).toDF("k", "t", "px", "sz")
    val trades = Seq(("A", ts("2024-01-01 11:30:00"), 1L)).toDF("k", "t", "qty")
    val r = AsOfJoin.asOf(trades, quotes, "k", "k", "t", "t", Seq("px", "sz")).head()
    assert(r.getAs[Any]("px") === null,
      "matched row's NULL px must not be back-filled from the older row")
    assert(r.getAs[Long]("sz") === 200L, "and sz comes from the same matched row")
  }

  test("asOf output keeps exactly the left rows") {
    val left = Seq(("A", ts("2024-01-01 00:00:00"), 1L)).toDF("k", "t", "v")
    val right = Seq(("A", ts("2023-12-31 00:00:00"), 5.0),
      ("A", ts("2023-12-30 00:00:00"), 4.0)).toDF("k", "t", "w")
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t", Seq("w"))
    assert(out.count() === 1)
    assert(out.select("w").as[Double].head() === 5.0, "latest prior wins")
  }

  test("asOf tolerance: stale matches become NULL, fresh ones survive") {
    import org.apache.spark.sql.functions.unix_micros
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "t", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:30:00"), 10L),  // 30 min old -> kept
      ("A", ts("2024-01-01 12:00:01"), 11L),  // > 2h old -> discarded
    ).toDF("k", "t", "qty")
    val out = AsOfJoin.asOf(trades, quotes, "k", "k", "t", "t", Seq("px"),
      tolerance = Some((lt, rt) =>
        unix_micros(lt) - unix_micros(rt) <= org.apache.spark.sql.functions.lit(7200000000L)))
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap
    assert(out(10L) === Some(1.0), "within tolerance: match kept")
    assert(out(11L) === None, "stale match discarded exactly like no-match")
  }

  test("asOf rightTieBreak: equal-time right rows dedup inside the carry window") {
    val quotes = Seq( // two quotes at the SAME (key, time) — version 2 must win
      ("A", ts("2024-01-01 10:00:00"), 1.0, 1L),
      ("A", ts("2024-01-01 10:00:00"), 2.0, 2L),
      ("A", ts("2024-01-01 09:00:00"), 9.0, 7L), // earlier time: version irrelevant
    ).toDF("k", "t", "px", "version")
    val trades = Seq(("A", ts("2024-01-01 10:30:00"), 10L)).toDF("k", "t", "qty")
    val out = AsOfJoin.asOf(trades, quotes, "k", "k", "t", "t",
      Seq("px", "version"), rightTieBreak = Seq("version")).head()
    assert(out.getAs[Double]("px") === 2.0,
      "max tie-break version's row wins, same as dedupByKeyOrdered(desc)")
    assert(out.getAs[Long]("version") === 2L)
  }
}

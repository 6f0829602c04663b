package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SessionizeTextSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gap > threshold, per user") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),   // same session (10m)
      (1L, ts("2024-01-01 11:00:00"), 3.0),   // 50m gap -> new session
      (2L, ts("2024-01-01 10:05:00"), 4.0),   // other user independent
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.sessionize(ev, "user_id", "ts", gapSeconds = 1800)
      .select("user_id", "ts", "session_seq")
      .as[(Long, Timestamp, Long)].collect().sortBy(r => (r._1, r._2.getTime))
    assert(out.map(_._3).toSeq === Seq(1L, 1L, 2L, 1L))
  }

  test("sessionStats aggregates per session with exact epoch bounds") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.5),
      (1L, ts("2024-01-01 10:10:00"), 2.5),
    ).toDF("user_id", "ts", "value")
    val r = Sessionize.sessionStats(ev, "user_id", "ts", "value", 1800).head()
    assert(r.getAs[Long]("n_events") === 2L)
    assert(r.getAs[Double]("value_sum") === 4.0)
    assert(r.getAs[Long]("end_s") - r.getAs[Long]("start_s") === 600L)
  }

  test("tumbling windows partition events exactly; sliding double-counts") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1.0),
      (2L, ts("2024-01-01 10:55:00"), 1.0),
      (3L, ts("2024-01-01 11:05:00"), 1.0),
    ).toDF("user_id", "ts", "value")
    val tumb = Sessionize.tumbling(ev, "ts", 3600, Seq(count(lit(1)).as("n")))
      .select("window_start_s", "n").as[(Long, Long)].collect().toMap
    assert(tumb.values.sum === 3L, "tumbling covers each event once")
    val slid = Sessionize.sliding(ev, "ts", 3600, 1800, Seq(count(lit(1)).as("n")))
      .select("window_start_s", "n").as[(Long, Long)].collect().toMap
    assert(slid.values.sum === 6L, "width/slide = 2 windows per event")
  }

  test("TextOps: shingles, langid tie-break, fingerprint normalization") {
    val sh = Seq("a b c d").toDF("text")
      .select(TextOps.shingles($"text", 3).as("s")).as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))

    val short = Seq("a b").toDF("text")
      .select(TextOps.shingles($"text", 3).as("s")).as[Seq[String]].head()
    assert(short.isEmpty)

    // 'la' is in both es and fr lexicons: es declared first must win the tie
    val lang = Seq("la la").toDF("text")
      .select(TextOps.languageId($"text", TextOps.defaultLexicons)).as[String].head()
    assert(lang === "es")

    val fps = Seq("Hello   World", "hello world").toDF("text")
      .select(TextOps.fingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1), "whitespace runs and case collapse")
  }
}

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

  test("nativeSessionStats: inclusive gap merge matches lag form; end = last + gap") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0), // exactly gap later -> MERGED (inclusive)
      (1L, ts("2024-01-01 11:00:01"), 5.0), // 1s past the gap -> new session
      (2L, ts("2024-01-01 10:00:00"), 3.0),
      (2L, ts("2024-01-01 10:29:59"), 4.0), // inside the gap -> same session
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.nativeSessionStats(ev, "user_id", "ts", "value", gapSeconds = 1800)
      .select("user_id", "n_events", "start_s", "end_s")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((1L, 2L), (1L, 1L), (2L, 2L)),
      "exactly-gap-later event merges (inclusive); past-gap starts a new session")
    // window end is last event + gap, NOT the last event
    assert(out(0)._4 - out(0)._3 === 1800L + 1800L)
    assert(out(2)._4 - out(2)._3 === 1799L + 1800L)

    // session boundaries agree with the lag-based form (both '> gap')
    val lagForm = Sessionize.sessionStats(ev, "user_id", "ts", "value", 1800)
      .filter($"user_id" === 1L).count()
    assert(lagForm === 2L, "lag form finds the same two user-1 sessions")
  }

  test("funnel: strictly-after ordering; out-of-order steps never count") {
    val ev = Seq(
      // u1 completes the whole funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      // u2: click BEFORE view — the click must not count; no purchase
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      // u3: view and click at the SAME instant — strict '>' rejects it
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "click"),
      // u4 never views
      (4L, ts("2024-01-01 07:00:00"), "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select("step", "users").as[(String, Long)].collect().toMap
    assert(out === Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("cohortRetention: first-week cohorts, offsets count distinct users") {
    val ev = Seq(
      // u1 active weeks 0,1,2 (per 100s "week"); u2 joins week 0, returns week 2
      (1L, ts("2024-01-01 00:00:10"), 0.0), (1L, ts("2024-01-01 00:01:50"), 0.0),
      (1L, ts("2024-01-01 00:03:25"), 0.0),
      (2L, ts("2024-01-01 00:00:30"), 0.0), (2L, ts("2024-01-01 00:03:30"), 0.0),
      // u3's first event is in week 2 -> its own cohort, offset 0
      (3L, ts("2024-01-01 00:03:40"), 0.0),
      // duplicate activity in one week must not double-count
      (3L, ts("2024-01-01 00:03:50"), 0.0),
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.cohortRetention(ev, "user_id", "ts", weekSeconds = 100L)
      .as[(Long, Long, Long)].collect().map(r => (r._1 % 100, r._2) -> r._3).toMap
    // epoch weeks are huge at step 100s; normalize cohort mod 100 for the map
    val base = out.keys.map(_._1).min
    def at(c: Long, o: Long) = out((base + c, o))
    assert(at(0, 0) === 2L, "u1+u2 cohort week 0")
    assert(at(0, 1) === 1L, "only u1 back in week 1")
    assert(at(0, 2) === 2L, "u1 and u2 back in week 2")
    assert(at(2, 0) === 1L, "u3 is its own later cohort")
  }

  test("repeatedNgramFrac: duplicate shingles measured, short docs NULL") {
    val out = Seq(
      ("a b a b a b", 1),   // 2-grams: [a b, b a, a b, b a, a b] -> 5 total, 2 distinct
      ("x y z", 2),         // no repeats -> 0.0
      ("one", 3),           // < 2 tokens -> NULL
    ).toDF("text", "k")
      .select($"k", TextOps.repeatedNgramFrac($"text", 2).as("f"))
      .collect().sortBy(_.getInt(0))
    assert(math.abs(out(0).getDouble(1) - 0.6) < 1e-9) // 1 - 2/5
    assert(out(1).getDouble(1) === 0.0)
    assert(out(2).isNullAt(1))
  }

  test("tfidfTopTerms: corpus-wide terms score 0, rare terms rank first") {
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare2 other"),
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._4).map(r => (r._2, r._3)) }
    // 'common' appears in all 3 docs: idf = ln(1) = 0 -> never outranks a rare term
    assert(out(1L).head._1 === "rare1")
    assert(out(1L).head._2 === math.rint(math.log(3.0) * 1e6) / 1e6)
    // doc 2: rare2 (df=2) wins over common (0); tie-break alphabetical after
    assert(out(2L).map(_._1).toSeq === Seq("rare2", "common"))
    assert(out(3L).map(_._1).toSeq === Seq("other", "rare2"))
  }

  test("chunkWindows: stride overlap, short tail, chunk reassembly") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val out = TextOps.chunkWindows(docs, "doc_id", "text", width = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    // starts at tokens 1, 4, 7 -> windows [t0..t3], [t3..t6], [t6]
    assert(out.map(_._3).toSeq === Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6"))
    assert(out.map(_._4).toSeq === Seq(4L, 4L, 1L), "tail chunk is short, not dropped")
    assert(out.map(_._2).toSeq === Seq(0L, 1L, 2L), "chunk_idx is 0-based and dense")
  }

  test("topNgramCharFrac: coverage math, deterministic ties, short docs NULL") {
    val docs = Seq(
      (1L, "ab ab ab"),  // 2-grams: 'ab ab' x2; frac = 2*5/8
      (2L, "ba ab ba"),  // 'ba ab' and 'ab ba' both once -> lexicographic winner 'ab ba'
      (3L, "one"),       // no 2-grams -> NULL
    ).toDF("doc_id", "text")
    val out = TextOps.topNgramCharFrac(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) === 2 * 5 / 8.0)
    assert(out(2L) === 1 * 5 / 8.0)
    assert(out(3L) === null)
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

  test("removeRepeatedLines: boilerplate gone, order kept, all-gone doc stays") {
    val df = Seq(
      (1L, "alpha\nCOPY\nbeta"),
      (2L, "COPY\ngamma"),
      (3L, "COPY"),          // every line is boilerplate
      (4L, "delta\nCOPY"),
    ).toDF("id", "text")
    val out = TextOps.removeRepeatedLines(df, "id", "text", maxDocFreq = 3)
      .select("id", "text_clean").as[(Long, String)].collect().toMap
    assert(out(1L) === "alpha\nbeta", "interior line removed, order preserved")
    assert(out(2L) === "gamma")
    assert(out(3L) === "", "fully-boilerplate doc kept as empty row")
    assert(out(4L) === "delta")
  }

  test("removeRepeatedLines: below-threshold repeats survive") {
    val df = Seq((1L, "x\ny"), (2L, "x\nz")).toDF("id", "text")
    val out = TextOps.removeRepeatedLines(df, "id", "text", maxDocFreq = 3)
      .select("id", "text_clean").as[(Long, String)].collect().toMap
    assert(out(1L) === "x\ny" && out(2L) === "x\nz")
  }
}

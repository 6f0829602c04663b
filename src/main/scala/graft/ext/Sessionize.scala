package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization and event-time windows over event streams
  * (SURVEY.md §2b). Batch forms here; streaming twins (watermark +
  * `session_window`) in `graft.streaming.StreamOps`.
  *
  * All timestamp arithmetic runs on integer epoch-microseconds
  * (`unix_micros`) — exact, and reproducible against engines that read the
  * source's nanosecond parquet (micros = floor(nanos/1000) on both sides).
  */
object Sessionize {

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapSeconds`. Classic lag + running-sum
    * pattern: one shuffle on the user key, one in-partition sort — the same
    * cost envelope as any per-user window at 100 TB (skewed power-users
    * handled by AQE skew splitting on the exchange).
    *
    * Adds `session_seq` (1-based per-user session index).
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(byUser)
    val newSession = when(prevUs.isNull || (us - prevUs) > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Per-session rollup: event count, value sum, and start/end epoch
    * seconds. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String, valueCol: String,
                   gapSeconds: Long): DataFrame =
    sessionize(df, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("value_sum"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"))
      // integer `div`, not `/`: long/long in Spark is DOUBLE division, and
      // floor(x/1e6) can misround near second boundaries
      .withColumn("start_s", expr("start_us div 1000000"))
      .withColumn("end_s", expr("end_us div 1000000"))
      .drop("start_us", "end_us")

  /** Gap-based sessionization via Spark's NATIVE `session_window` generator
    * (the same operator the streaming engine uses for session state):
    * `groupBy(user, session_window(ts, gap))`. Session boundaries match
    * [[sessionize]] exactly (merge while the silence is <= gap, INCLUSIVE at
    * the boundary — verified in SessionizeTextSpec); the difference is shape:
    * a session's window is [first event, last event + gap), so `end_s` is
    * `last_event_second + gapSeconds`, unlike [[sessionStats]] whose `end_s`
    * is the last event itself. One shuffle on (user, merged window); window
    * merging happens inside the aggregate — no lag/running-sum pass.
    */
  def nativeSessionStats(df: DataFrame, userCol: String, tsCol: String, valueCol: String,
                         gapSeconds: Long): DataFrame =
    df.groupBy(col(userCol), session_window(col(tsCol), s"$gapSeconds seconds").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("value_sum"))
      .withColumn("start_s", unix_timestamp(col("w.start")))
      .withColumn("end_s", unix_timestamp(col("w.end")))
      .drop("w")

  /** Tumbling event-time window aggregate: `window(ts, width)` + groupBy.
    * Window starts are epoch-aligned, emitted as epoch seconds.
    */
  def tumbling(df: DataFrame, tsCol: String, widthSeconds: Long,
               aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), s"$widthSeconds seconds").as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_s", unix_timestamp(col("w.start")))
      .drop("w")

  /** Sliding event-time window aggregate (width, slide). Each row lands in
    * width/slide windows; Spark expands via the `window` generator.
    */
  def sliding(df: DataFrame, tsCol: String, widthSeconds: Long, slideSeconds: Long,
              aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), s"$widthSeconds seconds", s"$slideSeconds seconds").as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_s", unix_timestamp(col("w.start")))
      .drop("w")

  /** Strict ordered funnel: for steps (A, B, C, …), a user completes step i
    * when an event of that type occurs STRICTLY AFTER the time at which they
    * completed step i−1 (each completion time is the EARLIEST qualifying
    * event). Returns one row per step: (step_idx 1-based, step, users).
    *
    * Shape at 100 TB: one `min(ts)` aggregate per step, each joined to the
    * previous step's per-user threshold — |steps| keyed shuffles over a
    * per-user relation that only SHRINKS down the funnel; no window over the
    * whole event stream, no per-user event sorting. Timestamps compare as
    * epoch micros (exact longs).
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val ev = df.select(col(userCol).as("user"), col(typeCol).as("etype"),
      unix_micros(col(tsCol)).as("us"))
    // fold: thresholds(i) = per-user completion time of step i
    val completions = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val candidates = prev match {
          case None => ev.filter(col("etype") === step)
          case Some(th) => ev.filter(col("etype") === step)
            .join(th.select(col("user"), col("t").as("__prev_t")), Seq("user"))
            .filter(col("us") > col("__prev_t"))
        }
        Some(candidates.groupBy("user").agg(min(col("us")).as("t")))
    }.flatten
    val counts = completions.zip(steps).zipWithIndex.map {
      case ((th, step), i) =>
        th.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("step_idx"), lit(step).as("step"), col("users"))
    }
    counts.reduce(_.unionByName(_)).orderBy("step_idx")
  }

  /** Cohort retention: users bucket into the epoch-week of their FIRST
    * event (the cohort); each (cohort_week, week_offset) cell counts the
    * distinct users of that cohort active `offset` weeks later — the
    * retention triangle every growth dashboard draws.
    *
    * Shape at 100 TB: ONE aggregate per user collects the SET of active
    * weeks (map-side partials dedup within partition; per-user state is
    * bounded by distinct weeks — a few thousand even for decades of data),
    * the cohort is `array_min` of that set, and each (cohort, offset) cell
    * then counts plain rows: after the per-user dedup a user reaches each
    * cell at most once, so `count(*)` IS the distinct-user count. Two
    * exchanges total — the former distinct + min-aggregate + join-back +
    * countDistinct form paid three exchanges plus an Expand and measured
    * ~40% slower at sf0.1. NULL users are dropped up front: the reference
    * semantics (count DISTINCT user, null-unsafe cohort join) never counts
    * them anyway.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      weekSeconds: Long = 604800L): DataFrame = {
    // FLOOR division, not `div`: Spark's div truncates toward zero while
    // the week bucket must floor (DuckDB's `//` does) — they differ exactly
    // on pre-1970 timestamps (negative epoch micros). pmod is non-negative,
    // so (a − pmod(a, b)) div b is exact integer floor division.
    val wkMicros = weekSeconds * 1000000L
    df.filter(col(userCol).isNotNull)
      .select(col(userCol).as("user"),
        expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${wkMicros}L))" +
          s" div ${wkMicros}L").as("w"))
      .groupBy("user").agg(collect_set(col("w")).as("ws"))
      .select(array_min(col("ws")).as("cw"), explode(col("ws")).as("w"))
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }
}

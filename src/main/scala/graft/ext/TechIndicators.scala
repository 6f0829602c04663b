package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Technical-indicator feature family over keyed time series — the
  * stock-analytics domain the reference serves (its daily pipeline computes
  * returns and aggregates; these are the indicators the same users compute
  * downstream): EMA, RSI, MACD, Bollinger bands, drawdown. All are ONE
  * window pass per key ordering — a single hash exchange on the key, sort
  * within partitions, every indicator frame-local after that. At 100 TB
  * the shuffle is by symbol/entity and each series sorts independently —
  * embarrassingly parallel across keys.
  *
  * EMA is deliberately computed as a LEFT FOLD over a bounded trailing
  * frame (`collect_list` + `aggregate` HOF: e₀ = x₀, eⱼ = α·xⱼ + (1−α)·eⱼ₋₁)
  * rather than the closed-form power sum: the fold is the textbook
  * recursive definition, it is renderable VERBATIM in DuckDB
  * (`list(...) OVER` + `list_reduce`), and both engines execute the same
  * float ops in the same order — bit-identical, no pow() overflow games.
  * The bounded frame (span rows) is the standard warm-up truncation: a
  * (1−α)^span tail is below double noise for the α,span pairings used.
  */
object TechIndicators {

  private def keyedWindow(keyCol: String, orderCols: Seq[String]): WindowSpec =
    Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)

  /** Recursive EMA over a trailing `span`-row frame (see object doc). */
  def emaCol(valueCol: Column, w: WindowSpec, alpha: Double, span: Int): Column = {
    val vals = collect_list(valueCol).over(w.rowsBetween(-(span - 1), 0))
    aggregate(
      slice(vals, lit(2), size(vals) - 1),
      element_at(vals, 1),
      (acc, x) => acc * (1 - alpha) + x * alpha)
  }

  def ema(df: DataFrame, keyCol: String, orderCols: Seq[String],
          valueCol: String, alpha: Double, span: Int): DataFrame =
    df.withColumn("ema",
      emaCol(col(valueCol), keyedWindow(keyCol, orderCols), alpha, span))

  /** RSI over a `period`-row frame: 100·avgGain/(avgGain+avgLoss) (the
    * algebraic form of 100 − 100/(1+RS) that avoids the 0-loss pole), NULL
    * until a prior row exists and when the frame moved nowhere.
    */
  def rsi(df: DataFrame, keyCol: String, orderCols: Seq[String],
          valueCol: String, period: Int = 14): DataFrame = {
    val w = keyedWindow(keyCol, orderCols)
    // CASE spelling, not greatest(delta, 0): the two engines disagree on
    // greatest's NULL contract, a coalesced delta + CASE renders identically
    val delta = coalesce(
      col(valueCol) - lag(col(valueCol), 1).over(w), lit(0.0))
    val frame = w.rowsBetween(-(period - 1), 0)
    val avgGain = avg(when(delta > 0.0, delta).otherwise(0.0)).over(frame)
    val avgLoss = avg(when(delta < 0.0, -delta).otherwise(0.0)).over(frame)
    df.withColumn("rsi",
      when(avgGain + avgLoss === 0.0, lit(null))
        .otherwise(lit(100.0) * (avgGain / (avgGain + avgLoss))))
    // ratio-first grouping: ag/(ag+al) is exactly 1.0 when al=0 (same
    // operand up and down), so an all-gains window reads exactly 100
  }

  /** MACD line: EMA(fast) − EMA(slow), both the bounded-frame fold. */
  def macd(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, fast: Int = 12, slow: Int = 26): DataFrame = {
    val w = keyedWindow(keyCol, orderCols)
    df.withColumn("macd",
      emaCol(col(valueCol), w, 2.0 / (fast + 1), span = 3 * fast) -
        emaCol(col(valueCol), w, 2.0 / (slow + 1), span = 3 * slow))
  }

  /** Bollinger bands: SMA(period) ± k·σ_sample(period).
    *
    * Mean and σ come from Σx / Σx² computed SEQUENTIALLY over the bounded
    * frame, not the engines' tree-associated windowed avg/stddev: windowed
    * aggregates re-associate differently across engines (segment tree vs
    * sequential), and a ~1e-9 drift at a rounding-grid midpoint flips the
    * displayed digit (observed 5 cells in 30 k at round-4).
    *
    * Spark evaluates a BOUNDED sliding frame by re-initializing the
    * aggregation buffer and updating it over the frame's rows in row order
    * for every output row (`SlidingWindowFunctionFrame.write`) — i.e. a
    * left fold, bit-identical to `collect_list` + sequential fold and to
    * DuckDB's `list` + `list_reduce` render (IEEE `0.0 + x ≡ x`, so the
    * fold's explicit 0.0 seed changes nothing). Plain windowed sums
    * therefore keep cross-engine bit-parity while dropping the per-row
    * 20-element array the fold form materialized — that array was the
    * suite's worst memory-weather amplifier (12.6× ratio swinging to 7.6 s
    * under contention). TechIndicatorsSpec pins the windowed ≡ fold
    * equality exactly (not rounded) on the full sf0.1 events table.
    * `count` (not frame size) mirrors collect_list's NULL-skipping.
    */
  def bollinger(df: DataFrame, keyCol: String, orderCols: Seq[String],
                valueCol: String, period: Int = 20, k: Double = 2.0): DataFrame = {
    val w = keyedWindow(keyCol, orderCols).rowsBetween(-(period - 1), 0)
    // the three frame aggregates in ONE select → one Window node evaluating
    // each sum exactly once; deriving the bands in later withColumns would
    // re-extract the window expressions per output column (3 Window nodes,
    // 13 duplicated aggregates — PlanCheckSpec pins the single pass)
    val withSums = df.select(col("*"),
      count(col(valueCol)).over(w).cast("double").as("__bb_n"),
      sum(col(valueCol)).over(w).as("__bb_s1"),
      sum(col(valueCol) * col(valueCol)).over(w).as("__bb_s2"))
    val n = col("__bb_n"); val s1 = col("__bb_s1"); val s2 = col("__bb_s2")
    val ma = s1 / n
    val varS = (s2 - s1 * s1 / n) / (n - 1)
    val sd = when(n < 2, lit(null))
      .otherwise(sqrt(when(varS < 0.0, 0.0).otherwise(varS)))
    withSums
      .withColumn("bb_mid", ma)
      .withColumn("bb_up", ma + lit(k) * sd)
      .withColumn("bb_dn", ma - lit(k) * sd)
      .drop("__bb_n", "__bb_s1", "__bb_s2")
  }

  /** Drawdown from the running peak: (peak − value)/peak. */
  def drawdown(df: DataFrame, keyCol: String, orderCols: Seq[String],
               valueCol: String): DataFrame = {
    val peak = max(col(valueCol))
      .over(keyedWindow(keyCol, orderCols).rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("peak", peak)
      .withColumn("drawdown",
        when(peak === 0.0, lit(null)).otherwise((peak - col(valueCol)) / peak))
  }
}

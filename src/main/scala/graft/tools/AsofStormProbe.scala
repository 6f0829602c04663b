package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 probe for the asof-family storm amplification (VERDICT r15 ask
  * #1): in the judge's storm-window run, `asof_nearest` hit 16.7 s and
  * `asof_tolerance` 15.7 s — 30–50x their sub-second mins — while
  * neighboring gates inflated only 2–3x, and both settled in the next run.
  * Two competing explanations:
  *
  *   (a) STRUCTURAL — some phase of the union+window form (the
  *       key-exchange, the in-partition sorts, the running-frame window)
  *       multiplies under host contention the way r13's Bollinger
  *       range-sampling pass did;
  *   (b) TEMPORAL — the two gates are ADJACENT in the suite's sorted
  *       execution order (…asof_forward, asof_nearest, asof_tolerance…),
  *       so one ~30 s host gust lands on exactly those two consecutive
  *       gates and on nothing else.
  *
  * The probe separates them: run each asof gate (plus the merge-exec form
  * as the judge's comparison point and one non-asof control) N times
  * back-to-back, optionally under an induced CPU-hog load (`hog` arg =
  * number of spin threads). If (a), the asof window-form gates inflate
  * under the hog FAR more than the control and the merge form; if (b),
  * everything inflates by a similar factor and the 30–50x was weather
  * adjacency. Prints per-gate min/median/max over the passes.
  *
  * usage: AsofStormProbe <dir> [passes=5] [hogThreads=0]
  */
object AsofStormProbe {
  private val usage = "usage: AsofStormProbe <dir> [passes=5] [hogThreads=0]"
  // same numeric-arg discipline as GateTwice (ADVICE r14): a typo must fail
  // at the usage line; passes=0 would crash the median index after printing
  // a plausible header
  private def numArg(v: String, what: String, min: Int): Int = {
    val n = try v.toInt catch { case _: NumberFormatException =>
      sys.error(s"$what must be an integer >= $min (got '$v'); $usage") }
    if (n < min) sys.error(s"$what must be an integer >= $min (got '$v'); $usage")
    n
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(numArg(_, "passes", 1)).getOrElse(5)
    val hogThreads = args.lift(2).map(numArg(_, "hogThreads", 0)).getOrElse(0)
    val gates = Seq(
      "asof_event_order",       // backward window form (did NOT amplify r15)
      "asof_forward",           // forward window form
      "asof_nearest",           // amplified 16.7 s in the judge's storm run
      "asof_tolerance",         // amplified 15.7 s
      "asof_event_order_merge", // custom AsOfMergeJoinExec comparison point
      "w2_moving_avg"           // non-asof window control
    )
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // induced contention: plain spin threads oversubscribing the box —
    // crude but it reproduces the mechanism a host storm applies (every
    // Spark task time-slices against foreign CPU work)
    @volatile var stop = false
    val hogs = (0 until hogThreads).map { i =>
      val t = new Thread(() => {
        var acc = 0L
        while (!stop) acc += acc * 31 + i
      }, s"hog-$i")
      t.setDaemon(true); t.setPriority(Thread.NORM_PRIORITY); t.start(); t
    }

    println(s"[asofprobe] dir=$dir passes=$passes hog=$hogThreads")
    // SPARK_GRAFT_ASOF_EXPLAIN=true: dump each gate's physical plan first —
    // the r15 ask includes checking whether any phase (e.g. a
    // range-partition sampling pass) re-executes the union child
    if (sys.env.getOrElse("SPARK_GRAFT_ASOF_EXPLAIN", "false") == "true")
      gates.foreach { g =>
        println(s"===== $g =====")
        println(graft.SparkEntry.queries(g)(spark, dir)
          .queryExecution.executedPlan.toString.take(4000))
      }
    // one untimed warm pass per gate: JIT + codegen + parquet footers, so
    // pass timings measure execution, matching the suite's warmed posture
    gates.foreach { g =>
      graft.SparkEntry.queries(g)(spark, dir).queryExecution.toRdd.count()
    }
    val results = gates.map { g =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(g)(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      println(f"[asofprobe] $g%-24s min=${times.head}%6.2f med=$med%6.2f max=${times.last}%6.2f")
      (g, times)
    }
    stop = true; hogs.foreach(_.join(1000))
    // machine-readable line for COVERAGE — Locale.ROOT, not the f
    // interpolator (ADVICE r16): under a comma-decimal default locale
    // f"$t%.3f" emits 1,234-style numbers and the JSON would not parse
    println("[asofprobe] json " + results.map { case (g, ts) =>
      val vals = ts.map(t =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
      s""""$g":[${vals.mkString(",")}]""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic cold/warm split for ANY registry gate: runs
  * `SparkEntry.queries(name)` twice in one JVM against `dir`, with the
  * standard blocking cleanup between passes — the decomposition that
  * closed the 100× pagerank question in round 13 (262 s cold → 73.4 s
  * warm). Pass 1 carries cold-start (page cache for the scale tiles,
  * JIT, parquet footers) plus whatever sustained-exposure throttling the
  * window dealt; pass 2 is the number comparable across scales.
  *
  * Covers ALL six heavy families since round 15: `graph_pagerank`'s
  * registry gate derives its supplier offset from max(o_custkey) and
  * data-sizes its own shuffle partitions, so tiled key ranges are safe
  * (it overrides the [parts] arg for its own body, like the stream gates).
  *
  * usage: GateTwice <gateName> <dir> [shuffleParts=32] [passes=2]
  */
object GateTwice {
  private val usage = "usage: GateTwice <gate> <dir> [shuffleParts=32] [passes=2]"
  // numeric-arg validation matches the known-names discipline on the gate
  // arg: a typo'd value must fail at the usage line, not as a raw
  // NumberFormatException or later inside Spark conf parsing. Positivity
  // included: parts=0 dies deep inside Spark, and passes=0 would print the
  // header, measure nothing, and exit 0 — an automation wrapper would read
  // that as a completed measurement
  private def numArg(v: String, what: String): Int = {
    val n = try v.toInt catch { case _: NumberFormatException =>
      sys.error(s"$what must be a positive integer (got '$v'); $usage") }
    if (n <= 0) sys.error(s"$what must be a positive integer (got '$v'); $usage")
    n
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error(usage))
    val dir = args.lift(1).getOrElse("/tmp/scale100x")
    val parts = args.lift(2).map(numArg(_, "shuffleParts").toString).getOrElse("32")
    val passes = args.lift(3).map(numArg(_, "passes")).getOrElse(2)
    // resolve the gate BEFORE paying session startup, with the known names
    val gate = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown gate '$name'; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    // session posture matches ScaleCheck.session (same env overrides) so
    // the two tools' readings stay comparable in one COVERAGE table
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("SPARK_GRAFT_COMMITTER_V", "2"))
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS", "graft.io.NioLocalFileSystem"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[gatetwice] gate=$name dir=$dir parts=$parts heap=${Runtime.getRuntime.maxMemory() / (1L << 30)}%dg")
    for (pass <- 1 to passes) {
      val t0 = System.nanoTime()
      val rows = gate(spark, dir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      println(f"[gatetwice] pass_$pass $sec%.2f s ($rows rows)")
    }
    spark.stop()
  }
}

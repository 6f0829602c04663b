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
  * usage: GateTwice <gateName> <dir> [shuffleParts=32] [passes=2]
  */
object GateTwice {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: GateTwice <gate> <dir> [parts] [passes]"))
    val dir = args.lift(1).getOrElse("/tmp/scale100x")
    val parts = args.lift(2).getOrElse("32")
    val passes = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gate = graft.SparkEntry.queries(name)
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

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of the ScaleCheck pagerank family at a given scale
  * dir: edge construction (the lineitem⋈orders join + distinct), PageRank
  * prep (edge checkpoint + degree), and the iteration loop at 1/3/5
  * iterations — to locate the superlinear term the 100× point surfaced
  * (growth/scale 0.23 @30× → 0.48-0.60 @100× under the family's
  * historical 8-partition pin AND under data-sized partitions).
  */
object PageRankScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100x")
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // driver heap comes from the launcher (build.sbt javaOptions -Xmx /
      // SPARK_DRIVER_MEM) — a spark.driver.memory builder conf is a no-op
      // in an already-running local JVM; the real heap is logged below
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sec(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    println(f"[prprobe] dir=$dir parts=$parts heap=${Runtime.getRuntime.maxMemory() / (1L << 30)}%dg")

    val li = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val ord = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    val fwd = joined.select(col("o_custkey").as("src"),
      (col("l_suppkey") + 10000000L).as("dst")).distinct()
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))

    // phase 0: the join+distinct pipeline WITHOUT block-store
    // materialization — isolates compute from the checkpoint's row-object
    // storage footprint (the suspect saturating term at 100M+ edges)
    val tBare = sec { edges.queryExecution.toRdd.count(): Unit }
    println(f"[prprobe] edge_build_bare $tBare%.1f s (no checkpoint)")

    // phase 1: edge construction alone, materialized via checkpoint
    var eCount = 0L
    val tEdges = sec {
      val (e, n) = org.apache.spark.sql.GraftPlanShim.localCheckpointWithCount(edges)
      eCount = n
      org.apache.spark.sql.GraftPlanShim.unpersistLocalCheckpoint(e, blocking = true)
    }
    println(f"[prprobe] edge_build $tEdges%.1f s ($eCount edges)")

    // phase 2: full pageRank at increasing iteration counts — the slope is
    // the per-iteration cost, the intercept is prep (checkpoint+deg+count)
    for (iters <- Seq(1, 3, 5)) {
      val t = sec {
        graft.ext.PageRank.pageRank(edges, iterations = iters, noDangling = true)
          .queryExecution.toRdd.count(): Unit
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      println(f"[prprobe] pagerank_iters_$iters $t%.1f s")
    }
    spark.stop()
  }
}

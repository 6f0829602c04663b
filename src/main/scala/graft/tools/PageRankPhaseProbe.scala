package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARM phase split of the graph_pagerank gate body (VERDICT r18 ask 4):
  * runs the gate's exact prep pipeline twice in one JVM (pass 2 = steady)
  * and times each phase separately — edge-source build, edge
  * checkpoint+count, degree checkpoint+count, and the 5-iteration
  * consume — so the "second bite" targets the phase that actually pays.
  *
  * usage: PageRankPhaseProbe <dir> [shuffleParts=8] [passes=2]
  */
object PageRankPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).getOrElse("8")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sec(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }

    for (pass <- 1 to passes) {
      val tOff = sec { // the gate's o_custkey max (driver-side scalar agg)
        graft.Tables.orders(spark, dir).agg(max(col("o_custkey")).cast("long")).head: Unit
      }
      val ord = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val li = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val fwd = joined.select(col("o_custkey").as("src"),
        (col("l_suppkey") + 10000000L).as("dst")).distinct()
      val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))

      var e0: org.apache.spark.sql.DataFrame = null
      var eCount = 0L
      val tCkpt = sec {
        val r = org.apache.spark.sql.GraftPlanShim.localCheckpointWithCount(
          edges.select(col("src"), col("dst")))
        e0 = r._1; eCount = r._2
      }
      val eParts = math.max(1, math.min(e0.rdd.getNumPartitions,
        math.ceil(eCount / 250000.0).toInt))
      val e = e0.coalesce(eParts)
      var deg: org.apache.spark.sql.DataFrame = null
      var degCount = 0L
      val tDeg = sec {
        val r = org.apache.spark.sql.GraftPlanShim.localCheckpointWithCount(
          e.groupBy("src").agg(count(lit(1)).cast("double").as("d")))
        deg = r._1; degCount = r._2
      }
      // remaining: iterations + final consume via the real operator (it
      // re-does the prep internally, so time the FULL gate too)
      val tFull = sec {
        graft.ext.PageRank.pageRank(edges, iterations = 5, noDangling = true)
          .queryExecution.toRdd.count(): Unit
      }
      println(f"[prphase] pass=$pass off=$tOff%.2f ckptE=$tCkpt%.2f ($eCount) deg=$tDeg%.2f ($degCount) fullGate=$tFull%.2f parts=$eParts")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}

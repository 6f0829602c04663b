package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: where do the ~0.7 s of `hll_approx_distinct` /
  * `hll_sketch_merge` go at sf0.1? Phases: bare scan, plain grouped count,
  * count_distinct alone, the gate's fused exact+HLL aggregate — each at
  * 32, 8, and 4 shuffle partitions (AQE off, as in Bench).
  */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir).select("l_returnflag", "l_partkey", "l_linestatus")
    def ms(f: => Unit): Long = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1000000L }
    def run(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count(): Unit // warm/compile
      val times = (1 to 3).map(_ => ms(mk.queryExecution.toRdd.count(): Unit))
      println(s"[hllprobe] $tag ${times.mkString(" ")} ms")
    }
    for (parts <- Seq("32", "8", "4")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      println(s"[hllprobe] --- parts=$parts ---")
      run("scan_only")(li)
      run("group_count")(li.groupBy("l_returnflag").count())
      run("count_distinct")(li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("n_distinct")))
      run("fused_exact_hll")(li.groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("n_distinct"),
          approx_count_distinct(col("l_partkey"), 0.05).as("a"))
        .filter(abs(col("a") - col("n_distinct")) <= col("n_distinct") * 0.15)
        .select("l_returnflag", "n_distinct"))
      run("sketch_merge_side")(graft.ops.AggOps.hllMergeEstimate(
        graft.ops.AggOps.hllSketches(li, Seq("l_returnflag", "l_linestatus"), "l_partkey"),
        Seq("l_returnflag")))
    }
    spark.stop()
  }
}

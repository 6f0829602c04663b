package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan + phase probe for the minhash-LSH pair pipeline (VERDICT r12 item
  * 6's sanctioned look): prints the physical plan of the pair relation —
  * specifically whether the candidate→sets verify joins plan as
  * sort-merge (checkpointed `sets` has no stats) — and times the gate
  * configuration end to end. Throwaway diagnostics; keeps the hunt
  * protocol's evidence in-repo.
  */
object MinhashPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    def ms(f: => Unit): Long = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1000000L }
    def run(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count(): Unit // warm/compile
      val times = (1 to 3).map(_ => ms(mk.queryExecution.toRdd.count(): Unit))
      println(s"[mhprobe] $tag ${times.mkString(" ")} ms")
    }
    // the gate's fast config (64/32, threshold 0.4)
    val pairs = graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.4, numHashes = 64, bands = 32)
    println("[mhprobe] ===== physical plan (64/32) =====")
    println(pairs.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Sort ") || l.contains("HashAggregate") || l.contains("Scan"))
      .mkString("\n"))
    run("pairs_64_32")(graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.4, numHashes = 64, bands = 32))
    // phase decomposition: the eager shingle-set checkpoint alone (the
    // construction-time job every pairs run pays), then signatures alone
    import org.apache.spark.sql.functions.col
    def setsOnly() = {
      val f = docs.select(col("doc_id").as("id"),
        graft.functions.ShingleHashes.shingleHashes(col("text"), 3).as("set"))
        .localCheckpoint()
      org.apache.spark.sql.GraftPlanShim.unpersistLocalCheckpoint(f, blocking = true)
    }
    setsOnly() // warm
    val setsTimes = (1 to 3).map(_ => ms(setsOnly()))
    println(s"[mhprobe] sets_checkpoint_only ${setsTimes.mkString(" ")} ms")
    run("signatures_only")(graft.ext.Dedup.minhashSignatures(
      docs, "doc_id", "text", n = 3, numHashes = 64))
    spark.stop()
  }
}

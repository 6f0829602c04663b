package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter→recall sweep for the ANN operators at sf0.1 — the evidence
  * base for the gate/spec recall floors (rounds 9–11 asked for the curve:
  * the floors were set at 0.3 with an unquantified "near-uniform testdata"
  * rationale). Prints recall@5 for the LSH plane counts and IVF
  * (nlist, nprobe) grid over the same probe set the gates use.
  */
object AnnSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.SimSearch
    val emb = graft.Tables.embeddings(spark, sfDir).localCheckpoint()
    val probes = emb.filter(col("vec_id") < 10)
    val k = 5
    val exact = SimSearch.bruteForceTopK(emb, probes, "vec_id", "embedding", k)
      .select("probe_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val a = approx.select("probe_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      if (exact.isEmpty) 1.0 else a.intersect(exact).size.toDouble / exact.size
    }
    // corpus geometry: how concentrated is the similarity structure?
    val sims = SimSearch.bruteForceTopK(emb, probes, "vec_id", "embedding", k)
      .agg(min("cosine"), expr("percentile(cosine, 0.5)"), max("cosine")).collect()(0)
    println(s"[annsweep] true-top5 cosine min=${sims.get(0)} med=${sims.get(1)} max=${sims.get(2)}")
    for (planes <- Seq(2, 3, 4, 6, 8)) {
      val t0 = System.nanoTime()
      val r = recall(SimSearch.lshTopK(emb, probes, "vec_id", "embedding",
        k, numPlanes = planes, dim = 64))
      println(f"[annsweep] lsh planes=$planes recall=$r%.3f (${(System.nanoTime()-t0)/1e9}%.2f s)")
    }
    for ((nlist, nprobe) <- Seq((8, 2), (8, 4), (16, 4), (16, 8), (32, 8), (32, 16), (16, 16))) {
      val t0 = System.nanoTime()
      val r = recall(SimSearch.ivfTopK(emb, probes, "vec_id", "embedding",
        k, nlist = nlist, nprobe = nprobe))
      println(f"[annsweep] ivf nlist=$nlist nprobe=$nprobe recall=$r%.3f (${(System.nanoTime()-t0)/1e9}%.2f s)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: phase split of the `ann_topk_ivf_persist` gate
  * (train / write / read / query+recall) at sf0.1 — the drift audit the
  * round-9→11 verdicts asked for. Mirrors the gate's exact calls.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("SPARK_GRAFT_COMMITTER_V", "2"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.SimSearch
    val emb = graft.Tables.embeddings(spark, sfDir)
    emb.limit(1).collect()
    val probes = emb.filter(col("vec_id") < 10)
    def ms(f: => Unit): Long = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1000000L }
    for (rep <- 0 until 3) {
      val path = s"${graft.Scratch.root}/ivf_probe_${ProcessHandle.current().pid()}_$rep"
      var idx: SimSearch.IvfIndex = null
      var loaded: SimSearch.IvfIndex = null
      val tTrain = ms { idx = SimSearch.buildIvfIndex(emb, "vec_id", "embedding", nlist = 16) }
      val tWrite = ms { SimSearch.writeIvfIndex(idx, path) }
      val tRead = ms { loaded = SimSearch.readIvfIndex(spark, path) }
      var n = 0L
      // keep in lockstep with the ann_topk_ivf_persist gate (ExtQueries:
      // nlist=16, nprobe=8) — a probe at half the nprobe measures half the
      // query-phase work the gate actually does
      val tQuery = ms { n = SimSearch.ivfTopKIndexed(loaded, probes, "vec_id", "embedding",
        k = 5, nprobe = 8).count() }
      val tDel = ms { graft.io.ParquetIO.deleteRecursively(new java.io.File(path)) }
      println(s"[ivfprobe] rep=$rep train=$tTrain write=$tWrite read=$tRead " +
        s"query=$tQuery delete=$tDel rows=$n")
    }
    spark.stop()
  }
}

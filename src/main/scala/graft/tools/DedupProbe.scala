package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the flagged dedup pair family: phase split of
  * `minhashLshPairs` (shingle pass / signatures+banding+candidates /
  * verify) and the output pairs' jaccard distribution — the numbers the
  * band-tuning decision needs (recall must stay ~exact: the gate's oracle
  * is the EXACT pair set, so a lossy band config is a red gate, not a
  * slow one).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    docs.limit(1).collect()
    def ms(f: => Unit): Long = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1000000L }

    if (args.headOption.contains("jaccard")) { jaccardAccounting(spark, docs); spark.stop(); return }

    for (rep <- 0 until 3) {
      // phase 1: shingle sets (the shared scan kernel)
      var sets: org.apache.spark.sql.DataFrame = null
      val tSets = ms { sets = docs.select(col("doc_id").as("id"),
          graft.functions.ShingleHashes.shingleHashes(col("text"), 3).as("set"))
        .localCheckpoint() }
      // phase 2: signatures + banding + candidate pairs
      val numHashes = 128; val bands = 64; val rows = numHashes / bands
      var nCand = 0L
      val tCand = ms {
        val sigs = sets.select(col("id"),
            graft.functions.SketchFunctions.minhashSketch(col("set"), numHashes).as("sig"))
          .filter(col("sig").isNotNull)
        val banded = sigs.select(col("id"), posexplode(
          array((0 until bands).map(bnd =>
            xxhash64((1 to rows).map(r => element_at(col("sig"), bnd * rows + r)): _*)): _*)
        ).as(Seq("band", "bh")))
        nCand = banded.as("x").hint("shuffle_hash").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct().count()
      }
      // phase 3: full pipeline (re-runs everything; full - cand - sets ≈ verify)
      var nOut = 0L
      val tFull = ms { nOut = graft.ext.Dedup.minhashLshPairs(
        docs, "doc_id", "text", 3, 0.4).count() }
      sets.unpersist()
      println(s"[dedupprobe] rep=$rep sets=$tSets cand=$tCand full=$tFull " +
        s"nCand=$nCand nOut=$nOut")
    }
    // output-pair jaccard distribution (band-tuning safety margin)
    val out = graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.4)
      .agg(min("jaccard"), expr("percentile(jaccard, 0.05)"),
        expr("percentile(jaccard, 0.25)"), expr("percentile(jaccard, 0.5)"),
        count(lit(1))).collect()(0)
    println(s"[dedupprobe] jaccard min=${out.get(0)} p05=${out.get(1)} " +
      s"p25=${out.get(2)} p50=${out.get(3)} n=${out.get(4)}")
    spark.stop()
  }

  /** Σdf² accounting + phase split for the exact n-gram Jaccard join —
    * the numbers behind the accepted-floor note in COVERAGE.md. The gate's
    * cost model is: one shingle scan (explode) + one hash-partitioned
    * self-join whose work IS Σ_s df_s·(df_s−1)/2 candidate rows + one
    * count aggregate over candidates. DuckDB runs the identical algebra
    * in-process with no exchange serialization; the gap is machinery per
    * candidate row, not a redundant plan term.
    */
  private def jaccardAccounting(spark: SparkSession, docs: org.apache.spark.sql.DataFrame): Unit = {
    val ex = docs.select(col("doc_id").as("id"),
        graft.functions.ShingleHashes.shingleHashes(col("text"), 3).as("set"))
      .select(col("id"), explode(col("set")).as("s"))
    val dfTab = ex.groupBy("s").agg(count(lit(1)).as("df")).localCheckpoint()
    val acct = dfTab.agg(count(lit(1)).as("vocab"),
      sum(col("df")).as("exploded_rows"),
      max(col("df")).as("max_df"),
      sum(col("df") * (col("df") - 1) / 2).as("cand_pairs")).collect()(0)
    val nDocs = docs.count()
    println(s"[jaccacct] docs=$nDocs vocab=${acct.get(0)} " +
      s"exploded=${acct.get(1)} max_df=${acct.get(2)} cand_pairs=${acct.get(3)}")
    dfTab.unpersist()
    def ms(f: => Unit): Long = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1000000L }
    for (rep <- 0 until 3) {
      var nNaive = 0L; var nPrefix = 0L
      val tNaive = ms { nNaive = graft.ext.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", 3, 0.4).count() }
      val tPrefix = ms { nPrefix = graft.ext.Dedup.ngramJaccardPairsPrefix(
        docs, "doc_id", "text", 3, 0.4).count() }
      println(s"[jaccacct] rep=$rep naive_ms=$tNaive prefix_ms=$tPrefix " +
        s"out_naive=$nNaive out_prefix=$nPrefix")
    }
  }
}

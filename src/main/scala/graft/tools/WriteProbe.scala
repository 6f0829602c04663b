package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: per-file metadata overhead of a local parquet write.
  * The local FileSystem pays a fork/exec per chmod (no native Hadoop lib —
  * see [[FsProbe]]), and the output committer does several metadata ops per
  * file; this measures how much of a small N-file write is committer
  * machinery vs data. Args: [nFiles] [reps]. A/B via the usual
  * `spark.hadoop.*` confs passed as `-D`-style env overrides in the caller.
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 16
    val reps = if (args.length > 1) args(1).toInt else 6
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_PROBE_COMMITTER_V2").filter(_ == "true").foreach { _ =>
      builder.config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    }
    sys.env.get("GRAFT_PROBE_RAW_FS").filter(_ == "true").foreach { _ =>
      builder.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
    }
    sys.env.get("GRAFT_PROBE_NIO_FS").filter(_ == "true").foreach { _ =>
      builder.config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(0, 16000).selectExpr("id", "id * 2 AS v")
    df.repartition(nFiles).write.mode("overwrite")
      .parquet(s"${graft.Scratch.root}/write_probe_warm") // warm codegen/committer classes
    val times = (0 until reps).map { i =>
      val t0 = System.nanoTime()
      df.repartition(nFiles).write.mode("overwrite")
        .parquet(s"${graft.Scratch.root}/write_probe_$i")
      (System.nanoTime() - t0) / 1e6
    }
    println(f"[writeprobe] nFiles=$nFiles median=${times.sorted.apply(reps / 2)}%.0f ms " +
      s"all=${times.map(_.round).mkString(",")}")
    (0 until reps).foreach(i => graft.io.ParquetIO.deleteRecursively(
      new java.io.File(s"${graft.Scratch.root}/write_probe_$i")))
    graft.io.ParquetIO.deleteRecursively(
      new java.io.File(s"${graft.Scratch.root}/write_probe_warm"))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Measurement probe for the stream codegen default (VERDICT r18 ask 2):
  * does the `SPARK_GRAFT_STREAM_WSCG=false` pin still win when a single
  * AvailableNow trigger carries a PRODUCTION-SIZED batch instead of the
  * gate-scale 50-150k rows?
  *
  * Builds a tiled events landing (id/user strides per tile, one parquet
  * file set) under the scratch root, then drains three representative
  * stateful shapes (windowed aggregate, session windows, exact dedup →
  * rollup) in ONE trigger each, alternating whole-stage codegen ON/OFF
  * inside the same JVM (the pin is a session conf read at stream start).
  * Interleaved A-B-A-B per shape; prints one JSON line per (shape, mode,
  * rep) with the drain wall. Not part of any gate — a tools/ probe.
  *
  * usage: StreamWscgScaleProbe <srcDir> [tiles=30] [reps=2]
  */
object StreamWscgScaleProbe {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tiles = if (args.length > 1) args(1).toInt else 30
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-wscg-probe")
      // shuffle partitions NOT pinned to the gate-scale 4: a production
      // drain of a large batch keeps real parallelism — this is exactly
      // the posture difference the probe exists to measure
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "32"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        graft.streaming.LocalCheckpointFileManager.confValue)
      .config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // tiled landing: ts unchanged (same window/session geometry per tile),
    // ids and users strided so state cardinality scales with the data
    val base = graft.Tables.events(spark, src)
    val idStride = base.agg(max(col("event_id"))).head.getLong(0) + 1L
    val userStride = base.agg(max(col("user_id"))).head.getLong(0) + 1L
    val landing = s"${graft.Scratch.root}/graft_wscg_probe_" +
      s"${ProcessHandle.current().pid()}_$tiles"
    val tiled = (0 until tiles).map { i =>
      base.withColumn("event_id", col("event_id") + lit(idStride * i))
        .withColumn("user_id", col("user_id") + lit(userStride * i))
    }.reduce(_ unionByName _)
    tiled.repartition(8).write.mode("overwrite").parquet(landing)
    val nRows = spark.read.parquet(landing).count()
    System.err.println(s"[probe] landing $landing rows=$nRows")

    def drain(name: String, mode: OutputMode,
              mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_]): Double = {
      val ckpt = s"$landing-ckpt-${System.nanoTime()}"
      val stream = spark.readStream
        .schema(spark.read.parquet(landing).schema)
        .parquet(landing) // no maxFilesPerTrigger: AvailableNow = ONE batch
      val t0 = System.nanoTime()
      val q = mk(stream).writeStream.outputMode(mode)
        .format("memory").queryName(s"probe_$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(); q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.dropTempView(s"probe_$name")
      graft.io.ParquetIO.deleteRecursively(new java.io.File(ckpt))
      sec
    }

    val shapes: Seq[(String, OutputMode, org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_])] = Seq(
      ("windowed", OutputMode.Complete(),
        df => graft.streaming.StreamOps.windowedCounts(df, 3600, 3600)),
      ("session", OutputMode.Append(),
        df => graft.streaming.StreamOps.sessionCounts(df, 1800)),
      ("dedup_rollup", OutputMode.Complete(),
        df => graft.streaming.StreamOps.dedupByKey(df, "event_id")
          .groupBy("event_type").agg(count(lit(1)).as("n"))))

    // one untimed warm drain per shape per mode (first-touch engine init)
    for ((n, m, mk) <- shapes; w <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", w)
      drain(s"warm_${n}_$w", m, mk): Unit
    }
    val out = for {
      rep <- 1 to reps
      (n, m, mk) <- shapes
      w <- Seq("false", "true")
    } yield {
      spark.conf.set("spark.sql.codegen.wholeStage", w)
      val cg0 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      val sec = drain(s"${n}_${w}_$rep", m, mk)
      val cg = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount - cg0
      System.err.println(f"[probe] $n wscg=$w rep=$rep $sec%7.2f s  compiles=$cg")
      s"""{"shape":"$n","wscg":$w,"rep":$rep,"sec":${f"$sec%.3f"},"compiles":$cg}"""
    }
    out.foreach(println)
    graft.io.ParquetIO.deleteRecursively(new java.io.File(landing))
    spark.stop()
  }
}

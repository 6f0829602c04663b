package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    * Shared with [[graft.tools.DumpOracle]] so the gauge's oracle dump
    * can never drift from the driver-facing one. */
  private[graft] def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The ONE renderer of an oracle_sql.json payload, shared with
    * [[graft.tools.DumpOracle]]. Hoisting only the escape left the
    * object-assembly line duplicated in both producers, where a format
    * tweak to one would silently diverge the gauge's dump from the
    * driver-facing one — the whole map→JSON step lives here instead. */
  private[graft] def oracleJson(entries: Map[String, String]): String =
    entries.map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter for fast local
    // iteration (the driver always passes exactly two args → full run)
    val wanted: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    wanted.foreach { w =>
      val unknown = w.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // engine defaults unless overridden — lets the Bench session's
      // streaming fixed-cost settings be correctness-checked through the
      // same oracle compare (the driver sets no env)
      .config("spark.sql.streaming.noDataMicroBatches.enabled",
        sys.env.getOrElse("SPARK_GRAFT_NO_DATA_MB", "true"))
      .config("spark.sql.streaming.minBatchesToRetain",
        sys.env.getOrElse("SPARK_GRAFT_MIN_RETAIN", "100"))
      // the nio checkpoint manager is DEFAULT here (unlike the perf confs
      // above): it is library I/O code, so the driver's oracle compare is
      // exactly where it must prove itself — every stream gate's hash runs
      // through it. All Verify/Bench checkpoints live under Scratch.root
      // (local), the manager's only supported scope.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_FM",
          graft.streaming.LocalCheckpointFileManager.confValue))
      // same library-I/O-code rationale as above: every gate's local read
      // and write runs through the nio-permission local FS here, so the
      // oracle compare is what proves it
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS", "graft.io.NioLocalFileSystem"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => wanted.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = oracleJson(SparkEntry.oracleSql
      .filter { case (k, _) => wanted.forall(_.contains(k)) })
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

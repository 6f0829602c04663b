package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Partitioned parquet sources/sinks (SURVEY.md §2a S4, K1–K2).
  *
  * Reads go through the table ROOT plus partition-column predicates —
  * Catalyst's file-index pruning then skips non-matching `dataproc=`/`setor=`
  * directories, which is the scalable form of the reference's manual path
  * construction (`transform_stocks_job.py:32`): same IO, but the pruning is
  * visible to the optimizer and composes with further pushed filters.
  */
object ParquetIO {

  /** S4 — read one (or any) Hive partition by predicate, pruning at the
    * file index. `partitionFilters` e.g. Map("dataproc" -> "20240501").
    */
  def readPartitioned(spark: SparkSession, root: String,
                      partitionFilters: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.option("basePath", root).parquet(root)
    partitionFilters.foldLeft(base) { case (df, (k, v)) => df.filter(col(k) === v) }
  }

  /** K1/K2 — partitioned snappy-parquet write, mirroring the reference's
    * writer chain (`extract_stocks_job.py:386-393`) including its explicit
    * dictionary/bloom-filter opt-out on raw stocks. Append by default (the
    * reference's mode); `overwrite` for idempotent scratch outputs.
    */
  def writePartitioned(df: DataFrame, path: String, partitions: Seq[String],
                       disableDictionary: Boolean = false,
                       overwrite: Boolean = false): Unit = {
    val w0 = df.write.mode(if (overwrite) "overwrite" else "append")
      .option("compression", "snappy")
    val w = if (disableDictionary)
      w0.option("parquet.enable.dictionary", "false")
        .option("parquet.bloom.filter.enabled", "false")
    else w0
    w.partitionBy(partitions: _*).parquet(path)
  }

  /** Size-controlled partitioned write — the small-files guard.
    *
    * A naive `df.write.partitionBy(p)` emits one file per (task ×
    * partition-value): with T tasks and P partition values that is up to
    * T×P files — the classic metadata/NameNode killer at 100 TB. Hash-
    * repartitioning on the partition columns first routes each partition
    * value to ONE task (one file per value), and `maxRecordsPerFile` splits
    * oversized values back into bounded files. Result: max(1, rows/maxRec)
    * files per partition value, independent of upstream parallelism.
    */
  def writeSized(df: DataFrame, path: String, partitions: Seq[String],
                 maxRecordsPerFile: Long): Unit =
    df.repartition(partitions.map(col): _*)
      .write.mode("append")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitions: _*)
      .parquet(path)

  /** Bucketed catalog table: rows hash-clustered into `buckets` files by
    * `bucketCols`, sorted within each bucket.
    *
    * The 100 TB co-location primitive: two tables bucketed the same way on
    * the join key join with ZERO exchange — each task zips bucket i with
    * bucket i (verified by `PlanCheckSpec`: no Exchange in the plan). The
    * shuffle is paid once at write time instead of on every join, which is
    * the right trade for fact tables joined repeatedly on the same key.
    * Bucket pruning also serves point lookups on the bucket key.
    */
  def writeBucketed(df: DataFrame, db: String, table: String,
                    bucketCols: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(s"`$db`.`$table`")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor directory the
  * driver passes to every `SparkEntry.queries` entry. Reads go through
  * `spark.read.parquet` so Catalyst column pruning / predicate pushdown apply
  * to every downstream query (check `PushedFilters` in `.explain`).
  */
object Tables {
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` is nanosecond-precision parquet (TIMESTAMP(NANOS)), which
    * Spark's vectorized reader rejects. Read it as raw nanos
    * (`nanosAsLong`) and convert with exact integer division — a double
    * intermediate would lose precision above 2^53 (epoch-nanos ≈ 1.7e18).
    * Micros = floor(nanos/1000), matching DuckDB's ns→us truncation, so
    * oracle comparisons on formatted/epoch values agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

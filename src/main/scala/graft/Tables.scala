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
  /** `events.ts` normalization. The generated parquet has carried two
    * physical types across testdata drops: TIMESTAMP(NANOS) (which Spark
    * only reads as a raw long via `nanosAsLong`; converted here with exact
    * integer division — a double intermediate would lose precision above
    * 2^53, epoch-nanos ≈ 1.7e18) and TIMESTAMP(MICROS, isAdjustedToUTC=
    * false) (which Spark reads natively as TIMESTAMP_NTZ). Both normalize
    * to session-zone TimestampType — sessions here pin UTC, so the NTZ→LTZ
    * cast is wall-clock-preserving and every downstream event-time operator
    * (windows, watermarks, unix_* extractors) sees one stable type that
    * formats identically to DuckDB's naive micros timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Resolved-relation cache: `spark.read.parquet` pays file listing +
    * parquet footer schema read at analysis, and a registry suite that
    * rebuilds its inputs per query was paying it per QUERY (measured:
    * `ResolveDataSource` alone was 10.7 s of the 138-gate bench — the
    * single largest Catalyst cost). One resolution per (session, dir,
    * table) returns the same analyzed relation; downstream plans compose
    * on it without re-resolving (self-joins are handled by Catalyst's
    * `DeduplicateRelations`, exactly as they already were within one
    * query). The testdata tables are immutable, so a cached file index is
    * never stale; keyed on the session instance so a fresh session
    * re-lists (every JVM here — bench, verify, the shared test session —
    * holds at most a couple of sessions, so the strong key cannot
    * accumulate).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor directory the
  * driver passes to every `SparkEntry.queries` entry. Reads go through
  * `spark.read.parquet` so Catalyst column pruning / predicate pushdown apply
  * to every downstream query (check `PushedFilters` in `.explain`).
  *
  * Every load passes through [[graft.ops.SchemaOps.conformTypes]] against the
  * expected logical schema below: a regenerated upstream drop that narrows an
  * id, promotes a float, or flips a timestamp's physical representation gets
  * cast back to the type the whole query surface was written against — and
  * when nothing drifted (the steady state) the guard is a literal no-op, so
  * plans and pushdown are byte-identical to a bare read. Motivated by a real
  * incident: the round-8 testdata regeneration flipped `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) and silently broke every
  * events-family gate.
  */
object Tables {
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.ts` normalization. The generated parquet has carried two
    * physical types across testdata drops: TIMESTAMP(NANOS) (which Spark
    * only reads as a raw long via `nanosAsLong`; converted here with exact
    * integer division — a double intermediate would lose precision above
    * 2^53, epoch-nanos ≈ 1.7e18) and TIMESTAMP(MICROS, isAdjustedToUTC=
    * false) (which Spark reads natively as TIMESTAMP_NTZ). Both normalize
    * to session-zone TimestampType — sessions here pin UTC, so the NTZ→LTZ
    * cast is wall-clock-preserving and every downstream event-time operator
    * (windows, watermarks, unix_* extractors) sees one stable type that
    * formats identically to DuckDB's naive micros timestamp. The raw-long
    * case needs the unit-aware conversion, which is why `ts` is excluded
    * from the generic conformTypes pass and handled first.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Expected logical schema per table — what every query in the registry
    * was written (and oracle-gated) against. `events.ts` is deliberately
    * absent: its conversion is unit-aware, not a cast (see [[events]]).
    */
  private val expectedTypes: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
  )

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
    * accumulate). The drift guard is applied BEFORE caching: a no-op when
    * nothing drifted, and computed once per session either way.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Name-indexed access to the same cached relations the typed accessors
    * return — for callers that iterate the table set (bench warm-up). */
  def byName(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => load(spark, dir, other)
    }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ => {
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      expectedTypes.get(name).fold(raw)(graft.ops.SchemaOps.conformTypes(raw, _))
    })
}

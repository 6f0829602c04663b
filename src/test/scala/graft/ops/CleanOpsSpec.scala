package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** P1–P13 semantics against reference-shaped fixtures (FIXTURES.md §A1/A3):
  * NaN vs NULL collapse, validity filters, date-equality edges, fuzzy schema
  * normalization with misnamed and missing columns.
  */
class CleanOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def stockRaw = {
    // (ticker, close, volume): NaN, null, negative, zero fixtures per A1
    val schema = StructType(Seq(
      StructField("ticker", StringType), StructField("close", DoubleType),
      StructField("volume", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("ITUB4.SA", 27.35, 1000L),
        Row("PETR4.SA", Double.NaN, 2000L),
        Row("VIVT3.SA", null, 3000L),
        Row("BBDC4.SA", -1.0, 4000L),
        Row("SBSP3.SA", 80.0, 0L))), schema)
  }

  test("P1 nanSafeCast collapses NaN to NULL but keeps nulls and values") {
    val out = CleanOps.nanSafeCast(stockRaw, Seq(
      "ticker" -> StringType, "close" -> DoubleType, "volume" -> LongType))
      .orderBy("ticker").collect()
    val closeByTicker = out.map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(closeByTicker("PETR4.SA").isEmpty, "NaN must become NULL")
    assert(closeByTicker("VIVT3.SA").isEmpty, "NULL stays NULL")
    assert(closeByTicker("ITUB4.SA").contains(27.35))
    assert(closeByTicker("BBDC4.SA").contains(-1.0), "negative survives cast (filtered later)")
  }

  test("P5 filterValid drops non-positive close/volume like the reference") {
    val cleaned = CleanOps.filterValid(stockRaw,
      Seq($"close".isNotNull && !isnan($"close"), $"close" > 0, $"volume" > 0))
    assert(cleaned.select("ticker").as[String].collect().toSet === Set("ITUB4.SA"))
  }

  test("P6 sameDayFilter keeps only parseable equal dates") {
    val df = Seq(
      ("a", "2024-05-01", "2024-05-01"),   // keep
      ("b", "2024-05-01", "2024-05-02"),   // differ
      ("c", "not-a-date", "2024-05-01"),   // unparseable -> null (try_to_date)
      ("d", null, "2024-05-01"),           // null
    ).toDF("id", "published", "extracted")
    val parsed = CleanOps.parseDate(
      CleanOps.parseDate(df, "published", "pd"), "extracted", "ed")
    val out = CleanOps.sameDayFilter(parsed, $"pd", $"ed")
    assert(out.select("id").as[String].collect().toSeq === Seq("a"))
  }

  test("P8 truncateIsoToDate strips T-suffix only when present") {
    val df = Seq("2024-05-01T10:22:33Z", "2024-05-01").toDF("published_time")
    val out = CleanOps.truncateIsoToDate(df, "published_time", "d")
      .select("d").as[String].collect().toSet
    assert(out === Set("2024-05-01"))
  }

  test("P10 dropNullsIn ignores absent columns and drops null rows") {
    val df = Seq(("t1", "l1", "s1"), (null, "l2", "s2"), ("t3", null, "s3"))
      .toDF("title", "link", "source")
    val out = CleanOps.dropNullsIn(df, Seq("title", "link", "missing_col"))
    assert(out.count() === 1)
  }

  test("P13 sanitizeString drops unpaired surrogates, keeps pairs, trims") {
    assert(CleanOps.sanitizeString("  hello\uD800 world  ") === "hello world")
    val emoji = "ok 😀"
    assert(CleanOps.sanitizeString(emoji) === emoji.trim)
  }

  test("P13 sanitize column op strips control chars and trims") {
    val out = CleanOps.sanitize(Seq("  hello�  ").toDF("t"), "t")
      .as[String].head()
    assert(out === "hello")
  }

  test("P2+P3+P4 rename/literal/cast compose") {
    val df = Seq(("2024-05-01", "27.3")).toDF("date", "close")
    val out = CleanOps.withProcessDate(
      CleanOps.castColumns(
        CleanOps.renameAll(df, Map("date" -> "data", "close" -> "precoFechamento")),
        Map("data" -> DateType, "precoFechamento" -> DoubleType)),
      "20240501")
    val r = out.head()
    assert(r.getAs[java.sql.Date]("data").toString === "2024-05-01")
    assert(r.getAs[Double]("precoFechamento") === 27.3)
    assert(r.getAs[String]("dataproc") === "20240501")
  }
}

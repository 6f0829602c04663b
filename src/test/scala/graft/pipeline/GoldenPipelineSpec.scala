package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.io.Catalog
import graft.pipeline.Model.RawQuote

/** Golden end-to-end run of the 4-stage pipeline on fixture data
  * (SURVEY.md §5): refined-zone schema, two-level partition layout
  * (dataproc, setor), and row-level values.
  */
class GoldenPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val zones = Files.createTempDirectory("graft-golden").toString
  private val cfg = Jobs.Config(
    rawStocks = s"$zones/raw/stocks", rawNews = s"$zones/raw/news",
    refinedStocks = s"$zones/refined/stocks", refinedNews = s"$zones/refined/news",
    stockDb = "g_stock_db", newsDb = "g_news_db", processDate = "20240503")

  private val quotes = new FixtureQuoteSource(Seq(
    RawQuote("2024-05-01", "ITUB4.SA", 27.0, 27.5, 26.5, 26.8, 100L),
    RawQuote("2024-05-02", "ITUB4.SA", 28.0, 28.5, 27.5, 27.2, 200L),
    RawQuote("2024-05-03", "ITUB4.SA", 29.0, 29.5, 28.5, 28.2, 300L),
    RawQuote("2024-05-01", "PETR4.SA", 40.0, 41.0, 39.0, 39.5, 10L),
    RawQuote("2024-05-02", "PETR4.SA", 41.0, 42.0, 40.0, 40.5, 20L),
    RawQuote("2024-05-02", "PETR4.SA", Double.NaN, 1.0, 1.0, 1.0, 30L), // NaN close -> null -> filtered
    RawQuote("2024-05-03", "SBSP3.SA", 80.0, 81.0, 79.0, 79.5, 0L),     // volume 0 -> filtered
  ))

  private def art(title: String, link: String, pub: String, ext: String) =
    Seq("ITUB4.SA", "Itau Unibanco", "Banks", title, "g1", link, pub, "itau stock", ext)

  private val news = new FixtureNewsSource(Seq(
    art("Itau rises", "http://a", "2024-05-03T10:00:00", "2024-05-03T21:00:00"),
    art("Itau rises again", "http://a", "2024-05-03T11:00:00", "2024-05-03T21:00:00"), // dup link
    art("Old news", "http://b", "2024-05-01T09:00:00", "2024-05-03T21:00:00"),         // not same-day
    art("Bad date", "http://c", "garbage", "2024-05-03T21:00:00"),                     // unparseable
    art("Same day", "http://d", "2024-05-03T12:00:00", "2024-05-03T21:00:00"),
    art("Same day", "http://d", "2024-05-03T12:00:00", "2024-05-03T21:00:00"),         // full dup
  ))

  test("pipeline end-to-end: refined zones, partitions, values") {
    Pipeline.runAll(spark, quotes, news, cfg)

    // --- refined stocks: partition layout dataproc=*/setor=* (K2)
    val setorDirs = new java.io.File(s"${cfg.refinedStocks}/dataproc=20240503")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(setorDirs === Set("setor=Banks", "setor=Energy"))

    val clean = spark.read.option("basePath", cfg.refinedStocks)
      .parquet(cfg.refinedStocks)
    assert(clean.count() === 5, "NaN-close and zero-volume rows filtered")

    val itub = clean.filter($"codigoAcao" === "ITUB4.SA")
      .orderBy("data").collect()
    assert(itub.map(r => Option(r.getAs[Double]("variacaoFechamento"))).toSeq ===
      Seq(None, Some(1.0), Some(1.0)), "W1 lag variation")
    val bankMedia = itub.head.getAs[Double]("mediaFechamento")
    assert(math.abs(bankMedia - 28.0) < 1e-9, "per-sector avg attached to detail")

    // --- refined news: same-day + dedup semantics
    val newsClean = spark.read.option("basePath", cfg.refinedNews)
      .parquet(cfg.refinedNews)
    val links = newsClean.select("link").as[String].collect().sorted
    assert(links.toSeq === Seq("http://a", "http://d"),
      "same-day only, keyed+full dedup applied")
    val titleA = newsClean.filter($"link" === "http://a")
      .select("title").as[String].head()
    assert(titleA === "Itau rises", "deterministic survivor (earliest title)")

    // --- catalogs registered and queryable (D2/D6, S5)
    assert(Catalog.tableExists(spark, cfg.stockDb, "stocks_clean"))
    assert(Catalog.showPartitions(spark, cfg.stockDb, "stocks_clean").toSet ===
      Set("dataproc=20240503/setor=Banks", "dataproc=20240503/setor=Energy"))
    assert(Catalog.readTable(spark, cfg.newsDb, "news_clean").count() === 2)
    assert(spark.sql(s"SELECT count(*) FROM `${cfg.stockDb}`.`stocks_clean`")
      .head().getLong(0) === 5)
  }
}

package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** S2/S3 offline source implementations: the selector port parsed against
  * checked-in fixture HTML (the crawl's parsing logic is pure,
  * `extract_news_job.py:68-155`), and the v8 chart JSON parse for quotes —
  * end-to-end to DataFrames with the model schemas, no network.
  */
class HttpSourcesSpec extends AnyFunSuite with SparkSpec {

  private val articlePage =
    """<html><body><main>
      |<article class="card">
      |  <a href="./read/CBMiabc?hl=pt-BR" data-n-tid="9">ignored</a>
      |  <h3>Itaú lucra R$ 10 bi <b>no tri</b></h3>
      |  <div data-n-tid="29">Valor Econômico</div>
      |  <time datetime="2024-05-01T12:30:00Z"> há 2 horas </time>
      |</article>
      |<article>
      |  <a href="/articles/xyz"><h4> Sem h3, com h4 </h4></a>
      |  <span data-n-tid="9">InfoMoney</span>
      |</article>
      |<article>
      |  <a href="https://example.com/abs">absolute</a>
      |  <time>ontem</time>
      |</article>
      |</main></body></html>""".stripMargin

  test("article page: selector chain, link normalization, time fallbacks") {
    val arts = NewsCrawl.parseArticles(articlePage)
    assert(arts.size === 3)
    assert(arts(0).title === "Itaú lucra R$ 10 bino tri",
      "bs4 get_text(strip=True) semantics: each string stripped, concatenated")
    assert(arts(0).link === "https://news.google.com/read/CBMiabc?hl=pt-BR")
    assert(arts(0).source === "Valor Econômico")
    assert(arts(0).publishedTime === "2024-05-01T12:30:00Z")
    assert(arts(1).title === "Sem h3, com h4")
    assert(arts(1).link === "https://news.google.com/articles/xyz",
      "non-http href resolves against the domain")
    val bare = NewsCrawl.parseArticles("""<article><a href="articles/bare">t</a></article>""")
    assert(bare.head.link === "https://news.google.com/articles/bare",
      "bare-relative href gets the missing separator")
    assert(arts(1).source === "InfoMoney", "span[data-n-tid] fallback")
    assert(arts(1).publishedTime === "")
    assert(arts(2).title === "")
    assert(arts(2).link === "https://example.com/abs")
    assert(arts(2).source === "Google News", "default when no data-n-tid")
    assert(arts(2).publishedTime === "ontem", "time text when no datetime attr")
  }

  test("selector fallback: div[data-n-tid] page, then div.xrnccd page") {
    val tidPage =
      """<div><div data-n-tid="1"><h3>T1</h3></div>
        |<div data-n-tid="2"><h3>T2</h3></div></div>""".stripMargin
    assert(NewsCrawl.parseArticles(tidPage).map(_.title) === Seq("T1", "T2"))
    val xrnccdPage =
      """<div class="a xrnccd b"><h4>Only card</h4>
        |<a href="./x">l</a></div>""".stripMargin
    val arts = NewsCrawl.parseArticles(xrnccdPage)
    assert(arts.map(_.title) === Seq("Only card"))
    assert(arts.head.link === "https://news.google.com/x")
  }

  test("HtmlDoc survives comments, script content, void and unclosed tags") {
    val messy =
      """<!DOCTYPE html><!-- <article>not real</article> -->
        |<script>var x = "<article>nope</article>";</script>
        |<article><h3>Real<br>Title</h3><p>unclosed paragraph</article>""".stripMargin
    val arts = NewsCrawl.parseArticles(messy)
    assert(arts.map(_.title) === Seq("RealTitle"))
  }

  test("HtmlDoc decodes entities in text and attributes like bs4") {
    val root = HtmlDoc.parse(
      """<article><h3>Tom &amp; Jerry &#8211; a &quot;Duo&quot;&#x21;</h3>
        |<a href="./read?a=1&amp;b=2">M&uacute;sica&bogus; &#128512;</a></article>""".stripMargin)
    val h3 = root.findFirst(_.tag == "h3").get
    assert(h3.text === "Tom & Jerry – a \"Duo\"!")
    val a = root.findFirst(_.tag == "a").get
    assert(a.attr("href").get === "./read?a=1&b=2", "hrefs decode &amp;")
    // known named + unknown passthrough + astral numeric
    assert(a.text === "Música&bogus; 😀")
    // full HTML4 table via commons-text, not a curated subset
    assert(HtmlDoc.parse("<p>M&ouml;glich ma&ntilde;ana &szlig;</p>").text
      === "Möglich mañana ß")
    // C1 refs take the HTML5 windows-1252 remap (html.parser behavior)...
    assert(HtmlDoc.parse("<p>It&#146;s &#147;here&#148;</p>").text
      === "It’s “here”")
    // ...and NUL / surrogate / out-of-range / overflowing refs yield U+FFFD
    assert(HtmlDoc.parse("<p>&#0;&#xD800;&#1114112;&#99999999999;</p>").text
      === "����")
    // non-numeric garbage that never matches the ref grammar passes through
    assert(HtmlDoc.parse("<p>&#xZZ; &;</p>").text === "&#xZZ; &;")
  }

  test("HtmlDoc terminates and never throws on adversarial fragments") {
    val nasty = Seq(
      "", "<", "<>", "</", "<//>", "<a", "<a href=", "<a href='unterminated",
      "<a href=\"x>y\">t</a>", "<!---->", "<!-- unterminated", "<script>",
      "<script>unterminated", "<b><i></b></i>", "</nothing>", "<1notatag>",
      "text < notatag > text", "<p/><p/><p/>", "<a data-n-tid>bare attr</a>",
      "<ARTICLE><H3>CAPS</H3></ARTICLE>", "<div class>empty class</div>",
      ("<div>" * 500) + "deep" + ("</div>" * 500))
    nasty.foreach { html =>
      val root = HtmlDoc.parse(html) // must not hang or throw
      root.descendants.size // force traversal
      root.text
    }
    // case-insensitivity: bs4 html.parser lowercases tag names
    val caps = HtmlDoc.parse("<ARTICLE><H3>Caps Title</H3></ARTICLE>")
    assert(NewsCrawl.selectArticles(caps).size === 1)
    assert(NewsCrawl.title(NewsCrawl.selectArticles(caps).head) === "Caps Title")
  }

  test("HttpNewsSource: terms per company, sanitize, failures skip the term") {
    val served = scala.collection.mutable.ArrayBuffer.empty[String]
    val fetch: String => String = url => {
      served += url
      if (url.contains("resultados")) throw new java.io.IOException("HTTP 429")
      s"""<article><h3>  Noticia  sobre algo  </h3>
         |<a href="./read/1"></a><time datetime="2024-05-01T00:00:00Z"></time>
         |<div data-n-tid="9">Fonte</div></article>""".stripMargin
    }
    val src = new HttpNewsSource(fetch, pauseMs = 0, now = () => "2024-05-01T00:00:00")
    val df = src.fetchNews(spark, Seq("ITUB4.SA" -> "Itaú Unibanco"))
    assert(df.schema === Model.newsRawSchema)
    val rows = df.collect()
    assert(served.size === 4, "four search terms per company")
    assert(served.head.contains("Empresa%20Ita") && served.head.contains("hl=pt-BR"))
    assert(served.exists(_.contains("ITUB4")) && !served.exists(_.contains(".SA")),
      "ticker term drops the .SA suffix")
    assert(rows.length === 3, "the failing term contributes zero rows, others one each")
    val r = rows.head
    assert(r.getString(0) === "ITUB4.SA" && r.getString(2) === "Banks")
    assert(r.getString(3) === "Noticia  sobre algo",
      "ends trimmed; internal whitespace preserved (reference strip() parity)")
    assert(r.getString(5) === "https://news.google.com/read/1")
    assert(r.getString(8) === "2024-05-01T00:00:00")
  }

  private val chartJson =
    """{"chart":{"result":[{"meta":{"symbol":"ITUB4.SA"},
      |"timestamp":[1714563000, 1714563060, 1714563120],
      |"indicators":{"quote":[{
      |  "open":[27.1, null, 27.3], "high":[27.2, 27.25, 27.4],
      |  "low":[27.0, 27.05, 27.2], "close":[27.15, 27.2, null],
      |  "volume":[1000, null, 3000]}]}}],"error":null}}""".stripMargin

  test("HttpQuoteSource: chart JSON to long-form OHLCV rows, nulls kept") {
    val src = new HttpQuoteSource(_ => chartJson)
    val df = src.fetchQuotes(spark, Seq("ITUB4.SA"))
    assert(df.columns.toSeq === Seq("Date", "Ticker", "Close", "High", "Low", "Open", "Volume"))
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "2024-05-01" && rows(0).getString(1) === "ITUB4.SA")
    assert(rows(0).getDouble(2) === 27.15 && rows(0).getLong(6) === 1000L)
    assert(rows(1).isNullAt(5) && rows(1).isNullAt(6), "null points stay NULL")
    assert(rows(2).isNullAt(2))
    // same shape the fixture source produces -> Jobs.extractStocks accepts both
    import spark.implicits._
    val fixture = new FixtureQuoteSource(Seq(
      Model.RawQuote("2024-05-01", "ITUB4.SA", 1, 1, 1, 1, 1L)))
      .fetchQuotes(spark, Seq("ITUB4.SA"))
    assert(fixture.columns.toSeq === df.columns.toSeq)
  }

  test("HTTP sources plug into the extract jobs end-to-end") {
    val zones = java.nio.file.Files.createTempDirectory("graft-http-e2e").toString
    val cfg = Jobs.Config(
      rawStocks = s"$zones/raw/stocks", rawNews = s"$zones/raw/news",
      refinedStocks = s"$zones/refined/stocks", refinedNews = s"$zones/refined/news",
      stockDb = "h_stock_db", newsDb = "h_news_db", processDate = "20240501")

    val newsHtml =
      """<article><h3>Uma noticia</h3><a href="./read/9"></a>
        |<time datetime="2024-05-01T00:00:00Z"></time>
        |<div data-n-tid="9">Fonte</div></article>""".stripMargin
    Jobs.extractNews(spark,
      new HttpNewsSource(_ => newsHtml, pauseMs = 0, now = () => "2024-05-01T00:00:00"),
      cfg)
    val rawNews = graft.io.Catalog.readTable(spark, "h_news_db", "news_raw")
    assert(rawNews.count() === Model.stockDim.size * 4,
      "one parsed article per (company x search term)")
    assert(rawNews.select("sector").distinct().count() > 1, "sector lookup applied")

    Jobs.extractStocks(spark, new HttpQuoteSource(_ => chartJson), cfg)
    val rawStocks = graft.io.Catalog.readTable(spark, "h_stock_db", "stock_prices_best_row")
    // fixture serves the same 3-bar chart (symbol ITUB4.SA) for every ticker
    assert(rawStocks.count() === Model.stockDim.size * 3)
    assert(rawStocks.filter(org.apache.spark.sql.functions.col("sector") === "Banks")
      .count() > 0, "dim enrichment joined through")
  }

  test("HttpQuoteSource: malformed/empty payloads yield zero rows, no throw") {
    val src = new HttpQuoteSource(_ => """{"chart":{"result":[],"error":"boom"}}""")
    assert(src.fetchQuotes(spark, Seq("X")).count() === 0)
    val bad = new HttpQuoteSource(_ => "not json at all")
    assert(bad.fetchQuotes(spark, Seq("X")).count() === 0)
  }
}

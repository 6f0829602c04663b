package graft.sources

import java.util

import scala.util.control.NonFatal

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.ChartJson

/** Transport boundary for the DSv2 quote source. Implementations must have
  * a zero-arg constructor: the reader factory ships only the CLASS NAME to
  * executors and instantiates per partition — the cluster-valid form of
  * dependency injection (closures over sockets/clients don't serialize).
  */
trait QuoteTransport extends Serializable {
  def fetch(url: String): String
}

/** Production transport: `java.net.http` GET with the crawl headers. */
final class HttpTransport extends QuoteTransport {
  @transient private lazy val f = graft.pipeline.Http.fetcher()
  def fetch(url: String): String = f(url)
}

/** Hermetic transport: serves a deterministic, well-formed v8 chart JSON
  * document per ticker (no I/O — this container has no egress). The
  * expected PARSED rows are exposed as [[SyntheticTransport.rowsFor]] so
  * tests and the correctness-gate oracle derive from the same definition
  * and cannot drift from the JSON.
  */
final class SyntheticTransport extends QuoteTransport {
  def fetch(url: String): String = SyntheticTransport.chartFor(url)
}

object SyntheticTransport {

  private val BaseEpoch = 1700000000L // 2023-11-14 UTC

  /** Ticker as embedded in [[ChartJson.chartUrl]]. */
  private def tickerOf(url: String): String = {
    val m = java.util.regex.Pattern.compile("/chart/([^?]+)").matcher(url)
    if (!m.find()) throw new IllegalArgumentException(s"not a chart url: $url")
    java.net.URLDecoder.decode(m.group(1), "UTF-8")
  }

  /** The rows [[chartFor]]'s JSON must parse to: 4 one-minute bars per
    * ticker; bar 2 is a null OHLC point (volume only) to exercise the
    * NaN/NULL path. Prices are exact binary fractions (.25 steps) so both
    * engines compare bit-identical without rounding.
    */
  def rowsFor(ticker: String): Seq[(String, String, Option[Double], Option[Long])] = {
    val base = 10.0 + math.abs(ticker.hashCode % 90)
    (0 until 4).map { i =>
      val close = if (i == 2) None else Some(base + 0.25 * i)
      (java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(BaseEpoch + 60L * i)),
        ticker, close, Some(1000L + 10 * i))
    }
  }

  def chartFor(url: String): String = {
    val t = tickerOf(url)
    val rows = rowsFor(t)
    val ts = rows.indices.map(i => BaseEpoch + 60L * i).mkString(",")
    def arr(f: Option[Double] => String) = rows.map(r => f(r._3)).mkString(",")
    val closes = arr(_.fold("null")(_.toString))
    val highs = arr(_.fold("null")(c => (c + 0.5).toString))
    val lows = arr(_.fold("null")(c => (c - 0.5).toString))
    val opens = closes
    val vols = rows.map(_._4.get).mkString(",")
    s"""{"chart":{"result":[{"meta":{"symbol":"$t","exchangeTimezoneName":"UTC"},
       |"timestamp":[$ts],
       |"indicators":{"quote":[{"close":[$closes],"high":[$highs],"low":[$lows],
       |"open":[$opens],"volume":[$vols]}]}}]}}""".stripMargin
  }
}

/** DataSourceV2 quote source — the 100 TB shape of S2 ingestion (SURVEY §3
  * E3: "the 100-TB design must replace this with a DataSourceV2"): one
  * input partition per ticker, fetched and parsed ON THE EXECUTORS, so a
  * 10k-ticker universe fans out across the cluster instead of serializing
  * through a driver loop.
  *
  *   spark.read.format("graft-quotes")
  *     .option("tickers", "PETR4.SA,VALE3.SA")
  *     .option("transport", classOf[HttpTransport].getName)  // default
  *     .load()
  *
  * Per-ticker failures yield an empty partition (the reference's per-term
  * try/except, `extract_stocks_job.py` — one bad symbol must not kill the
  * batch).
  */
final class QuoteDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-quotes"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ChartJson.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new QuoteTable
}

private[sources] final class QuoteTable extends Table with SupportsRead {
  override def name(): String = "graft_quotes"
  override def schema(): StructType = ChartJson.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QuoteScanBuilder(
      options.getOrDefault("tickers", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      options.getOrDefault("transport", classOf[HttpTransport].getName))
}

/** Scan builder with the two pushdowns that matter for a fetch-per-ticker
  * source: `Ticker` equality/IN predicates prune whole PARTITIONS (HTTP
  * requests that never happen — the DSv2 analogue of partition pruning),
  * and required-column projection trims the row width the reader emits.
  */
private[sources] final class QuoteScanBuilder(tickers: Seq[String], transportClass: String)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In}

  private var remaining: Seq[String] = tickers
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ChartJson.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (prunable, rest) = filters.partition {
      case EqualTo("Ticker", _: String) => true
      case In("Ticker", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    prunable.foreach {
      case EqualTo("Ticker", v: String) => remaining = remaining.filter(_ == v)
      case In("Ticker", vs) => val keep = vs.collect { case s: String => s }.toSet
        remaining = remaining.filter(keep)
      case _ =>
    }
    pushed = prunable
    // return ALL filters for re-evaluation: pruning is an optimization
    // only — the emitted Ticker comes from the response's meta.symbol,
    // which a real endpoint may normalize (case, suffixes) away from the
    // requested ticker, so Spark must still apply the predicate to rows
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order; an empty projection (count(*)) keeps
    // zero columns and the reader emits empty rows
    required = StructType(ChartJson.schema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new QuoteScan(remaining, transportClass, required)
}

private[sources] final class QuoteScan(tickers: Seq[String], transportClass: String,
                                       required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    tickers.map(QuotePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new QuoteReaderFactory(transportClass,
      required.fieldNames.map(ChartJson.schema.fieldIndex))
}

private[sources] final case class QuotePartition(ticker: String) extends InputPartition

private[sources] final class QuoteReaderFactory(transportClass: String,
                                                projection: Array[Int])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ticker = partition.asInstanceOf[QuotePartition].ticker
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[Row] = {
        // transport resolution is a CONFIG error and must fail the scan
        // loudly — only the per-ticker fetch/parse gets the swallow-to-empty
        // resilience (a typo'd class name silently yielding 0 rows would be
        // indistinguishable from "all tickers failed")
        val transport = Class.forName(transportClass)
          .getDeclaredConstructor().newInstance().asInstanceOf[QuoteTransport]
        try ChartJson.parse(transport.fetch(ChartJson.chartUrl(ticker))).iterator
        catch { case NonFatal(_) => Iterator.empty }
      }
      private var current: Row = _
      override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
      // full schema: Date, Ticker (strings) then Close/High/Low/Open
      // (double), Volume (long) — numeric externals are already catalyst
      // values, strings need UTF8String; emit only the pruned columns
      override def get(): InternalRow = InternalRow.fromSeq(
        projection.toSeq.map { i =>
          if (i < 2) UTF8String.fromString(current.getAs[String](i)) else current.get(i)
        })
      override def close(): Unit = ()
    }
  }
}

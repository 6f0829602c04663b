package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.pipeline.ChartJson

/** A transport whose constructor succeeds but whose fetch always fails —
  * the per-partition resilience path (one bad symbol, empty partition).
  */
final class ExplodingTransport extends QuoteTransport {
  def fetch(url: String): String = throw new java.io.IOException("boom")
}

class QuoteSourceV2Spec extends AnyFunSuite with SparkSpec {

  private def read(tickers: String, transport: Class[_ <: QuoteTransport]) =
    spark.read.format("graft-quotes")
      .option("tickers", tickers)
      .option("transport", transport.getName)
      .load()

  test("short name resolves via DataSourceRegister; schema is the chart schema") {
    val df = read("SYN1", classOf[SyntheticTransport])
    assert(df.schema === ChartJson.schema)
  }

  test("one input partition per ticker — the executor-side fan-out") {
    val df = read("SYN1,SYN2,SYN3", classOf[SyntheticTransport])
    assert(df.rdd.getNumPartitions === 3)
  }

  test("rows match the transport's declared parse output, nulls included") {
    val got = read("SYN1,SYN2", classOf[SyntheticTransport])
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        Some(r.getLong(6)): Option[Long])).sortBy(r => (r._2, r._4.get))
    val want = Seq("SYN1", "SYN2").flatMap(SyntheticTransport.rowsFor)
      .sortBy(r => (r._2, r._4.get))
    assert(got.toSeq === want)
    // the i==2 null-OHLC bar survives as NULL, not 0 or NaN
    assert(got.count(_._3.isEmpty) === 2)
  }

  test("a failing ticker yields an empty partition, not a failed scan") {
    assert(read("SYN1,SYN2", classOf[ExplodingTransport]).count() === 0L)
  }

  test("Ticker predicates prune partitions — fetches that never happen") {
    val df = read("SYN1,SYN2,SYN3", classOf[SyntheticTransport])
    assert(df.filter(org.apache.spark.sql.functions.col("Ticker") === "SYN2")
      .rdd.getNumPartitions === 1, "EqualTo prunes to one partition")
    assert(df.filter(org.apache.spark.sql.functions.col("Ticker").isin("SYN1", "SYN3"))
      .rdd.getNumPartitions === 2, "In prunes to the matching partitions")
    // a non-prunable predicate keeps all partitions and still filters rows
    val c = df.filter(org.apache.spark.sql.functions.col("Volume") === 1000L)
    assert(c.rdd.getNumPartitions === 3)
    assert(c.count() === 3L)
  }

  test("column pruning trims the reader's row width") {
    val df = read("SYN1", classOf[SyntheticTransport])
      .select("Ticker", "Volume")
    assert(df.schema.fieldNames.toSeq === Seq("Ticker", "Volume"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      SyntheticTransport.rowsFor("SYN1").map(r => (r._2, r._4.get)))
  }

  test("a misconfigured transport class fails the scan loudly, not empty") {
    val df = spark.read.format("graft-quotes")
      .option("tickers", "SYN1")
      .option("transport", "graft.sources.NoSuchTransport")
      .load()
    val e = intercept[org.apache.spark.SparkException] { df.count() }
    assert(e.getMessage.contains("NoSuchTransport") ||
      Option(e.getCause).exists(_.toString.contains("NoSuchTransport")))
  }

  test("empty tickers option plans zero partitions") {
    val df = spark.read.format("graft-quotes")
      .option("transport", classOf[SyntheticTransport].getName).load()
    assert(df.count() === 0L)
  }
}

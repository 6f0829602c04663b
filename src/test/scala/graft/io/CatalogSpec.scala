package graft.io

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** D1–D8 + K1/K3 + S5 against the built-in session catalog with local
  * Hive-layout directories.
  */
class CatalogSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val tmp = Files.createTempDirectory("graft-catalog").toString
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("D1/D2/D5: database + external partitioned table lifecycle") {
    Catalog.ensureDatabase(spark, "t_db")
    assert(!Catalog.tableExists(spark, "t_db", "t1"))
    Catalog.createExternalTable(spark, "t_db", "t1", schema,
      Seq("dataproc" -> "STRING"), s"$tmp/t1")
    assert(Catalog.tableExists(spark, "t_db", "t1"))
  }

  test("K1 + D6/D7: path-partitioned write discovered by MSCK REPAIR") {
    Catalog.ensureDatabase(spark, "t_db")
    val df = Seq((1L, "a", "20240501"), (2L, "b", "20240502"))
      .toDF("id", "v", "dataproc")
    ParquetIO.writePartitioned(df, s"$tmp/t2", Seq("dataproc"))
    Catalog.createExternalTable(spark, "t_db", "t2", schema,
      Seq("dataproc" -> "STRING"), s"$tmp/t2")
    assert(Catalog.showPartitions(spark, "t_db", "t2").isEmpty)
    Catalog.repairTable(spark, "t_db", "t2")
    val parts = Catalog.showPartitions(spark, "t_db", "t2")
    assert(parts.toSet === Set("dataproc=20240501", "dataproc=20240502"))
    assert(Catalog.readTable(spark, "t_db", "t2").count() === 2)
  }

  test("D8: idempotent ADD PARTITION with explicit location") {
    Catalog.ensureDatabase(spark, "t_db")
    val df = Seq((3L, "c", "20240503")).toDF("id", "v", "dataproc")
    ParquetIO.writePartitioned(df, s"$tmp/t3", Seq("dataproc"))
    Catalog.createExternalTable(spark, "t_db", "t3", schema,
      Seq("dataproc" -> "STRING"), s"$tmp/t3")
    Catalog.addPartition(spark, "t_db", "t3",
      Map("dataproc" -> "20240503"), s"$tmp/t3/dataproc=20240503")
    Catalog.addPartition(spark, "t_db", "t3",
      Map("dataproc" -> "20240503"), s"$tmp/t3/dataproc=20240503") // idempotent
    assert(Catalog.showPartitions(spark, "t_db", "t3") === Seq("dataproc=20240503"))
    assert(Catalog.readTable(spark, "t_db", "t3").count() === 1)
  }

  test("K3 + S5: catalog-mediated append then scan") {
    Catalog.ensureDatabase(spark, "t_db")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS `t_db`.`t4` (id BIGINT, v STRING)
                 |USING parquet PARTITIONED BY (dataproc STRING)
                 |LOCATION '$tmp/t4'""".stripMargin)
    Seq((1L, "x", "20240501")).toDF("id", "v", "dataproc")
      .transform(df => { Catalog.appendToTable(df, "t_db", "t4"); df })
    assert(Catalog.readTable(spark, "t_db", "t4").count() === 1)
    assert(Catalog.showPartitions(spark, "t_db", "t4") === Seq("dataproc=20240501"))
  }

  test("D4: drop table removes catalog entry but not external data") {
    Catalog.ensureDatabase(spark, "t_db")
    Catalog.createExternalTable(spark, "t_db", "t5", schema,
      Seq("dataproc" -> "STRING"), s"$tmp/t2")
    Catalog.dropTable(spark, "t_db", "t5")
    assert(!Catalog.tableExists(spark, "t_db", "t5"))
    assert(spark.read.parquet(s"$tmp/t2").count() === 2, "external data survives")
  }
}

package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class CompactionSpec extends AnyFunSuite with SparkSpec {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compact: many small files become few sized files, zero row churn") {
    val base = Files.createTempDirectory("graft_compact").toString
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    li.repartition(32).write.parquet(s"$base/small")
    assert(parquetFiles(s"$base/small").length === 32)
    ParquetIO.compact(spark, s"$base/small", s"$base/out", targetBytes = 512L * 1024)
    val outFiles = parquetFiles(s"$base/out")
    assert(outFiles.length < 32, "compaction must reduce the file count")
    // file-count math: ceil(inputBytes / target), never zero
    val inBytes = parquetFiles(s"$base/small").map(_.length).sum
    assert(outFiles.length === math.max(1, math.ceil(inBytes / (512.0 * 1024)).toInt))
    // no loss, no duplication
    val before = li.count()
    assert(spark.read.parquet(s"$base/out").count() === before)
  }

  test("compact of a tiny directory yields exactly one file") {
    val base = Files.createTempDirectory("graft_compact1").toString
    Tables.region(spark, sfDir).repartition(5).write.parquet(s"$base/small")
    ParquetIO.compact(spark, s"$base/small", s"$base/out")
    assert(parquetFiles(s"$base/out").length === 1)
  }
}

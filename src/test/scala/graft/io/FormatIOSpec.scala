package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FormatIOSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_fmt_$tag").toString + "/out"

  private val df = Seq(
    (1L, Some("alpha"), Some(2.5)),
    (2L, None, Some(-0.125)),
    (3L, Some("gamma, delta"), None), // embedded comma exercises CSV quoting
  ).toDF("id", "s", "v")

  test("csv round-trip preserves values, nulls, and quoting") {
    val back = FormatIO.roundTrip(df, tmp("csv"), "csv")
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      (1L, Some("alpha"), Some(2.5)),
      (2L, None, Some(-0.125)),
      (3L, Some("gamma, delta"), None)))
  }

  test("json round-trip preserves values and nulls exactly") {
    val back = FormatIO.roundTrip(df, tmp("json"), "json")
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      (1L, Some("alpha"), Some(2.5)),
      (2L, None, Some(-0.125)),
      (3L, Some("gamma, delta"), None)))
  }

  test("orc round-trip preserves values and nulls exactly") {
    val back = FormatIO.roundTrip(df, tmp("orc"), "orc")
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(back.toSeq === Seq(
      (1L, Some("alpha"), Some(2.5)),
      (2L, None, Some(-0.125)),
      (3L, Some("gamma, delta"), None)))
  }

  test("unsupported format fails loudly") {
    intercept[IllegalArgumentException] {
      FormatIO.roundTrip(df, tmp("bad"), "xml")
    }
  }
}

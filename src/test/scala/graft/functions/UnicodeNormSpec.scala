package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UnicodeNormSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(c: org.apache.spark.sql.Column, in: String*): Seq[String] =
    in.toDF("s").select(c.as("r")).as[String].collect().toSeq

  test("nfc: combining sequences recompose; precomposed and ASCII are identity") {
    val got = run(UnicodeNorm.nfc(col("s")),
      "café", "café", "ÀB", "hello", "")
    assert(got === Seq("café", "café", "ÀB", "hello", ""))
  }

  test("strip_accents: marks drop from either form; undecomposables survive") {
    val got = run(UnicodeNorm.stripAccents(col("s")),
      "café", "café", "straße", "Ø", "ñ")
    assert(got === Seq("cafe", "cafe", "straße", "Ø", "n"))
  }

  test("both are idempotent and NULL-safe") {
    val twice = run(UnicodeNorm.stripAccents(UnicodeNorm.stripAccents(col("s"))), "café")
    assert(twice === Seq("cafe"))
    val n = Seq(Option.empty[String]).toDF("s")
      .select(UnicodeNorm.nfc(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VectorQuantizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def quantize(vs: Seq[Float]): (Double, Seq[Byte]) = {
    val row = Seq(Tuple1(vs.toArray)).toDF("v")
      .select(VectorFunctions.quantizeI8(col("v")).as("s"))
      .select(col("s.scale"), col("s.q")).head()
    (row.getDouble(0), row.getSeq[Byte](1))
  }

  test("hand example: max maps to ±127, round half away from zero") {
    val (scale, q) = quantize(Seq(1.0f, -0.5f, 0.25f, 0.0f))
    assert(scale === 1.0 / 127.0)
    // 0.25/scale = 31.75 → 32; -0.5/scale = -63.5 → -64 (away from zero)
    assert(q === Seq[Byte](127, -64, 32, 0))
  }

  test("dequantization error bounded by scale/2") {
    val vs = Seq(0.83f, -0.17f, 0.442f, -0.91f, 0.034f)
    val (scale, q) = quantize(vs)
    vs.zip(q).foreach { case (v, qi) =>
      assert(math.abs(qi * scale - v) <= scale / 2 + 1e-12,
        s"dequant error for $v → $qi")
    }
  }

  test("all-zero vector: scale 0, q all zero") {
    val (scale, q) = quantize(Seq(0.0f, 0.0f, 0.0f))
    assert(scale === 0.0 && q === Seq[Byte](0, 0, 0))
  }

  test("NaN input fails loudly") {
    val e = intercept[Exception] { quantize(Seq(1.0f, Float.NaN)) }
    assert(e.getMessage != null)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.TextOps

/** The single-pass sketch kernels must be BIT-IDENTICAL to the declarative
  * aggregate formulations they replaced (same XXH64 family, same seed
  * chaining) — banding, recall specs, and cross-round stability all depend
  * on it.
  */
class SketchFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "spark engines process completely different words here daily"),
    (3L, "a b"), // fewer than 3 tokens -> no 3-shingles
    (4L, ""),
  ).toDF("doc_id", "text")

  test("minhash_sketch == 128 x min(xxhash64(i, s)) over exploded shingles") {
    val numHashes = 128
    val native = docs.select($"doc_id",
        SketchFunctions.minhashSketch(
          ShingleHashes.shingleHashes($"text", 3), numHashes).as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), $"s")).as(s"h$i"))
    val agg = docs
      .select($"doc_id", explode(ShingleHashes.shingleHashes($"text", 3)).as("s"))
      .groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select($"doc_id", array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native === agg)
    assert(!native.contains(3L) && !native.contains(4L),
      "short docs yield no signature in either formulation")
  }

  test("simhash64 == 64-column vote aggregate over exploded tokens") {
    val native = docs.select($"doc_id",
        SketchFunctions.simhash64(TextOps.tokens($"text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val tok = docs.select($"doc_id", explode(TextOps.tokens($"text")).as("t"))
      .withColumn("h", xxhash64($"t"))
    val votes = (0 until 64).map(j =>
      sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"v$j"))
    val fp = (0 until 64).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val agg = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select($"doc_id", fp.as("fp")).as[(Long, Long)].collect().toMap
    assert(native === agg)
  }

  test("shingle_strings == transform/slice/concat_ws HOF form, duplicates kept") {
    val ts = TextOps.tokens($"text")
    val hof = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", slice(ts, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val out = docs.select($"doc_id",
        TextOps.shingles($"text", 2).as("native"), hof.as("hof"))
      .as[(Long, Seq[String], Seq[String])].collect()
    out.foreach { case (id, n, h) => assert(n === h, s"doc $id diverges") }
    // duplicates kept: "x y x y" has bigram "y x" once, "x y" twice
    val dup = Seq("x y x y").toDF("text")
      .select(TextOps.shingles($"text", 2)).head().getSeq[String](0)
    assert(dup === Seq("x y", "y x", "x y"))
  }

  test("lexicon_hits == size(filter(tokens, array_contains)) HOF form") {
    val lex = Seq("the", "and", "of")
    val lexArr = array(lex.map(lit): _*)
    val ts = TextOps.tokens($"text")
    val out = docs.select(
        LexiconHits.hits(ts, lex).as("native"),
        size(filter(ts, t => array_contains(lexArr, t))).as("hof"))
      .as[(Int, Int)].collect()
    out.foreach { case (n, h) => assert(n === h) }
    assert(out.exists(_._1 > 0), "fixture exercises actual hits")
  }

  test("float_vector_dot errors on dimension mismatch (DuckDB error parity)") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.dotF($"a", $"b")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("dimension mismatch"))))
  }

  test("float_vector_dot codegen uses fresh locals (no duplicate declarations)") {
    // two instances in ONE codegen scope with non-nullable children: fixed
    // local names would collide and silently fall back to interpreted eval
    val ctx = new CodegenContext
    val br = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = false)
    val code1 = FloatVectorDot(br, br).genCode(ctx).code.toString
    val code2 = FloatVectorDot(br, br).genCode(ctx).code.toString
    def decls(c: String) =
      "(?:int|double) (\\w+) =".r.findAllMatchIn(c).map(_.group(1)).toSet
    assert(decls(code1).intersect(decls(code2)).isEmpty,
      s"shared locals between instances:\n$code1\n$code2")
  }
}

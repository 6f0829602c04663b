package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.SparkSpec

/** Parity of the byte-scan text kernels against the Java-regex forms they
  * replace: FastTokens vs `split(trim(s), "\s+")`, CollapseWhitespace vs
  * `regexp_replace(s, "\s+", " ")`, and FastTokens.splitJava vs
  * `s.trim.split("\s+")` (the ShingleHashes path — hash inputs must not
  * move or LSH bucket assignments shift).
  */
class TextKernelsSpec extends AnyFunSuite with SparkSpec {

  // strings biased toward the edge shapes: ws runs, leading/trailing ws of
  // BOTH classes (space vs \t\n\x0B\f\r), empties, multibyte chars
  private val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val genStr: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(wsChars),
    1 -> Gen.oneOf('é', 'ü', '中', '€', 'ß'))).map(_.mkString)

  private val edgeCases = Seq(
    "", " ", "  ", "\t", "\n", " \t ", "a", " a ", "\ta", "a\t", "\ta\t",
    "a b", "a  b", " a  b ", "\t a \t b \n", "中 文\t字", "ab",
    "\r\n\r\n", "x \r\n y", "   \t   ")

  test("FastTokens ≡ split(trim(s), \\s+) — edge cases and random strings") {
    val spark0 = spark
    import spark0.implicits._
    def both(strs: Seq[String]): Unit = {
      val df = strs.toDF("s")
      val got = df.select(FastTokens.fastTokens(col("s"))).as[Seq[String]].collect()
      val want = df.select(split(trim(col("s")), "\\s+")).as[Seq[String]].collect()
      got.zip(want).zip(strs).foreach { case ((g, w), s) =>
        assert(g == w, s"input ${s.map(_.toInt).mkString("[", ",", "]")}")
      }
    }
    both(edgeCases)
    val rnd = Gen.listOfN(300, genStr).sample.get
    both(rnd)
  }

  test("CollapseWhitespace ≡ regexp_replace(s, \\s+, ' ')") {
    val spark0 = spark
    import spark0.implicits._
    val strs = edgeCases ++ Gen.listOfN(300, genStr).sample.get
    val df = strs.toDF("s")
    val got = df.select(CollapseWhitespace.collapseWs(col("s"))).as[String].collect()
    val want = df.select(regexp_replace(col("s"), "\\s+", " ")).as[String].collect()
    got.zip(want).zip(strs).foreach { case ((g, w), s) =>
      assert(g == w, s"input ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("splitJava ≡ s.trim.split(\\s+) — the ShingleHashes tokenization") {
    (edgeCases ++ Gen.listOfN(500, genStr).sample.get).foreach { s =>
      val got = FastTokens.splitJava(s).toSeq
      val want = s.trim.split("\\s+").toSeq
      assert(got == want, s"input ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("null propagates") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq[String](null).toDF("s")
    assert(df.select(FastTokens.fastTokens(col("s"))).first().isNullAt(0))
    assert(df.select(CollapseWhitespace.collapseWs(col("s"))).first().isNullAt(0))
  }

  test("TokenEntropy ≡ the explode/two-aggregate form on real documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), FastTokens.fastTokens(col("text")).as("ts"))
    val agg = toks.select(col("doc_id"), explode(col("ts")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(log2(sum(col("c"))) -
        sum(col("c").cast("double") * log2(col("c"))) / sum(col("c")), 4)
        .as("entropy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kern = toks.select(col("doc_id"),
        round(TokenEntropy.entropy(col("ts")), 4).as("entropy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kern.keySet == agg.keySet)
    kern.foreach { case (id, h) => assert(h == agg(id), s"doc $id") }
  }

  test("WrapChars ≡ the split/filter/transform/array_join chain") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val chain = (w: org.apache.spark.sql.Column) => array_join(transform(
      filter(split(w, ""), c => c =!= ""),
      c => concat(lit("("), c, lit(")"))), "")
    val inputs = Seq("", "a", "low", "zzzzzzzz", "abcdefghijklmnopqrstuvwxyz",
      "é日ß", "a b", "(x)")
    val rows = inputs.toDF("w")
      .select(WrapChars.wrapChars(col("w")).as("k"), chain(col("w")).as("c"))
      .collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getString(0) === r.getString(1), s"mismatch for '$in'")
    }
    assert(Seq(Tuple1(null: String)).toDF("w")
      .select(WrapChars.wrapChars(col("w"))).first().isNullAt(0))
  }

  test("TokenEntropy hand-computed values and edges") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    def h(ts: Seq[String]): Double =
      Seq(ts).toDF("ts").select(TokenEntropy.entropy(col("ts"))).first().getDouble(0)
    assert(h(Seq("a", "b", "a", "b")) == 1.0)                  // two equiprobable
    assert(h(Seq("x", "x", "x")) == 0.0)                       // single symbol
    assert(math.abs(h(Seq("a", "a", "b", "c")) - 1.5) < 1e-12) // 1/2,1/4,1/4
    assert(h(Seq.empty[String]) == 0.0)                        // no tokens
    // null elements count as one distinct token value
    val withNull = Seq(Tuple1(Seq[String]("a", null, "a", null))).toDF("ts")
    assert(withNull.select(TokenEntropy.entropy(col("ts"))).first().getDouble(0) == 1.0)
    // null array propagates
    assert(Seq(Tuple1(null: Seq[String])).toDF("ts")
      .select(TokenEntropy.entropy(col("ts"))).first().isNullAt(0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native expressions exposed to SQL via the session extension /
  * registry.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("float_vector_dot and shingle_hashes callable from spark.sql") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT float_vector_dot(CAST(array(1.0, 2.0) AS array<float>), " +
        "CAST(array(3.0, 4.0) AS array<float>)) AS d")
      .head().getDouble(0)
    assert(dot === 11.0)

    val n = spark.sql("SELECT size(shingle_hashes('a b c d', 3)) AS n")
      .head().getInt(0)
    assert(n === 2, "two distinct 3-gram shingles in a 4-token doc")

    val hits = spark.sql(
      "SELECT lexicon_hits(split('the cat and the dog', ' '), array('the', 'and')) AS h")
      .head().getInt(0)
    assert(hits === 3, "two 'the' + one 'and'")
  }

  test("topk_pairs aggregate callable from spark.sql") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      """SELECT g, topk_pairs(s, id, 2) AS tk FROM VALUES
        |  (1, CAST(0.9 AS DOUBLE), CAST(10 AS BIGINT)),
        |  (1, CAST(0.95 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (1, CAST(0.1 AS DOUBLE), CAST(13 AS BIGINT)) AS t(g, s, id)
        |GROUP BY g""".stripMargin)
      .selectExpr("tk[0].id", "tk[1].id").head()
    assert((out.getLong(0), out.getLong(1)) === (12L, 10L))
  }

  test("SQL results match the Column API forms") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Tables.embeddings(spark, sfDir).limit(20)
    df.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT vec_id, float_vector_dot(embedding, embedding) AS d FROM emb_ext")
      .as[(Long, Double)].collect().toMap
    val viaApi = df.select($"vec_id",
      graft.functions.VectorFunctions.dotF($"embedding", $"embedding").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(viaSql === viaApi)
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Throwaway phase-timing harness (not part of the suite contract; fast at
  * the spec's default sf). Run manually with -z to time one shape.
  */
class ScratchTimingSpec extends AnyFunSuite with SparkSpec {

  private def t(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  test("zorder phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    import graft.ops.ZOrder
    val orders = graft.Tables.orders(spark, dir)
    def q = orders.select(col("o_orderkey"),
      expr("CAST(o_custkey % 1024 AS BIGINT)").as("qa"),
      expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') % 1024 AS BIGINT)").as("qb"))
    t("scan+quantize only")(q.queryExecution.toRdd.count())
    t("with zv")(q.select(col("o_orderkey"),
      ZOrder.zvalue("qa", "qb", 10).cast("long").as("zv")).queryExecution.toRdd.count())
    t("with zv again")(q.select(col("o_orderkey"),
      ZOrder.zvalue("qa", "qb", 10).cast("long").as("zv")).queryExecution.toRdd.count())
    t("with zv + orderBy")(q.select(col("o_orderkey"),
      ZOrder.zvalue("qa", "qb", 10).cast("long").as("zv"))
      .orderBy("o_orderkey").queryExecution.toRdd.count())
  }

  ignore("fuzzy phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
    import graft.ext.Dedup
    t("pair count stats") {
      val d = docs.select(split_part(trim(col("text")), lit(" "), lit(1)).as("b1"))
      val s = d.groupBy("b1").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).as("pairs"),
          count(lit(1)).as("vocab"), max(col("count")).as("biggest")).head()
      info(s"exact-block pairs=${s.get(0)} vocab=${s.get(1)} biggest=${s.get(2)}")
    }
    val dd = docs.select(col("doc_id").as("id"),
      substring(trim(col("text")), 1, 40).as("pfx"),
      split_part(trim(col("text")), lit(" "), lit(1)).as("b1"))
    def rn(s: String) = dd.withColumnsRenamed(Map(
      "id" -> s"id_$s", "pfx" -> s"pfx_$s", "b1" -> s"b1_$s"))
    t("enumerate only (no dist)") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b"))
        .queryExecution.toRdd.count()
      info(s"enumerated=$n")
    }
    t("enumerate + bag filter") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b") &&
          graft.functions.BagBound.editBound(col("pfx_a"), col("pfx_b")) <= 12)
        .queryExecution.toRdd.count()
      info(s"bag-pass=$n")
    }
    t("enumerate + myers filter") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b") &&
          graft.functions.MyersBound.editBound(col("pfx_a"), col("pfx_b")) <= 12)
        .queryExecution.toRdd.count()
      info(s"myers-pass=$n")
    }
    t("enumerate + dp only") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b") &&
          levenshtein(col("pfx_a"), col("pfx_b"), 12) >= 0)
        .queryExecution.toRdd.count()
      info(s"dp-pass=$n")
    }
    t("exact branch only") {
      Dedup.fuzzyPairsBlocked(docs, "doc_id", "text", maxDist = 12,
        prefixLen = 40, dualBlock = false).queryExecution.toRdd.count()
    }
    t("dual (full)") {
      Dedup.fuzzyPairsBlocked(docs, "doc_id", "text", maxDist = 12,
        prefixLen = 40).queryExecution.toRdd.count()
    }
    t("dual + orderBy") {
      Dedup.fuzzyPairsBlocked(docs, "doc_id", "text", maxDist = 12,
        prefixLen = 40).orderBy("id_a", "id_b").queryExecution.toRdd.count()
    }
  }

  ignore("global_index phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val orders = graft.Tables.orders(spark, dir)
    t("warm scan")(orders.select("o_orderkey").queryExecution.toRdd.count())
    t("scan again")(orders.select("o_orderkey").queryExecution.toRdd.count())
    t("sketch only") {
      orders.select(expr(
        "approx_percentile(CAST(o_orderkey AS DOUBLE), array(0.5), 100)")).head()
    }
    t("globalIndex no orderBy") {
      IndexOps.globalIndex(orders, "o_orderkey")
        .select(col("o_orderkey"), col("idx")).queryExecution.toRdd.count()
    }
    t("globalIndex + orderBy") {
      IndexOps.globalIndex(orders, "o_orderkey")
        .select(col("o_orderkey"), col("idx"))
        .orderBy("o_orderkey").queryExecution.toRdd.count()
    }
    t("plain row_number singleton") {
      orders.select(col("o_orderkey"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("o_orderkey")))
        .cast("long").as("idx")).queryExecution.toRdd.count()
    }
  }
}

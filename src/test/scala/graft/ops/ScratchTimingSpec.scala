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

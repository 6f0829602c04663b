package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FreqItemsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], m: Int, parts: Int = 8): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(FreqItems.freqItems($"item", m).as("fi"))
      .select(explode($"fi").as("e")).select($"e.item", $"e.count")
      .as[(String, Long)].collect().toMap

  test("lossless when capacity exceeds the vocabulary") {
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(3)("c")
    val out = sketch(scala.util.Random.shuffle(items), m = 10)
    assert(out === Map("a" -> 30L, "b" -> 20L, "c" -> 3L))
  }

  test("superset guarantee: every item above N/m survives eviction") {
    // 60 'hot' + 200 singletons, m = 8: N = 260, N/m = 32.5 < 60 -> 'hot'
    // must be present with count >= 60 - N/m
    val items = Seq.fill(60)("hot") ++ (1 to 200).map(i => s"one$i")
    val out = sketch(scala.util.Random.shuffle(items), m = 8)
    assert(out.size <= 8, "capacity bound holds")
    assert(out.contains("hot"), "heavy hitter evicted — MG guarantee broken")
    assert(out("hot") >= 60L - 33L && out("hot") <= 60L,
      s"count ${out("hot")} outside MG error band")
  }

  test("counts are lower bounds, never overestimates") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(2000)(s"w${rnd.nextInt(50)}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = sketch(items, m = 12)
    out.foreach { case (k, c) =>
      assert(c <= truth(k), s"$k overestimated: $c > ${truth(k)}")
    }
  }

  test("per-group sketches stay independent") {
    val df = (Seq.fill(5)(("g1", "x")) ++ Seq.fill(3)(("g2", "y"))).toDF("g", "item")
    val out = df.groupBy("g").agg(FreqItems.freqItems($"item", 4).as("fi"))
      .select($"g", explode($"fi").as("e")).select($"g", $"e.item", $"e.count")
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("g1", "x", 5L), ("g2", "y", 3L)))
  }

  test("callable from spark.sql as freq_items_mg") {
    graft.GraftExtensions.register(spark)
    val top = spark.sql(
      "SELECT freq_items_mg(item, 4) AS fi FROM VALUES ('a'),('a'),('b') AS t(item)")
      .selectExpr("fi[0].item", "fi[0].count").head()
    assert((top.getString(0), top.getLong(1)) === ("a", 2L))
  }
}

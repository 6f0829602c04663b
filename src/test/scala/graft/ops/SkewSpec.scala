package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class SkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("saltedAggregate ≡ direct groupBy (counts exact, sums to 1e-9)") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("value_sum"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val salted = Skew.saltedAggregate(ev, Seq("event_type"), $"event_id", 16,
      Seq(("n", (c: org.apache.spark.sql.Column) => count(c),
            (c: org.apache.spark.sql.Column) => sum(c)),
          ("value_sum", (c: org.apache.spark.sql.Column) => sum(c),
            (c: org.apache.spark.sql.Column) => sum(c))),
      Seq("event_id", "value"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n === direct(k)._1)
      assert(math.abs(s - direct(k)._2) < 1e-9)
    }
  }

  test("saltedJoin ≡ plain join on a skewed key distribution") {
    // hot key: 90% of left rows share key 1
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val right = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), $"v", buckets = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(salted === plain)
  }
}

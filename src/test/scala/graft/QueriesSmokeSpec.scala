package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract smoke: every registry query runs at sf0.001; oracle keys are a
  * subset of query names; flagship entry returns rows.
  */
class QueriesSmokeSpec extends AnyFunSuite with SparkSpec {

  // SimHash hamming<=3 is stricter than jaccard 0.4; the tiny sf may
  // legitimately have no pairs that close.
  private val mayBeEmpty = Set("dedup_simhash")

  test("every registry query executes and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty.contains(name))
        assert(n > 0, s"query $name returned no rows at sf0.001")
    }
  }

  test("oracleSql keys ⊆ queries keys; no blank SQL") {
    val qk = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(qk.contains(k), s"oracle for unknown query $k")
      assert(sql.trim.nonEmpty)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }
}

package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.AsOfJoin

/** Generated-input equivalence battery for the custom as-of merge exec:
  * whatever the key/time distribution — duplicate (key, time) ties, nulls
  * on either side, single-key pile-ups, keys present on only one side —
  * the merge exec must return row-identical results to the union+window
  * form. The hand-rolled merge loop (carried state, buffered peeks,
  * specialized comparators) is exactly the kind of code a fixture suite
  * under-covers.
  */
class AsOfPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val keyGen: Gen[Option[Long]] = Gen.frequency(
    8 -> Gen.choose(0L, 4L).map(Some(_)), // few keys → heavy per-key runs
    1 -> Gen.const(Option.empty[Long]))
  private val timeGen: Gen[Option[Long]] = Gen.frequency(
    8 -> Gen.choose(0L, 20L).map(Some(_)), // small domain → many exact ties
    1 -> Gen.const(Option.empty[Long]))

  test("merge exec ≡ window form on 15 generated (ties, nulls, skew) inputs") {
    val rowGen = Gen.zip(keyGen, timeGen, Gen.choose(0.0, 100.0))
    val gen = Gen.zip(Gen.listOf(rowGen), Gen.nonEmptyListOf(rowGen))
    (0 until 15).foreach { i =>
      val (lRows, rRows) = gen.apply(
        Gen.Parameters.default.withSize(60), Seed(123L + i)).get
      // left rows get unique ids so row-identity is checkable as a multiset
      val left = lRows.zipWithIndex
        .map { case ((k, t, _), id) => (id.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rRows.zipWithIndex
        .map { case ((k, t, v), j) => (k, t, v + j) } // near-unique payloads
        .toDF("k", "t", "v")
      val mergeOut = AsOfMergeJoin.asOf(left, right, "k", "k", "t", "t", Seq("v"))
        .select("lid", "v").as[(Long, Option[Double])].collect().toSet
      val windowOut = AsOfJoin.asOf(left, right, "k", "k", "t", "t", Seq("v"))
        .select("lid", "v").as[(Long, Option[Double])].collect().toSet
      assert(mergeOut.size === lRows.size, s"case $i: exactly the left rows")
      assert(mergeOut === windowOut, s"case $i diverged")
    }
  }
}

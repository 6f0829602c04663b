package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The `graph_pagerank` gate must be key-range independent (round 15): its
  * supplier node-space offset is DERIVED from max(o_custkey), not the
  * historical literal 100000, so ScaleCheck's tiled dirs (and any future
  * testdata drop with larger key ranges) cannot collide supplier node ids
  * into the customer id space.
  *
  * The probe shifts every o_custkey by exactly +100000 — a range where the
  * old literal offset WOULD have merged supplier nodes into customers
  * (sf0.001 custkeys and suppkeys both start near 1, so the shifted
  * custkey range [100001, 100000+maxCust] overlaps the literal supplier
  * range [100001, 100000+maxSupp]). A collision changes the node COUNT,
  * which changes every initial rank 1/n and therefore every output rank;
  * id-shifting alone changes neither the graph structure nor any rank.
  */
class PagerankGateKeyRangeSpec extends AnyFunSuite with SparkSpec {

  test("custkeys shifted past the old literal offset leave node count and rank multiset unchanged") {
    val gate = graft.SparkEntry.queries("graph_pagerank")
    val base = gate(spark, sfDir).collect()

    val tmp = java.nio.file.Files.createTempDirectory("pg_keyrange").toString
    graft.Tables.orders(spark, sfDir)
      .withColumn("o_custkey", col("o_custkey") + lit(100000L))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    graft.Tables.lineitem(spark, sfDir)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val shifted = gate(spark, tmp).collect()

    // no supplier↔customer id collision merged nodes
    assert(shifted.length === base.length,
      s"node count changed: ${base.length} -> ${shifted.length} (id collision)")
    // same graph structure => same rank multiset. The gate emits
    // round(rank, 6), so compared values sit on a 1e-6 grid — a tolerance
    // below that grid is exact equality in disguise, and the float-order
    // difference this tolerance exists for (shifted dst keys hash to
    // different partitions, so contribution sums accumulate in a different
    // order) can legitimately flip a value across one rounding boundary —
    // and after the sorted zip, two ranks flipping in OPPOSITE directions
    // across adjacent 1e-6 boundaries pair a value with its neighbor's
    // slot, a legitimate 2e-6 gap. Bound just under TWO grid steps; a
    // node-id collision is caught by the COUNT assert above (merging ids
    // changes n), not by this check.
    val a = base.map(_.getDouble(1)).sorted
    val b = shifted.map(_.getDouble(1)).sorted
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) < 2.5e-6, s"rank multiset diverged at sorted index $i: $x vs $y")
    }
    // the derived offset actually cleared the shifted customer space:
    // supplier nodes sit strictly above every shifted custkey
    // mirrors the gate's cast("long") defense (ExtQueries graph_pagerank):
    // an int32 o_custkey in a future testdata drop must widen here too,
    // not ClassCastException the spec while the gate itself survives
    val maxShiftedCust = graft.Tables.orders(spark, tmp)
      .agg(max(col("o_custkey")).cast("long")).head.getLong(0)
    assert(shifted.map(_.getLong(0)).max > maxShiftedCust,
      "no supplier node above the shifted custkey range - offset not derived from the data")
  }
}

package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Double)].collect().toMap

  test("symmetric pair is the uniform fixpoint; star concentrates on the hub") {
    val pair = ranksOf(Seq((1L, 2L), (2L, 1L)), 10)
    assert(math.abs(pair(1L) - 0.5) < 1e-12 && math.abs(pair(2L) - 0.5) < 1e-12)
    val star = ranksOf(
      Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L)), 10)
    assert(star(1L) > star(2L) && star(2L) === star(3L) && star(3L) === star(4L))
    assert(math.abs(star.values.sum - 1.0) < 1e-9) // mass conserved
  }

  test("dangling node: parked mass redistributes, total rank stays 1") {
    // 1 -> 2, node 2 has no out-edges. One iteration by hand (d=0.85, n=2):
    //   contrib(2) = 0.5; dm = rank(2) = 0.5
    //   new1 = 0.075 + 0.85·(0 + 0.25)   = 0.2875
    //   new2 = 0.075 + 0.85·(0.5 + 0.25) = 0.7125
    val r = ranksOf(Seq((1L, 2L)), 1)
    assert(math.abs(r(1L) - 0.2875) < 1e-12, s"got ${r(1L)}")
    assert(math.abs(r(2L) - 0.7125) < 1e-12, s"got ${r(2L)}")
    // mass stays conserved across further iterations too
    val r5 = ranksOf(Seq((1L, 2L)), 5)
    assert(math.abs(r5.values.sum - 1.0) < 1e-9)
  }

  test("noDangling fast path is bit-identical to the general path on symmetric graphs") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    val general = PageRank.pageRank(edges.toDF("src", "dst"), 5)
      .as[(Long, Double)].collect().toMap
    val fast = PageRank.pageRank(edges.toDF("src", "dst"), 5, noDangling = true)
      .as[(Long, Double)].collect().toMap
    assert(general === fast) // exact ==: dm is 0.0, a float no-op
  }

  test("symmetricHalf closure matches the pre-built symmetric union") {
    // half-input: each undirected edge once, disjoint from its reverse
    // (src ids < 10 <= dst ids — the gate's key-range shape)
    val half = Seq((1L, 11L), (2L, 11L), (2L, 12L), (3L, 12L), (1L, 13L))
    val union = half ++ half.map(_.swap)
    for (noDangling <- Seq(false, true)) {
      val full = PageRank.pageRank(union.toDF("src", "dst"), 5,
        noDangling = noDangling).as[(Long, Double)].collect().toMap
      val viaHalf = PageRank.pageRank(half.toDF("src", "dst"), 5,
        noDangling = noDangling, symmetricHalf = true)
        .as[(Long, Double)].collect().toMap
      assert(full.keySet === viaHalf.keySet)
      // same edge set, same degrees, same formula; only aggregate
      // combine ORDER can differ (partition layout) — bound it well below
      // the gate's round-6 display grid
      full.foreach { case (node, r) =>
        assert(math.abs(r - viaHalf(node)) < 1e-12,
          s"node $node: $r vs ${viaHalf(node)} (noDangling=$noDangling)")
      }
      assert(math.abs(viaHalf.values.sum - 1.0) < 1e-9)
    }
  }

  test("oracle render executes the same formula (spot check vs DuckDB-less hand run)") {
    // the render is pinned by the driver's DuckDB hash gate; here just
    // assert it unrolls the requested depth and embeds the damping
    val sql = PageRank.pageRankOracleSql("SELECT 1 AS src, 2 AS dst", 3, 0.85)
    assert(sql.contains("pr3") && !sql.contains("pr4"))
    assert(sql.contains("0.85"))
  }
}

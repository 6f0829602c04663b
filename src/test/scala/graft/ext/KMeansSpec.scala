package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class KMeansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("well-separated clusters are recovered exactly") {
    // two tight blobs far apart: whatever the md5-seeded init picks, one
    // Lloyd round pulls the centroids into the blobs
    val docs = ((1L to 20L).map(i => (i, Array(10.0f, 10.0f + i * 0.001f))) ++
      (21L to 40L).map(i => (i, Array(-10.0f, -10.0f + i * 0.001f))))
      .toDF("vec_id", "embedding")
    val out = KMeans.lloydQuantized(docs, "vec_id", "embedding", k = 2, iterations = 3)
      .as[(Long, Long)].collect().toMap
    val blobA = (1L to 20L).map(out).toSet
    val blobB = (21L to 40L).map(out).toSet
    assert(blobA.size === 1 && blobB.size === 1 && blobA != blobB,
      s"each blob must land in one distinct cluster: $blobA vs $blobB")
  }

  test("deterministic across repartitionings; ties take the lower cell") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val a = KMeans.lloydQuantized(emb, "vec_id", "embedding", 4, 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = KMeans.lloydQuantized(emb.repartition(7), "vec_id", "embedding", 4, 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a === b && a.nonEmpty)
    // all-identical vectors: every distance ties, everything lands in cell 0
    val tied = (1L to 10L).map(i => (i, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val cells = KMeans.lloydQuantized(tied, "vec_id", "embedding", 3, 2)
      .select("cluster").distinct().as[Long].collect().toSeq
    assert(cells === Seq(0L))
  }

  test("size-gated in-memory training is bit-identical to the distributed loop") {
    // maxDriverCells = 0 forces every iteration through the distributed
    // scan + (cell, dim)-aggregate path; the default collects once and
    // trains in memory. Same grid, same argmin tie-break, same exact
    // division — the assignments must be EXACTLY equal, including on
    // tie-heavy inputs (duplicate vectors across cluster seeds).
    val emb = graft.Tables.embeddings(spark, sfDir)
      .unionByName(graft.Tables.embeddings(spark, sfDir)
        .withColumn("vec_id", col("vec_id") + lit(1000000L)))
    val inMem = KMeans.lloydQuantized(emb, "vec_id", "embedding", 5, 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val dist = KMeans.lloydQuantized(emb, "vec_id", "embedding", 5, 3,
        maxDriverCells = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(inMem.nonEmpty && inMem === dist)
  }

  test("empty input and k larger than the corpus survive") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(KMeans.lloydQuantized(empty, "vec_id", "embedding", 4, 2).count() === 0)
    val three = (1L to 3L).map(i => (i, Array(i.toFloat, 0.0f))).toDF("vec_id", "embedding")
    // k=8 > 3 vectors: only 3 centroids exist; every vector still assigned
    val out = KMeans.lloydQuantized(three, "vec_id", "embedding", 8, 2)
    assert(out.count() === 3)
  }
}

package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class SimSearchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("cosine column matches hand computation (double precision)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(SimSearch.cosine($"a", $"b")).as[Double].head()
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - expect) < 1e-12)
  }

  test("zero-norm vectors yield NULL cosine instead of ANSI divide-by-zero") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    // would throw SparkArithmeticException without the guard
    val out = SimSearch.bruteForceTopK(df, df, "vec_id", "embedding", 2)
      .select("probe_id", "nbr_id", "cosine").collect()
    assert(out.nonEmpty)
    val zeroPairs = out.filter(r => r.getLong(0) == 1L || r.getLong(1) == 1L)
    assert(zeroPairs.forall(_.isNullAt(2)), "degenerate pairs score NULL")
    val pairs = Dedup.embeddingCosinePairs(df, "vec_id", "embedding", 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists { case (a, b) => a == 1L || b == 1L },
      "NULL cosine excluded by threshold filter")
  }

  test("bruteForceTopK returns k ranked neighbors per probe, self excluded") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = SimSearch.bruteForceTopK(emb, emb.filter($"vec_id" < 3), "vec_id", "embedding", 5)
    val rows = out.as[(Long, Long, Double, Int)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq === Seq(0L, 1L, 2L))
    rows.groupBy(_._1).foreach { case (probe, nbrs) =>
      assert(nbrs.length === 5)
      assert(!nbrs.exists(_._2 == probe), "probe must not match itself")
      val sims = nbrs.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "ranked by sim desc")
    }
  }

  test("lshTopK hits are a subset of brute-force candidates' quality: " +
       "every LSH neighbor's sim <= true rank-1 sim, and recall@5 is measured") {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter($"vec_id" < 10)
    val exact = SimSearch.bruteForceTopK(emb, probes, "vec_id", "embedding", 5)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val approx = SimSearch.lshTopK(emb, probes, "vec_id", "embedding",
      k = 5, numPlanes = 4, dim = 64)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = if (exact.isEmpty) 1.0
      else approx.intersect(exact).size.toDouble / exact.size
    // testdata embeddings are near-uniform (max pairwise cos ≈ 0.5), the
    // hardest case for sign-LSH: a cos≈0.4 neighbor disagrees on ~37% of
    // hyperplanes. 4 planes + hamming-1 multiprobe ⇒ theoretical recall
    // ≈ 0.5; the assertion pins it doesn't silently collapse.
    assert(recall >= 0.3, s"LSH recall@5 collapsed: $recall")
    assert(approx.nonEmpty)
  }

  test("ivfTopK: data-adaptive cells beat fixed hyperplanes on recall here") {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter($"vec_id" < 10)
    val exact = SimSearch.bruteForceTopK(emb, probes, "vec_id", "embedding", 5)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val ivf = SimSearch.ivfTopK(emb, probes, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall@5 collapsed: $recall")
    // determinism: seeded centroid sample
    val ivf2 = SimSearch.ivfTopK(emb, probes, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
      .select("probe_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(ivf === ivf2)
  }

  test("ivfTopK degrades gracefully when the corpus is smaller than nprobe") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    // 3 corpus rows < nlist=16, nprobe=4 > available centroids: must probe
    // all cells rather than reject the request
    val out = SimSearch.ivfTopK(tiny, tiny.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 2, nlist = 16, nprobe = 4)
      .select("nbr_id").as[Long].collect().toSet
    assert(out === Set(2L, 3L))
  }

  test("lsh buckets are deterministic across invocations (seeded planes)") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val b1 = emb.select(SimSearch.lshBucket($"embedding", 8, 64).as("b")).as[Long].collect()
    val b2 = emb.select(SimSearch.lshBucket($"embedding", 8, 64).as("b")).as[Long].collect()
    assert(b1.toSeq === b2.toSeq)
  }

  test("IVF index persists: written + reloaded index answers row-identically") {
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter($"vec_id" < 5)
    val direct = SimSearch.ivfTopK(emb, probes, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 2)
      .orderBy("probe_id", "rank").collect().toSeq
    val idx = SimSearch.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    SimSearch.writeIvfIndex(idx, dir)
    val loaded = SimSearch.readIvfIndex(spark, dir)
    // the reloaded matrix must be the trained one, in cell order
    assert(loaded.centroids.length === idx.centroids.length)
    assert(loaded.centroids.zip(idx.centroids).forall { case (a, b) => a.sameElements(b) })
    val persisted = SimSearch.ivfTopKIndexed(loaded, probes, "vec_id", "embedding",
        k = 3, nprobe = 2)
      .orderBy("probe_id", "rank").collect().toSeq
    assert(persisted === direct,
      "an index reloaded from parquet must answer exactly like the in-memory one")
  }
}

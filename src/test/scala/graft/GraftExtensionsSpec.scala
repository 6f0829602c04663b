package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-line installer contract: a session built with NOTHING but
  * `spark.sql.extensions=graft.GraftExtensions` gets the SQL functions, the
  * as-of planner strategy, and the thresholded-levenshtein optimizer rule —
  * no per-feature register calls.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    // a NEW SparkSession (shared SparkContext) built through the installer.
    // `spark.sql.extensions=<class>` is read from the STATIC SparkContext
    // conf, which a suite-shared context predates — so exercise the same
    // class programmatically: `new GraftExtensions` (reflective 0-arg
    // construction, exactly what the conf path does) + withExtensions
    // (exactly how the conf path applies it). Restore the suite session
    // afterwards.
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(classOf[GraftExtensions].getDeclaredConstructor()
        .newInstance())
      .config("spark.sql.shuffle.partitions", 4)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("config-only session: SQL functions, planner strategy, optimizer " +
    "rule all active") {
    withExtSession { s =>
      import s.implicits._
      // 1. native SQL functions resolve
      Seq((1.0, 5L), (3.0, 6L), (2.0, 7L)).toDF("score", "id")
        .createOrReplaceTempView("ext_scores")
      val top = s.sql(
        "SELECT topk_pairs(score, id, 2) AS t FROM ext_scores").head()
      assert(top.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)) === Seq(6L, 7L))
      assert(s.sql("SELECT percentile_compact(CAST(id AS DOUBLE), array(0.5D)) " +
        "FROM ext_scores").head().getSeq[Double](0) === Seq(6.0))
      // round-7 additions: bound kernels, bucket assignment, string top-k,
      // capped collection, portable simhash — all from SQL alone
      assert(s.sql("SELECT edit_distance_myers_bound('kitten', 'sitting')")
        .head().getInt(0) === 3)
      assert(s.sql("SELECT edit_distance_bag_bound('abc', 'abcd')")
        .head().getInt(0) === 1)
      assert(s.sql("SELECT sorted_lower_bound(CAST(2.5 AS DOUBLE), array(1.0D, 2.0D, 3.0D))")
        .head().getInt(0) === 2)
      val tt = s.sql("SELECT topk_terms(CAST(id AS DOUBLE), CAST(score AS STRING), 1) " +
        "FROM ext_scores").head().getSeq[org.apache.spark.sql.Row](0)
      assert(tt.map(_.getString(0)) === Seq("2.0")) // id 7 is max; its score string
      assert(s.sql("SELECT bounded_sorted_collect(score, 2) FROM ext_scores")
        .head().isNullAt(0), "3 values past cap 2 must evaluate NULL")
      assert(s.sql("SELECT simhash64_md5(array('a','b')) = simhash64_md5(array('a','b'))")
        .head().getBoolean(0))
      // round-8 additions: sketch aggregates + scalars, SQL-only pipeline
      // (KLL median of 1..3 = 2; theta overlap of {5,6,7}∩{6,7} = 2 exact)
      assert(s.sql("SELECT kll_quantiles(kll_merge_agg(sk), array(0.5D)) FROM " +
        "(SELECT kll_sketch_agg(CAST(score AS DOUBLE)) AS sk FROM ext_scores)")
        .head().getSeq[Double](0) === Seq(2.0))
      assert(s.sql("SELECT theta_estimate(theta_union_agg(sk)) FROM " +
        "(SELECT theta_sketch_agg(id) AS sk FROM ext_scores GROUP BY score)")
        .head().getDouble(0) === 3.0)
      val overlapRow = s.sql(
        "SELECT theta_intersect_estimate(a.sk, b.sk), theta_a_not_b_estimate(a.sk, b.sk) FROM " +
          "(SELECT theta_sketch_agg(id) AS sk FROM ext_scores) a, " +
          "(SELECT theta_sketch_agg(id) AS sk FROM ext_scores WHERE id > 5) b")
        .head()
      assert(overlapRow.getDouble(0) === 2.0 && overlapRow.getDouble(1) === 1.0)

      // 2. planner strategy injected: the as-of node plans WITHOUT the
      // builder's experimental-methods fallback having to add it
      assert(s.sessionState.planner.strategies
          .exists(_ eq graft.plans.AsOfJoinStrategy),
        "AsOfJoinStrategy missing from the session's planner strategies")
      val quotes = Seq(("A", 10L, 1.0)).toDF("k", "t", "px")
      val trades = Seq(("A", 11L, 5L)).toDF("k", "t", "qty")
      val asof = graft.plans.AsOfMergeJoin.asOf(
        trades, quotes, "k", "k", "t", "t", Seq("px"))
      assert(asof.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"))
      assert(asof.select("px").head().getDouble(0) === 1.0)

      // 3. optimizer rule injected: lev <= k rewrites to the banded form
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
      val df = docs.filter(
        levenshtein(substring($"text", 1, 12), lit("key agg row")) <= 4)
      val thresholded = df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case l: Levenshtein => l.threshold })
      assert(thresholded.exists(_.isDefined),
        s"optimizer rule did not rewrite:\n${df.queryExecution.optimizedPlan}")
    }
  }
}

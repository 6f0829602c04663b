package graft.plans

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ThresholdedLevenshteinRuleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    ThresholdedLevenshteinRule.register(spark)
    try f finally {
      val em = spark.experimental
      em.extraOptimizations =
        em.extraOptimizations.filterNot(_ == ThresholdedLevenshteinRule)
    }
  }

  private def pairs = Seq(
    ("kitten", "sitting"),   // dist 3
    ("flaw", "lawn"),        // dist 2
    ("abc", "abc"),          // dist 0
    ("aaaa", "zzzz"),        // dist 4
  ).toDF("a", "b")

  test("lev(a,b) <= k rewrites to the banded form; results identical") {
    // parquet-backed input: extraOptimizations run as the LAST batch, and a
    // LocalRelation input would already be constant-folded away by then
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val naive = docs.filter(levenshtein(substring($"text", 1, 12), lit("key agg row")) <= 4)
      .select("doc_id").as[Long].collect().toSet
    withRule {
      val df = docs.filter(levenshtein(substring($"text", 1, 12), lit("key agg row")) <= 4)
      val opt = df.queryExecution.optimizedPlan
      val thresholded = opt.expressions.flatMap(_.collect {
        case l: Levenshtein => l.threshold
      })
      assert(thresholded.exists(_.isDefined),
        s"rule did not rewrite to the thresholded form:\n$opt")
      assert(df.select("doc_id").as[Long].collect().toSet === naive,
        "rewritten predicate must select the identical rows")
      assert(naive.nonEmpty, "fixture sanity: the bound must actually match docs")
    }
  }

  test("strict < and literal-first spellings rewrite too; boundary exact") {
    withRule {
      // < 3 keeps dist <= 2 — the k-1 band must not off-by-one
      assert(pairs.filter(levenshtein($"a", $"b") < 3).count() === 2)
      assert(pairs.filter(lit(3) >= levenshtein($"a", $"b")).count() === 3)
    }
  }

  test("fuzzyPairsBlockedNaive + rule equals the hand-thresholded operator") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "dist").as[(Long, Long, Long)]
        .collect().sorted.toSeq
    val hand = rows(graft.ext.Dedup.fuzzyPairsBlocked(
      docs, "doc_id", "text", maxDist = 12, prefixLen = 40))
    withRule {
      val naive = graft.ext.Dedup.fuzzyPairsBlockedNaive(
        docs, "doc_id", "text", maxDist = 12, prefixLen = 40)
      // walk the WHOLE tree: predicate pushdown moves the rewritten
      // comparison into join conditions below the root
      val thresholded = naive.queryExecution.optimizedPlan
        .collect { case n => n.expressions }.flatten
        .flatMap(_.collect { case l: Levenshtein => l.threshold })
      assert(thresholded.exists(_.isDefined),
        "gate shape must rewrite to the banded form")
      assert(rows(naive) === hand,
        "naive spelling under the rule must emit the identical pair set")
      assert(hand.nonEmpty, "fixture sanity: some fuzzy pairs must exist")
    }
  }

  test("without the rule, the plan stays un-thresholded (no global side effect)") {
    val df = pairs.repartition(2).filter(levenshtein($"a", $"b") <= 2)
    val thresholded = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case l: Levenshtein => l.threshold
    })
    assert(thresholded.forall(_.isEmpty), "rule leaked outside registration")
    assert(df.count() === 2, "naive form still correct")
  }
}

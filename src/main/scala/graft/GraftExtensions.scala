package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BagBound, BoundedSortedCollect, CollapseWhitespace, FastTokens, FloatVectorDot, FreqItems, KllMergeAgg, KllQuantiles, KllSketchAgg, LexiconHits, MinHashSketch, MyersBound, PercentileCompact, ShingleHashes, ShingleStrings, SimHash64, SortedLowerBound, ThetaANotBEstimate, ThetaEstimate, ThetaIntersectEstimate, ThetaSketchAgg, ThetaUnionAgg, TopKPairs, TopKTerms}
import graft.functions.{NfcNormalize, StripAccents}

/** ONE-LINE installer for every graft Catalyst extension point — the whole
  * library activates from configuration alone, no code changes:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or programmatically:
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * Installs the native SQL functions (float_vector_dot, shingle_hashes,
  * shingle_strings, minhash_sketch, simhash64, simhash64_md5, lexicon_hits,
  * topk_pairs, topk_terms, freq_items_mg, percentile_compact,
  * bounded_sorted_collect, sorted_lower_bound, edit_distance_bag_bound,
  * edit_distance_myers_bound), the [[graft.plans.AsOfJoinStrategy]] planner
  * strategy (so [[graft.plans.AsOfMergeJoin.asOf]] plans without its
  * fallback self-registration), and the
  * [[graft.plans.ThresholdedLevenshteinRule]] optimizer rule
  * (auto-thresholds `levenshtein(a, b) <= k` predicates into the banded
  * early-exit form).
  *
  * [[GraftExtensions.register]] does the functions on an existing session
  * (the path used by queries running under the driver's session, which
  * graft does not construct); strategy and rule have their own idempotent
  * `register`/`registerStrategy` on-session installers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.ThresholdedLevenshteinRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("float_vector_dot",
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (es: Seq[Expression]) => FloatVectorDot(es(0), es(1))),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (es: Seq[Expression]) => ShingleHashes(es(0), intLit(es(1)))),
    ("shingle_strings",
      new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
      (es: Seq[Expression]) => ShingleStrings(es(0), intLit(es(1)))),
    ("minhash_sketch",
      new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
      (es: Seq[Expression]) => MinHashSketch(es(0), intLit(es(1)))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    ("lexicon_hits",
      new ExpressionInfo(classOf[LexiconHits].getName, "lexicon_hits"),
      (es: Seq[Expression]) => { requireArity("lexicon_hits", es, 2); LexiconHits(es(0), arrayLit(es(1))) }),
    ("topk_pairs",
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (es: Seq[Expression]) => { requireArity("topk_pairs", es, 3)
        TopKPairs(es(0), es(1), intLit(es(2))) }),
    ("freq_items_mg",
      new ExpressionInfo(classOf[FreqItems].getName, "freq_items_mg"),
      (es: Seq[Expression]) => { requireArity("freq_items_mg", es, 2)
        FreqItems(es(0), intLit(es(1))) }),
    ("percentile_compact",
      new ExpressionInfo(classOf[PercentileCompact].getName, "percentile_compact"),
      (es: Seq[Expression]) => { requireArity("percentile_compact", es, 2)
        PercentileCompact(es(0), doubleArrayLit(es(1))) }),
    ("simhash64_md5",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64_md5"),
      (es: Seq[Expression]) => { requireArity("simhash64_md5", es, 1)
        SimHash64(es(0), md5Base = true) }),
    ("edit_distance_bag_bound",
      new ExpressionInfo(classOf[BagBound].getName, "edit_distance_bag_bound"),
      (es: Seq[Expression]) => { requireArity("edit_distance_bag_bound", es, 2)
        BagBound(es(0), es(1)) }),
    ("edit_distance_myers_bound",
      new ExpressionInfo(classOf[MyersBound].getName, "edit_distance_myers_bound"),
      (es: Seq[Expression]) => { requireArity("edit_distance_myers_bound", es, 2)
        MyersBound(es(0), es(1)) }),
    ("sorted_lower_bound",
      new ExpressionInfo(classOf[SortedLowerBound].getName, "sorted_lower_bound"),
      (es: Seq[Expression]) => { requireArity("sorted_lower_bound", es, 2)
        SortedLowerBound(es(0), doubleArrayLit(es(1)).distinct.sorted) }),
    ("topk_terms",
      new ExpressionInfo(classOf[TopKTerms].getName, "topk_terms"),
      (es: Seq[Expression]) => { requireArity("topk_terms", es, 3)
        TopKTerms(es(0), es(1), intLit(es(2))) }),
    ("bounded_sorted_collect",
      new ExpressionInfo(classOf[BoundedSortedCollect].getName, "bounded_sorted_collect"),
      (es: Seq[Expression]) => { requireArity("bounded_sorted_collect", es, 2)
        BoundedSortedCollect(es(0), intLit(es(1))) }),
    ("fast_tokens",
      new ExpressionInfo(classOf[FastTokens].getName, "fast_tokens"),
      (es: Seq[Expression]) => { requireArity("fast_tokens", es, 1)
        FastTokens(es(0)) }),
    ("collapse_ws",
      new ExpressionInfo(classOf[CollapseWhitespace].getName, "collapse_ws"),
      (es: Seq[Expression]) => { requireArity("collapse_ws", es, 1)
        CollapseWhitespace(es(0)) }),
    // sketch aggregates/scalars (mergeable quantile + set-operation state;
    // optional second arg = k / lgNomEntries, defaulted like the API)
    ("kll_sketch_agg",
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (es: Seq[Expression]) =>
        KllSketchAgg(es(0), if (es.length > 1) intLit(es(1)) else 200)),
    ("kll_merge_agg",
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      (es: Seq[Expression]) =>
        KllMergeAgg(es(0), if (es.length > 1) intLit(es(1)) else 200)),
    ("kll_quantiles",
      new ExpressionInfo(classOf[KllQuantiles].getName, "kll_quantiles"),
      (es: Seq[Expression]) => { requireArity("kll_quantiles", es, 2)
        KllQuantiles(es(0), doubleArrayLit(es(1))) }),
    ("theta_sketch_agg",
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "theta_sketch_agg"),
      (es: Seq[Expression]) =>
        ThetaSketchAgg(es(0), if (es.length > 1) intLit(es(1)) else 12)),
    ("theta_union_agg",
      new ExpressionInfo(classOf[ThetaUnionAgg].getName, "theta_union_agg"),
      (es: Seq[Expression]) =>
        ThetaUnionAgg(es(0), if (es.length > 1) intLit(es(1)) else 12)),
    ("theta_estimate",
      new ExpressionInfo(classOf[ThetaEstimate].getName, "theta_estimate"),
      (es: Seq[Expression]) => { requireArity("theta_estimate", es, 1)
        ThetaEstimate(es(0)) }),
    ("theta_intersect_estimate",
      new ExpressionInfo(classOf[ThetaIntersectEstimate].getName, "theta_intersect_estimate"),
      (es: Seq[Expression]) => { requireArity("theta_intersect_estimate", es, 2)
        ThetaIntersectEstimate(es(0), es(1)) }),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (es: Seq[Expression]) => { requireArity("nfc_normalize", es, 1)
        NfcNormalize(es(0)) }),
    ("strip_accents",
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (es: Seq[Expression]) => { requireArity("strip_accents", es, 1)
        StripAccents(es(0)) }),
    ("theta_a_not_b_estimate",
      new ExpressionInfo(classOf[ThetaANotBEstimate].getName, "theta_a_not_b_estimate"),
      (es: Seq[Expression]) => { requireArity("theta_a_not_b_estimate", es, 2)
        ThetaANotBEstimate(es(0), es(1)) }),
  )

  private def requireArity(fn: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${es.length}")

  /** Evaluate a foldable array-of-strings argument (e.g. `array('a','b')`)
    * to a clean error rather than an internal NPE on malformed input.
    */
  private def arrayLit(e: Expression): Seq[String] = {
    require(e.foldable, "lexicon argument must be a literal array of strings")
    val v = e.eval(null)
    require(v != null, "lexicon argument must not be NULL")
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType)
    require(!arr.contains(null), "lexicon entries must not be NULL")
    arr.toSeq.map(_.toString)
  }

  /** Evaluate a foldable numeric-array argument (e.g. `array(0.25, 0.5)`)
    * as doubles. Un-suffixed literals parse as DECIMAL, so the natural
    * spelling must work — cast any numeric array rather than demanding the
    * D-suffixed form.
    */
  private def doubleArrayLit(e: Expression): Seq[Double] = {
    import org.apache.spark.sql.types._
    require(e.foldable, "probs argument must be a literal array of numbers")
    val cast = e.dataType match {
      case ArrayType(DoubleType, _) => e
      case ArrayType(_: NumericType, n) =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          e, ArrayType(DoubleType, n))
      case dt => throw new IllegalArgumentException(
        s"probs must be a numeric array, got ${dt.sql}")
    }
    val v = cast.eval(null)
    require(v != null, "probs argument must not be NULL")
    v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toSeq
  }

  /** Register on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}

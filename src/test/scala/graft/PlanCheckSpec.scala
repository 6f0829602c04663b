package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §4): the properties that matter at
  * 100 TB must be visible in the plan, not assumed — filter pushdown to the
  * parquet scan, column pruning, broadcast joins for dims, top-k via
  * TakeOrderedAndProject (no global sort), partial aggregation, and
  * whole-stage codegen coverage. A regression here is a performance bug
  * even while results stay correct.
  */
class PlanCheckSpec extends AnyFunSuite with SparkSpec {

  // collect() (not count(), which builds a separate QueryExecution) so THIS
  // plan's AQE finalizes; keep only the Final Plan section — the Initial
  // Plan echo would double-count operators
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("s4_pruned_scan: shipdate predicate reaches the parquet scan") {
    val p = plan("s4_pruned_scan")
    assert(p.contains("PushedFilters: ") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
  }

  test("s4_pruned_scan: only referenced columns are read (pruning)") {
    val p = plan("s4_pruned_scan")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_extendedprice") && read.contains("l_quantity"),
      s"column pruning failed: $read")
  }

  test("j1_dim_enrich_join: dimension joins are broadcast, fact side never shuffles") {
    val p = plan("j1_dim_enrich_join")
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join must not sort-merge:\n$p")
  }

  test("o1_topk: ORDER BY+LIMIT plans as TakeOrderedAndProject, not global sort") {
    val p = plan("o1_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k rewrite missing:\n$p")
  }

  test("a1_groupby_agg: partial (map-side) aggregation before the exchange") {
    val p = plan("a1_groupby_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum") || p.contains("partial_"),
      s"no map-side partial aggregation:\n$p")
  }

  test("p12_arithmetic: scan+project stays inside whole-stage codegen") {
    val p = plan("p12_arithmetic")
    // codegen'd operators print with a *(stageId) prefix
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"projection fell off codegen:\n$p")
  }

  test("txt_vocab_encode: vocab id assignment never sorts the vocab on one task") {
    // round 18 (VERDICT r17 item 1): the last data-shaped single-partition
    // window — row_number over the unique-term relation, ~10^8 rows at a
    // 100 TB corpus — replaced by IndexOps.globalIndexBy's range-bucketed
    // numbering. The only SinglePartition allowed in the whole gate plan is
    // the bounded bucket-offset window (<= 64 count rows).
    val p = plan("txt_vocab_encode")
    assert("SinglePartition".r.findAllIn(p).size <= 1,
      s"vocab numbering must not serialize the term relation through one task:\n$p")
    assert(p.toLowerCase.contains("__gx_bucket"),
      s"vocab row_number window must be partitioned by the range bucket:\n$p")
  }

  test("j2_agg_join_back: single shuffle (window), not agg+join double exchange") {
    val p = plan("j2_agg_join_back")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"expected at most 1 hash exchange, got $exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "window form must not join at all")
  }

  test("dedup_incremental: ONE exchange of the batch (min_by partial agg), " +
    "no window sort of full rows") {
    val p = plan("dedup_incremental")
    assert(!p.contains("Window"), s"survivor must be an aggregate, not a window:\n$p")
    assert(p.contains("partial_min_by"),
      s"no map-side partial min_by before the exchange:\n$p")
    // batch agg exchange + (at most) the tiny history side of the anti join
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$p")
  }

  test("dedup_substring_spans: gram stream shuffles once, counts ride a " +
    "partial-combined exchange, filter joins back without a sort") {
    val p = plan("dedup_substring_spans")
    // stream repartition + partial-agg counts + island window = 3; a
    // re-shuffle of the stream for the join or a window without reuse
    // would push this to 4+
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$p")
    assert(p.contains("partial_count"),
      s"gram occurrence counts must partial-aggregate map-side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the gram filter must hash-join, never sort the stream:\n$p")
  }

  test("txt_top_ngram_frac: zero shuffles, zero windows — per-row sorted-run " +
    "arithmetic") {
    val p = plan("txt_top_ngram_frac")
    assert(!p.contains("Window"), s"no window expected:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 0,
      s"mode n-gram must not leave the document's row:\n$p")
  }

  test("txt_tfidf_top_terms: per-doc top-k is an aggregate, not a window sort") {
    val p = plan("txt_tfidf_top_terms")
    assert(!p.contains("Window"), s"no window expected:\n$p")
  }

  test("txt_tfidf_top_terms: tf, dfreq, and the join all ride ONE term " +
    "exchange; only the O(k)-state top-k rollup re-shuffles") {
    val p = plan("txt_tfidf_top_terms")
    // a ReusedExchange line repeats its target's "Exchange hashpartitioning"
    // description — it is the win being asserted, not an exchange
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(exchanges <= 2, s"expected <=2 hash exchanges (term stream + doc " +
      s"rollup), got $exchanges:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"tf-dfreq join must not sort the tf relation:\n$p")
  }

  test("txt_word_entropy: per-row kernel on the scan — zero shuffles") {
    val p = plan("txt_word_entropy")
    assert(p.contains("token_entropy"), s"expected the TokenEntropy kernel:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 0,
      s"a document's entropy must not leave its row:\n$p")
  }

  test("dedup_embedding_cosine: codegen'd native dot product in the plan") {
    // the GATE freezes (localCheckpoints) the matches before its
    // presentation sort, which truncates the visible plan to a Scan
    // ExistingRDD — assert on the OPERATOR's own plan, which is what the
    // frozen relation materializes from
    val p = graft.ext.Dedup.embeddingCosinePairs(
      graft.Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0.4)
      .queryExecution.executedPlan.toString
    assert(p.contains("float_vector_dot"), s"custom expression not used:\n$p")
    assert(!p.toLowerCase.contains("zip_with"), "HOF path crept back in")
  }

  test("range_point_in_interval: bucketed equi-join, no nested-loop cartesian") {
    val p = plan("range_point_in_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
    assert(p.contains("__bucket") || p.contains("hashpartitioning"),
      s"expected a bucket equi-join:\n$p")
  }

  test("dedup_minhash_lsh: sketch builds scan-side — no explode-aggregate fan") {
    // the GATE returns a localCheckpoint()'d frame (its self-escalation
    // check needs the materialized result), which plans as Scan ExistingRDD
    // — assert on the library plan at the gate's parameters instead
    // (constants shared with the gate so a retune keeps this test honest)
    import graft.queries.ExtQueries._
    val df = graft.ext.Dedup.minhashLshPairs(
      Tables.documents(spark, sfDir), "doc_id", "text",
      n = MinhashGateN, threshold = MinhashGateThreshold,
      numHashes = MinhashGateFastHashes, bands = MinhashGateFastBands)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("minhash_sketch"), s"native sketch expression not in plan:\n$p")
    // the old formulation aggregated 128 min() columns; its signature was a
    // shuffle whose aggregate expressions mention xxhash64 directly
    assert(!p.contains("partial_min(xxhash64"),
      s"128-column aggregate formulation crept back:\n$p")
  }

  test("txt_top_bigrams: native shingle kernel, no interpreted HOF transform") {
    val p = plan("txt_top_bigrams")
    assert(p.contains("shingle_strings"), s"native kernel not in plan:\n$p")
    assert(!p.contains("transform(sequence"), "HOF chain crept back in")
  }

  test("decontaminate_overlap: benchmark shingle set broadcasts, corpus never shuffles on it") {
    val p = plan("decontaminate_overlap")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"benchmark side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not sort-merge against the benchmark:\n$p")
  }

  test("txt_chunk_windows: generator pipeline with zero exchanges") {
    val p = plan("txt_chunk_windows")
    // orderBy adds one range exchange for the gate's determinism; the
    // chunking itself must add none
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 0, s"chunking must not hash-shuffle:\n$p")
    assert(p.contains("Generate"), s"expected the sequence generator:\n$p")
  }

  test("gopher_quality: one scan, no shuffle before the order-by") {
    val p = plan("gopher_quality")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 0,
      s"rule battery must be shuffle-free:\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) === 1,
      s"rule battery must be a single scan:\n$p")
  }

  test("profile_orders: no multi-distinct Expand; grouped partial aggs per column") {
    val p = plan("profile_orders")
    assert(!p.contains("Expand"), s"multi-distinct Expand crept back in:\n$p")
    assert(p.contains("partial_count"), s"expected map-side partials:\n$p")
  }

  test("a6_rollup: rollup plans as one Expand aggregate, not a union of aggs") {
    val p = plan("a6_rollup")
    assert(p.contains("Expand"), s"rollup should expand grouping sets:\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) === 1,
      s"rollup must be a single scan:\n$p")
  }

  test("dedup_ngram_jaccard: pair enumeration is a shuffled hash join, no sorts") {
    val p = plan("dedup_ngram_jaccard")
    assert(p.contains("ShuffledHashJoin"), s"expected shuffle-hash pair join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"pair enumeration must not pay a sort:\n$p")
  }

  test("dedup_ngram_jaccard_prefix: no cartesian or nested-loop anywhere") {
    val p = plan("dedup_ngram_jaccard_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filter must stay equi-join:\n$p")
  }

  test("pack_sequences: exactly one shuffle — the shard window") {
    val p = plan("pack_sequences")
    // window partitionBy(shard) = 1 hash exchange; orderBy adds its range
    // exchange for the gate's determinism
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"packing must shuffle once, on the shard key:\n$p")
  }

  test("mix_weighted: pure scan-side predicate, zero shuffles") {
    val p = plan("mix_weighted")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 0,
      s"mixing must be a per-row filter:\n$p")
  }

  test("emb_quantize_int8: native quantize expression on the scan, no shuffle") {
    val p = plan("emb_quantize_int8")
    assert(p.contains("float_vector_quantize_int8"), s"expected native kernel:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 0,
      s"quantization must not shuffle:\n$p")
  }

  test("j4_semi_join: dim-sized filter side broadcasts, fact never shuffles") {
    val p = plan("j4_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast left-semi:\n$p")
    assert(!p.contains("SortMergeJoin"), s"semi join must not sort-merge here:\n$p")
  }

  test("j5_anti_join: broadcast left-anti, no fact shuffle") {
    val p = plan("j5_anti_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast left-anti:\n$p")
  }

  test("zorder_value: z-value is a pure scan-side projection — zero hash shuffles") {
    val p = plan("zorder_value")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 0,
      s"bit interleave must not shuffle (orderBy's range exchange is the gate's):\n$p")
  }

  test("w4_zscore_outliers: window aggregates share ONE shuffle (no agg+join-back)") {
    val p = plan("w4_zscore_outliers")
    // mu, sigma, z all ride the same Window over the priority key: one hash
    // exchange total; a second would mean the agg-then-join shape crept in
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"z-scoring must shuffle once, on the group key:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no join belongs in the window form:\n$p")
  }

  test("emb_group_centroid: ONE aggregate pair — partials shuffle labels·dims, not vectors·dims") {
    val p = plan("emb_group_centroid")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"centroid must shuffle once, on (label,pos):\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"map-side partial aggregation must precede the exchange:\n$p")
  }

  test("corpus_report: distinct-count via two-level agg — no multi-distinct Expand") {
    val p = plan("corpus_report")
    assert(!p.contains("Expand"),
      s"mixing count(DISTINCT) with plain aggs must not Expand every row:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"two keyed exchanges max ((source,fp) then source):\n$p")
  }

  test("cohort_retention: no window, no cartesian — distinct/agg/join pipeline only") {
    val p = plan("cohort_retention")
    assert(!p.contains("Window"), s"cohorting must not window the event stream:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cohort join is a keyed equi-join:\n$p")
  }

  test("share_of_total: global ratio via broadcast one-row agg, NOT a global window") {
    val p = plan("share_of_total")
    // the global total DOES funnel through one task — but only PARTIAL
    // per-partition sums (one row each), never data rows; the forbidden
    // shape is a Window with an empty partition spec
    assert(!p.contains("Window"), s"sum() OVER () would single-task the data:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row total should broadcast:\n$p")
  }

  test("tpch_q3ish: date predicates push to both fact scans; dim side broadcasts") {
    val p = plan("tpch_q3ish")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || p.contains("GreaterThan(l_shipdate"), s"l_shipdate not pushed:\n$p")
    assert(p.contains("LessThan(o_orderdate"), s"o_orderdate not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"filtered customer dim should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 must not global-sort:\n$p")
  }

  test("tpch_q5ish: snowflake dims broadcast; no cartesian; date filter pushed") {
    val p = plan("tpch_q5ish")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"date filter not pushed:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"region/nation/supplier (and customer at this SF) should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every join is an equi-join:\n$p")
    // the stats-blind static planner used to bushy-reorder this into
    // customer ⋈ supplier on nationkey (a per-nation row blowup) and then
    // sort-merge the fact against the blowup — the left-deep pin must hold
    assert(!p.contains("SortMergeJoin"),
      s"left-deep dims-onto-fact must not sort-merge at this SF:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1,
      s"the fact should shuffle once (final aggregate), got:\n$p")
  }

  test("cohort_retention: two exchanges, no join, no distinct-aggregate Expand") {
    val p = plan("cohort_retention")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2,
      s"collect_set form is user-agg + cell-agg, nothing more:\n$p")
    assert(!p.contains("Join"), s"cohort attaches via array_min, not a join-back:\n$p")
    assert(!p.contains("Expand"),
      s"count(*) over the pre-deduped sets must not plan a distinct aggregate:\n$p")
  }

  test("txt_remove_boilerplate: hot lines broadcast; no join back onto the input") {
    val p = plan("txt_remove_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      s"hot-line mark must broadcast (the relation is boilerplate-sized):\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 3,
      s"distinct + line-count + per-doc collect — the all-hot-doc resurrection join is gone:\n$p")
  }

  test("asof_event_order: rightTieBreak folds the orders dedup into the one carry window") {
    val p = plan("asof_event_order")
    assert(p.linesIterator.count(_.contains("Window")) === 1,
      s"exactly ONE window pass — no separate row_number dedup over orders:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"the window's key exchange is the only shuffle:\n$p")
  }

  test("fin_ema / fin_bollinger: one window pass, one key exchange — indicators stay frame-local") {
    for (name <- Seq("fin_ema", "fin_bollinger")) {
      val p = plan(name)
      assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
        s"$name: the (user) window shuffle must be the only exchange:\n$p")
      assert(p.linesIterator.count(_.contains("Window")) === 1,
        s"$name: one window pass computes every frame column:\n$p")
    }
  }

  test("theta_user_overlap: sketch self-join broadcasts; raw events scanned for sketches only") {
    val p = plan("theta_user_overlap")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row-per-group sketch pair join must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"two sketch aggregations (one per join side over the same relation), nothing more:\n$p")
  }

  test("kll_quantile_rollup: sketch + exact percentile rollups, no more than three exchanges") {
    val p = plan("kll_quantile_rollup")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 3,
      s"fine-sketch agg, rollup merge, exact-percentile agg — the join of two 3-row sides is free:\n$p")
  }

  test("dsir_importance: B-row ratio table broadcasts; corpus shuffles on bucket + doc key only") {
    val p = plan("dsir_importance")
    assert(p.contains("BroadcastHashJoin"),
      s"the ratio table must broadcast onto the exploded corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"scoring must never sort or cross the corpus:\n$p")
  }

  test("dsir_resample_top: top-m plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("dsir_resample_top")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("ccnet_bucket_sample: tier + coin are one scan — no join, no window over the corpus") {
    val p = plan("ccnet_bucket_sample")
    // the fence selection runs as separate driver-side actions; the gated
    // plan itself is scan → filter/project only
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Window")
      && !p.contains("Join"),
      s"bucket assignment must be a pure scan-side pass:\n$p")
  }
}

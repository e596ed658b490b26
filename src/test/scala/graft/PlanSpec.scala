package graft

import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}

/** Physical-plan shape assertions — the scale properties PERF.md
  * argues (pushdown, pruning, broadcast choice, top-k without global
  * sort) locked in as tests so a refactor can't silently regress the
  * 100 TB story.
  */
class PlanSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  private def simple(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(SimpleMode)

  test("q01: scan reads only the projected columns (column pruning)") {
    val rs = formatted("q01_scan_projection").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("l_orderkey") && rs.contains("l_extendedprice"), rs)
    assert(!rs.contains("l_discount") && !rs.contains("l_shipdate"), rs)
  }

  test("q02: predicates are pushed into the parquet scan") {
    val pf = formatted("q02_filter_predicate").linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pf.contains("event_type") && pf.contains("value"), pf)
  }

  test("q16/q22: dimension joins plan as BroadcastHashJoin") {
    assert(simple("q16_enrich_join").contains("BroadcastHashJoin"))
    assert(simple("q22_multi_join_agg").contains("BroadcastHashJoin"))
  }

  test("q23/q24/q58: semi/anti/EXISTS joins avoid payload duplication") {
    assert(simple("q23_semi_join").contains("LeftSemi"))
    assert(simple("q24_anti_join").contains("LeftAnti"))
    assert(simple("q58_exists_subquery").contains("LeftSemi"))
  }

  test("q26/q29: top-k plans TakeOrderedAndProject, not a global sort") {
    assert(simple("q26_topk_users").contains("TakeOrderedAndProject"))
    assert(simple("q29_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("q56: interval join broadcasts the tiny interval side") {
    assert(simple("q56_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("q57: correlated subqueries decorrelate into aggregate+join (no per-row subplans)") {
    val p = simple("q57_scalar_subquery")
    assert(!p.contains("Subquery"), p.take(400))
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("aggregations plan partial (map-side) + final HashAggregate") {
    val p = simple("q04_rms_group")
    assert(p.contains("HashAggregate"))
    // partial+final = two HashAggregate operators around the exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(400))
  }

  test("q79: the benchmark shingle set broadcasts (train side unshuffled by the join)") {
    assert(simple("q79_contamination").contains("BroadcastHashJoin"))
  }

  test("q80: the 5-row threshold dim broadcasts into the fact filter") {
    assert(simple("q80_mix_weights").contains("BroadcastHashJoin"))
  }

  test("q76: pair generation equi-joins on the LSH (band, bucket), not a cartesian") {
    val p = simple("q76_edit_distance_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(600))
  }

  test("q38/q67: pair generation equi-joins on (label, LSH bucket), not a cartesian") {
    Seq("q38_embed_neardup", "q67_knn_join").foreach { q =>
      val p = simple(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: ${p.take(600)}")
    }
  }

  test("q47: simhash pairs bucket on bit-bands — no all-pairs join in the plan") {
    val p = simple("q47_simhash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(600))
  }

  test("q82/q84: pair generation equi-joins on the LSH bucket, not a cartesian") {
    Seq("q82_embed_neardup_lsh", "q84_knn_join_lsh").foreach { q =>
      val p = simple(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: ${p.take(600)}")
    }
  }

  test("q83: timestamp range predicate pushes into the parquet scan") {
    val pf = formatted("q83_time_slice").linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pf.contains("ts"), pf)
    assert(pf.contains("GreaterThanOrEqual") || pf.contains("IsNotNull"), pf)
  }

  test("q92/q94: per-group threshold dims broadcast into the row-level pass") {
    assert(simple("q92_quality_decile").contains("BroadcastHashJoin"))
    assert(simple("q94_ewma_anomaly").contains("BroadcastHashJoin"))
  }

  test("q93: incremental dedup probes via equi-join on (band, bucket), no cartesian") {
    val p = simple("q93_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(600))
  }

  test("q95: the ship-date bound pushes into the lineitem scan") {
    val pf = formatted("q95_pricing_summary").linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pf.contains("l_shipdate"), pf)
  }

  test("q106: chunking is a narrow explode — the only exchange is the output sort") {
    val p = simple("q106_doc_chunks")
    assert("Exchange".r.findAllIn(p).length == 1, p.take(600))
    assert(p.contains("rangepartitioning"), p.take(600))
    val rs = formatted("q106_doc_chunks").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(!rs.contains("lang") && !rs.contains("source"), rs)
  }

  test("q103/q108: packing and budget-sampling windows are partition-local " +
    "(hash partition on the group key, never a single-partition sort)") {
    Seq("q103_sequence_packing", "q108_token_budget_sample").foreach { q =>
      val p = simple(q)
      assert(p.contains("hashpartitioning"), s"$q: ${p.take(600)}")
      assert(!p.contains("SinglePartition"), s"$q: ${p.take(600)}")
    }
  }

  test("q104: quantization audit prunes the scan to (embedding, label) and " +
    "plans partial+final aggregates") {
    val rs = formatted("q104_embed_quantize").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(!rs.contains("vec_id"), rs)
    val p = simple("q104_embed_quantize")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(600))
  }

  test("q105/q109: overlap matrix and centroid geometry equi-join, no cartesian") {
    Seq("q105_source_overlap", "q109_label_centroids").foreach { q =>
      val p = simple(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: ${p.take(600)}")
    }
  }

  test("q107: z-order audit plans partial (map-side) + final HashAggregate") {
    val p = simple("q107_zorder_layout")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(600))
  }

  test("q85/q87: funnel and outlier screens broadcast their small sides") {
    // q85: the benchmark shingle set rides a broadcast semi-join (q79's
    // shape); the corpus side is never shuffled by the contamination join
    assert(simple("q85_curation_funnel").contains("BroadcastHashJoin"))
    // q87: 10-row centroid and threshold dims broadcast into the
    // narrow per-vector distance pass
    assert(simple("q87_embed_outliers").contains("BroadcastHashJoin"))
  }

  test("q110: bloom might-contain filter sits BELOW the verify join") {
    // the per-row bitset probe (element_at + shiftleft mask) must
    // evaluate on the train side BEFORE the verify join — that is the
    // entire point of the bloom prefilter: shuffle only survivors.
    // Catalyst fuses the crossJoin(bloom)+filter into the 1-row
    // BroadcastNestedLoopJoin's condition, which is the same thing.
    val p = formatted("q110_bloom_contamination")
    assert(p.contains("element_at(bloom"),
      "bloom probe missing from the physical plan")
    // the single-row bitset rides a broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("q112/q113: graph triangles and calibration equi-join, no cartesian") {
    Seq("q112_graph_triangles", "q113_minhash_calibration").foreach { q =>
      val p = simple(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(600)}")
    }
  }

  test("q115/q116: round-trip sources scan csv/json with the declared schema") {
    val csv = formatted("q115_csv_roundtrip")
    assert(csv.contains("Scan csv"), csv.take(600))
    val json = formatted("q116_jsonl_roundtrip")
    assert(json.contains("Scan json"), json.take(600))
  }

  test("q117: attribution joins on user_id equality, never a cartesian") {
    val p = simple("q117_click_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(600))
  }

  test("q118: heavy hitters top-k plans TakeOrdered; total rides a broadcast") {
    val p = simple("q118_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    // the 1-row total joins via broadcast (BNLJ on a single row), not
    // a shuffle of the per-user aggregate
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("q120/q121/q123: bounded dims (top-20 set, thresholds, sketch) broadcast") {
    Seq("q120_boilerplate_retention", "q121_winsorized_agg",
      "q123_cms_calibration").foreach { q =>
      val p = simple(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: ${p.take(600)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(600)}")
    }
  }

  test("q119/q122: sequence windows read only the needed columns") {
    Seq("q119_markov_transitions", "q122_next_event_examples").foreach { q =>
      val rs = formatted(q).linesIterator
        .filter(_.contains("ReadSchema")).mkString
      assert(rs.contains("event_type") && !rs.contains("props"),
        s"$q: $rs")
    }
  }

  test("q124/q125/q128: retention, prefix join, and merge never cartesian") {
    Seq("q124_cohort_retention", "q125_prefix_similarity_join",
      "q128_cdc_merge").foreach { q =>
      val p = simple(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(600)}")
    }
  }

  test("q126: top-10 paths plan TakeOrderedAndProject, not a global sort") {
    assert(simple("q126_session_paths").contains("TakeOrderedAndProject"))
  }

  test("q129: group top-k scans only (lang, doc_id, n_chars) — text pruned") {
    val rs = formatted("q129_group_topk").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("n_chars") && !rs.contains("text"), rs)
  }

  test("q130/q132: pagerank and chunk-dup joins are equi-joins, no cartesian") {
    Seq("q130_pagerank", "q132_chunk_dup_rate").foreach { q =>
      val p = simple(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(600)}")
    }
  }

  test("q131: bm25 top-20 plans TakeOrderedAndProject") {
    assert(simple("q131_bm25_score").contains("TakeOrderedAndProject"))
  }

  test("q133: dimension stats scan reads only the embedding column") {
    val rs = formatted("q133_embed_dim_stats").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("embedding") && !rs.contains("label"), rs)
  }

  test("q134: the trailing-window join broadcasts the day dimension") {
    val p = simple("q134_rolling_active_users")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("q135: posting-list selection plans TakeOrderedAndProject") {
    assert(simple("q135_posting_lists").contains("TakeOrderedAndProject"))
  }

  test("q136: FK audit joins broadcast the dim parents, never cartesian") {
    val p = simple("q136_fk_integrity")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("q137/q138: merge and disorder audits scan only the needed columns") {
    Seq("q137_incremental_merge", "q138_out_of_order").foreach { q =>
      val rs = formatted(q).linesIterator
        .filter(_.contains("ReadSchema")).mkString
      assert(!rs.contains("props"), s"$q: $rs")
    }
  }

  test("q139/q140: pair features and drift monitor equi-join, dims broadcast") {
    val p139 = simple("q139_pair_features")
    assert(!p139.contains("CartesianProduct"), p139.take(600))
    val p140 = simple("q140_source_drift")
    assert(p140.contains("BroadcastHashJoin"), p140.take(600))
  }

  test("q141: token census top-100 plans TakeOrderedAndProject") {
    assert(simple("q141_zipf_slope").contains("TakeOrderedAndProject"))
  }

  test("q142: variant extraction scans only (event_id, event_type, props)") {
    val rs = formatted("q142_variant_extract").linesIterator
      .filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("props") && !rs.contains("value") && !rs.contains("user_id"), rs)
  }

  test("q145: the HLL sketch plans as a partial+final object aggregate") {
    // TypedImperativeAggregate → ObjectHashAggregate with a partial
    // stage before the exchange: 256-byte buffers shuffle, raw user
    // ids never do (beyond the count_distinct twin's expand)
    val p = simple("q145_hll_calibration")
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final object aggregate stages")
  }

  test("q147/q148: model scoring and collocations broadcast their dims") {
    // q147: the token->count join is the one shuffle; totals broadcast
    val p147 = simple("q147_perplexity_filter")
    assert(p147.contains("BroadcastExchange"), p147.take(400))
    assert(!p147.contains("CartesianProduct"))
    // q148: head vocabulary broadcasts; top-20 is TakeOrdered
    val p148 = simple("q148_pmi_collocations")
    assert(p148.contains("BroadcastHashJoin"), p148.take(400))
    assert(p148.contains("TakeOrderedAndProject"))
    assert(!p148.contains("CartesianProduct"))
  }

  test("q143: capped pair generation keeps the (band,bucket) bucket-collect shape") {
    val p = simple("q143_capped_lsh_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(400))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("q157/q158: capped span paths stay equi-join + aggregate, never cartesian") {
    val p157 = simple("q157_capped_dup_spans")
    assert(!p157.contains("CartesianProduct") && !p157.contains("BroadcastNestedLoop"),
      p157.take(400))
    val p158 = simple("q158_window_df_profile")
    assert(!p158.contains("CartesianProduct"), p158.take(400))
    // the profile is two aggregate stages over the window rows
    assert(p158.contains("HashAggregate"), p158.take(400))
  }

  test("q159: the quantile sketch plans as a partial+final object aggregate") {
    // same shape claim as q145: sparse integer histograms shuffle,
    // raw values never do (the exact-percentile twin columns aside)
    val p = simple("q159_qsketch_calibration")
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final object aggregate stages")
  }

  test("q161/q162: source matrix and shard audit broadcast their small sides") {
    // q161: the (doc_id, source) dictionary joins broadcast at test
    // scale (AQE would demote exactly when the dictionary outgrows
    // the threshold); never cartesian
    val p161 = simple("q161_source_dup_matrix")
    assert(!p161.contains("CartesianProduct"), p161.take(400))
    // q162: the 1-row grand-total side is an explicit broadcast
    val p162 = simple("q162_shard_balance")
    assert(p162.contains("BroadcastExchange"), p162.take(400))
    assert(!p162.contains("SortMergeJoin"), p162.take(400))
  }

  test("q163: register algebra aggregates objects, never cartesian") {
    // per-day register files through partial+final ObjectHashAggregate;
    // the day-pair self-join is an equi-join on the tiny state table
    val p = simple("q163_audience_overlap")
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("q164/q166: census top-30 and sample top-K plan TakeOrderedAndProject") {
    assert(simple("q164_bpe_merge_census").contains("TakeOrderedAndProject"))
    assert(simple("q166_weighted_sample").contains("TakeOrderedAndProject"))
  }

  test("q165: shard states aggregate as objects; grand totals broadcast") {
    val p = simple("q165_qsketch_shard_merge")
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert(p.contains("BroadcastExchange"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("q167: sequence funnel is window-over-scan — no join at all") {
    val p = simple("q167_funnel_sequence")
    assert(!p.contains("Join"), p.take(400))
    assert(p.contains("Window"), p.take(400))
  }

  test("q168: retention grid broadcasts cohort sizes, no cartesian") {
    val p = simple("q168_cohort_retention")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("q169/q170: transition matrix and rolling rollup are window-over-aggregate, no join") {
    val p169 = simple("q169_event_transitions")
    assert(!p169.contains("Join") && p169.contains("Window"), p169.take(400))
    val p170 = simple("q170_rolling_7day")
    assert(!p170.contains("Join") && p170.contains("Window"), p170.take(400))
  }

  test("q171: neighborhood blocking plans an equi-join (hash or sort-merge), never nested-loop") {
    val p = simple("q171_hamming1_entity_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(400))
    assert(p.contains("Join"), p.take(400))
  }

  test("q173: MAD screen broadcasts the per-lang stats frames") {
    val p = simple("q173_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("q175: table profile reads the scan without any join") {
    val p = simple("q175_table_profile")
    assert(!p.contains("Join"), p.take(400))
  }

  test("q176: the day grid comes from a 1-row broadcast, daily join stays equi") {
    val p = simple("q176_gap_fill_locf")
    assert(p.contains("BroadcastExchange"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("q177: hopping windows partially aggregate after the expand — no join") {
    val p = simple("q177_hopping_windows")
    assert(!p.contains("Join"), p.take(400))
    assert(p.contains("HashAggregate"), p.take(400))
  }

  test("q178: skew diagnosis plans TakeOrdered over the per-key counts") {
    val p = simple("q178_join_key_skew")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(p.contains("BroadcastExchange"), p.take(400))
  }

  test("q179: PSI edges and totals ride broadcasts, never sort-merge") {
    val p = simple("q179_psi_drift")
    assert(p.contains("BroadcastExchange"), p.take(400))
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("q180: the top-50 vocab maps into the token pass as a broadcast") {
    val p = simple("q180_vocab_kl")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("q193: burst windows need no join — one window pass + aggregate") {
    val p = simple("q193_burst_windows")
    assert(!p.contains("Join"), p.take(400))
    assert(p.contains("Window"), p.take(400))
  }

  test("q201: Q7-shape keeps equi-joins; the OR pair predicate is a filter, not a cartesian") {
    val p = simple("q201_nation_pair_trade")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("q186: Q5-shape joins broadcast dims; the year RANGE pushes into the orders scan") {
    val p = simple("q186_local_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
    val pf = formatted("q186_local_revenue").linesIterator
      .filter(_.contains("PushedFilters")).mkString
    assert(pf.contains("o_orderdate"), pf)
  }
}

"""Scale-posture assertions: physical plans must show pushdown, pruning,
broadcasts, and no accidental cartesians — the properties that decide
whether a query survives 100 TB, checked on every commit."""

from __future__ import annotations

import os

import pytest

from spark_ibm_mq_spark import registry
from spark_ibm_mq_spark.plans import (
    has_cartesian,
    num_broadcast_joins,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_ids,
)

registry.load_all_modules()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_flagship_pushdown_and_pruning(spark):
    df = registry.QUERIES["pricing_summary"](spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters
    (cols,) = read_schema_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols  # pruned
    assert len(cols) == 7
    df.collect()  # AQE finalizes the plan on execution; codegen ids appear then
    assert wholestage_codegen_ids(df), "no whole-stage codegen spans"


def test_multiway_join_broadcasts_dims(spark):
    df = registry.QUERIES["join_revenue_by_nation"](spark, SF_DIR)
    assert num_broadcast_joins(df) >= 4  # supplier, nation, region (+cust at this SF)
    assert not has_cartesian(df)


def test_jaccard_is_equi_join_not_cross(spark):
    df = registry.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_dedup_broadcast_pins_are_size_gated(spark):
    """The dedup funnels' corpus-side broadcast pins must be decided by
    CODE, not comments: under the normal threshold the small fixture side
    broadcasts; when the threshold is forced below the side's size estimate
    the same builder emits a shuffle-join plan (the 100 TB shape) instead
    of a forced broadcast that would OOM."""
    # raw builders, not registry.QUERIES: the registry wrapper routes through
    # tune_for_oracle, which re-pins the threshold this test manipulates
    from spark_ibm_mq_spark.operators.dedup import (
        dedup_minhash_lsh_md5,
        dedup_ngram_jaccard,
    )

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, str(10 * 1024 * 1024))
        for fn in (dedup_ngram_jaccard, dedup_minhash_lsh_md5):
            assert num_broadcast_joins(fn(spark, SF_DIR)) >= 1, fn.__name__
        spark.conf.set(key, "1")
        for fn in (dedup_ngram_jaccard, dedup_minhash_lsh_md5):
            df = fn(spark, SF_DIR)
            assert num_broadcast_joins(df) == 0, fn.__name__
            assert not has_cartesian(df), fn.__name__
    finally:
        spark.conf.set(key, prev)


def test_dedup_jaccard_same_rows_with_and_without_broadcast(spark):
    """The size-gate changes the physical join strategy only — the result
    set must be identical either way."""
    from spark_ibm_mq_spark.operators.dedup import dedup_ngram_jaccard

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, str(10 * 1024 * 1024))
        with_bc = sorted(map(tuple, dedup_ngram_jaccard(spark, SF_DIR).collect()))
        spark.conf.set(key, "1")
        without_bc = sorted(map(tuple, dedup_ngram_jaccard(spark, SF_DIR).collect()))
    finally:
        spark.conf.set(key, prev)
    assert with_bc == without_bc and len(with_bc) > 0


def test_filter_pushdown_in_predicates_query(spark):
    df = registry.QUERIES["filter_predicates"](spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("l_returnflag" in f for f in filters), filters
    assert any("l_quantity" in f for f in filters), filters


def test_topn_uses_take_ordered(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["sort_topn_offset"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_sort_within_partitions_no_range_exchange(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["sort_within_partitions"](spark, SF_DIR)
    plan = executed_plan(df)
    # local sort after a hash repartition: no global (range-partitioned) sort
    assert "Sort [" in plan, plan[:800]
    assert "rangepartitioning" not in plan.lower(), plan[:800]
    assert "hashpartitioning" in plan.lower(), plan[:800]


def test_pandas_udf_keeps_scan_side_filter_pushed(spark):
    df = registry.QUERIES["udf_pandas_net_price"](spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("l_quantity" in f for f in filters), filters


def test_tpch_q5_broadcasts_dims_no_cartesian(spark):
    df = registry.QUERIES["tpch_q5_local_supplier_volume"](spark, SF_DIR)
    assert num_broadcast_joins(df) >= 3  # supplier, nation, region at minimum
    assert not has_cartesian(df)


def test_tpch_q6_full_pushdown_narrow_scan(spark):
    df = registry.QUERIES["tpch_q6_forecast_revenue"](spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters
    assert any("l_discount" in f for f in filters), filters
    assert any("l_quantity" in f for f in filters), filters
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_tpch_q18_semi_join_before_fact_join(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["tpch_q18_large_volume_customers"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "LeftSemi" in plan or "left_semi" in plan.lower(), plan[:500]
    assert not has_cartesian(df)


def test_tpch_q19_disjunction_stays_equi_join(spark):
    df = registry.QUERIES["tpch_q19_disjunctive_revenue"](spark, SF_DIR)
    # the OR-of-ANDs must not degrade the p_partkey equi-join to a BNLJ
    assert not has_cartesian(df)
    assert num_broadcast_joins(df) >= 1


def test_tpch_q15_single_fact_pass_broadcast_max(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["tpch_q15_top_supplier"](spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters
    # the max-revenue scalar and the supplier dim both broadcast; the only
    # shuffle is the per-supplier aggregation
    assert num_broadcast_joins(df) >= 1
    assert not has_cartesian(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def test_tpch_q17_decorrelated_avg_no_cartesian(spark):
    df = registry.QUERIES["tpch_q17_small_quantity_revenue"](spark, SF_DIR)
    assert not has_cartesian(df)
    assert num_broadcast_joins(df) >= 1  # filtered part side


def test_tpch_q22_anti_join_shape(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["tpch_q22_global_sales_opportunity"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "LeftAnti" in plan or "left_anti" in plan.lower(), plan[:500]


def test_train_test_split_narrow_scan(spark):
    df = registry.QUERIES["pipeline_train_test_split"](spark, SF_DIR)
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"doc_id", "text"}, cols  # lang/meta pruned


def test_ivf_probe_join_no_corpus_shuffle_per_query(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["sim_ann_ivf"](spark, SF_DIR)
    # centroid fan-outs are broadcast nested-loop (small side broadcast,
    # corpus streamed — never a shuffled CartesianProduct) and the
    # probe→candidate join is a broadcast hash join
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert num_broadcast_joins(df) >= 1


def test_signed_lsh_bucket_equi_join_no_cartesian(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["sim_ann_lsh_signed"](spark, SF_DIR)
    assert not has_cartesian(df)
    # probe list broadcast into the candidate join: corpus never shuffles
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_domain_mix_broadcasts_rate_table_narrow_scan(spark):
    df = registry.QUERIES["pipeline_domain_mix"](spark, SF_DIR)
    assert not has_cartesian(df)
    assert num_broadcast_joins(df) >= 1  # 20-row rate table, never shuffled
    # document bodies stay out of every exchange: text is pruned at the scan
    cols_per_scan = read_schema_columns(df)
    assert all("text" not in cols for cols in cols_per_scan), cols_per_scan


def test_quantize_int8_no_shuffle(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["emb_quantize_int8"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Exchange" not in plan, plan[:800]  # pure per-row expression pass


def test_bucketed_cell_manifest_zero_exchanges(spark):
    """The whole point of the bucketed layout: self-join, both aggregates,
    and the manifest join all satisfied by bucketing — no shuffle anywhere
    (broadcast of the tiny pair-stats side is allowed)."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["scale_bucketed_cell_manifest"](spark, SF_DIR)
    df.collect()
    plan = executed_plan(df)
    assert "Exchange hashpartitioning" not in plan, plan[:1500]


def test_partitioned_scan_prunes_directories(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["scale_partitioned_scan_pruned"](spark, SF_DIR)
    plan = executed_plan(df)
    # the filter must reach PartitionFilters (directory pruning), not be a
    # post-scan row filter
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "event_date" in seg, seg


def test_interval_join_bucketized_no_bnlj(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["join_interval_bucketed"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "BroadcastNestedLoop" not in plan
    assert not has_cartesian(df)


def test_corpus_shuffle_single_exchange(spark):
    from spark_ibm_mq_spark.plans import num_exchanges

    df = registry.QUERIES["pipeline_corpus_shuffle"](spark, SF_DIR)
    # one hash exchange on the shard key; no global range sort
    assert num_exchanges(df) == 1
    from spark_ibm_mq_spark.plans import executed_plan

    assert "rangepartitioning" not in executed_plan(df).lower()


def test_repetition_filter_zero_shuffle(spark):
    """The token multiset never leaves its row: no aggregation/range
    shuffle. The ONE allowed exchange is the r16 scale-conditional
    `spread` of the raw narrow scan (fires only when the scan is
    under-partitioned vs cores — parallelizes the per-row token-count
    loop, guide §2.6), which carries (doc_id, lang, text) rows, not any
    derived/aggregated frame."""
    from spark_ibm_mq_spark.plans import executed_plan, num_exchanges

    df = registry.QUERIES["text_repetition_filter"](spark, SF_DIR)
    assert num_exchanges(df) <= 1
    plan = executed_plan(df)
    assert "rangepartitioning" not in plan.lower()
    # the exchange (when present) is the scan spread, below the projection:
    # no hash key derived from computed columns
    assert plan.count("Exchange") == plan.count(
        "Exchange hashpartitioning(doc_id"
    ), plan[:600]


def test_zorder_manifest_narrow_scan_single_agg_exchange(spark):
    from spark_ibm_mq_spark.plans import num_exchanges

    df = registry.QUERIES["scale_zorder_manifest"](spark, SF_DIR)
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"o_custkey", "o_orderdate"}, cols
    assert num_exchanges(df) <= 1


def test_decontaminate_equi_join_no_cross(spark):
    df = registry.QUERIES["pipeline_decontaminate"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_chunk_documents_stays_in_scan_stage(spark):
    """Chunking is tokenize→sequence→explode→hash: the only Exchange allowed
    is the fixture-width spread repartition — no shuffle is introduced by
    the operator itself, and the scan reads only (doc_id, text)."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["pipeline_chunk_documents"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") <= 1, plan[:800]
    (cols,) = read_schema_columns(df)
    assert set(cols) <= {"doc_id", "text"}, cols


def test_pii_scrub_zero_shuffle_narrow_scan(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["pipeline_pii_scrub"](spark, SF_DIR)
    plan = executed_plan(df)
    # one spread repartition max (fixture single-row-group), nothing else
    assert plan.count("Exchange") <= 1, plan[:800]
    (cols,) = read_schema_columns(df)
    assert set(cols) <= {"event_id", "props"}, cols


def test_pq_codes_broadcasts_codebook_no_cartesian(spark):
    df = registry.QUERIES["emb_pq_codes"](spark, SF_DIR)
    assert not has_cartesian(df)
    assert num_broadcast_joins(df) >= 1  # 32-row codebook is broadcast


def test_ann_recall_eval_no_cartesian_both_funnels(spark):
    df = registry.QUERIES["sim_ann_recall_eval"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_cms_counter_frame_broadcast_no_cartesian(spark):
    df = registry.QUERIES["agg_heavy_hitters_cms"](spark, SF_DIR)
    assert not has_cartesian(df)
    assert num_broadcast_joins(df) >= 1  # the d×w counter frame (≤1024 rows)


def test_kmeans_broadcasts_centroids_every_iteration(spark):
    """Each Lloyd iteration must broadcast the K-row centroid frame into
    the corpus scan (BroadcastNestedLoopJoin over the 8-row side), never a
    CartesianProduct over the corpus."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["emb_kmeans_3iter"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan[:800]
    assert plan.count("BroadcastNestedLoopJoin") == 3, plan.count(
        "BroadcastNestedLoopJoin"
    )


def test_bloom_prefilter_broadcast_probes_no_cartesian(spark):
    """Both bitmap-word probes AND the exact semi join must be broadcast
    hash joins (the word table is ~1 KiB, the key list a dim) — the fact
    side must never shuffle before the prefilter."""
    df = registry.QUERIES["join_bloom_prefilter"](spark, SF_DIR)
    assert not has_cartesian(df)
    assert num_broadcast_joins(df) >= 3


def test_substr_spans_shingles_stay_in_scan_stage(spark):
    """Shingle generation is transform(sequence(...)) over the token array —
    per-row, no explode-then-groupBy token shuffle. Total exchanges: the
    fixture spread, the shingle-count window, and the per-doc rollup."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["dedup_substr_spans"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") <= 3, plan[:1200]


def test_char_entropy_zero_shuffle(spark):
    """The per-doc char histogram is computed inside the row (higher-order
    array expressions) — no explode, no aggregation exchange at any corpus
    size; the only exchange is the fixture spread."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["text_char_entropy"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") <= 1, plan[:800]
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"doc_id", "text"}, cols


def test_new_pairwise_ops_avoid_cartesian(spark):
    """Containment, incremental dedup, and co-purchase PMI must generate
    candidates through equi-joins — no BNLJ/cartesian anywhere."""
    from spark_ibm_mq_spark.plans import has_cartesian

    for name in (
        "dedup_containment_3gram",
        "pipeline_dedup_incremental",
        "affinity_copurchase_pmi",
    ):
        df = registry.QUERIES[name](spark, SF_DIR)
        assert not has_cartesian(df), name


def test_attribution_single_user_shuffle(spark):
    """The attribution window and the as-of pairing ride ONE user_id
    exchange; only the tiny channel rollup adds a second."""
    from spark_ibm_mq_spark.plans import num_exchanges

    df = registry.QUERIES["events_attribution_last_touch"](spark, SF_DIR)
    assert num_exchanges(df) <= 2, df._jdf.queryExecution().executedPlan().toString()[:800]


def test_retrieval_ops_broadcast_small_frames_no_cartesian(spark):
    """BM25's df/stats frames and the cosine blocker's df frame are tiny
    broadcasts; candidate generation is equi-join only. The 1-row
    stats/total frames legitimately arrive via broadcast nested loop
    (a cross join against one row), so the assertion is on CartesianProduct
    specifically plus at least one broadcast hash join."""
    from spark_ibm_mq_spark.plans import num_broadcast_joins

    for name in ("text_bm25_rank", "sim_tf_cosine_blocked", "text_unigram_logprob"):
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert num_broadcast_joins(df) >= 1, name


def test_pagerank_rounds_share_part_partitioning(spark):
    """Each PageRank round is equi-join + groupBy on the part key; the
    vertex-count scalar rides as a 1-row broadcast — no cartesian."""
    df = registry.QUERIES["graph_pagerank_copurchase"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_gap_fill_spine_no_shuffle_for_sequence(spark):
    """The hour spine is generated by explode(sequence(...)) — engine-side
    generation, no extra exchange beyond the rollup + window."""
    df = registry.QUERIES["events_hourly_gap_fill"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan or "Generate" in plan
    assert "CartesianProduct" not in plan


def test_ewma_is_window_not_self_join(spark):
    """The Spark side of the EWMA must be the frame-bounded window fold,
    not the oracle's O(16x) band self-join: exactly zero joins in the
    plan."""
    df = registry.QUERIES["win_ewma_hourly"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:600]
    assert "Window" in plan


def test_compaction_plan_is_manifest_scale(spark):
    """Compaction planning reads ONE narrow column set (date only) —
    manifest math, not data math."""
    from spark_ibm_mq_spark.plans import read_schema_columns

    df = registry.QUERIES["scale_compaction_plan"](spark, SF_DIR)
    (cols,) = read_schema_columns(df)
    assert cols == ["o_orderdate"], cols


def test_bigram_model_joins_are_broadcasts(spark):
    """Both bigram-model joins must broadcast the count frames; the
    explode stays in the scan stage (no shuffle before the model joins)."""
    from spark_ibm_mq_spark.plans import num_broadcast_joins

    df = registry.QUERIES["text_bigram_logprob"](spark, SF_DIR)
    assert num_broadcast_joins(df) >= 2
    assert not has_cartesian(df)


def test_systematic_sample_reads_manifest_columns_only(spark):
    """The sampling layout never touches the text column."""
    from spark_ibm_mq_spark.plans import read_schema_columns

    df = registry.QUERIES["pipeline_systematic_sample"](spark, SF_DIR)
    for cols in read_schema_columns(df):
        assert "text" not in cols, cols


def test_ivfpq_funnel_no_cartesian_broadcast_index_frames(spark):
    """IVFPQ: centroids/codebook/probe/LUT ride as broadcasts (the cross
    joins against them are broadcast nested loops over ≤160-row frames,
    never CartesianProduct); candidate generation is the cell equi-join."""
    from spark_ibm_mq_spark.plans import num_broadcast_joins

    df = registry.QUERIES["sim_ann_ivfpq"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert num_broadcast_joins(df) >= 2


def test_snapshot_diff_shuffles_hashes_not_text(spark):
    """The full-outer diff joins 32-byte manifests: the join keys' child
    projections must not carry the text column past the scan stage."""
    df = registry.QUERIES["pipeline_snapshot_diff"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)


def test_stickiness_band_join_is_bucketized_equi(spark):
    """The trailing-week WAU join must be an equi-join on the 7-wide
    bucket (hash/broadcast-hash), never a nested-loop over the day band."""
    df = registry.QUERIES["events_stickiness_dau_wau"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:800]


# ---------------------------------------------------------------- r8 families


def test_cdc_apply_single_aggregation_no_window(spark):
    """mq_cdc_apply's keep-newest must be ONE hash/sort aggregation on the
    replication key (struct-ordinal max), not a window + filter — no
    Window node, no join, no cartesian."""
    df = registry.QUERIES["mq_cdc_apply"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    assert not has_cartesian(df)
    (cols,) = read_schema_columns(df)
    assert "props" not in cols and "event_type" in cols  # pruned to needs


def test_triangle_count_all_equi_joins(spark):
    """The oriented wedge-close must be hash/equi-joinable end to end —
    a single OR-condition in the closing join degrades to BNLJ and the
    plan dies at scale."""
    df = registry.QUERIES["graph_triangle_count"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_jaccard_link_prediction_no_all_pairs(spark):
    df = registry.QUERIES["graph_jaccard_link_prediction"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_benford_prunes_to_one_column(spark):
    df = registry.QUERIES["agg_benford_first_digit"](spark, SF_DIR)
    for cols in read_schema_columns(df):
        assert cols == ["o_totalprice"], cols


def test_correlation_matrix_single_scan(spark):
    """Six corr accumulators must share ONE scan/aggregate — no self-join
    of lineitem per pair."""
    df = registry.QUERIES["agg_correlation_matrix"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_length_ablation_single_scan(spark):
    """The 4-threshold sweep must be one conditional aggregate, not one
    scan per threshold."""
    df = registry.QUERIES["pipeline_length_filter_ablation"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_nearest_event_is_merge_not_pair_join(spark):
    """join_nearest_event must be the union-interleave merge: one
    (user_id) exchange feeding window carries — no (purchase × click)
    pair join in the plan."""
    df = registry.QUERIES["join_nearest_event"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]
    assert "Window" in plan


def test_minhash_recall_eval_no_cartesian(spark):
    df = registry.QUERIES["dedup_minhash_recall_eval"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_dynamic_partition_pruning_subquery_present(spark):
    """scale_dynamic_partition_pruning must carry a dynamicpruning
    subquery on the partitioned fact scan — the runtime dim membership
    reaching PartitionFilters, not a full scan filtered post-hoc."""
    df = registry.QUERIES["scale_dynamic_partition_pruning"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]


def test_adamic_adar_no_all_pairs(spark):
    """Candidates must come from the shared-neighbor wedge equi-join —
    never an all-pairs product; the AA term joins the wedge CENTER's
    degree, which must stay a hash join."""
    df = registry.QUERIES["graph_adamic_adar"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_phrase_match_filters_terms_before_join(spark):
    """The positional self-join must run on query-term postings only:
    the term IN (...) filter sits below the join, the adjacency test is
    an equi-join on (doc_id, pos+1), and no cartesian appears."""
    df = registry.QUERIES["retrieval_phrase_match"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_spearman_single_scan_two_rank_windows(spark):
    """One daily rollup scan feeds both rank windows — no second pass
    over orders."""
    df = registry.QUERIES["win_spearman_daily"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_mann_kendall_pair_join_is_calendar_bounded(spark):
    """The O(n²) pair join must join DAILY ROLLUPS (calendar-bounded),
    not raw orders: both join inputs aggregate before the non-equi
    condition, so each side is ≤ |days| rows regardless of data scale."""
    df = registry.QUERIES["win_mann_kendall_trend"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the pair join is a BNLJ by construction (range condition) — the
    # safety property is that the daily HashAggregates sit BELOW it, so
    # each BNLJ input is <= |days| rows regardless of data scale, and
    # n_days derives from the pair count (no third scan, no cross join)
    assert plan.count("Scan parquet") == 2, plan[:2000]
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan[:2000]
    assert "HashAggregate" in plan


def test_dimension_variance_prunes_to_embedding(spark):
    """posexplode must read only the embedding column; integer (dim, q)
    pairs shuffle, never vectors."""
    df = registry.QUERIES["emb_dimension_variance_profile"](spark, SF_DIR)
    for cols in read_schema_columns(df):
        assert cols == ["embedding"], cols


def test_asof_forward_is_merge_not_pair_join(spark):
    df = registry.QUERIES["join_asof_forward"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan[:2000]
    assert "Window" in plan


def test_tokenizer_fertility_single_scan(spark):
    df = registry.QUERIES["text_tokenizer_fertility"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_bollinger_single_scan(spark):
    df = registry.QUERIES["win_bollinger_bands"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Window" in plan


def test_query_likelihood_no_cartesian_blowup(spark):
    """The two crossJoins are a 3-row term frame and a 1-row stats frame —
    both broadcast; the corpus-side shuffle is the one postings aggregate."""
    df = registry.QUERIES["retrieval_query_likelihood"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]


def test_perplexity_ablation_one_scoring_pass(spark):
    """Four gates must share ONE corpus scoring pass — the gate sweep is a
    conditional aggregate over the per-doc score frame, not 4 scans."""
    df = registry.QUERIES["pipeline_perplexity_gate_ablation"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2, plan[:2000]


def test_js_divergence_pair_join_is_model_sized(spark):
    """The pair join runs on the (source, term) grid — model-sized rows —
    with the corpus touched once by the count aggregate."""
    df = registry.QUERIES["text_js_divergence_sources"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_soft_weighting_broadcasts_labels(spark):
    df = registry.QUERIES["dedup_soft_weighting"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_assortativity_single_reduction(spark):
    df = registry.QUERIES["graph_degree_assortativity"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_pca_no_collect_no_cartesian(spark):
    """The power-iteration rounds must stay distributed: v rides as a
    broadcast frame, never a collected literal; no cartesian anywhere."""
    df = registry.QUERIES["emb_pca_power_iteration"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_mmr_corpus_touched_once(spark):
    """The O(pool^2) similarity matrix joins the 20-row shortlist with
    itself — the corpus-scale scan feeds only the relevance stage."""
    df = registry.QUERIES["sim_mmr_rerank"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]


def test_rsi_single_scan(spark):
    df = registry.QUERIES["win_rsi_indicator"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_ngram_novelty_no_cartesian(spark):
    df = registry.QUERIES["text_ngram_novelty"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_interval_overlap_is_bucket_equi_join(spark):
    """The interval-overlap candidates must come from the hour-bucket
    equi-join — never interval x interval."""
    df = registry.QUERIES["join_interval_overlap"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_rfm_migration_single_scan(spark):
    df = registry.QUERIES["agg_rfm_migration_matrix"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2, plan[:2000]


def test_rake_no_cartesian(spark):
    df = registry.QUERIES["text_rake_keywords"](spark, SF_DIR)
    assert not has_cartesian(df)


def test_alert_debounce_single_scan_windows(spark):
    df = registry.QUERIES["events_alert_debounce"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Window" in plan


def test_centroid_drift_prunes_and_no_cartesian(spark):
    df = registry.QUERIES["emb_centroid_drift"](spark, SF_DIR)
    assert not has_cartesian(df)
    # ReadSchema strings truncate past ~2 fields, so assert the pruning
    # negatively: the 3-column projection never widens to a full-row scan
    for cols in read_schema_columns(df):
        assert set(cols) <= {"label", "vec_id", "embedding"}, cols


def test_compression_proxy_single_scan(spark):
    df = registry.QUERIES["text_compression_ratio_proxy"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_winnowing_is_fingerprint_equi_join(spark):
    """Winnowing pairs must come from the fingerprint equi-join — never
    doc x doc — and the selection windows must not widen the scan."""
    df = registry.QUERIES["dedup_winnowing_fingerprint"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text"}, cols


def test_kcore_checkpoints_edges_and_stays_equi(spark):
    """The peel rounds must run as equi-joins against the checkpointed
    edge list; the only broadcast-nested-loop is the 1-row k threshold."""
    df = registry.QUERIES["graph_kcore_peel"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the edge build is checkpointed once: the lineitem scan appears in
    # the RDD scan lineage, not 4x in this plan
    assert plan.count("Scan parquet") == 0, plan[:2000]
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_jl_projection_zero_shuffle(spark):
    """The JL projection itself is a pure map stage: no explode, no join,
    no aggregation exchange. The ONE allowed exchange is the r16
    scale-conditional `spread` of the under-partitioned fixture scan
    (parallelizes the per-row JL folds; fires only when files < cores, so
    a real multi-split table keeps the zero-exchange plan)."""
    df = registry.QUERIES["emb_random_projection_jl"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan[:2000]
    assert "hashpartitioning" not in plan, plan[:2000]  # round-robin only
    assert plan.count("Scan parquet") == 1


def test_hill_tail_uses_take_ordered(spark):
    """Top-k selection must be TakeOrdered (heap), not a global sort."""
    df = registry.QUERIES["agg_hill_tail_index"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Sort " not in plan or "SortMergeJoin" in plan


def test_asof_nearest_single_user_shuffle(spark):
    """The nearest as-of join is the union-interleave merge: one events
    scan, windows over user_id, no pair join anywhere."""
    df = registry.QUERIES["join_asof_nearest"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_edit_distance_blocks_on_catalog(spark):
    """Levenshtein pairing must run on the distinct-name catalog after
    an aggregate, joined on the noun block key — no row-level pairing."""
    df = registry.QUERIES["dedup_edit_distance_parts"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_funnel_time_bound_stays_equi_and_prunes(spark):
    """Every funnel stage join must be an equi-join on user_id with the
    attribution window as a residual filter — never a nested-loop range
    join — and the events scans must read only the 3 funnel columns."""
    df = registry.QUERIES["events_funnel_time_bound"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"user_id", "ts", "event_type"}, cols


def test_cusum_single_rollup_then_tiny_windows(spark):
    """CUSUM's only full-data pass is the groupBy(day) rollup; the
    Lindley windows and the 1-row parameter broadcast run over the
    ~|days| frame. The scan must read only the timestamp column."""
    df = registry.QUERIES["events_changepoint_cusum"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    # the only nested-loop is the broadcast 1-row (mu, slack) frame
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"ts"}, cols


def test_parkinson_single_scan_no_join(spark):
    """Parkinson volatility is one partial-agg scan + windows over the
    daily frame: exactly one pruned parquet scan, no join anywhere."""
    df = registry.QUERIES["win_parkinson_volatility"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"o_orderdate", "o_totalprice"}, cols


def test_bfs_hops_runs_on_checkpointed_edges(spark):
    """Every BFS hop must expand against the checkpointed edge list
    (no re-derivation from parquet in the final plan) and stay an
    equi-join — frontier x edges never degenerates to a cross."""
    df = registry.QUERIES["graph_bfs_hops"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_attribution_linear_stays_equi_and_prunes(spark):
    """Purchase x touch pairing must be a user_id equi-join with the
    7-day window as a residual predicate — never a nested loop — and
    the events scans must prune to the 5 attribution columns."""
    df = registry.QUERIES["events_attribution_linear"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"event_id", "ts", "user_id", "event_type", "value"}, cols


def test_hard_negative_mining_cell_equi_join(spark):
    """Candidate pairs must come from the cell equi-join (the only
    nested-loop is the broadcast 8-row centroid frame), and the scans
    must read only (vec_id, embedding, label)."""
    df = registry.QUERIES["emb_hard_negative_mining"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    for cols in read_schema_columns(df):
        assert set(cols) <= {"vec_id", "embedding", "label"}, cols


def test_mutual_information_single_rollup(spark):
    """The contingency rollup is the only full-data pass (checkpointed:
    the marginal/term consumers must not re-scan events), and the 1-row
    total rides a broadcast."""
    df = registry.QUERIES["agg_mutual_information"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan[:2000]
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:2000]


def test_cdc_chunking_zero_shuffle_text(spark):
    """Chunk cutting/hashing must be per-row array expressions over the
    checkpointed (doc_id, chunk_hash) set — no parquet re-scan in the
    pair stage, and the pair generator stays an equi-join."""
    df = registry.QUERIES["dedup_cdc_chunking"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_phash_near_dup_band_equi_join_not_cross(spark):
    """Candidate generation must come from the band equi-join — a
    cartesian here means pair volume n², the exact failure the banding
    exists to prevent."""
    df = registry.QUERIES["mm_phash_near_dup"](spark, SF_DIR)
    assert not has_cartesian(df)
    # the scan feeds doc_id + text into sha2 — nothing else
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text"}, cols


def test_mm_decode_scan_prunes_to_payload_inputs(spark):
    """The decode pass reads exactly (doc_id, text): a scan that drags
    lang/source/n_chars through Arrow into Python pays per-byte for
    columns the decoder never touches."""
    df = registry.QUERIES["mm_decode_features"](spark, SF_DIR)
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text"}, cols


def test_mm_planners_no_shuffle(spark):
    """Resize and audio-chunk planning are pure per-row projections or
    explodes over the decode output — an Exchange in either means the
    planner shuffles payload-derived rows it never aggregates."""
    for name in ("mm_resize_letterbox_plan", "mm_audio_chunk_plan"):
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # r16: _decode_df spreads its under-partitioned input BEFORE the
        # Python boundary (parallel decode, guide §2.6/§4). That one
        # exchange carries raw (doc_id, payload) rows and sits BELOW the
        # decode node; any exchange ABOVE it would mean the planner
        # shuffles payload-derived rows it never aggregates.
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex <= 1, f"{name} shuffles: {plan[:400]}"
        if n_ex == 1:
            decode_pos = plan.find("MapInPandas")
            assert decode_pos != -1 and plan.find(
                "Exchange hashpartitioning"
            ) > decode_pos, f"{name} shuffles above decode: {plan[:400]}"


def test_scene_cut_single_doc_shuffle(spark):
    """Scene assembly needs exactly the per-doc window partitioning —
    one shuffle on doc_id (reused by the groupBy through the window's
    existing partitioning), never a second full exchange of frame rows."""
    df = registry.QUERIES["mm_video_scene_cut_plan"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # r16: TWO doc_id hash exchanges are the correct shape now — the
    # decode-input spread below MapInPandas (parallel decode; mapInPandas
    # emits fresh attributes, so its output partitioning is unknown to the
    # planner and cannot feed the window) plus the per-doc window
    # partitioning. Never a third full exchange of frame rows.
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:600]
    decode_pos = plan.find("MapInPandas")
    assert plan.count("Exchange hashpartitioning", decode_pos) <= 1, plan[:600]
    assert not has_cartesian(df)


def test_ks_drift_narrow_scan_and_partitioned_windows(spark):
    """The KS screen must read ONLY (source, n_chars) from documents and
    keep its per-source ECDF window partitioned — the only global window
    runs over the metadata-scale length grid."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["agg_ks_source_drift"](spark, SF_DIR)
    scans = read_schema_columns(df)
    for cols in scans:
        assert set(cols) <= {"source", "n_chars"}, cols
    assert not has_cartesian(df) or "BroadcastNestedLoopJoin" in executed_plan(
        df
    )  # the 1-row pooled-total carry rides a broadcast


def test_crossmodal_candidates_are_keyed_joins(spark):
    """mm_crossmodal_near_dup's candidate generators must both be keyed
    equi-joins: no CartesianProduct anywhere; the only nested-loop join
    allowed is the broadcast centroid carry of the cell assignment."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["mm_crossmodal_near_dup"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    # band join + cell join appear as hash joins on their keys
    assert "band_idx" in plan and "band_val" in plan


def test_textrank_keeps_word_graph_joins_hashed(spark):
    """TextRank's per-round contribution joins run on the word key — no
    cartesian, and the corpus scan reads only the text column."""
    df = registry.QUERIES["text_textrank_keywords"](spark, SF_DIR)
    assert not has_cartesian(df)
    for cols in read_schema_columns(df):
        assert set(cols) <= {"text"}, cols


def test_lsh_band_profile_never_materializes_pairs(spark):
    """The banding sweep must contain NO self-join at all — its pair
    volume comes from bucket aggregates (sum C(df,2)), so the plan has
    exactly one scan of documents and no join nodes."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["dedup_lsh_band_profile"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Join" not in plan, "sweep must aggregate buckets, not join pairs"


def test_line_level_dedup_packed_min_no_window(spark):
    """Line-level dedup must read only (doc_id, text), generate chunks
    per-row, and rank first occurrences via a map-side-combinable
    partial_min over the packed (doc_id, idx) bigint — NEVER a window
    on the line key (a boilerplate hot line makes a window partition
    AQE-unsplittable; VERDICT r12 task 5). The only join is the
    doc-count-sized totals-vs-kept doc_id equi-join."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["dedup_line_level"](spark, SF_DIR)
    assert not has_cartesian(df)
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text"}, cols
    plan = executed_plan(df)
    assert "Window" not in plan, plan[:600]
    assert "partial_min" in plan, plan[:600]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:600]


def test_boundary_overlap_gram_equi_join(spark):
    """The joint detector's pairs must come from the (k, gram) hash join
    — no cartesian, no nested-loop join, narrow scan."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["dedup_boundary_overlap"](spark, SF_DIR)
    assert not has_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in executed_plan(df)
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text"}, cols


def test_oov_rate_collapses_tokens_before_join(spark):
    """Raw token rows must collapse to (source, token, count) via a
    partial+final HashAggregate BEFORE the vocabulary join; the top-K
    vocabulary cut must plan as a PARALLEL TakeOrderedAndProject, never
    an unpartitioned row_number window (the distinct-token frame is
    corpus-proportional at 100 TB — ADVICE r12)."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["text_oov_rate"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = executed_plan(df)
    # the vocabulary side broadcasts (size-gated): its K rows never
    # justify a shuffle join against the compact (source, token) frame
    assert "BroadcastHashJoin" in plan, plan[:600]
    assert "TakeOrderedAndProject" in plan, plan[:600]
    assert "Window" not in plan, plan[:600]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "source", "text"}, cols


def test_mattr_single_spread_exchange(spark):
    """MATTR is a pure per-row sweep: exactly ONE exchange (the spread
    that fans the single-file scan across cores), no joins, no windows,
    no aggregates past the scan stage."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["text_mattr_diversity"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Exchange") <= 1, plan[:600]
    assert "Join" not in plan and "Window" not in plan, plan[:600]


def test_bpe_3merge_broadcasts_argmax_no_corpus_cartesian(spark):
    """Each BPE rewrite round must broadcast the 1-row elected-pair frame
    into the distinct-word frame (BroadcastNestedLoopJoin over ONE row,
    the emb_kmeans_3iter shape) — never a CartesianProduct — and the
    corpus must be scanned ONCE: the base word frame is checkpointed, so
    the final plan's five word-frame consumers (three output branches +
    two rewrite chains) all read the checkpoint RDD and NO parquet scan
    survives downstream. (Pre-checkpoint, the executed plan carried a
    separate tokenize+aggregate exchange per branch — ~6 corpus scans at
    100 TB — which is why the ReuseExchange-will-save-us assumption is
    asserted false here.)"""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["pipeline_bpe_3merge"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan[:800]
    # The unrolled rewrite chains recompute from the CHECKPOINT
    # (vocab-sized, the cheap part at scale), not from the corpus; the
    # current recomputation shape yields 4 BNLJs (round-2 branch
    # re-derives rewrite 1; round-3 carries rewrite 2 over rewrite 1
    # plus rewrite 1 inside its argmax side), every one a 1-row
    # IdentityBroadcastMode build side. The INVARIANTS (no cartesian, no
    # file scan, checkpoint present, broadcast rewrite joins exist) are
    # asserted exactly; the BNLJ COUNT is a bound, not an equality —
    # a Spark/AQE bump that dedups or re-shapes the chains is benign
    # (ADVICE r15 #4).
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert 1 <= n_bnlj <= 6, (n_bnlj, plan[:800])
    assert "ExistingRDD" in plan, plan[:600]
    assert "Scan parquet" not in plan and "FileScan" not in plan, plan[:800]


def test_temperature_mixture_narrow_scan_and_broadcast_total(spark):
    """The mixture weights must read ONLY `source` from documents, and
    the derivation's single 1-row total carry must ride a broadcast
    nested-loop join — never a cartesian over the count frame. (Shared
    derivation: the streaming twin reads the same plan shape over its
    snapshot, so this pins both consumers' read-time math.)"""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["pipeline_temperature_mixture"](spark, SF_DIR)
    for cols in read_schema_columns(df):
        assert set(cols) <= {"source"}, cols
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan[:600]
    assert "BroadcastNestedLoopJoin" in plan, plan[:600]


def test_dsir_collapses_buckets_before_model_join(spark):
    """DSIR must hash tokens to buckets inside the scan stage and collapse
    to (doc_id, bucket, n) via a partial+final HashAggregate BEFORE the
    model join; the 64-row model and 1-row totals broadcast — raw token
    rows never join anything."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["pipeline_dsir_importance"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = executed_plan(df)
    assert "partial_count" in plan or "partial_sum" in plan, plan[:600]
    assert "BroadcastHashJoin" in plan, plan[:600]
    assert "SortMergeJoin" not in plan, plan[:600]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "source", "text"}, cols


def test_semdedup_cell_equi_join_only(spark):
    """SemDeDup's candidate pairs must come from the cell equi-join —
    never an all-pairs product — and the scan must read only the
    embedding columns the shared cell-assignment engine needs."""
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["dedup_semdedup_prune"](spark, SF_DIR)
    assert not has_cartesian(df)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:600]
    for cols in read_schema_columns(df):
        assert set(cols) <= {"vec_id", "embedding", "label"}, cols

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``spark_ibm_mq_spark/operators/`` and register into
``spark_ibm_mq_spark.registry``; this module just re-exports the merged
registry (SURVEY.md §2.2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ibm_mq_spark import registry  # noqa: E402

registry.load_all_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    return registry.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS gate checks the FIRST 50 entries of queries() in
# dict order.  Round-7 window, in priority order:
# (a0) the five queries that registered after the r6 window filled and have
#      NEVER had an external driver row (sim-verified only) — VERDICT r6
#      item 1, the scoreboard must confirm them;
# (a1) the six operators NEW this round (rolling median window, last-touch
#      attribution, co-purchase PMI, skew diagnostics, 3-gram containment,
#      incremental dedup) — first-ever driver rows;
# (a2) the three queries whose behavior changed this round: the
#      struct-ordinal keep-latest (agg_latest_order_per_cust; the
#      stream_foreachbatch_upsert twin is already in a0), the id-domain
#      guard + durable_checkpoint in the bitmap rollup, and the
#      lazy-durable-checkpoint rewrite of cluster resolve;
# (b)  the 22 remaining r3-vintage rows (VERDICT r6 item 2) — their last
#      driver check predates three rounds of refactors;
# (a3) the fifteen operators added late this round (BM25, blocked
#      tf-cosine, PageRank, cohort LTV, hourly gap-fill, EWMA, compaction
#      plan, unigram+bigram logprob, systematic sample, RFM, as-of
#      tolerance, MQ DLQ split, IVF+PQ funnel, snapshot diff) —
#      first-ever driver rows; never-checked queries outrank freshness
#      rotation (VERDICT r6 ranked them the top gap). To fit them,
#      join_cross_flags slips from the r3 rotation (still parity-swept at
#      sf0.001 per commit) and the whole r4 set (distinct/set/sort
#      families, sim_ann_lsh, streaming windows, tumbling, text_*,
#      tpch_*, udf/udaf/udtf, win_*) rotates in r8. The twenty-three operators
#      registered after this window filled (agg_mad_robust,
#      text_lang_confusion, events_cumulative_uniques,
#      win_weekly_pct_change, agg_welch_ab_test, sim_prefix_dim_eval,
#      pipeline_quality_gate_funnel, events_stickiness_dau_wau,
#      stream_windowed_dau, pipeline_canonicalize_dedup,
#      agg_pareto_revenue_deciles, pipeline_token_budget_allocator,
#      events_error_budget_burn, events_queue_backlog,
#      pipeline_schema_drift_report, events_behavior_entropy,
#      text_hapax_ratio, agg_gini_coefficient, win_activity_streaks,
#      text_term_burstiness, events_peak_concurrency,
#      agg_ship_latency_percentiles, mq_scd2_point_in_time) lead the r8
#      window.
# Every displaced query keeps per-commit sf0.001 parity coverage in
# tests/test_oracle_parity.py; all 50 below re-verified green this session
# via scripts/driver_sim.py at sf0.01.
_CHECK_FIRST = [
    # --- (a0) registered post-r6-window, never driver-checked ---
    "events_dau_rolling",
    "pipeline_dataset_card",
    "stream_foreachbatch_upsert",
    "text_char_entropy",
    "win_range_moving_sum",
    # --- (a1) NEW this round ---
    "win_rolling_median",
    "events_attribution_last_touch",
    "affinity_copurchase_pmi",
    "scale_skew_diagnostics",
    "dedup_containment_3gram",
    "pipeline_dedup_incremental",
    # --- (a2) behavior changed this round ---
    "agg_latest_order_per_cust",
    "agg_bitmap_distinct_rollup",
    "dedup_cluster_resolve",
    # --- (b) r3-vintage regression rotation ---
    "agg_approx_distinct",
    "agg_collect_event_types",
    "agg_pivot_event_types",
    "array_funcs",
    "conditional_case",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "filter_predicates",
    "hash_funcs",
    "join_anti_inactive",
    "join_full_outer_nation_presence",
    "join_price_bands",
    "join_right_outer_orders",
    "join_semi_purchasers",
    "map_funcs",
    "math_funcs",
    "mm_binary_meta",
    "mq_ordered_replay",
    "scan_csv_nation",
    "scan_jsonl_orders",
    "sql_api_shipping_priority",
    # --- (a3) added late this round, never driver-checked ---
    "text_bm25_rank",
    "sim_tf_cosine_blocked",
    "graph_pagerank_copurchase",
    "events_cohort_ltv",
    "events_hourly_gap_fill",
    "win_ewma_hourly",
    "scale_compaction_plan",
    "text_unigram_logprob",
    "pipeline_systematic_sample",
    "agg_rfm_segments",
    "text_bigram_logprob",
    "join_asof_tolerance",
    "mq_dlq_split",
    "sim_ann_ivfpq",
    "pipeline_snapshot_diff",
]



def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _CHECK_FIRST if k in mapping}
    head.update({k: v for k, v in mapping.items() if k not in head})
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return _ordered(dict(registry.ORACLE))

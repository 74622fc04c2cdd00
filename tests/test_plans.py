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


def test_filter_pushdown_in_predicates_query(spark):
    df = registry.QUERIES["filter_predicates"](spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("l_returnflag" in f for f in filters), filters
    assert any("l_quantity" in f for f in filters), filters


def test_topn_uses_take_ordered(spark):
    from spark_ibm_mq_spark.plans import executed_plan

    df = registry.QUERIES["sort_topn_offset"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_pandas_udf_keeps_scan_side_filter_pushed(spark):
    df = registry.QUERIES["udf_pandas_net_price"](spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("l_quantity" in f for f in filters), filters

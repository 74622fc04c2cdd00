"""Degenerate-document tests for the descending-sequence guards (the
winnowing ADVICE class): Spark's sequence(1, 0) steps DOWN to [1, 0],
so position generators must gate on input length BEFORE exploding.
The fixtures never contain sub-gram documents — these synthetic ones do,
and also pin Spark/DuckDB row-set agreement on them."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_ibm_mq_spark import registry

registry.load_all_modules()


@pytest.fixture(scope="module")
def tiny_docs_dir(tmp_path_factory):
    """Documents at every degenerate edge: empty, one char, one token,
    11 chars (sub-winnowing-gram), plus one normal doc."""
    d = tmp_path_factory.mktemp("tiny_docs")
    texts = ["", "x", "solo", "elevenchars", "a normal document with many tokens here"]
    rows = {
        "doc_id": list(range(1, len(texts) + 1)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["edge"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(rows), os.path.join(str(d), "documents.parquet"))
    return str(d)


def _oracle_rows(name: str, docs_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(docs_dir, 'documents.parquet')}'"
    )
    return con.execute(registry.ORACLE[name]).fetch_arrow_table().to_pylist()


def test_compression_proxy_survives_one_token_docs(spark, tiny_docs_dir):
    """Pre-guard, a 1-token doc generated i=0 and slice(t, 0, 2) — a
    runtime error. Now: no bigram rows for it, matching the oracle's
    empty range(1, 1)."""
    got = sorted(
        tuple(sorted(x.asDict().items()))
        for x in registry.QUERIES["text_compression_ratio_proxy"](
            spark, tiny_docs_dir
        ).collect()
    )
    want = sorted(
        tuple(sorted(r.items()))
        for r in _oracle_rows("text_compression_ratio_proxy", tiny_docs_dir)
    )
    assert got == want


def test_winnowing_survives_short_docs(spark, tiny_docs_dir):
    """Sub-12-char docs contribute no grams on either engine (the r10
    ADVICE guard); the op must run and agree on the tiny corpus."""
    got = sorted(
        tuple(sorted(x.asDict().items()))
        for x in registry.QUERIES["dedup_winnowing_fingerprint"](
            spark, tiny_docs_dir
        ).collect()
    )
    want = sorted(
        tuple(sorted(r.items()))
        for r in _oracle_rows("dedup_winnowing_fingerprint", tiny_docs_dir)
    )
    assert got == want

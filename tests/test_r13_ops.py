"""Invariant tests for the r13 ops: DSIR importance weighting and
SemDeDup pruning — each recomputed manually in plain Python from the
sf0.001 parquet and compared exactly (integers) or to the ln-drift
tolerance (the one rounded double)."""

from __future__ import annotations

import hashlib
import math
import os
import re
import sys
from collections import Counter

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_B = 64
_TARGET = "src0"
_TAU_MU = 400_000
_CELLS = 8


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    # regex split like BOTH engines (the test_r12b_ops convention)
    return [(i, re.split(r"\s+", t.strip()), s) for i, t, s in rows]


def _bucket(tok: str) -> int:
    h = hashlib.md5(tok.encode()).hexdigest()
    return (int(h[0], 16) * 16 + int(h[1], 16)) % _B


def test_dsir_importance_matches_manual(spark):
    from spark_ibm_mq_spark.operators.pipeline import pipeline_dsir_importance

    docs = _docs()
    db: dict[int, Counter] = {}
    src = {}
    tgt: Counter = Counter()
    raw: Counter = Counter()
    for doc_id, toks, source in docs:
        c = Counter(_bucket(t) for t in toks)
        db[doc_id] = c
        src[doc_id] = source
        raw.update(c)
        if source == _TARGET:
            tgt.update(c)
    tt, tr = sum(tgt.values()), sum(raw.values())
    expect = {}
    for doc_id, c in db.items():
        logw = sum(
            n
            * math.log(
                ((tgt.get(b, 0) + 1) * 1.0 * (tr + _B))
                / ((tt + _B) * 1.0 * (raw[b] + 1))
            )
            for b, n in c.items()
        )
        expect[doc_id] = (sum(c.values()), logw)
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["dsir_logw"])
        for r in pipeline_dsir_importance(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for doc_id, (n_tokens, logw) in expect.items():
        g_src, g_n, g_lw = got[doc_id]
        assert g_src == src[doc_id]
        assert g_n == n_tokens
        # ln drifts <= 1 ulp per bucket term; the sum stays far inside
        # the half-unit of the round(4) both sides apply
        assert abs(g_lw - round(logw, 4)) <= 1.1e-4, (doc_id, g_lw, logw)
    # the importance weight must, on average, favor the target domain
    # over the rest of the corpus — that is the entire point of DSIR
    t_scores = [got[i][2] for i in got if src[i] == _TARGET]
    o_scores = [got[i][2] for i in got if src[i] != _TARGET]
    assert sum(t_scores) / len(t_scores) > sum(o_scores) / len(o_scores)


def _units():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    units = {}
    for vec_id, emb in rows:
        ed = [float(x) for x in emb]
        s = 0.0
        for x in ed:  # sequential fold, like both engines
            s += x * x
        nrm = math.sqrt(s)
        units[vec_id] = [x / nrm for x in ed]
    return units


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):  # sequential left fold, like both engines
        s += x * y
    return s


def test_semdedup_prune_matches_manual(spark):
    from spark_ibm_mq_spark.operators.dedup import dedup_semdedup_prune

    units = _units()
    cent_ids = sorted(units)[:_CELLS]
    assign = {}
    cent_mu = {}
    for v, u in units.items():
        best = max(
            cent_ids,
            key=lambda c: (math.floor(_dot(u, units[c]) * 1e6), -c),
        )
        assign[v] = best
        cent_mu[v] = math.floor(_dot(u, units[best]) * 1e6)
    cells: dict[int, list[int]] = {}
    for v, c in assign.items():
        cells.setdefault(c, []).append(v)
    pruned = set()
    gated: dict[int, list[tuple[int, int]]] = {}
    for c, members in cells.items():
        for a in members:
            for b in members:
                if a == b:
                    continue
                if math.floor(_dot(units[a], units[b]) * 1e6) < _TAU_MU:
                    continue
                gated.setdefault(c, []).append((a, b))
                if cent_mu[b] < cent_mu[a] or (
                    cent_mu[b] == cent_mu[a] and b < a
                ):
                    pruned.add(a)
    got = {
        r["vec_id"]: (r["cell"], r["cent_mu"], r["pruned"])
        for r in dedup_semdedup_prune(spark, SF_DIR).collect()
    }
    assert set(got) == set(units)
    for v in units:
        assert got[v] == (assign[v], cent_mu[v], int(v in pruned)), v
    # the keep rule's survivor guarantee: every cell that has ANY gated
    # pair keeps at least one endpoint (its least-central gated member
    # dominates nobody's pruning of it)
    for c, pairs in gated.items():
        endpoints = {x for p in pairs for x in p}
        assert any(v not in pruned for v in endpoints), c
    # and the fixture must actually exercise pruning
    assert pruned, "fixture produced no near-dup pairs; gate untested"


def test_stream_temperature_mixture_equals_batch(spark):
    """The IVM guarantee, driven: the streaming twin's final state must
    equal the one-shot batch computation row-for-row (r16 registration;
    the count monoid is (source, n_docs) — trivially associative — and
    the q_i ∝ p_i^α derivation is shared code, so any divergence here
    means a scaffold commit-discipline bug, not a math bug)."""
    from spark_ibm_mq_spark.operators.pipeline import (
        pipeline_temperature_mixture,
    )
    from spark_ibm_mq_spark.operators.streaming_analytics import (
        stream_temperature_mixture_update,
    )

    batch = sorted(
        map(tuple, pipeline_temperature_mixture(spark, SF_DIR).collect())
    )
    stream = sorted(
        map(tuple, stream_temperature_mixture_update(spark, SF_DIR).collect())
    )
    assert batch == stream and len(batch) > 0


def test_stream_dsir_equals_batch(spark):
    """The IVM guarantee, driven: the streaming twin's final state must
    equal the one-shot batch computation row-for-row."""
    from spark_ibm_mq_spark.operators.pipeline import pipeline_dsir_importance
    from spark_ibm_mq_spark.operators.streaming_analytics import (
        stream_dsir_model_update,
    )

    batch = sorted(
        map(tuple, pipeline_dsir_importance(spark, SF_DIR).collect())
    )
    stream = sorted(
        map(tuple, stream_dsir_model_update(spark, SF_DIR).collect())
    )
    assert batch == stream and len(batch) > 0

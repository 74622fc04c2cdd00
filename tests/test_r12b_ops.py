"""Invariant tests for the r12 continuation ops: line-level dedup,
boundary overlap, OOV rate, MATTR diversity — each recomputed manually in
plain Python from the sf0.001 parquet and compared exactly.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_LINE_W = 10
_K_MIN, _K_MAX = 2, 6
_DF_CAP = 64
_VOCAB_K = 20
_MATTR_W = 25


def _docs():
    import re

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    # regex split like BOTH engines, not str.split(): on an empty or
    # whitespace-only text the engines' split yields [''] (one empty
    # token) where str.split() yields [] — the manual recompute must
    # diverge with the engines on that edge, not silently differ
    return [(i, re.split(r"\s+", t.strip()), s) for i, t, s in rows]


def test_line_level_matches_manual(spark):
    from spark_ibm_mq_spark.operators.dedup import dedup_line_level

    docs = _docs()
    seen: set[str] = set()
    expect = {}
    for doc_id, toks, _ in docs:  # doc_id ascending = global first-occurrence
        n_chunks = kept_chunks = n_tokens = kept_tokens = 0
        for i in range(0, len(toks), _LINE_W):
            chunk = toks[i : i + _LINE_W]
            line = " ".join(chunk)
            n_chunks += 1
            n_tokens += len(chunk)
            if line not in seen:
                seen.add(line)
                kept_chunks += 1
                kept_tokens += len(chunk)
        expect[doc_id] = (
            n_chunks,
            kept_chunks,
            n_tokens,
            kept_tokens,
            round(kept_tokens / n_tokens, 4),
        )
    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["kept_chunks"],
            r["n_tokens"],
            r["kept_tokens"],
            r["kept_ratio"],
        )
        for r in dedup_line_level(spark, SF_DIR).collect()
    }
    assert got == expect
    # every distinct line is kept at exactly one site
    assert sum(v[1] for v in got.values()) == len(seen)


def test_boundary_overlap_matches_manual(spark):
    from spark_ibm_mq_spark.operators.dedup import dedup_boundary_overlap

    docs = _docs()
    expect: dict[tuple[int, int], int] = {}
    for k in range(_K_MIN, _K_MAX + 1):
        heads: dict[str, list[int]] = {}
        for doc_id, toks, _ in docs:
            if len(toks) >= k:
                heads.setdefault(" ".join(toks[:k]), []).append(doc_id)
        for doc_id, toks, _ in docs:
            if len(toks) < k:
                continue
            g = " ".join(toks[-k:])
            if len(heads.get(g, ())) > _DF_CAP:
                continue
            for b in heads.get(g, ()):
                if b != doc_id:
                    key = (doc_id, b)
                    expect[key] = max(expect.get(key, 0), k)
    got = {
        (r["doc_a"], r["doc_b"]): r["max_overlap"]
        for r in dedup_boundary_overlap(spark, SF_DIR).collect()
    }
    assert got == expect
    assert got, "fixture should contain at least one boundary joint"


def test_oov_rate_matches_manual(spark):
    from spark_ibm_mq_spark.operators.text_analysis import text_oov_rate

    docs = _docs()
    freq: Counter[str] = Counter()
    per_source: dict[str, Counter[str]] = {}
    for _, toks, source in docs:
        freq.update(toks)
        per_source.setdefault(source, Counter()).update(toks)
    vocab = {
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB_K]
    }
    expect = {}
    for source, cnt in per_source.items():
        n = sum(cnt.values())
        oov = sum(c for t, c in cnt.items() if t not in vocab)
        expect[source] = (n, oov, round(oov / n, 4))
    got = {
        r["source"]: (r["n_tokens"], r["oov_tokens"], r["oov_rate"])
        for r in text_oov_rate(spark, SF_DIR).collect()
    }
    assert got == expect
    # the 31-word fixture vocabulary leaves genuine OOV mass past top-20
    assert any(v[1] > 0 for v in got.values())


def test_mattr_matches_manual(spark):
    from spark_ibm_mq_spark.operators.text_analysis import (
        text_mattr_diversity,
    )

    docs = _docs()
    expect = {}
    for doc_id, toks, _ in docs:
        n = len(toks)
        m = max(n - _MATTR_W + 1, 1)
        dsum = sum(
            len(set(toks[i : i + _MATTR_W])) for i in range(m)
        )
        w_eff = min(n, _MATTR_W)
        mattr = ((dsum * 20000 + w_eff * m) // (2 * w_eff * m)) / 10000.0
        expect[doc_id] = (n, mattr)
    got = {
        r["doc_id"]: (r["n_tokens"], r["mattr"])
        for r in text_mattr_diversity(spark, SF_DIR).collect()
    }
    assert got == expect
    # MATTR is a ratio of distinct-to-window-size: bounded (0, 1]
    assert all(0 < v[1] <= 1 for v in got.values())


def test_mattr_next_occurrence_closed_form_property():
    """The Spark side computes dsum via the next-occurrence closed form;
    prove it equals the definitional window sweep over random corpora
    (pure Python — validates the formula itself, independent of engines)."""
    import random

    rng = random.Random(12)

    def brute(toks, w):
        n = len(toks)
        if n < w:
            return len(set(toks))
        return sum(len(set(toks[i : i + w])) for i in range(n - w + 1))

    def closed(toks, w):
        n = len(toks)
        if n < w:
            return len(set(toks))
        m = n - w + 1
        nxt, last = [0] * n, {}
        for j in range(n - 1, -1, -1):
            nxt[j] = last.get(toks[j], n + 1)
            last[toks[j]] = j + 1
        return sum(
            max(0, min(j, m, nxt[j - 1] - w) - max(1, j - w + 1) + 1)
            for j in range(1, n + 1)
        )

    for _ in range(500):
        n = rng.randint(1, 80)
        w = rng.choice([2, 3, 5, 25])
        toks = [rng.choice("abcdefgh") for _ in range(n)]
        assert brute(toks, w) == closed(toks, w)


def test_packed_argmax_key_matches_explicit_ordering():
    """emb_hard_negative_mining packs its pick order into
    (sim_mu + 1e6 + 1) * 2^40 + (2^40 - 1 - cand) so the argmax stays a
    hash-aggregable bigint max; prove over random inputs that max(key)
    selects exactly the row an explicit (sim_mu DESC, cand ASC) sort
    would, and that the decode round-trips. The sample range includes
    sim_mu = -1_000_001 — reachable when the double dot of antipodal
    unit vectors rounds just below -1 — where the old +1e6 offset
    produced a NEGATIVE key whose truncate-toward-zero DIV/% decode was
    wrong (ADVICE r12)."""
    import random

    rng = random.Random(7)
    m = 1 << 40
    off = 1_000_001
    for _ in range(2000):
        rows = [
            (rng.randint(-1_000_001, 1_000_000), rng.randint(0, 10_000))
            for _ in range(rng.randint(1, 30))
        ]
        keys = [(s + off) * m + (m - 1 - c) for s, c in rows]
        best = max(keys)
        dec = (best // m - off, m - 1 - best % m)
        expect = sorted(rows, key=lambda r: (-r[0], r[1]))[0]
        assert dec == expect
        assert 0 <= best < 2**63
    # the exact regression case from ADVICE r12: (-1_000_001, 5) must
    # round-trip under a truncate-toward-zero DIV/%, which it only does
    # with a nonnegative key.
    s_mu, cand = -1_000_001, 5
    k = (s_mu + off) * m + (m - 1 - cand)
    assert k >= 0

    def _trunc_div(a, b):  # Spark DIV semantics (truncate toward zero)
        q = abs(a) // b
        return q if a >= 0 else -q

    def _trunc_mod(a, b):  # Spark % semantics (sign follows dividend)
        r = abs(a) % b
        return r if a >= 0 else -r

    assert (_trunc_div(k, m) - off, m - 1 - _trunc_mod(k, m)) == (s_mu, cand)
    # and the OLD offset demonstrably mis-decoded it:
    k_old = (s_mu + 1_000_000) * m + (m - 1 - cand)
    assert (
        _trunc_div(k_old, m) - 1_000_000,
        m - 1 - _trunc_mod(k_old, m),
    ) != (s_mu, cand)


def test_line_pack_guard_raises_out_of_envelope(spark):
    """ADVICE r13 #1: the packed first-occurrence key silently elects the
    wrong winner if idx >= 2^20 or doc_id is negative/>= 2^43 — the bound
    must be ENFORCED, not a docstring audit. In-bounds rows pack exactly;
    any out-of-envelope row raises instead of mis-deduping."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from spark_ibm_mq_spark.operators.dedup import (
        _LINE_IDX_M,
        _guarded_line_pack,
    )

    def pack(doc_id, idx):
        df = spark.createDataFrame(
            [(doc_id, idx)], "doc_id bigint, idx int"
        ).select(_guarded_line_pack(F.col("doc_id"), F.col("idx")).alias("pk"))
        return df.collect()[0]["pk"]

    # in-bounds: exact pack/decode round-trip at the envelope edges
    assert pack(0, 0) == 0
    assert pack(7, 3) == 7 * _LINE_IDX_M + 3
    top = (1 << 43) - 1
    assert pack(top, _LINE_IDX_M - 1) == top * _LINE_IDX_M + _LINE_IDX_M - 1
    # out-of-envelope rows fail loudly (raise_error surfaces as a JVM
    # exception through the collect), never decode to a wrong winner
    for bad in [(-1, 0), (1 << 43, 0), (5, _LINE_IDX_M), (5, -1)]:
        with pytest.raises(Exception) as exc:
            pack(*bad)
        assert "packed-key envelope" in str(exc.value)
    # ADVICE r14 #1: NULL inputs hit the same otherwise-arm (pre-guard
    # they were silently IGNORED by the min() aggregate — a possibly
    # wrong winner) and the diagnostic now names the NULL case
    for bad in [(None, 0), (5, None), (None, None)]:
        with pytest.raises(Exception) as exc:
            pack(*bad)
        assert "is NULL or outside" in str(exc.value)


def test_hn_pack_guard_raises_out_of_envelope(spark):
    """The hard-negative packed-argmax envelope (sim_mu in [-1_000_001,
    1_000_000], cand in [0, 2^40)) is enforced the same way as the
    line-level pack: in-bounds rows pack exactly (and still decode via
    truncate-toward-zero DIV/%), out-of-envelope rows raise instead of
    bleeding into the sim_mu field and electing the wrong winner."""
    import pytest

    from spark_ibm_mq_spark.operators.similarity import (
        _HN_PACK_M,
        _guarded_hn_key,
    )

    def pack(sim_mu, cand):
        df = spark.createDataFrame(
            [(sim_mu, cand)], "sim_mu bigint, cand bigint"
        ).select(_guarded_hn_key(F.col("sim_mu"), F.col("cand")).alias("k"))
        return df.collect()[0]["k"]

    off = 1_000_001
    # envelope corners round-trip exactly
    for s_mu, cand in [
        (-1_000_001, 0),
        (-1_000_001, 5),
        (1_000_000, _HN_PACK_M - 1),
        (0, 12345),
    ]:
        k = pack(s_mu, cand)
        assert k == (s_mu + off) * _HN_PACK_M + (_HN_PACK_M - 1 - cand)
        assert k >= 0
        assert (k // _HN_PACK_M - off, _HN_PACK_M - 1 - k % _HN_PACK_M) == (
            s_mu,
            cand,
        )
    # out-of-envelope raises loudly
    for bad in [
        (-1_000_002, 0),
        (1_000_001, 0),
        (0, -1),
        (0, _HN_PACK_M),
    ]:
        with pytest.raises(Exception) as exc:
            pack(*bad)
        assert "packed-argmax envelope" in str(exc.value)
    # ADVICE r14 #1: NULLs raise with a diagnostic that names the case
    for bad in [(None, 0), (0, None)]:
        with pytest.raises(Exception) as exc:
            pack(*bad)
        assert "is NULL or outside" in str(exc.value)

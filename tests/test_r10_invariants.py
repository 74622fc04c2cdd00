"""Independent numpy/pure-Python replays of the r10 operators. Oracle
parity proves Spark == DuckDB; these tests prove both equal the TEXTBOOK
definition computed a third way (the r7 water-filling lesson: two engines
can share the same wrong formula)."""

from __future__ import annotations

import hashlib
import math
import os
from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _read(name):
    return pq.read_table(os.path.join(SF_DIR, f"{name}.parquet")).to_pylist()


def test_stochastic_oscillator_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.windows import win_stochastic_oscillator

    daily = defaultdict(int)
    for r in _read("orders"):
        daily[r["o_orderdate"].date()] += int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    days = sorted(daily)
    rev = np.array([daily[d] for d in days], dtype=np.int64)
    got = {r["d"]: r for r in win_stochastic_oscillator(spark, SF_DIR).collect()}
    assert len(got) == max(len(days) - 15, 0)
    k_mu = {}
    for i in range(13, len(days)):
        lo = rev[i - 13 : i + 1].min()
        hi = rev[i - 13 : i + 1].max()
        k_mu[i] = (
            50_000_000
            if hi == lo
            else (int(rev[i] - lo) * 100_000_000) // int(hi - lo)
        )
    for i in range(15, len(days)):
        row = got[days[i]]
        # %K is the textbook (C - L14)/(H14 - L14) placement
        assert abs(row["pct_k"] - k_mu[i] / 1e6) < 5e-4
        # %D is the 3-period mean of %K
        want_d = (k_mu[i] + k_mu[i - 1] + k_mu[i - 2]) / 3e6
        assert abs(row["pct_d"] - want_d) < 5e-4


def test_hill_tail_index_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.aggregations import agg_hill_tail_index

    cents = sorted(
        (int(math.floor(r["o_totalprice"] * 100 + 0.5)) for r in _read("orders")),
        reverse=True,
    )
    top, ref = cents[:100], cents[100]
    want_gamma = sum(math.log(c / ref) for c in top) / 100
    row = agg_hill_tail_index(spark, SF_DIR).collect()[0]
    assert row["k"] == 100
    assert abs(row["threshold_price"] - ref / 100.0) < 1e-6
    assert abs(row["hill_gamma"] - want_gamma) < 5e-4
    assert abs(row["tail_alpha"] - 1.0 / want_gamma) < 5e-3


def test_asof_nearest_matches_bruteforce(spark):
    from spark_ibm_mq_spark.operators.joins import join_asof_nearest

    ev = _read("events")
    clicks = defaultdict(list)
    for r in ev:
        if r["event_type"] == "click":
            clicks[r["user_id"]].append((r["ts"], r["event_id"]))
    got = {r["p_id"]: r for r in join_asof_nearest(spark, SF_DIR).collect()}
    n_expected = 0
    for r in ev:
        if r["event_type"] != "purchase" or not clicks.get(r["user_id"]):
            continue
        n_expected += 1
        # brute force: min |gap|, ties backward, then the stated id order
        def key(c):
            gap = abs((c[0] - r["ts"]).total_seconds())
            backward = c[0] <= r["ts"]
            return (gap, 0 if backward else 1, -c[1] if backward else c[1])

        best = min(clicks[r["user_id"]], key=key)
        row = got[r["event_id"]]
        assert row["c_id"] == best[1], (r["event_id"], row["c_id"], best)
        assert row["direction"] == ("backward" if best[0] <= r["ts"] else "forward")
        assert (
            abs(row["gap_s"] - abs((best[0] - r["ts"]).total_seconds())) < 1e-3
        )
    assert len(got) == n_expected


def test_profile_columns_matches_python(spark):
    from spark_ibm_mq_spark.operators.pipeline import pipeline_profile_columns

    orders = _read("orders")
    got = {r["col_name"]: r for r in pipeline_profile_columns(spark, SF_DIR).collect()}
    assert set(got) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    for col in ("o_orderstatus", "o_orderpriority"):
        vals = [r[col] for r in orders if r[col] is not None]
        assert got[col]["n_rows"] == len(orders)
        assert got[col]["n_distinct"] == len(set(vals))
        assert got[col]["min_str"] == min(vals)
        assert got[col]["max_str"] == max(vals)
        assert got[col]["min_num"] is None
    tp = got["o_totalprice"]
    vals = [r["o_totalprice"] for r in orders]
    assert tp["min_num"] == min(vals) and tp["max_num"] == max(vals)
    assert tp["n_distinct"] == len(set(vals))


def test_bot_score_cv_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.events_analytics import events_bot_score

    ev = sorted(_read("events"), key=lambda r: (r["ts"], r["event_id"]))
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append(r)
    rows = events_bot_score(spark, SF_DIR).collect()
    assert rows, "expected at least one user with >= 10 events"
    for row in rows:
        evs = per_user[row["user_id"]]
        assert row["n_events"] == len(evs) >= 10
        secs = np.array(
            [int(e["ts"].timestamp()) for e in evs], dtype=np.int64
        )
        gaps = np.diff(secs)
        assert abs(row["mean_gap_s"] - gaps.mean()) < 5e-4
        if gaps.sum() > 0:
            cv = gaps.std() / gaps.mean()  # population std: the CV definition
            assert abs(row["gap_cv"] - cv) < 5e-4
        assert row["night_events"] == sum(1 for e in evs if e["ts"].hour <= 5)
        per_min = Counter(int(s // 60) for s in secs)
        assert row["max_per_min"] == max(per_min.values())


def test_good_turing_matches_python(spark):
    from spark_ibm_mq_spark.operators.text_analysis import (
        text_good_turing_smoothing,
    )

    big = Counter()
    for r in _read("documents"):
        toks = r["text"].strip().split()
        big.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    coc = Counter(big.values())
    n_total = sum(big.values())
    got = {r["r"]: r for r in text_good_turing_smoothing(spark, SF_DIR).collect()}
    assert set(got) == {r for r in coc if r <= 10}
    for r, row in got.items():
        assert row["n_r"] == coc[r]
        assert row["n_r_next"] == coc.get(r + 1, 0)
        want = (r + 1) * coc.get(r + 1, 0) / coc[r]
        assert abs(row["r_star"] - want) < 5e-4
        assert abs(row["raw_mass"] - r * coc[r] / n_total) < 5e-4


def test_edit_distance_matches_python_dp(spark):
    from spark_ibm_mq_spark.operators.dedup import dedup_edit_distance_parts

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = Counter(r["p_name"] for r in _read("part"))
    want = {}
    cat = sorted(names)
    for i, a in enumerate(cat):
        for b in cat[i + 1 :]:
            if a.split()[-1] != b.split()[-1] or abs(len(a) - len(b)) > 2:
                continue
            d = lev(a, b)
            if d <= 3:
                want[(a, b)] = d
    rows = dedup_edit_distance_parts(spark, SF_DIR).collect()
    got = {(r["a_name"], r["b_name"]): r for r in rows}
    assert set(got) == set(want)
    for k, r in got.items():
        assert r["edit_dist"] == want[k]
        assert r["a_parts"] == names[k[0]] and r["b_parts"] == names[k[1]]


def test_jl_projection_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.similarity import (
        _JL_DIM,
        _JL_K,
        _JL_SIGNS,
        emb_random_projection_jl,
    )

    signs = np.array(_JL_SIGNS, dtype=np.int64)
    assert signs.shape == (_JL_K, _JL_DIM)
    # the sign matrix is the documented md5 derivation
    for j in (0, _JL_K - 1):
        for i in (0, 31, _JL_DIM - 1):
            h = int(hashlib.md5(f"jl{j}:{i}".encode()).hexdigest()[0], 16)
            assert signs[j][i] == (1 if h % 2 == 0 else -1)
    emb = _read("embeddings")
    got = {r["vec_id"]: r for r in emb_random_projection_jl(spark, SF_DIR).collect()}
    assert len(got) == len(emb)
    for r in emb[:25]:
        q = np.array(
            [int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]],
            dtype=np.int64,
        )
        y = signs @ q
        row = got[r["vec_id"]]
        assert row["norm2_q"] == int((q * q).sum())
        assert row["norm2_proj"] == int((y * y).sum())
        assert abs(
            row["norm_ratio"] - (y * y).sum() / (_JL_K * (q * q).sum())
        ) < 5e-4


def test_winnowing_matches_python(spark):
    from spark_ibm_mq_spark.operators.dedup import dedup_winnowing_fingerprint

    K, W, DF_CAP, MIN_SHARED = 12, 8, 20, 5

    def fingerprints(text: str) -> set[str]:
        grams = [
            hashlib.md5(text[i : i + K].encode()).hexdigest()
            for i in range(len(text) - K + 1)
        ]
        return {
            min(grams[i : i + W]) for i in range(len(grams) - W + 1)
        } if len(grams) >= W else set()

    docs = {r["doc_id"]: fingerprints(r["text"]) for r in _read("documents")}
    df = Counter(fp for fps in docs.values() for fp in fps)
    want = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = sum(
                1 for fp in docs[a] & docs[b] if df[fp] <= DF_CAP
            )
            if shared >= MIN_SHARED:
                want[(a, b)] = shared
    rows = dedup_winnowing_fingerprint(spark, SF_DIR).collect()
    got = {(r["a_id"], r["b_id"]): r["shared_fps"] for r in rows}
    assert got == want
    # the winnowing guarantee: two docs sharing a >= K+W-1 char run of
    # text must share at least one fingerprint (before the df cap)
    texts = {r["doc_id"]: r["text"] for r in _read("documents")}
    probe = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 : i + 4]:
            ta, tb = texts[a], texts[b]
            run = next(
                (
                    ta[s : s + K + W - 1]
                    for s in range(len(ta) - (K + W - 1) + 1)
                    if ta[s : s + K + W - 1] in tb
                ),
                None,
            )
            if run is not None:
                assert docs[a] & docs[b], (a, b)
                probe += 1
    # the fixture corpus repeats heavily; the guarantee must actually fire
    assert probe > 0


def test_kcore_peel_matches_python(spark):
    from spark_ibm_mq_spark.operators.graph_analytics import graph_kcore_peel

    baskets = defaultdict(set)
    for r in _read("lineitem"):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in baskets.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    deg_sum = sum(len(v) for v in adj.values())
    k = 3 * deg_sum // (4 * len(adj)) + 1
    active = {n for n, nb in adj.items() if len(nb) >= k}
    for _ in range(2):
        active = {
            n for n in active if len(adj[n] & active) >= k
        }
    want = {n: len(adj[n] & active) for n in active if len(adj[n] & active) > 0}
    rows = graph_kcore_peel(spark, SF_DIR).collect()
    got = {r["part"]: r for r in rows}
    assert {n: r["deg_in_core"] for n, r in got.items()} == want
    for r in rows:
        assert r["k"] == k


def test_funnel_time_bound_matches_python(spark):
    from spark_ibm_mq_spark.operators.events_analytics import (
        events_funnel_time_bound,
    )

    ev = _read("events")
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    want = {}
    for uid, evs in by_user.items():
        views = [e["ts"] for e in evs if e["event_type"] == "view"]
        if not views:
            continue
        v = min(views)
        clicks = [
            e["ts"]
            for e in evs
            if e["event_type"] == "click"
            and v <= e["ts"]
            and (e["ts"] - v).total_seconds() <= 3600
        ]
        c = min(clicks) if clicks else None
        p = None
        if c is not None:
            buys = [
                e["ts"]
                for e in evs
                if e["event_type"] == "purchase"
                and c <= e["ts"]
                and (e["ts"] - c).total_seconds() <= 86400
            ]
            p = min(buys) if buys else None
        want[uid] = (v, c, p, 3 if p else (2 if c else 1))
    rows = events_funnel_time_bound(spark, SF_DIR).collect()
    got = {
        r["user_id"]: (r["view_ts"], r["click_ts"], r["purchase_ts"], r["stage"])
        for r in rows
    }
    assert got == want and got


def test_cusum_matches_sequential_recursion(spark):
    """The Lindley prefix-min linearization must equal the textbook
    sequential S_i = max(0, S_{i-1} + (x_i - mu - k)) recursion."""
    from spark_ibm_mq_spark.operators.events_analytics import (
        events_changepoint_cusum,
    )

    daily = Counter(r["ts"].date() for r in _read("events"))
    days = sorted(daily)
    xs = [daily[d] for d in days]
    mu = sum(xs) // len(xs)
    k = max(mu // 20, 1)
    s, want = 0, {}
    for d, x in zip(days, xs):
        s = max(0, s + (x - mu - k))
        want[d] = (x, s, 1 if s > 5 * k else 0)
    got = {
        r["d"]: (r["x"], r["cusum"], r["drift_alarm"])
        for r in events_changepoint_cusum(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_parkinson_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.windows import win_parkinson_volatility

    hi, lo = {}, {}
    for r in _read("orders"):
        d = r["o_orderdate"].date()
        c = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        hi[d] = max(hi.get(d, c), c)
        lo[d] = min(lo.get(d, c), c)
    days = sorted(hi)
    terms = [math.log(hi[d] / lo[d]) ** 2 for d in days]
    got = {r["d"]: r for r in win_parkinson_volatility(spark, SF_DIR).collect()}
    assert len(got) == max(len(days) - 13, 0)
    for i in range(13, len(days)):
        want = math.sqrt(sum(terms[i - 13 : i + 1]) / (4 * math.log(2) * 14))
        row = got[days[i]]
        assert abs(row["parkinson_sigma"] - want) < 5e-4
        assert row["day_high"] == round(hi[days[i]] / 100.0, 4)


def test_bfs_hops_matches_python(spark):
    from spark_ibm_mq_spark.operators.graph_analytics import graph_bfs_hops

    baskets = defaultdict(set)
    for r in _read("lineitem"):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in baskets.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    seeds = sorted(adj, key=lambda n: (-len(adj[n]), n))[:5]
    dist = {n: 0 for n in seeds}
    frontier = set(seeds)
    for hop in (1, 2, 3):
        frontier = {
            v for u in frontier for v in adj[u] if v not in dist
        }
        for v in frontier:
            dist[v] = hop
    rows = graph_bfs_hops(spark, SF_DIR).collect()
    got = {r["part"]: r["hops"] for r in rows}
    assert got == dist and got


def test_attribution_linear_matches_python(spark):
    """Linear credit must conserve value up to the documented sub-cent
    truncation, and match an event-by-event replay."""
    from spark_ibm_mq_spark.operators.events_analytics import (
        events_attribution_linear,
    )

    ev = _read("events")
    purchases = [e for e in ev if e["event_type"] == "purchase"]
    touches_by_user = defaultdict(list)
    for e in ev:
        if e["event_type"] != "purchase":
            touches_by_user[e["user_id"]].append(e)
    credits = defaultdict(lambda: [0, 0])  # channel -> [n, micro-units]
    for p in purchases:
        cents = int(math.floor(p["value"] * 100 + 0.5))
        win = [
            t
            for t in touches_by_user.get(p["user_id"], [])
            if t["ts"] < p["ts"]
            and (p["ts"] - t["ts"]).total_seconds() <= 7 * 86400
        ]
        if not win:
            credits["none"][0] += 1
            credits["none"][1] += cents * 10000
            continue
        share = (cents * 10000) // len(win)
        for t in win:
            credits[t["event_type"]][0] += 1
            credits[t["event_type"]][1] += share
    rows = events_attribution_linear(spark, SF_DIR).collect()
    got = {r["channel"]: (r["n_credits"], r["attributed_value"]) for r in rows}
    want = {c: (n, round(u / 1000000.0, 4)) for c, (n, u) in credits.items()}
    assert got == want and got
    # conservation: credited value within n_touches micro-units per purchase
    total_cents = sum(int(math.floor(p["value"] * 100 + 0.5)) for p in purchases)
    credited_u = sum(u for _, u in credits.values())
    assert 0 <= total_cents * 10000 - credited_u < len(ev) * 10000


def test_hard_negative_mining_matches_python(spark):
    """Triplets must match a brute-force in-cell replay: same cell
    assignment, same micro-unit argmax, same half-up display rounding."""
    from spark_ibm_mq_spark.operators.similarity import (
        _HNM_CELLS,
        emb_hard_negative_mining,
    )

    rows = _read("embeddings")
    unit, label = {}, {}
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        unit[r["vec_id"]] = v / math.sqrt(float((v * v).sum()))
        label[r["vec_id"]] = r["label"]
    cents = sorted(unit)[:_HNM_CELLS]
    cell = {}
    for vid, u in unit.items():
        scored = sorted(
            (
                (-int(math.floor(float(np.dot(u, unit[c])) * 1e6)), c)
                for c in cents
            ),
        )
        cell[vid] = scored[0][1]
    by_cell = defaultdict(list)
    for vid, c in cell.items():
        by_cell[c].append(vid)
    want = {}
    for vid, u in unit.items():
        cands = [o for o in by_cell[cell[vid]] if o != vid]
        pos = [
            (-int(math.floor(float(np.dot(u, unit[o])) * 1e6)), o)
            for o in cands
            if label[o] == label[vid]
        ]
        neg = [
            (-int(math.floor(float(np.dot(u, unit[o])) * 1e6)), o)
            for o in cands
            if label[o] != label[vid]
        ]
        if not pos or not neg:
            continue
        pmu, pid = min(pos)
        nmu, nid = min(neg)
        r4 = lambda mu: math.floor((mu + 50) / 100.0) / 10000.0
        want[vid] = (
            label[vid],
            pid,
            round(r4(-pmu), 4),
            nid,
            round(r4(-nmu), 4),
            round(r4(-pmu - (-nmu)), 4),
        )
    got = {
        r["anchor"]: (
            r["label"],
            r["pos_id"],
            r["pos_sim"],
            r["neg_id"],
            r["neg_sim"],
            r["margin"],
        )
        for r in emb_hard_negative_mining(spark, SF_DIR).collect()
    }
    assert got == want and got


def test_mutual_information_matches_python(spark):
    """MI table must match an event-by-event replay, and the quantized
    total must be non-negative (information inequality) and equal the
    replay's per-term quantized sum."""
    from spark_ibm_mq_spark.operators.aggregations import agg_mutual_information

    cells = Counter()
    for r in _read("events"):
        cells[(r["event_type"], r["ts"].hour)] += 1
    n = sum(cells.values())
    n_t, n_h = Counter(), Counter()
    for (t, h), c in cells.items():
        n_t[t] += c
        n_h[h] += c
    want, total_mu = {}, 0
    for (t, h), c in cells.items():
        # mirror the engines' double-product order (overflow-safe form):
        # (n_th * 1.0 * n) / (n_t * 1.0 * n_h), not exact-int then divide
        ratio = (float(c) * float(n)) / (float(n_t[t]) * float(n_h[h]))
        mu = int(math.floor(c * math.log(ratio) * 1000000 / n + 0.5))
        total_mu += mu
        want[(t, h)] = (c, round(math.log(ratio), 4), round(mu / 1000000.0, 4))
    rows = agg_mutual_information(spark, SF_DIR).collect()
    got = {
        (r["event_type"], r["hour_of_day"]): (r["n_th"], r["pmi"], r["mi_contrib"])
        for r in rows
    }
    assert got == want and got
    assert {r["mi_total"] for r in rows} == {round(total_mu / 1000000.0, 4)}
    assert total_mu >= -len(cells)  # I(T;H) >= 0 up to per-term quantization


def test_cdc_chunking_matches_python(spark):
    """Chunk cuts, pair counts, and Jaccard must match a hashlib replay;
    the replay also asserts the partition property (chunks concatenate
    back to the document)."""
    from spark_ibm_mq_spark.operators.dedup import dedup_cdc_chunking

    docch = {}
    for r in _read("documents"):
        text = r["text"]
        bounds = [
            i
            for i in range(2, max(len(text) - 7, 1) + 1)
            if hashlib.md5(text[i - 1 : i + 7].encode()).hexdigest()[0] == "0"
        ]
        starts = [1] + bounds
        chunks = []
        for j, s in enumerate(starts):
            e = starts[j + 1] - 1 if j + 1 < len(starts) else len(text)
            chunks.append(text[s - 1 : e])
        assert "".join(chunks) == text
        docch[r["doc_id"]] = {
            hashlib.md5(c.encode()).hexdigest() for c in chunks
        }
    df = Counter(ch for chs in docch.values() for ch in chs)
    want = {}
    ids = sorted(docch)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            shared = {
                ch for ch in docch[x] & docch[y] if df[ch] <= 20
            }
            # the op counts shared chunks that pass the df cap on the a-side
            n_shared = len(shared)
            if n_shared >= 2:
                # half-up at 4dp: Spark/DuckDB round() both round .xxxx5
                # up, Python's round() banker's-rounds it down (the chunk
                # Jaccards are dyadic rationals, so boundaries DO occur)
                jac = n_shared / (len(docch[x]) + len(docch[y]) - n_shared)
                want[(x, y)] = (
                    n_shared,
                    math.floor(jac * 10000 + 0.5) / 10000,
                )
    rows = dedup_cdc_chunking(spark, SF_DIR).collect()
    got = {
        (r["a_id"], r["b_id"]): (r["shared_chunks"], r["chunk_jaccard"])
        for r in rows
    }
    assert got == want and got


def test_stream_cusum_equals_batch(spark):
    """The incremental CUSUM's final state must equal the one-shot batch
    detector row-for-row (the IVM guarantee; >=4 merge rounds is
    asserted inside the operator)."""
    from spark_ibm_mq_spark.operators.events_analytics import (
        events_changepoint_cusum,
    )
    from spark_ibm_mq_spark.operators.streaming_analytics import (
        stream_cusum_monitor,
    )

    batch = {
        r["d"]: (r["x"], r["cusum"], r["drift_alarm"])
        for r in events_changepoint_cusum(spark, SF_DIR).collect()
    }
    stream = {
        r["d"]: (r["x"], r["cusum"], r["drift_alarm"])
        for r in stream_cusum_monitor(spark, SF_DIR).collect()
    }
    assert stream == batch and stream


# --- CDC chunking resynchronization property (pure Python + Hypothesis) ---
# The docstring's load-bearing claim: boundaries depend only on LOCAL
# content, so an insertion perturbs the cut set only in the 8-gram
# neighborhood of the edit — everything else re-aligns (shifted by one).
# This is the property that makes CDC dedup survive prepended headers
# where fixed-stride blocking loses every block.

from hypothesis import given, settings
from hypothesis import strategies as st


def _cdc_bounds(text):
    """1-based boundary-gram start positions, the operator's exact rule."""
    return {
        i
        for i in range(2, max(len(text) - 7, 1) + 1)
        if hashlib.md5(text[i - 1 : i + 7].encode()).hexdigest()[0] == "0"
    }


@given(
    text=st.text(alphabet="ab x", min_size=20, max_size=160),
    q=st.integers(min_value=0, max_value=200),
    ch=st.sampled_from("ab x"),
)
@settings(max_examples=200, deadline=None)
def test_cdc_boundary_locality(text, q, ch):
    q = q % (len(text) + 1)  # insertion point in [0, len]
    new = text[:q] + ch + text[q:]
    old_b, new_b = _cdc_bounds(text), _cdc_bounds(new)
    # grams entirely BEFORE the insertion are untouched: b + 6 < q
    assert {b for b in new_b if b < q - 6} == {b for b in old_b if b < q - 6}
    # grams entirely AFTER it re-align shifted by one: old 0-based start
    # b-1 >= q  <->  b >= q+1, capped at each text's own tail limit
    # ... except new position q+2 when it maps to old position 1, which
    # the rule never evaluates (chunk 1 starts there unconditionally)
    old_tail = {b + 1 for b in old_b if b >= q + 1}
    new_tail = {b for b in new_b if b >= max(q + 2, 3)}
    assert new_tail == {b for b in old_tail if b <= len(new) - 7}

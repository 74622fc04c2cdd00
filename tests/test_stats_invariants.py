"""Independent numpy/pure-Python replays of the r8 statistical and graph
operators. Oracle parity proves Spark == DuckDB; these tests prove both
equal the TEXTBOOK definition computed a third way (the r7 water-filling
lesson: two engines can share the same wrong formula)."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _events():
    return pq.read_table(os.path.join(SF_DIR, "events.parquet")).to_pylist()


def _daily_counts():
    c = Counter(r["ts"].date() for r in _events())
    days = sorted(c)
    return days, np.array([c[d] for d in days], dtype=np.int64)


def test_acf_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.events_analytics import events_acf_daily

    _days, x = _daily_counts()
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    got = {r["lag"]: r for r in events_acf_daily(spark, SF_DIR).collect()}
    for k in range(1, 8):
        want = ((x[:-k] - mu) * (x[k:] - mu)).sum() / den
        assert abs(got[k]["acf"] - want) < 5e-5, (k, got[k]["acf"], want)
        assert got[k]["n_pairs"] == len(x) - k


def test_ols_trend_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.aggregations import agg_ols_daily_trend

    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    c = Counter(r["o_orderdate"].date() for r in orders)
    days = sorted(c)
    t = np.array([(d - days[0]).days for d in days], dtype=np.float64)
    y = np.array([c[d] for d in days], dtype=np.float64)
    slope, intercept = np.polyfit(t, y, 1)
    r = np.corrcoef(t, y)[0, 1]
    row = agg_ols_daily_trend(spark, SF_DIR).collect()[0]
    assert abs(row["slope"] - slope) < 5e-4
    assert abs(row["intercept"] - intercept) < 5e-3
    assert abs(row["r_squared"] - r * r) < 5e-4
    assert row["n_days"] == len(days)


def test_rolling_corr_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.windows import win_rolling_corr

    ev = _events()
    clicks = Counter(r["ts"].date() for r in ev if r["event_type"] == "click")
    buys = Counter(r["ts"].date() for r in ev if r["event_type"] == "purchase")
    days = sorted(set(r["ts"].date() for r in ev))
    x = np.array([clicks.get(d, 0) for d in days], dtype=np.float64)
    y = np.array([buys.get(d, 0) for d in days], dtype=np.float64)
    got = {r["d"]: r["rolling_corr"] for r in win_rolling_corr(spark, SF_DIR).collect()}
    checked = 0
    for i in range(13, len(days)):
        xs, ys = x[i - 13 : i + 1], y[i - 13 : i + 1]
        if xs.std() == 0 or ys.std() == 0:
            assert days[i] not in got
            continue
        want = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[days[i]] - want) < 5e-5, (days[i], got[days[i]], want)
        checked += 1
    assert checked == len(got) and checked > 0


def test_survival_km_matches_manual(spark):
    from spark_ibm_mq_spark.operators.events_analytics import events_survival_km

    per_user = defaultdict(list)
    for r in _events():
        per_user[r["user_id"]].append(r)
    durs = []
    for evs in per_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        t0 = evs[0]["ts"].date()
        errs = [r["ts"].date() for r in evs if r["event_type"] == "error"]
        if errs:
            durs.append(((min(errs) - t0).days, 1))
        else:
            durs.append(((evs[-1]["ts"].date() - t0).days, 0))
    rows = events_survival_km(spark, SF_DIR).collect()
    s = 1.0
    manual = {}
    for t in sorted({d for d, e in durs if e == 1}):
        n = sum(1 for d, _ in durs if d >= t)
        dd = sum(1 for d, e in durs if d == t and e == 1)
        s *= 1 - dd / n
        manual[t] = (n, dd, s)
    assert len(rows) == len(manual)
    for r in rows:
        n, dd, s = manual[r["t_days"]]
        assert (r["n_at_risk"], r["n_deaths"]) == (n, dd)
        assert abs(r["survival"] - s) < 5e-5, (r["t_days"], r["survival"], s)


def test_wilson_ci_matches_manual(spark):
    from spark_ibm_mq_spark.operators.events_analytics import (
        events_conversion_wilson_ci,
    )

    for r in events_conversion_wilson_ci(spark, SF_DIR).collect():
        n, k, z = r["n_users"], r["n_converted"], 1.96
        p = k / n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        assert abs(r["ci_low"] - (center - half) / denom) < 5e-5
        assert abs(r["ci_high"] - (center + half) / denom) < 5e-5
        assert 0.0 <= r["ci_low"] <= r["p_hat"] <= r["ci_high"] <= 1.0


def test_winsorized_mean_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.aggregations import agg_winsorized_mean

    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    by_prio = defaultdict(list)
    for r in orders:
        by_prio[r["o_orderpriority"]].append(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    got = {r["priority"]: r for r in agg_winsorized_mean(spark, SF_DIR).collect()}
    for prio, cents in by_prio.items():
        a = np.array(cents, dtype=np.float64)
        lo, hi = np.percentile(a, [5, 95], method="linear")
        want = np.clip(a, lo, hi).mean() / 100.0
        assert abs(got[prio]["winsorized_mean"] - want) < 5e-3, prio
        assert got[prio]["n_clamped"] == int(((a < lo) | (a > hi)).sum())


def test_markov_3step_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.events_analytics import events_markov_3step

    per_user = defaultdict(list)
    for r in _events():
        per_user[r["user_id"]].append(r)
    trans = Counter()
    types = sorted({r["event_type"] for r in _events()})
    idx = {t: i for i, t in enumerate(types)}
    for evs in per_user.values():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for a, b in zip(evs, evs[1:]):
            trans[(a["event_type"], b["event_type"])] += 1
    P = np.zeros((len(types), len(types)))
    for (a, b), n in trans.items():
        P[idx[a], idx[b]] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(types), 1.0 / len(types))
    got = defaultdict(dict)
    for r in events_markov_3step(spark, SF_DIR).collect():
        got[r["step"]][r["event_type"]] = r["prob"]
    for step in (1, 2, 3):
        pi = pi @ P
        for t in types:
            assert abs(got[step][t] - pi[idx[t]]) < 5e-5, (step, t)
        assert abs(sum(got[step].values()) - 1.0) < 5e-3


def test_zipf_fit_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.text_analysis import text_zipf_fit

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    freq = Counter(t for r in docs for t in r["text"].strip().split())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=np.float64))
    y = np.log(np.array([f for _, f in ranked], dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    row = text_zipf_fit(spark, SF_DIR).collect()[0]
    assert row["n_types"] == len(ranked)
    assert abs(row["zipf_slope"] - slope) < 5e-4
    assert abs(row["intercept"] - intercept) < 5e-4
    r = np.corrcoef(x, y)[0, 1]
    assert abs(row["r_squared"] - r * r) < 5e-4


def _knn_graph_sets():
    """Pure-Python rebuild of the top-5 co-purchase graph."""
    li = pq.read_table(
        os.path.join(SF_DIR, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    w = Counter()
    for parts in baskets.values():
        for a in parts:
            for b in parts:
                if a != b:
                    w[(a, b)] += 1
    by_u = defaultdict(list)
    for (u, v), n in w.items():
        by_u[u].append((-n, v))
    adj = defaultdict(set)
    for u, lst in by_u.items():
        for _negn, v in sorted(lst)[:5]:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def test_triangle_count_matches_bruteforce(spark):
    from spark_ibm_mq_spark.operators.graph_analytics import graph_triangle_count

    adj = _knn_graph_sets()
    tri = Counter()
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for wv in common:
                if wv > v:
                    tri[u] += 1
                    tri[v] += 1
                    tri[wv] += 1
    got = {r["part"]: r for r in graph_triangle_count(spark, SF_DIR).collect()}
    assert set(got) == {u for u in nodes if len(adj[u]) >= 2}
    for u, r in got.items():
        assert r["degree"] == len(adj[u])
        assert r["n_triangles"] == tri.get(u, 0), (u, r["n_triangles"], tri.get(u, 0))
        want_cc = 2 * tri.get(u, 0) / (len(adj[u]) * (len(adj[u]) - 1))
        assert abs(r["clustering_coeff"] - want_cc) < 5e-5


def test_spearman_matches_manual(spark):
    from spark_ibm_mq_spark.operators.similarity import emb_metric_rank_correlation

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pylist()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    q = vecs[0]
    ids = sorted(i for i in vecs if i != 0)
    cos_key = {
        i: (-math.floor(float(vecs[i] @ q) / math.sqrt(float(vecs[i] @ vecs[i])) * 1e6), i)
        for i in ids
    }
    euc_key = {i: (math.floor(float(((vecs[i] - q) ** 2).sum()) * 1e6), i) for i in ids}
    r_cos = {i: r + 1 for r, i in enumerate(sorted(ids, key=lambda i: cos_key[i]))}
    r_euc = {i: r + 1 for r, i in enumerate(sorted(ids, key=lambda i: euc_key[i]))}
    n = len(ids)
    sd2 = sum((r_cos[i] - r_euc[i]) ** 2 for i in ids)
    rho = 1 - 6 * sd2 / (n * (n * n - 1))
    row = emb_metric_rank_correlation(spark, SF_DIR).collect()[0]
    assert row["n_vectors"] == n
    assert row["sum_sq_rank_diff"] == sd2
    assert abs(row["spearman_rho"] - rho) < 5e-5


def test_daily_spearman_matches_scipy_formula(spark):
    from spark_ibm_mq_spark.operators.windows import win_spearman_daily

    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    per_day = defaultdict(lambda: [0, 0])
    for r in orders:
        d = r["o_orderdate"].date()
        per_day[d][0] += 1
        per_day[d][1] += math.floor(r["o_totalprice"] * 100 + 0.5)
    days = sorted(per_day)
    n = len(days)
    rx = {d: i + 1 for i, d in enumerate(sorted(days, key=lambda d: (per_day[d][0], d)))}
    ry = {d: i + 1 for i, d in enumerate(sorted(days, key=lambda d: (per_day[d][1], d)))}
    sd2 = sum((rx[d] - ry[d]) ** 2 for d in days)
    rho = 1 - 6 * sd2 / (n * (n * n - 1))
    row = win_spearman_daily(spark, SF_DIR).collect()[0]
    assert row["n_days"] == n
    assert row["sum_d2"] == sd2
    assert abs(row["spearman_rho"] - rho) < 5e-5


def test_mann_kendall_matches_bruteforce(spark):
    from spark_ibm_mq_spark.operators.windows import win_mann_kendall_trend

    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    per_day = Counter()
    for r in orders:
        per_day[r["o_orderdate"].date()] += math.floor(r["o_totalprice"] * 100 + 0.5)
    xs = [per_day[d] for d in sorted(per_day)]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var_s)
    row = win_mann_kendall_trend(spark, SF_DIR).collect()[0]
    assert row["n_days"] == n
    assert row["n_pairs"] == n * (n - 1) // 2
    assert row["s_stat"] == s
    assert abs(row["kendall_tau"] - s / (n * (n - 1) / 2)) < 5e-5
    assert abs(row["z_score"] - z) < 5e-5


def test_theil_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.aggregations import agg_theil_index

    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    rev = Counter()
    for r in orders:
        rev[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100 + 0.5)
    x = np.array([rev[c] for c in sorted(rev)], dtype=np.float64)
    mu = x.mean()
    t = float(np.mean((x / mu) * np.log(x / mu)))
    row = agg_theil_index(spark, SF_DIR).collect()[0]
    assert row["n_customers"] == len(x)
    # micro-unit quantization error per term < 1e-6; textbook value within 1e-4
    assert abs(row["theil_t"] - t) < 1e-4
    # Theil bounds: 0 <= T <= ln n
    assert -1e-9 <= row["theil_t"] <= math.log(len(x))


def test_adamic_adar_matches_bruteforce(spark):
    from spark_ibm_mq_spark.operators.graph_analytics import graph_adamic_adar

    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet")).to_pylist()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    w = Counter()
    for parts in baskets.values():
        for u in parts:
            for v in parts:
                if u != v:
                    w[(u, v)] += 1
    knn = set()
    by_u = defaultdict(list)
    for (u, v), c in w.items():
        by_u[u].append((-c, v))
    for u, lst in by_u.items():
        for _c, v in sorted(lst)[:5]:
            knn.add((u, v))
    sym = knn | {(v, u) for (u, v) in knn}
    nbrs = defaultdict(set)
    for u, v in sym:
        nbrs[u].add(v)
    deg = {u: len(vs) for u, vs in nbrs.items()}
    scores = {}
    for z, vs in nbrs.items():
        for x in vs:
            for y in vs:
                if x < y and (x, y) not in sym:
                    scores.setdefault((x, y), [0, 0])
                    scores[(x, y)][0] += 1
                    scores[(x, y)][1] += math.floor(1e6 / math.log(deg[z]) + 0.5)
    want = sorted(
        ((aa, x, y, com) for (x, y), (com, aa) in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:50]
    got = graph_adamic_adar(spark, SF_DIR).collect()
    assert len(got) == min(50, len(want))
    for row, (aa, x, y, com) in zip(got, want):
        assert (row["part_a"], row["part_b"]) == (x, y)
        assert row["common_neighbors"] == com
        assert abs(row["adamic_adar"] - aa / 1e6) < 5e-5


def test_dimension_variance_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.similarity import (
        emb_dimension_variance_profile,
    )

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pylist()
    mat = np.array([r["embedding"] for r in emb], dtype=np.float64)
    q = np.floor(mat * 1e6 + 0.5)
    got = {r["dim"]: r for r in emb_dimension_variance_profile(spark, SF_DIR).collect()}
    assert set(got) == set(range(1, mat.shape[1] + 1))
    for j in range(mat.shape[1]):
        col = q[:, j]
        assert got[j + 1]["n_vecs"] == len(col)
        assert abs(got[j + 1]["mean"] - col.mean() / 1e6) < 5e-5
        assert abs(got[j + 1]["variance"] - col.var() / 1e12) < 5e-5


def test_phrase_match_matches_python_scan(spark):
    from spark_ibm_mq_spark.operators.retrieval import retrieval_phrase_match

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    want = {}
    for r in docs:
        toks = r["text"].split()
        hits = [i + 1 for i in range(len(toks) - 1)
                if toks[i] == "table" and toks[i + 1] == "hash"]
        if hits:
            want[r["doc_id"]] = (len(hits), hits[0])
    got = {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
           for r in retrieval_phrase_match(spark, SF_DIR).collect()}
    assert got == want


def test_bollinger_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.windows import win_bollinger_bands

    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    per_day = Counter()
    for r in orders:
        per_day[r["o_orderdate"].date()] += math.floor(r["o_totalprice"] * 100 + 0.5)
    days = sorted(per_day)
    xs = np.array([per_day[d] for d in days], dtype=object)  # exact ints
    got = {r["d"]: r for r in win_bollinger_bands(spark, SF_DIR).collect()}
    for i in range(13, len(days)):
        win = xs[i - 13 : i + 1]
        n, s = 14, int(sum(win))
        ss = int(sum(v * v for v in win))
        var_n2 = n * ss - s * s
        mid = s / 100.0 / n
        sd = math.sqrt(var_n2)
        row = got[days[i]]
        assert abs(row["band_mid"] - round(mid, 4)) < 1e-9
        assert abs(row["band_upper"] - round((s + 2 * sd) / n / 100.0, 4)) < 1e-9
        want_out = 1 if (n * int(xs[i]) - s) ** 2 > 4 * var_n2 else 0
        assert row["outside"] == want_out, days[i]


def test_theil_gini_consistency(spark):
    """Theil and Gini must order the same way on the same data: both zero
    iff all customer revenues equal; both positive here."""
    from spark_ibm_mq_spark.operators.aggregations import (
        agg_gini_coefficient,
        agg_theil_index,
    )

    t = agg_theil_index(spark, SF_DIR).collect()[0]["theil_t"]
    g = agg_gini_coefficient(spark, SF_DIR).collect()[0]["gini"]
    assert t > 0 and g > 0


def test_js_divergence_matches_scipy_formula(spark):
    from spark_ibm_mq_spark.operators.text_analysis import (
        text_js_divergence_sources,
    )

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    cnt = defaultdict(Counter)
    for r in docs:
        cnt[r["source"]].update(r["text"].split())
    vocab = sorted({t for c in cnt.values() for t in c})
    got = {(r["source_a"], r["source_b"]): r["js_divergence"]
           for r in text_js_divergence_sources(spark, SF_DIR).collect()}
    srcs = sorted(cnt)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            ta, tb = sum(cnt[sa].values()), sum(cnt[sb].values())
            jsd = 0.0
            for t in vocab:
                p, q = cnt[sa][t] / ta, cnt[sb][t] / tb
                m = (p + q) / 2
                if p > 0:
                    jsd += 0.5 * p * math.log(p / m)
                if q > 0:
                    jsd += 0.5 * q * math.log(q / m)
            assert abs(got[(sa, sb)] - jsd) < 1e-4, (sa, sb)
            assert -1e-9 <= got[(sa, sb)] <= math.log(2) + 1e-9


def test_assortativity_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.graph_analytics import (
        graph_degree_assortativity,
    )

    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet")).to_pylist()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    w = Counter()
    for parts in baskets.values():
        for u in parts:
            for v in parts:
                if u != v:
                    w[(u, v)] += 1
    by_u = defaultdict(list)
    for (u, v), c in w.items():
        by_u[u].append((-c, v))
    knn = {(u, v) for u, lst in by_u.items() for _c, v in sorted(lst)[:5]}
    sym = knn | {(v, u) for (u, v) in knn}
    deg = Counter()
    for u, _v in sym:
        deg[u] += 1
    xs = np.array([deg[u] for u, v in sym], dtype=np.float64)
    ys = np.array([deg[v] for u, v in sym], dtype=np.float64)
    r = np.corrcoef(xs, ys)[0, 1]
    row = graph_degree_assortativity(spark, SF_DIR).collect()[0]
    assert row["n_directed_edges"] == len(sym)
    assert abs(row["assortativity"] - r) < 5e-5


def test_soft_weighting_conserves_mass(spark):
    """Effective docs == n_clusters + n_singletons per corpus; effective
    mass never exceeds raw mass; sources sum to the corpus totals."""
    from spark_ibm_mq_spark.operators.dedup import (
        dedup_cluster_resolve,
        dedup_soft_weighting,
    )

    rows = dedup_soft_weighting(spark, SF_DIR).collect()
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    n_docs = sum(r["n_docs"] for r in rows)
    assert n_docs == len(docs)
    clusters = dedup_cluster_resolve(spark, SF_DIR).collect()
    n_in_clusters = sum(c["n_docs"] for c in clusters)
    want_eff_docs = len(clusters) + (len(docs) - n_in_clusters)
    got_eff = sum(r["effective_docs"] for r in rows)
    # micro-unit floors can undershoot by < 1e-6 per doc
    assert abs(got_eff - want_eff_docs) < 0.01
    for r in rows:
        assert r["effective_tokens"] <= r["raw_tokens"] + 1e-9
        assert r["n_dup_docs"] <= r["n_docs"]


def test_pca_power_iteration_matches_numpy(spark):
    """The integer-quantized power iteration must land near numpy's true
    dominant eigenvector of XtX (uncentered), up to sign and the
    micro-unit quantization the op defines."""
    from spark_ibm_mq_spark.operators.similarity import emb_pca_power_iteration

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pylist()
    X = np.floor(np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6 + 0.5)
    # replay the exact integer chain
    v = np.full(X.shape[1], 125000, dtype=object)
    Xi = X.astype(object)
    for _ in range(3):
        dt = np.array([int(r @ v) // 1000000 for r in Xi], dtype=object)
        w = np.array([int(c @ dt) for c in Xi.T], dtype=object)
        nd = int(math.floor(math.sqrt(float(sum(int(x) * int(x) for x in w))))) // 1000000
        v = np.array([int(x) // nd if x >= 0 else -((-int(x)) // nd) for x in w], dtype=object)
    got = {r["dim"]: r["loading"] for r in emb_pca_power_iteration(spark, SF_DIR).collect()}
    for j in range(X.shape[1]):
        assert abs(got[j + 1] - round(int(v[j]) / 1e6, 4)) < 1e-9, j
    # and each round genuinely climbed: the Rayleigh quotient vAv/vv under
    # A = XtX must be non-decreasing round over round (the power-iteration
    # guarantee that holds regardless of the spectral gap; the fixture's
    # near-isotropic spectrum makes "equals numpy's top eigenvector" an
    # unreachable bar in 3 rounds, so monotone ascent is the right check)
    Xf = X / 1e6
    A = Xf.T @ Xf

    def rq(u):
        u = np.array([float(x) for x in u])
        u = u / np.linalg.norm(u)
        return float(u @ A @ u)

    v_chk = np.full(X.shape[1], 125000, dtype=object)
    rqs = [rq(v_chk)]
    for _ in range(3):
        dt = np.array([int(r @ v_chk) // 1000000 for r in Xi], dtype=object)
        w = np.array([int(c @ dt) for c in Xi.T], dtype=object)
        nd = int(math.floor(math.sqrt(float(sum(int(x) * int(x) for x in w))))) // 1000000
        v_chk = np.array(
            [int(x) // nd if x >= 0 else -((-int(x)) // nd) for x in w], dtype=object
        )
        rqs.append(rq(v_chk))
    assert all(rqs[i + 1] >= rqs[i] - 1e-6 for i in range(3)), rqs
    assert rqs[-1] > rqs[0], rqs


def test_mmr_matches_greedy_replay(spark):
    from spark_ibm_mq_spark.operators.similarity import sim_mmr_rerank

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pylist()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    q = vecs[0]

    def cos_u(a, b):
        return math.floor(
            float(a @ b) / (math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))) * 1e6
        )

    rel = {i: cos_u(vecs[i], q) for i in vecs if i != 0}
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    picked = [min(pool, key=lambda i: (-rel[i], i))]
    for _ in range(4):
        rest = [i for i in pool if i not in picked]
        scores = {}
        for c in rest:
            ms = max(cos_u(vecs[c], vecs[s]) for s in picked)
            # python // floors; both engines truncate toward zero
            num = 7 * rel[c] - 3 * ms
            scores[c] = num // 10 if num >= 0 else -((-num) // 10)
        picked.append(min(rest, key=lambda i: (-scores[i], i)))
    got = sorted(sim_mmr_rerank(spark, SF_DIR).collect(), key=lambda r: r["pick"])
    assert [r["vec_id"] for r in got] == picked


def test_rsi_matches_manual(spark):
    from spark_ibm_mq_spark.operators.windows import win_rsi_indicator

    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    per_day = Counter()
    for r in orders:
        per_day[r["o_orderdate"].date()] += math.floor(r["o_totalprice"] * 100 + 0.5)
    days = sorted(per_day)
    xs = [per_day[d] for d in days]
    got = {r["d"]: r["rsi"] for r in win_rsi_indicator(spark, SF_DIR).collect()}
    for i in range(14, len(days)):
        deltas = [xs[j] - xs[j - 1] for j in range(i - 13, i + 1)]
        sg = sum(d for d in deltas if d > 0)
        sl = sum(-d for d in deltas if d < 0)
        if sg + sl == 0:
            assert days[i] not in got
            continue
        assert abs(got[days[i]] - round(100.0 * sg / (sg + sl), 4)) < 1e-9


def test_ngram_novelty_matches_python(spark):
    from spark_ibm_mq_spark.operators.text_analysis import text_ngram_novelty

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    got = {r["ngram_len"]: r for r in text_ngram_novelty(spark, SF_DIR).collect()}
    for n in (1, 2, 3):
        base, new = set(), Counter()
        for r in docs:
            toks = r["text"].split()
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if r["doc_id"] % 2 == 0:
                base.update(grams)
            else:
                new.update(grams)
        novel = [g for g in new if g not in base]
        assert got[n]["distinct_grams"] == len(new)
        assert got[n]["novel_grams"] == len(novel)
        assert got[n]["novel_occurrences"] == sum(new[g] for g in novel)


def test_interval_overlap_matches_python(spark):
    from spark_ibm_mq_spark.operators.joins import join_interval_overlap

    evs = sorted(_events(), key=lambda r: (r["ts"], r["event_id"]))
    # sessions per user (30-min gap)
    by_user = defaultdict(list)
    for r in evs:
        by_user[r["user_id"]].append(r)
    sessions = []
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        sid = 0
        cur = []
        prev = None
        for r in rs:
            ms = int(r["ts"].timestamp() * 1000)
            if prev is None or ms - prev > 1800000:
                if cur:
                    sessions.append((u, sid, cur[0], cur[-1]))
                sid += 1
                cur = []
            cur.append(ms)
            prev = ms
        if cur:
            sessions.append((u, sid, cur[0], cur[-1]))
    # global incidents (10-min gap over error events)
    errs = [r for r in evs if r["event_type"] == "error"]
    incidents = []
    iid = 0
    cur = []
    prev = None
    for r in errs:
        ms = int(r["ts"].timestamp() * 1000)
        if prev is None or ms - prev > 600000:
            if cur:
                incidents.append((iid, cur[0], cur[-1]))
            iid += 1
            cur = []
        cur.append(ms)
        prev = ms
    if cur:
        incidents.append((iid, cur[0], cur[-1]))
    want = set()
    for u, sid, s0, s1 in sessions:
        for i, i0, i1 in incidents:
            if s0 <= i1 and i0 <= s1:
                want.add((u, sid, i, round((min(s1, i1) - max(s0, i0)) / 1000.0, 4)))
    got = {
        (r["user_id"], r["session_id"], r["incident_id"], r["overlap_s"])
        for r in join_interval_overlap(spark, SF_DIR).collect()
    }
    assert got == want


def test_rake_scores_match_python(spark):
    from spark_ibm_mq_spark.functions.text import STOPWORDS_EN
    from spark_ibm_mq_spark.operators.text_analysis import text_rake_keywords

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pylist()
    stop = set(STOPWORDS_EN)
    phrases = []
    for r in docs:
        cur = []
        for t in r["text"].lower().split():
            if t in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(tuple(cur))
    freq, deg = Counter(), Counter()
    for p in phrases:
        for wd in p:
            freq[wd] += 1
            deg[wd] += len(p)
    score_u = {p: sum((deg[wd] * 1000000) // freq[wd] for wd in p) for p in set(phrases)}
    occ = Counter(phrases)
    top = sorted(set(phrases), key=lambda p: (-score_u[p], " ".join(p)))[:10]
    got = text_rake_keywords(spark, SF_DIR).collect()
    assert [r["phrase"] for r in got] == [" ".join(p) for p in top]
    for r, p in zip(got, top):
        assert r["n_occurrences"] == occ[p]
        assert abs(r["rake_score"] - round(score_u[p] / 1e6, 4)) < 1e-9


def test_partition_plan_file_counts_consistent(spark):
    from spark_ibm_mq_spark.operators.scale_layout import (
        scale_partition_evolution_plan,
    )

    rows = scale_partition_evolution_plan(spark, SF_DIR).collect()
    for r in rows:
        assert r["granularity"] in ("daily", "monthly")
        assert r["est_files"] >= 1
        if r["granularity"] == "monthly":
            # ceiling division against the 128 MiB target
            assert r["est_files"] == (r["bytes"] + 134217727) // 134217728


def test_hnsw_layers_geometric(spark):
    from spark_ibm_mq_spark.operators.similarity import sim_hnsw_layer_plan
    import hashlib

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pylist()
    want = Counter()
    for r in emb:
        h = hashlib.md5(str(r["vec_id"]).encode()).hexdigest()
        lz = len(h) - len(h.lstrip("0"))
        want[min(lz, 6)] += 1
    got = {r["layer"]: r for r in sim_hnsw_layer_plan(spark, SF_DIR).collect()}
    assert {k: v["n_vectors"] for k, v in got.items()} == dict(want)
    # reachable_vectors cumulates from the top layer down
    tot = 0
    for layer in sorted(got, reverse=True):
        tot += got[layer]["n_vectors"]
        assert got[layer]["reachable_vectors"] == tot


def test_seasonal_naive_matches_python(spark):
    from spark_ibm_mq_spark.operators.windows import win_seasonal_naive_eval

    days_, xs = _daily_counts()
    scored = [(int(xs[i]), int(xs[i - 7])) for i in range(7, len(xs)) if xs[i] > 0]
    mae = sum(abs(n - y) for n, y in scored) / len(scored)
    mape = sum((abs(n - y) * 1000000) // n for n, y in scored) / 1e6 / len(scored)
    row = win_seasonal_naive_eval(spark, SF_DIR).collect()[0]
    assert row["n_days_scored"] == len(scored)
    assert abs(row["mae"] - round(mae, 4)) < 1e-9
    assert abs(row["mape"] - round(mape, 4)) < 1e-9


def test_alert_debounce_suppression_conserves_errors(spark):
    from spark_ibm_mq_spark.operators.events_analytics import events_alert_debounce

    errors = [r for r in _events() if r["event_type"] == "error"]
    rows = events_alert_debounce(spark, SF_DIR).collect()
    # every raw error is attributed to exactly one burst
    assert sum(r["suppressed"] for r in rows) == len(errors)
    # bursts are disjoint per user: alert events are distinct errors
    assert len({r["alert_event_id"] for r in rows}) == len(rows)
    for r in rows:
        assert r["suppressed"] >= 1 and r["burst_span_s"] >= 0


def test_newcomer_share_first_month_is_full(spark):
    from spark_ibm_mq_spark.operators.aggregations import agg_newcomer_share

    rows = sorted(agg_newcomer_share(spark, SF_DIR).collect(), key=lambda r: r["month"])
    # in the first month of history every active customer is a newcomer
    assert rows[0]["newcomer_share"] == 1.0
    # newcomers across months sum to the distinct customer count
    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet")).to_pylist()
    assert sum(r["newcomers"] for r in rows) == len({r["o_custkey"] for r in orders})


def test_centroid_drift_matches_numpy(spark):
    from spark_ibm_mq_spark.operators.similarity import emb_centroid_drift

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pylist()
    by_label = defaultdict(lambda: ([], []))
    for r in emb:
        q = np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6 + 0.5).astype(
            np.int64
        )
        by_label[r["label"]][0 if r["vec_id"] % 2 == 0 else 1].append(q)
    got = {r["label"]: r for r in emb_centroid_drift(spark, SF_DIR).collect()}
    for lbl, (ha, hb) in by_label.items():
        if not ha or not hb:
            assert lbl not in got
            continue

        def cent(h):
            s = np.sum(h, axis=0)
            n = len(h)
            return np.array([int(x) // n if x >= 0 else -((-int(x)) // n) for x in s])

        d = cent(ha) - cent(hb)
        l2 = math.sqrt(float((d.astype(object) ** 2).sum())) / 1e6
        assert abs(got[lbl]["drift_l2"] - round(l2, 4)) < 1e-9
        assert got[lbl]["drift_max_dim"] == round(int(np.abs(d).max()) / 1e6, 4)


def test_ks_source_drift_matches_manual(spark):
    """Independent pure-Python replay of the per-source two-sample KS
    statistic vs the pooled ECDF: integer cross-products for the argmax
    (mirroring the engines' decimal carry), engine-order double division
    + floor(x*1e4+0.5) for the rounded statistic."""
    from spark_ibm_mq_spark.operators.aggregations import agg_ks_source_drift

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["source", "n_chars"]
    ).to_pylist()
    by_src = defaultdict(Counter)
    pooled = Counter()
    for r in docs:
        by_src[r["source"]][r["n_chars"]] += 1
        pooled[r["n_chars"]] += 1
    grid = sorted(pooled)
    n_all = sum(pooled.values())
    want = {}
    for src, cnt in by_src.items():
        n_s = sum(cnt.values())
        c_s = c_all = 0
        best = None  # (d_num, v) — max d_num, min v on ties
        for v in grid:
            c_s += cnt.get(v, 0)
            c_all += pooled[v]
            d_num = abs(c_s * n_all - c_all * n_s)
            if best is None or d_num > best[0]:
                best = (d_num, v)
        d_stat = math.floor(best[0] / (n_s * 1.0 * n_all) * 1e4 + 0.5) / 1e4
        want[src] = (n_s, d_stat, best[1])
    got = {
        r["source"]: (r["n_docs"], r["d_stat"], r["ks_at"])
        for r in agg_ks_source_drift(spark, SF_DIR).collect()
    }
    assert got == want


def test_label_propagation_matches_manual(spark):
    """Pure-Python replay of 3 synchronous majority-vote LP rounds on the
    top-5 co-purchase graph: per-node neighbor-label counts, majority
    label with smallest-label tie-break — integer-exact, so the replay
    must agree cell-for-cell."""
    from spark_ibm_mq_spark.operators.graph_analytics import (
        graph_label_propagation,
    )

    adj = _knn_graph_sets()
    labels = {u: u for u in adj}
    for _ in range(3):
        nxt = {}
        for u in adj:
            cnt = Counter(labels[v] for v in adj[u])
            # majority, smallest label on ties
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[u] = best
        labels = nxt
    sizes = Counter(labels.values())
    want = {u: (labels[u], sizes[labels[u]]) for u in adj}
    got = {
        r["part"]: (r["community"], r["community_size"])
        for r in graph_label_propagation(spark, SF_DIR).collect()
    }
    assert got == want


def test_textrank_matches_manual(spark):
    """Pure-Python weighted-PageRank replay over the word-adjacency graph:
    integer graph columns must agree exactly; damped scores to 5e-5
    (double sum order differs between replay and engine)."""
    from spark_ibm_mq_spark.operators.text_analysis import (
        text_textrank_keywords,
    )

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["text"]
    ).to_pylist()
    w = Counter()
    for r in docs:
        t = r["text"].strip().split()
        for i in range(len(t) - 1):
            if t[i] != t[i + 1]:
                w[(t[i], t[i + 1])] += 1
                w[(t[i + 1], t[i])] += 1
    wsum = Counter()
    neigh = defaultdict(set)
    for (a, b), c in w.items():
        wsum[a] += c
        neigh[a].add(b)
    score = {a: 1.0 for a in wsum}
    for _ in range(3):
        s = defaultdict(float)
        for (a, b), c in sorted(w.items()):
            s[b] += score[a] * c / wsum[a]
        score = {a: 0.15 + 0.85 * s[a] for a in wsum}
    got = {r["word"]: r for r in text_textrank_keywords(spark, SF_DIR).collect()}
    assert set(got) == set(wsum)
    for a, r in got.items():
        assert r["n_neighbors"] == len(neigh[a])
        assert r["w_total"] == wsum[a]
        assert abs(r["score"] - score[a]) < 5e-5, (a, r["score"], score[a])


def test_lsh_band_profile_matches_manual(spark):
    """Pure-Python replay of the banding sweep: recompute the 16 md5
    minhashes, regroup into each geometry, and verify bucket counts,
    max df, and the sum-C(df,2) pair volume exactly; capture literals
    must equal 1-(1-j^r)^b."""
    import hashlib

    from spark_ibm_mq_spark.operators.dedup import dedup_lsh_band_profile

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    sigs = {}
    for r in docs:
        toks = list(dict.fromkeys(r["text"].strip().split()))
        sigs[r["doc_id"]] = [
            min(md5(f"s{i}:" + t) for t in toks) for i in range(16)
        ]
    want = {}
    for b, rpb in ((2, 8), (4, 4), (8, 2)):
        buckets = Counter()
        for sig in sigs.values():
            for k in range(b):
                bh = md5("".join(sig[k * rpb : (k + 1) * rpb]))
                buckets[(k, bh)] += 1
        pair_volume = sum(df * (df - 1) // 2 for df in buckets.values())
        want[(b, rpb)] = (
            len(buckets),
            max(buckets.values()),
            pair_volume,
            round(1 - (1 - 0.7**rpb) ** b, 4),
            round(1 - (1 - 0.95**rpb) ** b, 4),
        )
    got = {
        (r["bands"], r["rows_per_band"]): (
            r["n_buckets"],
            r["max_df"],
            r["pair_volume"],
            r["capture_at_070"],
            r["capture_at_095"],
        )
        for r in dedup_lsh_band_profile(spark, SF_DIR).collect()
    }
    assert got == want

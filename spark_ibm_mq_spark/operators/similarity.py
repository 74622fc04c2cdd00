"""Similarity search over the embedding column (north-star EXT).

Brute-force cosine top-k (the correctness baseline, oracle-checked) and a
random-hyperplane LSH-bucketed ANN variant (the scale path, rows-only with
an in-query recall column against the exact answer).

Scale notes: brute-force is O(|Q|·|N|) — fine when the query set is small
and broadcastable, which is exactly how it's written (broadcast queries,
stream the corpus). The LSH variant prunes the corpus to same-bucket
candidates; multi-probe (flipping one plane bit) trades compute for recall
without changing the join shape.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.functions.vector import cosine_similarity, dot, dot_unrolled
from spark_ibm_mq_spark.operators.dedup import _COS_CELLS, _COS_SQL, _UNIT_SQL, _dot_sql
from spark_ibm_mq_spark.registry import ORACLE as _ORACLE
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import (
    durable_checkpoint,
    load_table,
    size_gated_broadcast,
    spread,
)

_TOP_K = 5
_N_QUERIES = 5  # vec_id < 5 are the query vectors


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT q_id, n_id, cos_sim, rank FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS n_id,
               round({_COS_SQL}, 4) AS cos_sim,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY floor(({_COS_SQL}) * 1000000) DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id < {_N_QUERIES}
    ) WHERE rank <= {_TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: tiny query side broadcast against the corpus,
    per-query row_number window for the top-k cut. The corpus is scanned
    once; no corpus-side shuffle until the (small) ranked set."""
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
        )
    )
    n = e.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne"))
    cos = cosine_similarity(F.col("qe"), F.col("ne"))
    # rank on the cosine rounded to 6 decimals (oracle matches): raw-double
    # ordering lets a 1-ulp engine divergence reshuffle the top-k boundary
    w = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("cos_raw") * 1e6).desc(), F.col("n_id")
    )
    return (
        q.join(n, F.col("n_id") != F.col("q_id"))
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "n_id", F.round("cos_raw", 4).alias("cos_sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no numpy dependency in
    the hot path — they are literals baked into the plan)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in planes]


def _plane_cols(planes: list[list[float]]) -> list:
    """One Column per hyperplane, built from a single SQL string each.

    Building the literal matrix element-by-element (F.array of F.array of
    F.lit) costs one py4j round-trip per element — 512 driver→JVM calls per
    plan construction for 8×64 planes, re-paid on every invocation (bench
    median-of-3 pays it three times). `repr(float)` is shortest-round-trip,
    so the parsed doubles are bit-identical to the Python values."""
    return [
        F.expr("array(" + ", ".join(f"{v!r}D" for v in row) + ")")
        for row in planes
    ]


@register("sim_ann_lsh")  # rows-only: plane literals impractical as SQL oracle
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 8 sign bits → bucket id; queries probe
    their own bucket plus one-bit-flipped neighbors (multi-probe), exact
    cosine re-rank inside the candidate set. Output carries `hit` = whether
    each ANN result is also in the exact top-k, so the driver's rows-only
    check still observes recall.

    At 100 TB: bucket the corpus once (write bucketed parquet), broadcast
    only the probe list per query batch — the shuffle is on bucket id."""
    e = load_table(spark, sf_dir, "embeddings")
    dim = 64
    n_planes = 8
    plane_cols = _plane_cols(_hyperplanes(dim, n_planes))

    def bucket_of(vec_col):
        bits = [
            F.when(dot(vec_col, plane_cols[i]) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(n_planes)
        ]
        return sum(bits)

    corpus = e.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne")
    ).withColumn("bucket", bucket_of(F.col("ne")))
    queries = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
        .withColumn("bucket0", bucket_of(F.col("qe")))
    )
    # multi-probe: own bucket + each one-bit flip
    probes = queries.select(
        "q_id",
        "qe",
        F.explode(
            F.array(
                F.col("bucket0"),
                *[
                    F.col("bucket0").bitwiseXOR(F.lit(1 << i))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    cos = cosine_similarity(F.col("qe"), F.col("ne"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("n_id"))
    ann = (
        F.broadcast(probes)
        .join(corpus, "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos_raw", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "n_id", F.round("cos_raw", 4).alias("cos_sim"), "rank")
    )
    exact = sim_topk_bruteforce(spark, sf_dir).select(
        F.col("q_id").alias("eq_id"), F.col("n_id").alias("en_id")
    )
    return ann.join(
        exact,
        (ann.q_id == exact.eq_id) & (ann.n_id == exact.en_id),
        "left",
    ).select(
        "q_id",
        "n_id",
        "cos_sim",
        "rank",
        F.col("eq_id").isNotNull().alias("hit"),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path, fully oracled
# ---------------------------------------------------------------------------

_IVF_K = 16       # coarse cells; centroid c = embedding of vec_id c
_IVF_NPROBE = 4   # cells probed per query
_IVF_QUERY_MOD = 100  # query set: vec_id % 100 == 0


def _cos_sql(x: str, y: str) -> str:
    """DuckDB cosine between two array expressions using the sequential
    double fold that is bit-identical to functions/vector.cosine_similarity
    (same trick as _COS_SQL, parameterized over the operand expressions)."""
    return f"""(
      list_aggregate(list_transform(list_zip({x}::DOUBLE[], {y}::DOUBLE[]),
                     z -> z[1] * z[2]), 'sum')
      / (sqrt(list_aggregate(list_transform({x}::DOUBLE[], v -> v * v), 'sum'))
         * sqrt(list_aggregate(list_transform({y}::DOUBLE[], v -> v * v), 'sum')))
    )"""


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cell, embedding AS ce FROM embeddings
        ORDER BY vec_id LIMIT {_IVF_K}
    ),
    assign AS (
        SELECT vec_id AS n_id, cell, ne FROM (
            SELECT e.vec_id, c.cell, e.embedding AS ne,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY floor(({_cos_sql('e.embedding', 'c.ce')}) * 1000000) DESC, c.cell
                   ) AS rn
            FROM embeddings e CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    probe AS (
        SELECT q_id, qe, cell FROM (
            SELECT q.vec_id AS q_id, q.embedding AS qe, c.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY floor(({_cos_sql('q.embedding', 'c.ce')}) * 1000000) DESC, c.cell
                   ) AS rn
            FROM embeddings q CROSS JOIN cent c
            WHERE q.vec_id % {_IVF_QUERY_MOD} = 0
        ) WHERE rn <= {_IVF_NPROBE}
    )
    SELECT q_id, n_id, cos_sim, rank FROM (
        SELECT p.q_id, a.n_id,
               round({_cos_sql('p.qe', 'a.ne')}, 4) AS cos_sim,
               row_number() OVER (
                   PARTITION BY p.q_id
                   ORDER BY floor(({_cos_sql('p.qe', 'a.ne')}) * 1000000) DESC, a.n_id
               ) AS rank
        FROM probe p JOIN assign a ON a.cell = p.cell
        WHERE a.n_id != p.q_id
    ) WHERE rank <= {_TOP_K}
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into K cells (centroid c = the
    embedding of vec_id c — deterministic, so the whole index is
    oracle-checkable), build the inverted index by nearest-centroid
    assignment, then answer each query by probing its nprobe nearest cells
    and exact-reranking only those candidates.

    Scale shape: centroids broadcast everywhere they appear; the only
    corpus-wide shuffle is the assignment window (one pass — at 100 TB the
    inverted index is written once as cell-bucketed parquet and amortized
    across query batches); per query the scan is |corpus|·nprobe/K instead
    of |corpus|. The probe list is broadcast into the candidate join, so
    query fan-out never shuffles the corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    # centroids = the K lowest vec_ids present (not `vec_id < K`, which is
    # vacuously empty for id-shifted fixtures on BOTH engines)
    cent = F.broadcast(
        e.orderBy("vec_id").limit(_IVF_K).select(
            F.col("vec_id").alias("cell"), F.col("embedding").alias("ce")
        )
    )
    # inverted index: nearest centroid per vector; ordering on the cosine
    # ROUNDED to 6 decimals so a 1-ulp engine divergence can't flip a cell
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.floor(F.col("c_sim") * 1e6).desc(), F.col("cell")
    )
    assign = (
        # r16 opt (guide §2.6): spread the 1-partition fixture scan before
        # the K-way centroid crossJoin so the |corpus|×K interpreted
        # cosine folds run on every core (no-op on multi-split tables)
        spread(e)
        .crossJoin(cent)
        .withColumn("c_sim", cosine_similarity(F.col("embedding"), F.col("ce")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("n_id"), "cell", F.col("embedding").alias("ne"))
    )
    # probe list: nprobe nearest cells per query vector
    w_probe = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("c_sim") * 1e6).desc(), F.col("cell")
    )
    probe = (
        e.filter(F.col("vec_id") % _IVF_QUERY_MOD == 0)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
        .crossJoin(cent)
        .withColumn("c_sim", cosine_similarity(F.col("qe"), F.col("ce")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("q_id", "qe", "cell")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("cos_raw") * 1e6).desc(), F.col("n_id")
    )
    return (
        F.broadcast(probe)
        .join(assign, "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos_raw", cosine_similarity(F.col("qe"), F.col("ne")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "n_id", F.round("cos_raw", 4).alias("cos_sim"), "rank")
    )


# ---------------------------------------------------------------------------
# Signed-LSH ANN — ±1 hyperplanes from md5, so the whole index is oracled
# ---------------------------------------------------------------------------

_SIGNED_N_PLANES = 8
_SIGNED_DIM = 64


def _signed_planes(dim: int, n_planes: int) -> list[list[float]]:
    """±1 hyperplanes derived from md5 — deterministic WITHOUT an RNG, so
    the exact same matrix is reproducible in SQL-literal form for the
    oracle. Sign of component (p, d) = parity of the first hex digit of
    md5("plane{p}:{d}"). ±1 planes are the classic cheap sign-random
    projection: E[cos angle preserved] matches Gaussian planes for LSH
    bucketing purposes while every dot product stays an exact ±sum."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


_SIGNED = _signed_planes(_SIGNED_DIM, _SIGNED_N_PLANES)
_SIGNED_VALUES = ", ".join(
    f"({1 << p}, [{', '.join('1.0' if v > 0 else '-1.0' for v in row)}]::DOUBLE[])"
    for p, row in enumerate(_SIGNED)
)
_SIGNED_FLIPS = "[" + ", ".join(str(x) for x in [0, *(1 << p for p in range(_SIGNED_N_PLANES))]) + "]"


@register(
    "sim_ann_lsh_signed",
    oracle=f"""
    WITH planes AS (SELECT * FROM (VALUES {_SIGNED_VALUES}) t(bit, pv)),
    bucketed AS (
        SELECT vec_id, embedding,
               CAST(sum(CASE WHEN pdot >= 0 THEN bit ELSE 0 END) AS BIGINT) AS bucket
        FROM (
            SELECT e.vec_id, e.embedding, pl.bit,
                   list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], pl.pv),
                                  z -> z[1] * z[2]), 'sum') AS pdot
            FROM embeddings e CROSS JOIN planes pl
        )
        GROUP BY vec_id, embedding
    ),
    probe AS (
        SELECT b.vec_id AS q_id, b.embedding AS qe, xor(b.bucket, f.flip) AS bucket
        FROM bucketed b CROSS JOIN (SELECT unnest({_SIGNED_FLIPS}) AS flip) f
        WHERE b.vec_id < {_N_QUERIES}
    )
    SELECT q_id, n_id, cos_sim, rank FROM (
        SELECT p.q_id, c.vec_id AS n_id,
               round({_cos_sql('p.qe', 'c.embedding')}, 4) AS cos_sim,
               row_number() OVER (
                   PARTITION BY p.q_id
                   ORDER BY floor(({_cos_sql('p.qe', 'c.embedding')}) * 1000000) DESC, c.vec_id
               ) AS rank
        FROM probe p JOIN bucketed c ON c.bucket = p.bucket
        WHERE c.vec_id != p.q_id
    ) WHERE rank <= {_TOP_K}
    """,
)
def sim_ann_lsh_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-oracled LSH ANN: same bucket/multi-probe/rerank shape as
    `sim_ann_lsh`, but the hyperplanes are md5-derived ±1 vectors baked as
    literals into BOTH plans, so bucket assignment, probing, and the final
    top-k are all value-checked against DuckDB (the Gaussian-plane variant
    stays rows-only and carries its recall column instead).

    Scale shape: bucket is a per-row expression in the scan stage — no
    corpus shuffle to index; at 100 TB write the corpus once as
    bucket-partitioned parquet and every query batch joins on bucket with
    the (tiny) probe list broadcast. Cross-engine determinism: a ±1 dot
    product is a sequential ±sum fold, bit-identical in Spark's
    `aggregate` and DuckDB's `list_aggregate`; the sign threshold and the
    6-decimal-rounded rerank ordering therefore agree."""
    e = load_table(spark, sf_dir, "embeddings")
    plane_cols = _plane_cols(_SIGNED)

    def bucket_of(vec_col):
        bits = [
            F.when(dot(vec_col, plane_cols[p]) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(_SIGNED_N_PLANES)
        ]
        return sum(bits)

    corpus = e.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("ne")
    ).withColumn("bucket", bucket_of(F.col("ne")))
    probes = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
        .withColumn("bucket0", bucket_of(F.col("qe")))
        .select(
            "q_id",
            "qe",
            F.explode(
                F.array(
                    F.col("bucket0"),
                    *[
                        F.col("bucket0").bitwiseXOR(F.lit(1 << p))
                        for p in range(_SIGNED_N_PLANES)
                    ],
                )
            ).alias("bucket"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("cos_raw") * 1e6).desc(), F.col("n_id")
    )
    return (
        F.broadcast(probes)
        .join(corpus, "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos_raw", cosine_similarity(F.col("qe"), F.col("ne")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "n_id", F.round("cos_raw", 4).alias("cos_sim"), "rank")
    )


# ---------------------------------------------------------------------------
# int8 quantization manifest — the storage-side half of similarity at scale
# ---------------------------------------------------------------------------


@register(
    "emb_quantize_int8",
    oracle="""
    SELECT vec_id,
           round(amax, 6) AS scale_q,
           array_to_string(list_transform(ed,
               v -> CAST(round(v * 127.0 / amax) AS BIGINT)), ',') AS codes_csv
    FROM (
        SELECT vec_id, embedding::DOUBLE[] AS ed,
               list_aggregate(list_transform(embedding::DOUBLE[], v -> abs(v)), 'max') AS amax
        FROM embeddings
    )
    WHERE amax > 0
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector absmax int8 quantization — the 4× storage/bandwidth cut
    every large ANN index takes before sharding (codes + one scale per
    vector reconstruct to within 1/254 of absmax). Emitted as a CSV string
    because raw array cells crash the driver comparator's row sort
    (CORRECTNESS_r04 `mm_decode_features`); downstream operators would read
    the arrays from parquet, not this manifest.

    Determinism: abs/max are exact on the float→double-widened values;
    `v * 127.0 / amax` is the same double op sequence in both engines and
    both round half-away-from-zero at scale 0. Scale shape: pure per-row
    expression — one narrow scan, zero shuffles, embarrassingly parallel."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    with_amax = e.select(
        "vec_id",
        ed.alias("ed"),
        F.array_max(F.transform(ed, lambda v: F.abs(v.cast("double")))).alias("amax"),
    )
    codes = F.concat_ws(
        ",",
        F.transform(
            "ed",
            lambda v: F.round(v * F.lit(127.0) / F.col("amax")).cast("bigint").cast("string"),
        ),
    )
    return with_amax.filter(F.col("amax") > 0).select(
        "vec_id",
        F.round("amax", 6).alias("scale_q"),
        codes.alias("codes_csv"),
    )


@register(
    "emb_centroid_per_label",
    oracle="""
    WITH exploded AS (
        SELECT label, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS x
        FROM embeddings, LATERAL unnest(range(1, len(embedding)+1)) AS t(i)
    ),
    means AS (
        SELECT label, pos, printf('%.4f', round(avg(x), 4) + 0.0) AS m
        FROM exploded GROUP BY label, pos
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS dim,
           string_agg(m, ',' ORDER BY pos) AS centroid_csv
    FROM means GROUP BY label
    """,
)
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class centroids) — the training step of
    IVF coarse quantizers and the k-means update every embedding-clustering
    pipeline iterates. Emitted as a fixed-format CSV string: the driver's
    canonicalizer can't hash array cells (r4 lesson), and printf renders
    identically in Spark and DuckDB where a raw double→string cast can
    disagree on scientific notation. Each mean is round(avg, 4)-ed BEFORE
    formatting (ADVICE r5): the rounded double sits ~1e-17 off the 4-decimal
    grid, so '%.4f' never lands on a formatting halfway point where Java
    HALF_UP and C round-half-even disagree — same round(,4) convention as
    the rest of the suite, absorbing partial-sum-order ulp drift.

    Scale shape: posexplode stays in the scan stage; the (label, pos) mean
    is ONE map-side-combinable aggregate whose output is |labels|×dim rows
    regardless of corpus size; centroid reassembly (collect_list + sort by
    pos) runs on that tiny frame. The corpus shuffles only aggregate
    partials — never whole vectors."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = spread(e, "vec_id").select(
        "label", F.posexplode("embedding").alias("pos", "x")
    )
    # `+ 0.0` normalizes IEEE negative zero (−0.0 + 0.0 = +0.0): a tiny
    # negative mean rounds to −0.0, which DuckDB's printf renders "-0.0000"
    # while Spark's round canonicalizes to +0.0 → "0.0000"
    means = ex.groupBy("label", "pos").agg(
        F.format_string(
            "%.4f", F.round(F.avg(F.col("x").cast("double")), 4) + F.lit(0.0)
        ).alias("m")
    )
    centroid = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ),
        ",",
    )
    return means.groupBy("label").agg(
        F.count(F.lit(1)).alias("dim"), centroid.alias("centroid_csv")
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation — recall@k of the oracled LSH funnel vs exact
# (the _ORACLE subscriptions below read entries the @register calls above
# populated earlier in this module's execution)
# ---------------------------------------------------------------------------


@register(
    "sim_ann_recall_eval",
    oracle=f"""
    WITH exact AS ({_ORACLE['sim_topk_bruteforce']}),
         ann   AS ({_ORACLE['sim_ann_lsh_signed']})
    SELECT a.q_id,
           CAST(count(*) AS BIGINT)       AS n_ann,
           CAST(count(e.n_id) AS BIGINT)  AS n_hits,
           round(count(e.n_id) * 1.0 / {_TOP_K}, 4) AS recall_at_k
    FROM ann a
    LEFT JOIN exact e ON e.q_id = a.q_id AND e.n_id = a.n_id
    GROUP BY a.q_id
    """,
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k evaluation harness: joins the signed-LSH ANN result against
    the exact brute-force top-k per query and reports hits / recall — the
    index-quality gate every ANN deployment runs before trusting an
    approximate index, here with BOTH sides value-oracled (the oracle
    composes the two registered SQL definitions as CTEs, so any drift in
    either funnel surfaces as a hash mismatch).

    Plan shape: both inputs end at a per-query top-k (|Q|·k rows); the
    evaluation join and groupBy run on those tiny frames — the corpus-side
    cost is exactly the two underlying funnels, unchanged. At 100 TB the
    eval is run on a sampled query set, which is what _N_QUERIES models."""
    exact = sim_topk_bruteforce(spark, sf_dir).select(
        "q_id", "n_id", F.lit(1).alias("hit")
    )
    ann = sim_ann_lsh_signed(spark, sf_dir)
    joined = ann.join(exact, ["q_id", "n_id"], "left")
    return joined.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_ann"),
        F.count("hit").alias("n_hits"),
        F.round(F.count("hit") / F.lit(_TOP_K), 4).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# Product quantization — the code-book compression half of IVF-PQ
# ---------------------------------------------------------------------------

_PQ_M = 4          # subspaces
_PQ_SUBDIM = 16    # dims per subspace (4 × 16 = 64 = embedding dim)
_PQ_K = 8          # centroids per subspace: sub-vectors of vec_id < 8


@register(
    "emb_pq_codes",
    oracle=f"""
    WITH sub AS (
        SELECT vec_id, m.m,
               list_slice(embedding::DOUBLE[], m.m * {_PQ_SUBDIM} + 1,
                          m.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sv
        FROM embeddings, (SELECT unnest(range(0, {_PQ_M})) AS m) m
    ),
    cent AS (
        SELECT vec_id AS cent_id, m, sv AS cv FROM sub WHERE vec_id < {_PQ_K}
    ),
    d AS (
        SELECT s.vec_id, s.m, c.cent_id,
               list_aggregate(list_transform(list_zip(s.sv, c.cv),
                              z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum') AS dist2
        FROM sub s JOIN cent c ON c.m = s.m
    ),
    r AS (
        SELECT vec_id, m, cent_id, dist2,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY floor(dist2 * 1000000), cent_id) AS rk
        FROM d
    )
    SELECT vec_id,
           string_agg(CAST(cent_id AS VARCHAR), ',' ORDER BY m) AS code_csv,
           string_agg(printf('%.4f', round(dist2, 4) + 0.0), ',' ORDER BY m) AS err_csv
    FROM r WHERE rk = 1 GROUP BY vec_id
    """,
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: split each 64-dim vector into 4×16-dim
    subspaces, assign each sub-vector to its nearest of 8 per-subspace
    centroids (L2; centroids = the sub-vectors of the 8 lowest vec_ids, the
    suite's deterministic stand-in for a trained codebook), and emit the
    4-byte PQ code per vector plus the per-subspace quantization error —
    the compression step that turns a 100 TB float index into the ~1.5 TB
    IVF-PQ index ANN systems actually serve from.

    Determinism: the L2 fold is the same left-to-right double sequence in
    Spark `aggregate` and DuckDB `list_aggregate`, so `floor(dist2*1e6)` +
    cent_id is a stable argmin key on both engines; errors are rounded
    before printf (suite convention) with `+0.0` canonicalizing −0.0.

    Plan shape: subspace explode is a per-row expression in the scan stage
    (M rows out per vector, only 16-dim slices); the 32-row codebook is
    broadcast; argmin is a window over M·K=32 rows per vector; reassembly
    groups M rows back to one. The corpus never shuffles full vectors —
    only (vec_id, m, 16-dim slice) then (vec_id, code) rows."""
    e = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    pieces = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice(ed, m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("sv"),
                )
                for m in range(_PQ_M)
            ]
        )
    ).alias("p")
    sub = e.select("vec_id", pieces).select("vec_id", "p.m", "p.sv")
    cent = F.broadcast(
        sub.filter(F.col("vec_id") < _PQ_K).select(
            F.col("vec_id").alias("cent_id"), F.col("m").alias("cm"),
            F.col("sv").alias("cv"),
        )
    )
    dist2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id", "m").orderBy(
        F.floor(F.col("dist2") * 1e6), "cent_id"
    )
    best = (
        sub.join(cent, F.col("cm") == F.col("m"))
        .withColumn("dist2", dist2)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    by_m = F.array_sort(
        F.collect_list(F.struct("m", F.col("cent_id").cast("string").alias("c"),
                                F.col("err").alias("e"))))
    return (
        best.withColumn(
            "err",
            F.format_string("%.4f", F.round(F.col("dist2"), 4) + F.lit(0.0)),
        )
        .groupBy("vec_id")
        .agg(
            F.array_join(F.transform(by_m, lambda s: s["c"]), ",").alias("code_csv"),
            F.array_join(F.transform(by_m, lambda s: s["e"]), ",").alias("err_csv"),
        )
    )


# ---------------------------------------------------------------------------
# Iterative k-means — Lloyd's algorithm as a fully-lazy DataFrame loop
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_DIM = 64

_KM_D2 = "list_aggregate(list_transform(list_zip(e.ev, c.cv), z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum')"


def _km_iteration_sql(i: int) -> str:
    """CTEs for one unrolled Lloyd iteration: assign to nearest centroid
    (integer floor(d2*1e6) + cid rank key), then recompute per-cluster
    per-dimension means rounded to 6 decimals (the suite's cross-engine
    float convention, emb_centroid_per_label)."""
    assign = f"""
    a{i} AS (
        SELECT vec_id, ev, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY floor(d2 * 1000000), cid) AS rk
        FROM (SELECT e.vec_id, e.ev, c.cid, {_KM_D2} AS d2
              FROM e0 e CROSS JOIN c{i - 1} c)
    )"""
    update = f"""
    m{i} AS (
        SELECT a.cid, t.i AS pos, round(avg(a.ev[t.i]), 6) AS m
        FROM a{i} a, LATERAL unnest(range(1, {_KM_DIM} + 1)) t(i)
        WHERE a.rk = 1 GROUP BY a.cid, t.i
    ),
    c{i} AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cid)"""
    return assign + ("," + update if i < _KM_ITERS else "")


@register(
    "emb_kmeans_3iter",
    oracle=f"""
    WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < {_KM_K}),
    {",".join(_km_iteration_sql(i) for i in range(1, _KM_ITERS + 1))}
    SELECT vec_id, cid AS cluster FROM a{_KM_ITERS} WHERE rk = 1
    """,
)
def emb_kmeans_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus — K=8, three iterations,
    deterministic init (the K lowest vec_ids) — expressed as a fully LAZY
    DataFrame loop: each iteration is assign (8-row centroid frame
    broadcast into a cross join, integer-keyed argmin window) → update
    (per-(cluster, dim) combinable mean, rounded to 6 decimals so both
    engines feed bit-identical centroids into the next iteration's
    distances). No driver collect, no materialization between iterations —
    Catalyst sees one DAG with three join+aggregate layers, and the oracle
    unrolls the identical three iterations as CTE pairs.

    Scale shape per iteration: the corpus is scanned with a K-row broadcast
    (no corpus shuffle for assignment beyond the per-vector window, which
    AQE plans off the same vec_id hash), and the update shuffles only
    (cluster, dim, partial-sum) triples — K·dim rows world-wide. For many
    iterations, checkpoint the assignment every ~10 rounds to cut lineage
    (the dedup_cluster_resolve pattern); at 3 iterations lineage is cheap.
    Empty clusters drop out of the centroid frame on both engines alike."""
    e = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("ev")
    )
    cents = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("ev").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("ev", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.floor(F.col("d2") * 1e6), "cid")
    assign = None
    for it in range(1, _KM_ITERS + 1):
        assign = (
            e.crossJoin(F.broadcast(cents))
            .withColumn("d2", d2)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
        )
        if it < _KM_ITERS:
            means = (
                assign.select("cid", F.posexplode("ev").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.round(F.avg("x"), 6).alias("m"))
            )
            cents = means.groupBy("cid").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
    return assign.select("vec_id", F.col("cid").alias("cluster"))


_IVFPQ_RERANK = 10  # ADC shortlist width before the exact rerank


@register(
    "sim_ann_ivfpq",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cell, embedding AS ce FROM embeddings
        ORDER BY vec_id LIMIT {_IVF_K}
    ),
    assign AS (
        SELECT vec_id AS n_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY floor(({_cos_sql('e.embedding', 'c.ce')}) * 1000000) DESC, c.cell
                   ) AS rn
            FROM embeddings e CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    sub AS (
        SELECT vec_id, m.m,
               list_slice(embedding::DOUBLE[], m.m * {_PQ_SUBDIM} + 1,
                          m.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sv
        FROM embeddings, (SELECT unnest(range(0, {_PQ_M})) AS m) m
    ),
    book AS (
        SELECT vec_id AS cent_id, m, sv AS cv FROM sub WHERE vec_id < {_PQ_K}
    ),
    codes AS (
        SELECT vec_id AS n_id, m, cent_id FROM (
            SELECT s.vec_id, s.m, b.cent_id,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY floor(list_aggregate(list_transform(
                                    list_zip(s.sv, b.cv),
                                    z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum')
                                * 1000000), b.cent_id) AS rk
            FROM sub s JOIN book b ON b.m = s.m
        ) WHERE rk = 1
    ),
    probe AS (
        SELECT q_id, cell FROM (
            SELECT q.vec_id AS q_id, c.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY floor(({_cos_sql('q.embedding', 'c.ce')}) * 1000000) DESC, c.cell
                   ) AS rn
            FROM embeddings q CROSS JOIN cent c
            WHERE q.vec_id % {_IVF_QUERY_MOD} = 0
        ) WHERE rn <= {_IVF_NPROBE}
    ),
    lut AS (
        SELECT s.vec_id AS q_id, s.m, b.cent_id,
               list_aggregate(list_transform(list_zip(s.sv, b.cv),
                              z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum') AS pd2
        FROM sub s JOIN book b ON b.m = s.m
        WHERE s.vec_id % {_IVF_QUERY_MOD} = 0
    ),
    adc AS (
        SELECT cd.q_id, cd.n_id,
               ((max(CASE WHEN cd.m = 0 THEN l.pd2 END)
                 + max(CASE WHEN cd.m = 1 THEN l.pd2 END))
                 + max(CASE WHEN cd.m = 2 THEN l.pd2 END))
                 + max(CASE WHEN cd.m = 3 THEN l.pd2 END) AS adc2
        FROM (
            SELECT p.q_id, a.n_id, c.m, c.cent_id
            FROM probe p
            JOIN assign a ON a.cell = p.cell AND a.n_id != p.q_id
            JOIN codes c ON c.n_id = a.n_id
        ) cd
        JOIN lut l ON l.q_id = cd.q_id AND l.m = cd.m AND l.cent_id = cd.cent_id
        GROUP BY cd.q_id, cd.n_id
    ),
    shortlist AS (
        SELECT q_id, n_id, adc2 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY floor(adc2 * 1000000), n_id) AS rk
            FROM adc
        ) WHERE rk <= {_IVFPQ_RERANK}
    )
    SELECT q_id, n_id, round(adc2, 4) AS adc_dist2, cos_sim, rank FROM (
        SELECT s.q_id, s.n_id, s.adc2,
               round({_cos_sql('q.embedding', 'n.embedding')}, 4) AS cos_sim,
               row_number() OVER (
                   PARTITION BY s.q_id
                   ORDER BY floor(({_cos_sql('q.embedding', 'n.embedding')}) * 1000000) DESC,
                            s.n_id) AS rank
        FROM shortlist s
        JOIN embeddings q ON q.vec_id = s.q_id
        JOIN embeddings n ON n.vec_id = s.n_id
    ) WHERE rank <= {_TOP_K}
    """,
)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN architecture end-to-end — IVF coarse routing +
    PQ asymmetric-distance shortlisting + exact rerank, the funnel
    `sim_ann_ivf` (cells) and `emb_pq_codes` (codes) each build half of:
    each query probes its nprobe nearest coarse cells, ranks ALL
    candidates in those cells by the ADC lookup-table distance (Σ_m of
    the precomputed ||q_sub_m − centroid(code_m)||² — 4 table lookups
    per candidate, NO vector math), keeps the top-{_IVFPQ_RERANK}
    shortlist, and only THOSE get exact full-vector cosine for the final
    top-{_TOP_K}. Centroids/codebooks are the suite's deterministic
    stand-ins (lowest vec_ids), same as the component operators.

    Determinism: every distance is the fixed left-to-right double fold;
    the per-candidate ADC total adds its 4 subspace terms in explicit
    fixed order (a SUM over m would leave the addition order to the
    engine); all rank keys are floor(·×1e6) + id ties.

    Plan shape — what makes IVFPQ the 100 TB ANN answer, visible in the
    plan: the corpus's FULL vectors are touched only at assignment/coding
    (index build, amortized) and the final ≤{_IVFPQ_RERANK}-row-per-query
    rerank join. The per-query work joins the broadcast probe list to the
    cell-keyed candidate index and the broadcast 160-row LUT to 4-row PQ
    codes — shuffle payloads are (id, m, code) ints, never 64-dim
    vectors. At scale the assign+codes frames are the serving index
    (cell-bucketed parquet, built once); queries stream against it."""
    e = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    # --- coarse index (sim_ann_ivf shape) ---
    cent = F.broadcast(
        e.orderBy("vec_id")
        .limit(_IVF_K)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("ce"))
    )
    rank_cos = F.floor(cosine_similarity(F.col("embedding"), F.col("ce")) * 1e6)
    wv = Window.partitionBy("vec_id").orderBy(rank_cos.desc(), "cell")
    assign = (
        e.crossJoin(cent)
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("n_id"), "cell")
    )
    # --- PQ codes (emb_pq_codes shape) ---
    pieces = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice(ed, m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("sv"),
                )
                for m in range(_PQ_M)
            ]
        )
    ).alias("p")
    sub = e.select("vec_id", pieces).select("vec_id", "p.m", "p.sv")
    book = F.broadcast(
        sub.filter(F.col("vec_id") < _PQ_K).select(
            F.col("vec_id").alias("cent_id"),
            F.col("m").alias("bm"),
            F.col("sv").alias("cv"),
        )
    )
    dist2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wc = Window.partitionBy("vec_id", "m").orderBy(
        F.floor(F.col("d2") * 1e6), "cent_id"
    )
    codes = (
        sub.join(book, F.col("m") == F.col("bm"))
        .withColumn("d2", dist2)
        .withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") == 1)
        .select(F.col("vec_id").alias("n_id"), "m", "cent_id")
    )
    # --- query side: probe lists + ADC lookup table, both broadcast ---
    q = e.filter(F.col("vec_id") % _IVF_QUERY_MOD == 0)
    wq = Window.partitionBy("vec_id").orderBy(rank_cos.desc(), "cell")
    probe = F.broadcast(
        q.crossJoin(cent)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("q_id"), "cell")
    )
    lut = F.broadcast(
        sub.filter(F.col("vec_id") % _IVF_QUERY_MOD == 0)
        .join(book, F.col("m") == F.col("bm"))
        .select(
            F.col("vec_id").alias("lq"),
            F.col("m").alias("lm"),
            F.col("cent_id").alias("lcent"),
            dist2.alias("pd2"),
        )
    )
    # --- ADC: candidates x 4 code rows -> LUT lookups, fixed-order sum ---
    cand = (
        probe.join(assign, "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .join(codes, "n_id")
        .join(
            lut,
            (F.col("lq") == F.col("q_id"))
            & (F.col("lm") == F.col("m"))
            & (F.col("lcent") == F.col("cent_id")),
        )
    )
    pm = [
        F.max(F.when(F.col("m") == i, F.col("pd2"))).alias(f"p{i}")
        for i in range(_PQ_M)
    ]
    adc = (
        cand.groupBy("q_id", "n_id")
        .agg(*pm)
        .withColumn(
            "adc2",
            ((F.col("p0") + F.col("p1")) + F.col("p2")) + F.col("p3"),
        )
    )
    ws = Window.partitionBy("q_id").orderBy(F.floor(F.col("adc2") * 1e6), "n_id")
    shortlist = (
        adc.withColumn("rk", F.row_number().over(ws))
        .filter(F.col("rk") <= _IVFPQ_RERANK)
        .select("q_id", "n_id", "adc2")
    )
    # --- exact rerank of the shortlist only ---
    qe = e.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    ne = e.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    exact_cos = cosine_similarity(F.col("qv"), F.col("nv"))
    wr = Window.partitionBy("q_id").orderBy(
        F.floor(exact_cos * 1e6).desc(), "n_id"
    )
    return (
        shortlist.join(qe, "q_id")
        .join(ne, "n_id")
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _TOP_K)
        .select(
            "q_id",
            "n_id",
            F.round(F.col("adc2"), 4).alias("adc_dist2"),
            F.round(exact_cos, 4).alias("cos_sim"),
            "rank",
        )
    )


_PREFIX_DIMS = 16  # truncated-embedding dims for the prefix ranking pass


@register(
    "sim_prefix_dim_eval",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS qe FROM embeddings
        WHERE vec_id % {_IVF_QUERY_MOD} = 0
    ),
    pairs AS (
        SELECT q.q_id, e.vec_id AS n_id,
               {_cos_sql('q.qe', 'e.embedding')} AS full_cos,
               {_cos_sql(f'list_slice(q.qe::DOUBLE[], 1, {_PREFIX_DIMS})',
                         f'list_slice(e.embedding::DOUBLE[], 1, {_PREFIX_DIMS})')}
                   AS prefix_cos
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id != q.q_id
    ),
    full_top AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id, row_number() OVER (
                PARTITION BY q_id
                ORDER BY floor(full_cos * 1000000) DESC, n_id) AS rk
            FROM pairs
        ) WHERE rk <= {_TOP_K}
    ),
    prefix_top AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id, row_number() OVER (
                PARTITION BY q_id
                ORDER BY floor(prefix_cos * 1000000) DESC, n_id) AS rk
            FROM pairs
        ) WHERE rk <= {_TOP_K}
    )
    SELECT f.q_id,
           CAST(count(p.n_id) AS BIGINT) AS n_overlap,
           round(count(p.n_id) * 1.0 / {_TOP_K}, 4) AS recall_at_{_TOP_K}
    FROM full_top f
    LEFT JOIN prefix_top p ON f.q_id = p.q_id AND f.n_id = p.n_id
    GROUP BY f.q_id
    """,
)
def sim_prefix_dim_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-dimension retrieval eval (the matryoshka-embedding
    question): per query, how much of the full-vector cosine top-{_TOP_K}
    survives when ranking uses only the first {_PREFIX_DIMS} of 64 dims —
    the measurement that decides whether a cheap prefix index (4× less
    memory and bandwidth) can serve as the first funnel stage, the same
    eval-harness pattern as `sim_ann_recall_eval` for the LSH funnel.

    Determinism: both rankings use the floor(cos×1e6)+id keys; the
    overlap count is pure set arithmetic.

    Plan shape: one candidate frame feeds BOTH rank windows (the prefix
    cosine is a row-local expression over the same pair rows — no second
    pass over the corpus), and the overlap is a tiny self-join on the two
    top-k frames. The brute-force pair generation is the eval's scope —
    deliberately exact, run on a sample at 100 TB, while the production
    path stays `sim_ann_ivfpq`."""
    e = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    q = e.filter(F.col("vec_id") % _IVF_QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    ed = F.transform("embedding", lambda x: x.cast("double"))
    qd = F.transform("qe", lambda x: x.cast("double"))
    pairs = (
        F.broadcast(q)
        .crossJoin(e.select(F.col("vec_id").alias("n_id"), "embedding"))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            cosine_similarity(F.col("qe"), F.col("embedding")).alias("full_cos"),
            cosine_similarity(
                F.slice(qd, 1, _PREFIX_DIMS), F.slice(ed, 1, _PREFIX_DIMS)
            ).alias("prefix_cos"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("full_cos") * 1e6).desc(), "n_id"
    )
    wp = Window.partitionBy("q_id").orderBy(
        F.floor(F.col("prefix_cos") * 1e6).desc(), "n_id"
    )
    full_top = (
        pairs.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= _TOP_K)
        .select("q_id", "n_id")
    )
    prefix_top = (
        pairs.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= _TOP_K)
        .select("q_id", F.col("n_id").alias("p_id"))
    )
    return (
        full_top.join(
            prefix_top,
            (full_top.q_id == prefix_top.q_id) & (full_top.n_id == prefix_top.p_id),
            "left",
        )
        .groupBy(full_top.q_id.alias("q_id"))
        .agg(
            F.count(F.col("p_id")).alias("n_overlap"),
            F.round(F.count(F.col("p_id")) * F.lit(1.0) / _TOP_K, 4).alias(
                f"recall_at_{_TOP_K}"
            ),
        )
    )


@register(
    "emb_norm_profile",
    oracle="""
    WITH nrm AS (
        SELECT vec_id,
               sqrt(list_aggregate(
                   list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))
                   AS l2
        FROM embeddings
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nrm)
    SELECT CAST(floor(l2 * 10) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(count(*) * 1.0 / n, 4) AS share,
           round(min(l2), 4) AS min_norm,
           round(max(l2), 4) AS max_norm
    FROM nrm CROSS JOIN tot
    GROUP BY floor(l2 * 10), n
    """,
)
def emb_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm distribution of the embedding column in 0.1-wide buckets —
    the vector-quality screen run before any ANN index build: a spread-out
    or bimodal norm profile means cosine and dot-product retrieval will
    DISAGREE (norm carries signal), a spike near 0 flags dead/zero
    vectors, and outlier buckets locate corrupt rows.

    Determinism: the norm is the same in-order double fold on both
    engines (the `_dot_sql` precedent), sqrt is IEEE-exact, so
    floor(l2·10) bucketing is bit-identical — no float-boundary risk even
    AT bucket edges. Plan: one mapInArrow-free columnar pass (higher-order
    array expression, no UDF), a ~|buckets|-row aggregate, 1-row total
    broadcast."""
    e = load_table(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    nrm = spread(e, "vec_id").select("vec_id", l2.alias("l2"))
    tot = nrm.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        nrm.crossJoin(F.broadcast(tot))
        .groupBy(F.floor(F.col("l2") * 10).cast("bigint").alias("bucket"), "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.min("l2"), 4).alias("min_norm"),
            F.round(F.max("l2"), 4).alias("max_norm"),
        )
        .select(
            "bucket",
            "n_vecs",
            F.round(F.col("n_vecs") / F.col("n"), 4).alias("share"),
            "min_norm",
            "max_norm",
        )
    )


@register(
    "emb_metric_rank_correlation",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
                   z -> z[1] * z[2]), 'sum') AS dot,
               list_aggregate(list_transform(list_zip(e.embedding::DOUBLE[], q.qv),
                   z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum') AS d2,
               list_aggregate(list_transform(e.embedding::DOUBLE[], x -> x * x),
                   'sum') AS n2
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    ),
    ranks AS (
        SELECT vec_id,
               CAST(row_number() OVER (
                   ORDER BY floor(dot / sqrt(n2) * 1000000) DESC, vec_id)
                   AS BIGINT) AS r_cos,
               CAST(row_number() OVER (
                   ORDER BY floor(d2 * 1000000), vec_id) AS BIGINT) AS r_euc
        FROM scored
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum((r_cos - r_euc) * (r_cos - r_euc)) AS BIGINT) AS sd2
        FROM ranks
    )
    SELECT n AS n_vectors, sd2 AS sum_sq_rank_diff,
           round(1 - 6.0 * sd2 / (n * (n * n - 1)), 4) AS spearman_rho
    FROM m
    """,
)
def emb_metric_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between COSINE and EUCLIDEAN retrieval
    orderings against a fixed probe vector (vec_id 0) — the measurement
    behind the advice "if your vectors aren't normalized, your metric
    choice matters": ρ ≈ 1 means the two metrics retrieve alike (norms
    are uniform — see `emb_norm_profile`), lower ρ quantifies how much
    norm variance re-orders results.

    Determinism: both orderings rank on floor(score·10⁶) INTEGER keys
    (the `dedup_embedding_cosine` assign precedent) with vec_id
    tie-breaks, so ranks are engine-exact; Spearman's ρ = 1 − 6Σd²/
    (n(n²−1)) is then integers + one division under round(4). Plan: the
    probe vector broadcasts (1-row cross join), scores are in-order
    array folds in the scan stage, two rank windows over the |vectors|
    frame, one moment row. At 100 TB the probe side stays a broadcast
    and the rank windows become the only shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    d2 = F.aggregate(
        F.zip_with(
            "embedding",
            "qv",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n2 = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    scored = (
        spread(e.filter(F.col("vec_id") != 0), "vec_id")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", dot.alias("dot"), d2.alias("d2"), n2.alias("n2"))
    )
    ranks = scored.select(
        "vec_id",
        F.row_number()
        .over(
            Window.orderBy(
                F.floor(F.col("dot") / F.sqrt("n2") * 1000000).desc(), "vec_id"
            )
        )
        .cast("bigint")
        .alias("r_cos"),
        F.row_number()
        .over(Window.orderBy(F.floor(F.col("d2") * 1000000), "vec_id"))
        .cast("bigint")
        .alias("r_euc"),
    )
    m = ranks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("r_cos") - F.col("r_euc")) * (F.col("r_cos") - F.col("r_euc")))
        .cast("bigint")
        .alias("sd2"),
    )
    return m.select(
        F.col("n").alias("n_vectors"),
        F.col("sd2").alias("sum_sq_rank_diff"),
        F.round(1 - 6.0 * F.col("sd2") / (F.col("n") * (F.col("n") * F.col("n") - 1)), 4).alias(
            "spearman_rho"
        ),
    )


@register(
    "emb_dimension_variance_profile",
    oracle="""
    WITH q AS (
        SELECT CAST(i AS BIGINT) AS dim,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS qv
        FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) r(i)
    ),
    agg AS (
        SELECT dim,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(qv) AS BIGINT)      AS sq,
               CAST(sum(qv * qv) AS BIGINT) AS sqq
        FROM q GROUP BY 1
    )
    SELECT dim, n_vecs,
           round(sq / 1000000.0 / n_vecs, 4) AS mean,
           round((n_vecs * sqq - sq * sq) * 1.0
                 / (n_vecs * n_vecs) / 1000000000000.0, 4) AS variance
    FROM agg
    """,
)
def emb_dimension_variance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding matrix — the
    feature-health profile run before any ANN index build: dead
    dimensions (variance ≈ 0) waste index bits, and dominant ones tell
    you whether `sim_prefix_dim_eval`'s matryoshka truncation is safe.

    Exactness: each float32 coordinate converts to double EXACTLY, is
    quantized to integer micro-units at the row (floor(x·10⁶ + 0.5) —
    the op is defined over micro-quantized values, so both engines sum
    identical bigints in any order), and population variance comes from
    the integer identity n·Σq² − (Σq)² with divisions only at the end.
    Bigint headroom: |q| ≤ 10⁶ ⇒ (Σq)² fits up to ~3M vectors per
    dimension; past that the same sums run on decimal(38,0) unchanged.
    Plan: one posexplode inside the scan stage (integer (dim, q) pairs
    shuffle — never vectors), one map-side-combinable groupBy(dim) to
    |dims| rows."""
    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    q = spread(e).select(
        F.posexplode("embedding").alias("d0", "x")
    ).select(
        (F.col("d0") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
    )
    agg = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("qv").cast("bigint").alias("sq"),
        F.sum(F.col("qv") * F.col("qv")).cast("bigint").alias("sqq"),
    )
    return agg.select(
        "dim",
        "n_vecs",
        F.round(F.col("sq") / 1000000.0 / F.col("n_vecs"), 4).alias("mean"),
        F.round(
            (F.col("n_vecs") * F.col("sqq") - F.col("sq") * F.col("sq"))
            * 1.0
            / (F.col("n_vecs") * F.col("n_vecs"))
            / 1000000000000.0,
            4,
        ).alias("variance"),
    )


_PCA_ROUNDS = 3


def _pca_round_cte(k: int) -> str:
    """One integer-quantized power-iteration round as CTEs."""
    return f"""
    dot{k} AS (
        SELECT q.vec_id,
               CAST(sum(q.qv * v.qv) AS BIGINT) // 1000000 AS dt
        FROM qx q JOIN v{k - 1} v ON q.dim = v.dim
        GROUP BY q.vec_id
    ),
    w{k} AS (
        SELECT q.dim, CAST(sum(q.qv * d.dt) AS BIGINT) AS w
        FROM qx q JOIN dot{k} d ON q.vec_id = d.vec_id
        GROUP BY q.dim
    ),
    n{k} AS (
        SELECT CAST(floor(sqrt(CAST(sum(CAST(w AS HUGEINT) * w) AS DOUBLE)))
                    AS BIGINT) // 1000000 AS nd
        FROM w{k}
    ),
    v{k} AS (SELECT dim, w // nd AS qv FROM w{k} CROSS JOIN n{k})"""


@register(
    "emb_pca_power_iteration",
    oracle="""
    WITH qx AS (
        SELECT vec_id, CAST(i AS BIGINT) AS dim,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS qv
        FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) r(i)
    ),
    v0 AS (SELECT DISTINCT dim, CAST(125000 AS BIGINT) AS qv FROM qx),"""
    + ",".join(_pca_round_cte(k) for k in range(1, _PCA_ROUNDS + 1))
    + f"""
    SELECT dim, round(qv / 1000000.0, 4) AS loading
    FROM v{_PCA_ROUNDS}
    """,
)
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal direction of the (uncentered) embedding matrix by
    THREE power-iteration rounds — iterative linear algebra as pure
    DataFrame joins/aggregates, the pattern that scales PCA/embedding
    diagnostics to matrices far beyond single-node memory (each round is
    one X·v and one Xᵀ·(Xv), both map-side-combinable aggregates over
    the (vec, dim, value) triples; v rides as a |dims|-row frame, the
    data is never collected).

    Exactness — the whole iteration is INTEGER arithmetic: coordinates
    quantize once to micro-units; each round's dot products are
    order-free bigint sums rescaled by exact integer division (both
    engines' `div` truncates toward zero, verified incl. negatives);
    the normalizer floor(√Σw²) computes Σw² in decimal(38,0)/HUGEINT
    (reaches ~10³⁵). Both engines therefore walk BIT-IDENTICAL integer
    states — no float accumulation-order drift across three rounds
    (start v₀ = 0.125·1 exactly). Headroom documented per term; at
    larger scale the same chain runs with one more `div` rescale.
    Convergence: each round provably raises the Rayleigh quotient
    (invariant-tested); landing ON the top eigenvector additionally
    needs a spectral gap — the fixture's near-isotropic synthetic
    embeddings don't have one, so this op is the MECHANISM demo (plus
    round count as a dial: one more round = one more CTE pair), not a
    claim that 3 rounds diagonalize arbitrary data."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qx = spread(e).select(
        "vec_id", F.posexplode("embedding").alias("d0", "x")
    ).select(
        "vec_id",
        (F.col("d0") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
    )
    qx = durable_checkpoint(qx, eager=False)
    v = qx.select("dim").distinct().select(
        "dim", F.lit(125000).cast("bigint").alias("qv")
    )
    for _k in range(_PCA_ROUNDS):
        # r16 opt: v is |dims| rows — bounded by embedding dimensionality
        # (a model constant), never by corpus size — so the broadcast pin
        # is unconditional and scale-safe. The size gate could not see
        # this: v's lineage roots in the checkpointed qx (LogicalRDD),
        # whose Catalyst size estimate is the unknown-size default, so the
        # gate always declined and every round paid a shuffle join of qx.
        dot = (
            qx.join(F.broadcast(v.withColumnRenamed("qv", "vq")), "dim")
            .groupBy("vec_id")
            .agg(
                F.expr("CAST(sum(qv * vq) AS BIGINT) div 1000000").alias("dt")
            )
        )
        w = (
            qx.join(size_gated_broadcast(dot), "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("qv") * F.col("dt")).cast("bigint").alias("w"))
        )
        n = w.agg(
            F.expr(
                "CAST(floor(sqrt(CAST(sum(CAST(w AS decimal(38,0)) * w) AS DOUBLE)))"
                " AS BIGINT) div 1000000"
            ).alias("nd")
        )
        v = (
            w.crossJoin(F.broadcast(n))
            .select("dim", F.expr("w div nd").cast("bigint").alias("qv"))
        )
        v = durable_checkpoint(v, eager=False)
    return v.select("dim", F.round(F.col("qv") / 1000000.0, 4).alias("loading"))


_MMR_POOL = 20   # relevance shortlist fed to the diversifier
_MMR_K = 5       # picks
_MMR_LAM = 7     # λ = 0.7 as an integer fraction (7/10)


def _mmr_pick_cte(k: int) -> str:
    """Round k (k ≥ 2): score unpicked candidates by
    (λ·rel − (1−λ)·max-sim-to-selected) in micro-units, pick the argmax."""
    union = " UNION ALL ".join(f"SELECT vec_id FROM s{j}" for j in range(1, k))
    return f"""
    sel{k - 1} AS ({union}),
    s{k} AS (
        SELECT c.vec_id,
               (7 * c.rel_u - 3 * max(sm.sim_u)) // 10 AS mmr_u
        FROM cand c
        JOIN sims sm ON sm.va = c.vec_id
        WHERE sm.vb IN (SELECT vec_id FROM sel{k - 1})
          AND c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
        GROUP BY c.vec_id, c.rel_u
        ORDER BY mmr_u DESC, c.vec_id
        LIMIT 1
    )"""


@register(
    "sim_mmr_rerank",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cand AS (
        SELECT vec_id, rel_u, embedding FROM (
            SELECT e.vec_id, e.embedding,
                   CAST(floor(("""
    + _cos_sql("e.embedding", "q.qe")
    + """) * 1000000) AS BIGINT) AS rel_u,
                   row_number() OVER (ORDER BY floor(("""
    + _cos_sql("e.embedding", "q.qe")
    + """) * 1000000) DESC, e.vec_id) AS rn
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != 0
        ) WHERE rn <= 20
    ),
    sims AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(floor(("""
    + _cos_sql("a.embedding", "b.embedding")
    + """) * 1000000) AS BIGINT) AS sim_u
        FROM cand a JOIN cand b ON a.vec_id != b.vec_id
    ),
    s1 AS (
        SELECT vec_id, rel_u AS mmr_u FROM cand
        ORDER BY rel_u DESC, vec_id LIMIT 1
    ),"""
    + ",".join(_mmr_pick_cte(k) for k in range(2, _MMR_K + 1))
    + """
    SELECT pick, p.vec_id,
           round(c.rel_u / 1000000.0, 4) AS relevance,
           round(p.mmr_u / 1000000.0, 4) AS mmr_score
    FROM ("""
    + " UNION ALL ".join(
        f"SELECT vec_id, mmr_u, {k} AS pick FROM s{k}" for k in range(1, _MMR_K + 1)
    )
    + """) p JOIN cand c ON p.vec_id = c.vec_id
    """,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (λ=0.7, k=5 picks from a
    20-candidate relevance shortlist for query vector 0) — the
    diversity-aware serving stage after ANN retrieval: each round picks
    argmax λ·rel(c) − (1−λ)·max_{s∈picked} sim(c,s), so near-duplicate
    neighbors can't monopolize the result page.

    Exactness: relevance and pairwise similarities quantize ONCE to
    floor(cos·10⁶) integers (the `sim_topk_bruteforce` rank-key
    discipline); every round's MMR score is the integer expression
    (7·rel_u − 3·max_sim_u) div 10 with (score, vec_id) total-order
    tie-breaks — the greedy trajectory is therefore IDENTICAL in both
    engines (a float argmax could diverge at round 1 and cascade).
    Plan/scale: the O(pool²) similarity matrix is 400 pairs from the
    shortlist — never the corpus; the corpus is touched once by the
    relevance scan (broadcast query). Greedy rounds are k−1 tiny
    join+argmax steps over ≤pool rows — the standard serve-time
    funnel: ANN recall → shortlist → MMR."""
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    )
    rel_u = F.floor(cosine_similarity(F.col("embedding"), F.col("qe")) * 1e6).cast(
        "bigint"
    )
    # checkpoint the 20-row shortlist: five greedy rounds re-consume it
    # (and the 400-row sims matrix below) — without the cut, each round's
    # plan re-derives the corpus-scale relevance scan, and the final plan
    # is 5 scans deep (measured 7.7 s at sf0.1; ~2 s with the cut)
    #
    # r16 opt (guide §2.4/§2.5): the shortlist was a global row_number
    # window — WindowExec with no PARTITION BY moves the WHOLE corpus
    # (embedding arrays included) onto ONE partition and sorts it there.
    # (rel_u desc, vec_id) is a total order, so `rn <= POOL` is exactly
    # the top-POOL rows — orderBy().limit() computes the same set as a
    # distributed TakeOrderedAndProject (per-partition top-POOL, tiny
    # driver merge), no single-partition sort, no corpus exchange. The
    # spread parallelizes the per-row cosine fold on the 1-partition
    # fixture scan (no-op on multi-split tables).
    cand = durable_checkpoint(
        spread(e.filter(F.col("vec_id") != 0))
        .crossJoin(q)
        .select("vec_id", "embedding", rel_u.alias("rel_u"))
        .orderBy(F.col("rel_u").desc(), "vec_id")
        .limit(_MMR_POOL),
        eager=False,
    )
    a = cand.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea")
    )
    b = cand.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb")
    )
    sims = durable_checkpoint(
        a.join(F.broadcast(b), F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            F.floor(cosine_similarity(F.col("ea"), F.col("eb")) * 1e6)
            .cast("bigint")
            .alias("sim_u"),
        ),
        eager=False,
    )
    slim = cand.select("vec_id", "rel_u")
    picked = (
        slim.orderBy(F.col("rel_u").desc(), "vec_id")
        .limit(1)
        .select("vec_id", F.col("rel_u").alias("mmr_u"), F.lit(1).alias("pick"))
    )
    for k in range(2, _MMR_K + 1):
        sel = picked.select("vec_id")
        nxt = (
            slim.join(sel, "vec_id", "left_anti")
            .join(sims, F.col("va") == F.col("vec_id"))
            .join(sel.withColumnRenamed("vec_id", "vb"), "vb")
            .groupBy("vec_id", "rel_u")
            .agg(F.max("sim_u").alias("ms"))
            .select(
                "vec_id",
                F.expr("(7 * rel_u - 3 * ms) div 10").alias("mmr_u"),
            )
            .orderBy(F.col("mmr_u").desc(), "vec_id")
            .limit(1)
            .select("vec_id", "mmr_u", F.lit(k).alias("pick"))
        )
        # r16 opt (guide §3.3 "planning time itself can become the
        # bottleneck"): round k's argmax references ALL prior rounds (the
        # anti-join's `sel` AND the union), so the unrolled plan grew
        # ~2^k — 4,811 formatted lines / 121 TakeOrderedAndProject nodes
        # over ≤20-row frames, all Catalyst planning, no data. A lazy
        # lineage cut per round makes round k+1 reference a ≤k-row RDD
        # scan instead of the whole prior tree (plan now linear in k);
        # the k picked rows themselves are identical.
        picked = durable_checkpoint(picked.unionByName(nxt), eager=False)
    return picked.join(slim, "vec_id").select(
        "pick",
        "vec_id",
        F.round(F.col("rel_u") / 1000000.0, 4).alias("relevance"),
        F.round(F.col("mmr_u") / 1000000.0, 4).alias("mmr_score"),
    )


@register(
    "sim_hnsw_layer_plan",
    oracle="""
    WITH lv AS (
        SELECT vec_id,
               least(length(md5(CAST(vec_id AS VARCHAR)))
                     - length(ltrim(md5(CAST(vec_id AS VARCHAR)), '0')),
                     6) AS layer
        FROM embeddings
    ),
    hist AS (
        SELECT layer, CAST(count(*) AS BIGINT) AS n_vectors
        FROM lv GROUP BY 1
    ),
    entry AS (
        SELECT min(vec_id) AS entry_vec
        FROM lv WHERE layer = (SELECT max(layer) FROM lv)
    )
    SELECT h.layer, h.n_vectors,
           CAST(sum(h.n_vectors) OVER (ORDER BY h.layer DESC) AS BIGINT)
               AS reachable_vectors,
           e.entry_vec
    FROM hist h CROSS JOIN entry e
    """,
)
def sim_hnsw_layer_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW layer-assignment plan: every vector's maximum layer is
    drawn from the geometric distribution HNSW requires — here
    DETERMINISTICALLY as the number of leading zero hex digits of
    md5(vec_id), capped at 6 (P(layer ≥ k) = 16⁻ᵏ, i.e. mL = 1/ln 16)
    — plus the per-layer census, the cumulative vectors reachable
    descending from the top, and the entry point (smallest id on the
    top layer). This is the index-BUILD planning artifact: layer
    sizes decide per-layer graph memory and build fan-out sharding;
    the content-addressed draw means re-planning the same corpus
    yields the same index skeleton (reproducible builds — the same
    md5-threshold trick as the sampling operators).

    Engine-exact by construction (md5 and integer comparisons only).
    Plan: one narrow scan, a |layers|-row aggregate, a 1-row entry
    broadcast."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    h = F.md5(F.col("vec_id").cast("string"))
    # NOT ltrim(str, '0'): Spark's two-arg ltrim takes (trimStr, str) —
    # reversed vs DuckDB/ANSI — the standard TRIM(LEADING ...) is portable
    stripped = F.expr("trim(LEADING '0' FROM md5(CAST(vec_id AS STRING)))")
    layer = F.least(
        F.length(h) - F.length(stripped), F.lit(6)
    ).alias("layer")
    lv = e.select("vec_id", layer)
    hist = lv.groupBy("layer").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    top = lv.agg(F.max("layer").alias("top_layer"))
    entry = (
        lv.join(F.broadcast(top), lv.layer == top.top_layer)
        .agg(F.min("vec_id").alias("entry_vec"))
    )
    wcum = Window.orderBy(F.col("layer").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.withColumn(
            "reachable_vectors", F.sum("n_vectors").over(wcum).cast("bigint")
        )
        .crossJoin(F.broadcast(entry))
        .select("layer", "n_vectors", "reachable_vectors", "entry_vec")
    )


@register(
    "emb_centroid_drift",
    oracle="""
    WITH q AS (
        SELECT label, vec_id % 2 = 0 AS half_a, CAST(i AS BIGINT) AS dim,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS qv
        FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) r(i)
    ),
    cent AS (
        SELECT label, half_a, dim,
               CAST(sum(qv) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
        FROM q GROUP BY 1, 2, 3
    ),
    diffs AS (
        SELECT a.label, a.dim, a.c - b.c AS d
        FROM cent a JOIN cent b
          ON a.label = b.label AND a.dim = b.dim AND a.half_a AND NOT b.half_a
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_dims,
           round(sqrt(CAST(sum(d * d) AS DOUBLE)) / 1000000.0, 4)
               AS drift_l2,
           round(max(abs(d)) / 1000000.0, 4) AS drift_max_dim
    FROM diffs GROUP BY label
    """,
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid DRIFT between the even-id and odd-id halves of
    the embedding table — the embedding-space stability check run when
    a corpus (or encoder) is updated: a label whose centroid moved is a
    class whose meaning shifted, and downstream k-NN/centroid
    classifiers (`emb_centroid_per_label`) need recalibration.

    Exactness: coordinates quantize to integer micro-units, per-half
    centroids come from EXACT integer division of bigint sums, and the
    L2 drift is one sqrt over an order-free bigint sum of squared
    integer differences. Plan: one posexplode pass, one (label, half,
    dim) aggregate — integer triples shuffle, never vectors — then a
    |labels|·|dims| self-join on the tiny centroid frame."""
    e = load_table(spark, sf_dir, "embeddings")
    q = spread(e).select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("half_a"),
        F.posexplode("embedding").alias("d0", "x"),
    ).select(
        "label",
        "half_a",
        (F.col("d0") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
    )
    cent = q.groupBy("label", "half_a", "dim").agg(
        F.expr("CAST(sum(qv) AS BIGINT) div CAST(count(*) AS BIGINT)").alias("c")
    )
    a = cent.filter(F.col("half_a")).select(
        "label", "dim", F.col("c").alias("ca")
    )
    b = cent.filter(~F.col("half_a")).select(
        "label", "dim", F.col("c").alias("cb")
    )
    d = F.col("ca") - F.col("cb")
    return (
        a.join(b, ["label", "dim"])
        .select("label", "dim", d.alias("d"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dims"),
            F.round(
                F.sqrt(F.sum(F.col("d") * F.col("d")).cast("double")) / 1000000.0, 4
            ).alias("drift_l2"),
            F.round(F.max(F.abs("d")) / 1000000.0, 4).alias("drift_max_dim"),
        )
    )


_JL_K = 8          # target dimensionality of the JL projection
_JL_DIM = 64       # fixture embedding width
# Deterministic ±1 sign matrix (Achlioptas database-friendly JL variant),
# content-addressed from md5 like the signed-LSH planes above: a
# compile-time constant embedded as literals in BOTH engines, so there is
# no in-engine hash-parity surface at all.
_JL_SIGNS = [
    [
        1 if int(hashlib.md5(f"jl{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1
        for i in range(_JL_DIM)
    ]
    for j in range(_JL_K)
]


def _jl_oracle() -> str:
    comps = []
    for j in range(_JL_K):
        plus = [str(i + 1) for i in range(_JL_DIM) if _JL_SIGNS[j][i] == 1]
        minus = [str(i + 1) for i in range(_JL_DIM) if _JL_SIGNS[j][i] == -1]
        comps.append(
            f"(list_sum(list_select(q, [{', '.join(plus)}]))"
            f" - list_sum(list_select(q, [{', '.join(minus)}])))"
        )
    norm_proj = " + ".join(f"y[{j + 1}] * y[{j + 1}]" for j in range(_JL_K))
    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS q
        FROM embeddings
    ),
    proj AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT)
                   AS norm2_q,
               [{', '.join(comps)}] AS y
        FROM q
    )
    SELECT vec_id, norm2_q,
           CAST({norm_proj} AS BIGINT) AS norm2_proj,
           round(({norm_proj}) * 1.0 / ({_JL_K} * norm2_q), 4)
               AS norm_ratio
    FROM proj
    """


@register("emb_random_projection_jl", oracle=_jl_oracle())
def emb_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 → 8 dims with a
    deterministic ±1 sign matrix, reporting the per-vector norm-
    preservation ratio ||Py||²/(k·||x||²) that the JL lemma says
    concentrates near 1 — the dimensionality-reduction primitive that
    turns 100 TB of wide embeddings into join-sized sketches (and the
    front half of `sim_ann_lsh_signed`'s hyperplane trick, kept here as
    a projection rather than a 1-bit quantization).

    Exactness: coordinates quantize ONCE to integer micro-units, the
    projection is then pure ±1 integer summation (order-free), and both
    norms are bigint sums of integer squares — the single float division
    is round(4). The sign matrix is an md5-derived compile-time literal
    in both engines (signed-LSH convention), not an in-engine hash.
    Plan: zero-shuffle — one narrow scan, per-row zip_with/aggregate
    higher-order arrays, no explode, no join; at 100 TB this is a pure
    map stage that pipelines with whatever consumes the sketches."""
    # r16 opt (guide §2.6): spread the 1-partition fixture scan — the
    # per-row JL folds (~9 higher-order passes over 64 elements per
    # vector) are interpreted and otherwise run serially inside the scan
    # stage. "Zero-shuffle" in the docstring refers to the projection
    # itself, which still never explodes or joins; the spread no-ops on a
    # real multi-split table.
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000000 + 0.5).cast("long"),
    )
    qd = e.select("vec_id", q.alias("q"))
    zero = F.lit(0).cast("long")
    comps = [
        F.aggregate(
            F.zip_with(
                F.col("q"),
                F.array(*[F.lit(s).cast("long") for s in _JL_SIGNS[j]]),
                lambda a, b: a * b,
            ),
            zero,
            lambda acc, x: acc + x,
        ).alias(f"y{j}")
        for j in range(_JL_K)
    ]
    norm2q = F.aggregate(
        F.transform(F.col("q"), lambda v: v * v), zero, lambda acc, x: acc + x
    )
    proj = qd.select("vec_id", norm2q.alias("norm2_q"), *comps)
    norm2p = sum(F.col(f"y{j}") * F.col(f"y{j}") for j in range(1, _JL_K)) + (
        F.col("y0") * F.col("y0")
    )
    return proj.select(
        "vec_id",
        "norm2_q",
        norm2p.cast("bigint").alias("norm2_proj"),
        F.round(norm2p * 1.0 / (_JL_K * F.col("norm2_q")), 4).alias("norm_ratio"),
    )


# coarse cells; centroid c = unit embedding of c-th lowest vec_id.  Defined
# AS the shared engine's constant (not a literal) because the Spark side is
# hard-wired to dedup._cell_assignment — a literal here could drift the
# oracle's centroid count away from the engine (r12 review finding).
_HNM_CELLS = _COS_CELLS
_HN_PACK_M = 1 << 40  # packed-argmax radix: candidate-id domain


def _guarded_hn_key(sim_mu, cand):  # -> Column
    """Pack the (sim_mu DESC, cand ASC) pick order into one NONNEGATIVE
    hash-aggregable bigint argmax key, raising loudly on any row outside
    the envelope sim_mu ∈ [-1_000_001, 1_000_000] × cand ∈ [0, 2^40)
    (same ENFORCED-not-audited discipline as dedup's
    `_guarded_line_pack`, ADVICE r13 #1). The envelope is exactly the
    reachable domain — sim_mu is floor(unit-dot·1e6) including the
    antipodal below−1 rounding case — but cand is a USER id: 2^40 ≈
    1.1e12 sits within one order of magnitude of a 100 TB embedding
    corpus's row count, and an id past it would bleed into the sim_mu
    field and silently elect the wrong positive/negative. A NULL
    sim_mu/cand also lands in the otherwise-arm (pre-guard it was
    silently ignored by the max() argmax) and the message names that
    case (ADVICE r14 #1). In-bounds rows pay one codegen'd predicate
    check; raise_error only evaluates on a violation (ADVICE r14 #4:
    a CaseWhen is a per-row conditional, not branch-free)."""
    return (
        F.when(
            (sim_mu >= F.lit(-1_000_001))
            & (sim_mu <= F.lit(1_000_000))
            & (cand >= 0)
            & (cand < F.lit(_HN_PACK_M)),
            (sim_mu + F.lit(1_000_001)) * F.lit(_HN_PACK_M)
            + (F.lit(_HN_PACK_M - 1) - cand),
        )
        .otherwise(
            F.raise_error(
                "emb_hard_negative_mining: (sim_mu, cand) is NULL or "
                "outside the packed-argmax envelope "
                "[-1_000_001, 1_000_000] x [0, 2^40)"
            )
        )
        .cast("bigint")
    )


@register(
    "emb_hard_negative_mining",
    oracle=f"""
    WITH unit AS (SELECT vec_id, label, {_UNIT_SQL} AS u FROM embeddings),
    cent AS (SELECT vec_id AS cell, u AS cu FROM unit
             ORDER BY vec_id LIMIT {_HNM_CELLS}),
    assign AS (
        SELECT vec_id, label, u, cell FROM (
            SELECT e.vec_id, e.label, e.u, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY floor(({_dot_sql('e.u', 'c.cu')}) * 1000000)
                                DESC, c.cell) AS rn
            FROM unit e CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS anchor, a.label AS a_label,
               b.vec_id AS cand, b.label AS c_label,
               CAST(floor(({_dot_sql('a.u', 'b.u')}) * 1000000) AS BIGINT)
                   AS sim_mu
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    pos AS (
        SELECT anchor, cand AS pos_id, sim_mu AS pos_mu FROM (
            SELECT anchor, cand, sim_mu,
                   row_number() OVER (PARTITION BY anchor
                       ORDER BY sim_mu DESC, cand) AS rn
            FROM pairs WHERE a_label = c_label
        ) WHERE rn = 1
    ),
    neg AS (
        SELECT anchor, cand AS neg_id, sim_mu AS neg_mu FROM (
            SELECT anchor, cand, sim_mu,
                   row_number() OVER (PARTITION BY anchor
                       ORDER BY sim_mu DESC, cand) AS rn
            FROM pairs WHERE a_label <> c_label
        ) WHERE rn = 1
    )
    SELECT p.anchor, a.label, p.pos_id,
           round(floor((p.pos_mu + 50) / 100.0) / 10000.0, 4) AS pos_sim,
           n.neg_id,
           round(floor((n.neg_mu + 50) / 100.0) / 10000.0, 4) AS neg_sim,
           round(floor((p.pos_mu - n.neg_mu + 50) / 100.0) / 10000.0, 4)
               AS margin
    FROM pos p
    JOIN neg n ON p.anchor = n.anchor
    JOIN assign a ON p.anchor = a.vec_id
    """,
)
def emb_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative triplet mining for metric-learning / embedding
    fine-tuning: for every anchor vector, the most-similar SAME-label
    neighbor (the positive) and the most-similar DIFFERENT-label
    neighbor (the hard negative) among its coarse-cell candidates, with
    the triplet margin pos−neg — the batch-mining step contrastive
    training pipelines run over a corpus before building triplet
    datasets. Anchors whose cell holds no same-label or no
    different-label partner drop out (inner joins): the op mines
    *in-cell* triplets by design, because that is the only form that
    survives scale.

    Exactness: cell assignment is `dedup_embedding_cosine`'s
    centroid-argmax (unit-normalize once, dot-fold in array order,
    floor(x*1e6) before the ORDER BY so a 1-ulp engine divergence
    cannot flip a cell), and both argmaxes order by the SAME
    floor(dot*1e6) micro-units with cand-id tiebreaks — gate/rank
    decisions never compare raw doubles. Scale shape: candidates come
    from a cell equi-join (never all-pairs; K cells scale with corpus
    size), BOTH argmaxes ride one map-side-combinable PACKED-BIGINT max
    pass over the pair frame (one anchor-keyed exchange, no window sort,
    the join evaluated once; NOT max(struct), which falls back to
    SortAggregate — SCALE.md rule 3), and shuffles carry
    (id, label, sim_mu) ints — vectors stay in the cell-local pair
    stage."""
    # the normalize + 8-cell assignment engine is the session-shared
    # `dedup._cell_assignment` memo (same geometry: _HNM_CELLS ==
    # dedup._COS_CELLS == 8; the oracle CTE above spells it out) — also
    # consumed by dedup_embedding_cosine and mm_crossmodal_near_dup
    from spark_ibm_mq_spark.operators.dedup import _cell_assignment

    assign = _cell_assignment(spark, sf_dir)
    a = assign.select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("a_label"),
        F.col("u").alias("ua"),
        "cell",
    )
    b = assign.select(
        F.col("vec_id").alias("cand"),
        F.col("label").alias("c_label"),
        F.col("u").alias("ub"),
        F.col("cell").alias("cell_b"),
    )
    # r16 opt: dot_unrolled — bit-identical left fold, statically expanded
    # so the half-million in-cell pair dots are codegen'd, not
    # lambda-interpreted (solo median 5.9 s -> 2.1 s). Single-reference
    # site: the expression occurs once in the plan (functions/vector.py
    # docstring for why that matters).
    sim_mu = F.floor(dot_unrolled(F.col("ua"), F.col("ub")) * 1e6).cast("bigint")
    pairs = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("anchor") != F.col("cand")),
        )
        .select("anchor", "a_label", "cand", "c_label", sim_mu.alias("sim_mu"))
    )
    # Both argmaxes in ONE aggregation pass over the pair frame: the
    # (sim_mu desc, cand asc) pick order is packed into a single BIGINT
    # key (sim_mu + 1e6 + 1) * 2^40 + (2^40 - 1 - cand), so max(key) is a
    # plain hash-aggregable bigint max — a max(struct) pick here falls
    # back to SortAggregate and SORTS the whole pair frame twice
    # (measured ~1.6x slower than even the old two-window form).
    # vs the two-window form this computes the cell join once instead of
    # twice and the partial max combines map-side before the single
    # (anchor)-keyed exchange. Bounds (SCALE.md rule 7): the offset is
    # 1e6 + 1, NOT 1e6, because a double dot of antipodal unit vectors
    # can round just below -1 so sim_mu = floor(dot*1e6) reaches
    # -1_000_001; the extra +1 keeps the key NONNEGATIVE there (Spark's
    # DIV/% truncate toward zero, so a negative key would decode to the
    # wrong (sim_mu, cand)). Upper side: dot rounding above +1 still
    # floors to 1_000_000, so offset sim_mu ≤ 2e6 + 1 and key ≤
    # (2e6+1)·2^40 + 2^40 ≈ 2.2e18 < 2^63. The envelope — including the
    # cand < 2^40 id headroom a 100 TB vec-id space approaches — is
    # ENFORCED by `_guarded_hn_key`, not just audited.
    _m = _HN_PACK_M
    key = _guarded_hn_key(F.col("sim_mu"), F.col("cand"))
    same = F.col("a_label") == F.col("c_label")
    picked = (
        pairs.groupBy("anchor", "a_label")
        .agg(
            F.max(F.when(same, key)).alias("pk"),
            F.max(F.when(~same, key)).alias("nk"),
        )
        .filter(F.col("pk").isNotNull() & F.col("nk").isNotNull())
        .select(
            "anchor",
            "a_label",
            F.struct(
                F.expr(f"pk DIV {_m} - 1000001").alias("sim_mu"),
                F.expr(f"{_m - 1} - pk % {_m}").alias("cand"),
            ).alias("pp"),
            F.struct(
                F.expr(f"nk DIV {_m} - 1000001").alias("sim_mu"),
                F.expr(f"{_m - 1} - nk % {_m}").alias("cand"),
            ).alias("np"),
        )
    )
    def _r4(mu):
        # micro-units -> 4dp with explicit integer half-up: floor((mu+50)/100)
        # is identical in both engines (the raw /1e6-then-round(4) differs on
        # exact .00005 boundaries: Spark HALF_UPs the decimal repr, DuckDB
        # rounds the nearest-double which can sit just below the boundary)
        return F.round(F.floor((mu + 50) / 100.0) / 10000.0, 4)

    return picked.select(
        "anchor",
        F.col("a_label").alias("label"),
        F.col("pp.cand").alias("pos_id"),
        _r4(F.col("pp.sim_mu")).alias("pos_sim"),
        F.col("np.cand").alias("neg_id"),
        _r4(F.col("np.sim_mu")).alias("neg_sim"),
        _r4(F.col("pp.sim_mu") - F.col("np.sim_mu")).alias("margin"),
    )


# Shared-helper dependency declarations (see registry.declare_helper_deps).
from spark_ibm_mq_spark.operators.dedup import _cell_assignment as _dedup_cells  # noqa: E402,E501
from spark_ibm_mq_spark.registry import declare_helper_deps  # noqa: E402

# the envelope guard is computation-bearing (it builds the argmax key),
# so it is declared like any shared engine: an edit to its packing
# arithmetic must re-open the consumer's green (r14 review finding —
# the guard was briefly undeclared, the exact stale-green class the
# transitive census exists to close).
from spark_ibm_mq_spark.tables import session_memo as _session_memo  # noqa: E402

# _dedup_cells (dedup._cell_assignment) is session_memo-backed, so its
# consumer declares the memo engine too (census-enforced)
declare_helper_deps(
    "emb_hard_negative_mining", _dedup_cells, _guarded_hn_key, _session_memo
)

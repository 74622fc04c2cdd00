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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.functions.vector import cosine_similarity, dot
from spark_ibm_mq_spark.operators.dedup import _COS_SQL
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table

_TOP_K = 5
_N_QUERIES = 5  # vec_id < 5 are the query vectors


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT q_id, n_id, cos_sim, rank FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS n_id,
               round({_COS_SQL}, 4) AS cos_sim,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY round({_COS_SQL}, 6) DESC, b.vec_id) AS rank
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
        F.round(F.col("cos_raw"), 6).desc(), F.col("n_id")
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
    planes = _hyperplanes(dim, n_planes)
    planes_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in planes])

    def bucket_of(vec_col):
        bits = [
            F.when(dot(vec_col, planes_col.getItem(i)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
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
                       ORDER BY round({_cos_sql('e.embedding', 'c.ce')}, 6) DESC, c.cell
                   ) AS rn
            FROM embeddings e CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    probe AS (
        SELECT q_id, qe, cell FROM (
            SELECT q.vec_id AS q_id, q.embedding AS qe, c.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_cos_sql('q.embedding', 'c.ce')}, 6) DESC, c.cell
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
                   ORDER BY round({_cos_sql('p.qe', 'a.ne')}, 6) DESC, a.n_id
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
        F.round(F.col("c_sim"), 6).desc(), F.col("cell")
    )
    assign = (
        e.crossJoin(cent)
        .withColumn("c_sim", cosine_similarity(F.col("embedding"), F.col("ce")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("n_id"), "cell", F.col("embedding").alias("ne"))
    )
    # probe list: nprobe nearest cells per query vector
    w_probe = Window.partitionBy("q_id").orderBy(
        F.round(F.col("c_sim"), 6).desc(), F.col("cell")
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
        F.round(F.col("cos_raw"), 6).desc(), F.col("n_id")
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

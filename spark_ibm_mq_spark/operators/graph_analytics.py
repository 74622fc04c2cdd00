"""Graph analytics over fact-table-derived graphs: PageRank on the
co-purchase graph.

Companion to `dedup.dedup_cluster_resolve` (connected components — the
other iterative graph primitive): where components answer "which items are
transitively linked", PageRank answers "which items are CENTRAL", the
importance prior recommendation and sampling pipelines weight by. The
edge list comes from the same self-equi-join-on-container shape as
`affinity_copurchase_pmi` — parts co-occurring in an order — so the graph
is symmetric and every vertex has out-degree ≥ 1 (no dangling-mass term).

Scale notes: each round is one join (edges ⋈ ranks on src) + one
map-side-combinable groupBy(dst) + one left join back to the vertex set —
all keyed on the part key. The PER-ROUND input (edges ⋈ out-degree) is
checkpointed once before the loop (`durable_checkpoint`: reliable
`checkpoint` when the session has a checkpoint dir, executor-local
otherwise), so the order-pair self-join and degree aggregate run exactly
once and every round starts from materialized, src-partitioned blocks.
The rank side of the per-round join goes through `size_gated_broadcast`:
a vertex frame that fits the broadcast threshold skips the edge-side
shuffle entirely; a 100 TB-scale vertex set degrades safely to the
shuffle join on src. At 100 TB, raise the round count and checkpoint the
rank frame every ~5 rounds — the same lineage discipline as the
connected-components loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import (
    durable_checkpoint,
    load_table,
    size_gated_broadcast,
)

_DAMP = 0.85
_ROUNDS = 3

_GRAPH_CTE = """
    WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    edges AS (
        SELECT DISTINCT a.pk AS src, b.pk AS dst
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes)
"""


def _iter_cte(k: int) -> str:
    """One PageRank round as a CTE pair (contribution sum + rank update)."""
    prev = f"r{k - 1}"
    return f"""
    c{k} AS (
        SELECT e.dst, sum(r.pr / d.deg) AS s
        FROM edges e
        JOIN {prev} r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    ),
    r{k} AS (
        SELECT nd.node, 0.15 / n.n_nodes + 0.85 * coalesce(c.s, 0) AS pr
        FROM nodes nd CROSS JOIN n
        LEFT JOIN c{k} c ON nd.node = c.dst
    )"""


@register(
    "graph_pagerank_copurchase",
    oracle=_GRAPH_CTE
    + ", r0 AS (SELECT node, 1.0 / n.n_nodes AS pr FROM nodes CROSS JOIN n),"
    + ",".join(_iter_cte(k) for k in range(1, _ROUNDS + 1))
    + f"""
    SELECT r.node AS part, d.deg AS out_degree,
           round(r.pr * n.n_nodes, 4) AS pr_norm
    FROM r{_ROUNDS} r
    JOIN deg d ON r.node = d.src
    CROSS JOIN n
    """,
)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 synchronous rounds from a uniform start)
    over the part co-purchase graph: vertices are parts, edges link parts
    appearing in the same order (both directions, so the graph is
    symmetric and dangling-free). Output is the SIZE-NORMALIZED rank
    pr·N — ≈1.0 for an average part — so the value survives round(4)
    at any graph size, where the raw probability (~1/N) would collapse.

    The edge build is the `affinity_copurchase_pmi` candidate shape:
    distinct (order, part) self-equi-joined on the order key, so edge
    volume is Σ width(order)², bounded by basket width. Each round is
    join-on-src → groupBy(dst) partial-agg → left join to the vertex set;
    the vertex count rides as a 1-row broadcast. Rank mass: symmetric
    edges mean no dangling vertices, so the 0.15/N teleport plus 0.85×
    the in-flow is the complete update — no dangling-redistribution term
    to shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = op.select("ok", F.col("pk").alias("src"))
    b = op.select("ok", F.col("pk").alias("dst"))
    edges = a.join(b, "ok").filter(F.col("src") != F.col("dst")).select(
        "src", "dst"
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # checkpoint the PER-ROUND input (edges ⋈ out-degree), not the raw
    # edge list: every round and the vertex/degree frames all start from
    # this one materialization, so the order-pair self-join and the degree
    # aggregate run exactly once instead of once per consumer
    contrib_src = durable_checkpoint(edges.join(deg, "src"), eager=False)
    nodes = contrib_src.select(F.col("src").alias("node")).distinct()
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for _ in range(_ROUNDS):
        c = (
            contrib_src.join(
                size_gated_broadcast(ranks.withColumnRenamed("node", "src")),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n))
            .join(c.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(0.15) / F.col("n_nodes")
                    + F.lit(_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    node_deg = contrib_src.select(
        F.col("src").alias("node"), "deg"
    ).distinct()
    return (
        ranks.join(node_deg, "node")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("node").alias("part"),
            F.col("deg").alias("out_degree"),
            F.round(F.col("pr") * F.col("n_nodes"), 4).alias("pr_norm"),
        )
    )

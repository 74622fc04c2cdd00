"""Item-affinity analytics: market-basket co-occurrence with PMI scoring.

The reference's consumers land order/line messages into exactly these fact
tables (IBMMQReceiver.java:306-312 record shape); this module answers the
"what sells together" question over them — the association-mining rollup a
training-data pipeline also reuses for co-occurrence statistics over any
(container, item) pair table (doc↔entity, session↔page, order↔part).

Scale notes: the pair generator is a SELF-EQUI-JOIN on the container key,
so candidate volume is Σ width(order)² — bounded by the widest basket
(O(7) lineitems in TPC-H), never |items|². Marginals and the pair counts
are both map-side-combinable groupBys, and the two marginal joins hash on
the part key; the order-count scalar rides in as a 1-row broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table


@register(
    "affinity_copurchase_pmi",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
    marg AS (SELECT l_partkey, count(*) AS c FROM op GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_co
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT part_a, part_b, n_co,
           round(ln(n_co * 1.0 * n.n_orders / (ma.c * mb.c)), 4) AS pmi
    FROM pairs, n
    JOIN marg ma ON part_a = ma.l_partkey
    JOIN marg mb ON part_b = mb.l_partkey
    """,
)
def affinity_copurchase_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase affinity: for every part pair appearing together in ≥2
    orders, pointwise mutual information ln(P(a,b) / (P(a)·P(b))) — the
    association score that separates "bought together because both are
    popular" (PMI≈0) from genuine affinity (PMI>0).

    Plan: distinct (order, part) → self-equi-join on the order key with
    part_a < part_b (pairs per order = C(width,2), bounded by basket
    width, NOT a cartesian) → pair counts with map-side combine → two
    hash joins against the part marginals → the global order count joins
    as a broadcast 1-row frame. At 100 TB the pair frame shuffles on
    (part_a, part_b); the n_co ≥ 2 support floor prunes the long tail
    BEFORE the marginal joins, the same support-pruning a-priori uses."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    marg = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    ma = marg.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    mb = marg.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(ma, "part_a")
        .join(mb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_co",
            F.round(
                F.log(
                    F.col("n_co") * F.col("n_orders")
                    / (F.col("ca") * F.col("cb"))
                ),
                4,
            ).alias("pmi"),
        )
    )

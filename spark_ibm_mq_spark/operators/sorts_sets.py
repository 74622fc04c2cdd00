"""Sorts / limits / top-k and set operations (SURVEY.md §2.2).

The reference's total order is its monotone key (IBMMQReceiver.java:259);
global sort here is the batch equivalent of its ordered replay. Union is
the multi-queue merge (one receiver per queue, IBMMQReceiver.java:425).

Scale notes: global orderBy is a range-partitioned sort (sampled bounds) —
acceptable only when followed by LIMIT (TakeOrderedAndProject) or when the
query semantically demands total order. Set ops are shuffle-based distincts;
prefer the ALL variants when multiplicity matters to skip a dedup pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table


@register(
    "sort_topn_offset",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS price, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
)
def sort_topn_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + offset + limit. Unique tie-break (o_orderkey) makes the
    selected window deterministic. Physical plan: TakeOrderedAndProject —
    a per-partition top-25 then driver merge, never a full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 4).alias("price"), "o_orderpriority")
        .offset(5)
        .limit(20)
    )


@register(
    "sort_within_partitions",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate,
           round(l_extendedprice, 4) AS price
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    """,
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (SURVEY §2.2 Sorts): repartition by order key,
    then `sortWithinPartitions` — NO range exchange, no global merge. This
    is the write-optimized-layout primitive at 100 TB: cluster rows inside
    each output split (for parquet min/max pruning or a downstream
    merge-join) at the cost of a hash exchange + local sort, where a global
    orderBy would add a sampled range exchange and a single merge point.

    The row SET is order-independent, so the order-insensitive driver hash
    compares values while the plan test pins the Sort(global=false) shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= "1995-01-01")
        .repartition("l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            F.round("l_extendedprice", 4).alias("price"),
        )
    )


@register(
    "set_union_by_name",
    oracle="""
    SELECT event_id, user_id, value, 'click' AS kind, NULL AS props FROM events
    WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, value, 'purchase' AS kind, props FROM events
    WHERE event_type = 'purchase'
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns — the multi-queue stream merge
    (§2.2 Set operations) tolerating schema drift between queues."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "value", F.lit("click").alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", F.lit("purchase").alias("kind"), "props"
    )
    return clicks.unionByName(purchases, allowMissingColumns=True)


@register(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers and
    suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "set_except_all_flags",
    oracle="""
    SELECT l_returnflag FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
    EXCEPT ALL
    SELECT l_returnflag FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-07-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def set_except_all_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference preserves multiplicity)."""
    li = load_table(spark, sf_dir, "lineitem")
    h1 = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("l_returnflag")
    h2 = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_returnflag")
    return h1.exceptAll(h2)


@register(
    "distinct_flag_combos",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flag_combos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — partial-aggregate dedup before the shuffle, so the exchange
    carries unique combos only."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "set_intersect_all_flags",
    oracle="""
    SELECT l_returnflag FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
    INTERSECT ALL
    SELECT l_returnflag FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-07-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def set_intersect_all_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection: min of per-side multiplicities)."""
    li = load_table(spark, sf_dir, "lineitem")
    h1 = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("l_returnflag")
    h2 = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_returnflag")
    return h1.intersectAll(h2)

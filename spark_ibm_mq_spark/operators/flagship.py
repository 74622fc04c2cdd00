"""M0 flagship: pricing summary over lineitem (TPC-H Q1 shape).

Exercises the core scan→filter→partial/final hash-aggregate→sort pipeline.
Scale notes: the shipdate filter and the 7-column projection push into the
parquet scan (PushedFilters/ReadSchema); the groupBy keys are 2 low-cardinality
flags, so the shuffle after partial aggregation moves only ~6 rows per
partition — this plan is shuffle-light at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table

_CUTOFF = "1998-09-02"


@register(
    "pricing_summary",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        round(sum(l_quantity), 4)                                        AS sum_qty,
        round(sum(l_extendedprice), 4)                                   AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
        round(avg(l_quantity), 4)                                        AS avg_qty,
        round(avg(l_extendedprice), 4)                                   AS avg_price,
        round(avg(l_discount), 4)                                        AS avg_disc,
        count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → groupBy → sum/avg/count → sort. Mirrors the consumption-side
    aggregation contract (SURVEY.md §2.2 Aggregations; reference consumers do
    this in vanilla Spark per README.md:10-17)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "sql_api_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def sql_api_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the plain SQL API (spark.sql over temp views):
    the textual surface next to the DataFrame API, same Catalyst plan."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_sql")
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer_sql JOIN orders_sql ON c_custkey = o_custkey
                          JOIN lineitem_sql ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )

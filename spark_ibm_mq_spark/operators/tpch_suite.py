"""TPC-H-shaped multi-join analytical suite (SURVEY.md §2.2 Joins/Aggregations).

The reference's ingested data is consumed with vanilla Spark relational ops
(reference README.md:10-17); this module covers the classic warehouse shapes —
multi-way star joins, disjunctive predicates, correlated-IN rewrites, ratio
aggregates — on the TPC-H-ish fixture star schema (FIXTURES.md).

Scale notes (100 TB design point):
- ``region``/``nation`` are tiny and ``supplier``/``part`` grow sub-linearly
  vs the fact table: all joined via ``F.broadcast`` so the only shuffles are
  on fact-table keys (``l_orderkey``/``o_custkey``) — Catalyst then plans
  one shuffle per fact join and the small sides never move.
- ``customer`` at 100 TB is NOT broadcastable: those joins stay shuffle
  hash/sort-merge on purpose, and AQE handles skewed customer keys.
- Date-range filters sit directly on the parquet scans (PushedFilters), so
  partition pruning on a date-partitioned 100 TB lineitem cuts IO first.
- Q18's ``HAVING sum(qty) > T`` pre-aggregates lineitem by orderkey BEFORE
  joining (a semi-join on an aggregated key list), so the big join only sees
  qualifying orders.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table

def _rev():
    # built per-call: PySpark 4 Column construction needs an active session
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, revenue by supplier nation within a
    region, where supplier and customer share a nation. lineitem⋈orders is
    the one real shuffle; supplier/nation/region broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_12')
          OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_3'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The nation dimension self-joins under two aliases (supplier side /
    customer side) — both broadcast; the disjunctive nation-pair predicate is
    applied after both broadcasts so Catalyst can still push each equality."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_12")
    ) | ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev(),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_12' THEN volume ELSE 0 END), 4) AS nation_volume,
           round(sum(volume), 4) AS total_volume
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND s_nationkey = n2.n_nationkey AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of ECONOMY-part revenue
    sold into a region, by order year. Emits numerator and denominator as
    separately-rounded columns (the share itself is a trivially derived
    ratio; rounding num/denom keeps the oracle hash float-stable)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), _rev(), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_12", F.col("volume")).otherwise(0.0)), 4
            ).alias("nation_volume"),
            F.round(F.sum("volume"), 4).alias("total_volume"),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 4) AS acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned items in
    a two-quarter window. Top-k = sort + limit (TakeOrderedAndProject — no
    global sort materialization); tie-broken on c_custkey so the LIMIT cut is
    deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * round(sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4)
                 / round(sum(l_extendedprice * (1 - l_discount)), 4), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO revenue share for one quarter. Single broadcast
    join + global aggregate; numerator and denominator each rounded before
    the ratio so both engines divide identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.round(F.sum(promo), 4) / F.round(F.sum(rev), 4), 4
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 4) AS totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold, with
    their customers. The IN-subquery becomes an aggregate + left-semi join:
    lineitem pre-aggregates by orderkey FIRST, so the expensive 3-way join
    only touches qualifying orders. l_quantity is integer-valued, so the
    HAVING comparison on an unrounded sum is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
          (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 5 AND 30)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 5 AND 40 AND l_quantity BETWEEN 10 AND 40))
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing both
    join sides. The equi-join key still extracts (broadcast hash join on
    p_partkey); the disjunction evaluates as a post-join filter inside the
    same codegen stage — no BNLJ."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(5, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(5, 40)
            & F.col("l_quantity").between(10, 40)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter→global-aggregate, the pushdown litmus
    test — all three predicates reach the parquet scan (PushedFilters), the
    projection is 4 columns (ReadSchema), and the aggregate is a partial→
    final pair moving one row per partition. The cheapest possible plan for
    this query at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram including zero-order
    customers — the left join keeps them, `count(o_orderkey)` counts only
    matches, and the join-side filter lives in the join condition (NOT a
    WHERE, which would drop the nulls). Two aggregations: the first
    shuffles on c_custkey, the second on the tiny count domain."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarter revenue per supplier, then
    the supplier(s) hitting the maximum — the scalar-subquery-on-aggregate
    pattern, decorrelated as: aggregate once, reduce the 1-row max,
    broadcast it back over the (already tiny) per-supplier rollup. The only
    fact-table pass is the first aggregation (filter pushed to the scan);
    everything after operates on |suppliers| rows. Revenue is rounded to 4
    decimals BEFORE the max-equality on both engines: comparing raw
    float sums across engines at equality is exactly the 1-ulp trap the
    cosine queries dodge the same way."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS agg_partkey, 0.2 * avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    ) part_agg ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#4' AND p_type = 'PROMO'
      AND l_quantity < avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    scalar subquery `l_quantity < 0.2 * avg(l_quantity per part)` written
    the way every engine actually executes it — decorrelated into a
    per-part average joined back to the fact rows. The fixture part table
    has no p_container, so the selective pair is (p_brand, p_type) — same
    shape, documented substitution.

    Scale: two lineitem passes (per-part avg, then the filtered join); the
    part filter broadcasts and prunes the join early. The quantity
    threshold is engine-exact: integer-valued quantities sum exactly in
    doubles (order-independent), so avg and 0.2*avg are bit-identical in
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#4") & (F.col("p_type") == "PROMO"))
        .select("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("avg_qty")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT n_name AS cntry, count(*) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average positive balance and NO orders, counted per country. The
    fixture customer has no c_phone, so country = the nation dim via
    c_nationkey, and because every fixture customer has orders the NOT
    EXISTS targets urgent-priority orders — same shape (uncorrelated
    scalar average + NOT EXISTS anti-join with a pushed join-side filter +
    group-count), documented substitutions that keep the result non-empty
    (a 0-row match would verify nothing).

    Scale: the scalar average is a 1-row broadcast; NOT EXISTS is a
    left-anti join shuffling only (o_custkey) pairs; nation broadcasts."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("threshold")
    )
    return (
        customer.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("threshold"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): count quarter orders that
    have at least one "late" line, grouped by priority. The fixture lineitem
    has no l_commitdate/l_receiptdate, so late = shipped more than 90 days
    after the order date — same EXISTS-with-inequality shape, documented
    substitution.

    Scale: the EXISTS is a left-semi join — Spark shuffles only
    (orderkey, shipdate) pairs against the date-pruned orders side, dedups
    on the build side, and the quarter filter is pushed to the orders scan
    (PushedFilters). No lineitem payload ever moves."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def tpch_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): conditional
    counting after the fact join. The fixture has no l_shipmode, so the
    grouping column is l_linestatus — same shape (join + CASE-sum pivot on a
    low-cardinality column), documented substitution.

    Scale: one shuffle (the orderkey join); the CASE-sums are map-side
    partial aggregates over 2 groups, so the final exchange moves ~2 rows
    per task. The shipdate year filter is pushed to the lineitem scan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit): profit per supplier nation per
    order year for one product line. The fixture has no partsupp, so cost =
    0.1 * p_retailprice * l_quantity instead of ps_supplycost * l_quantity —
    same shape (5-way join, derived profit expression, two-level group),
    documented substitution.

    Scale: part is filtered then broadcast, so the name LIKE prunes the
    fact rows in the broadcast hash join probe before the orderkey shuffle;
    supplier/nation broadcast too — the orders join is the only exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS partkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey)
    SELECT partkey, part_value FROM pv
    WHERE part_value > (SELECT round(sum(part_value) * 0.001, 2) FROM pv)
    ORDER BY part_value DESC, partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part value for
    one nation's suppliers, kept only when above a fraction of the total —
    the group-HAVING-against-global-scalar pattern. The fixture has no
    partsupp, so value = lineitem revenue via that nation's suppliers,
    documented substitution.

    Scale: the per-part aggregate shuffles once on l_partkey; the scalar
    total is a 1-row reduction of that SAME aggregated frame (reused, not
    recomputed from the fact table) broadcast back as a theta join.
    Parity: part_value is rounded to 2 decimals BEFORE the total/threshold
    so a sub-ulp sum divergence cannot flip the comparison on either side."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    )
    pv = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("part_value")
        )
    )
    threshold = pv.agg(F.round(F.sum("part_value") * 0.001, 2).alias("threshold"))
    return (
        pv.join(F.broadcast(threshold), F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per part attribute triple, excluding a blacklisted supplier set
    via NOT IN. The fixture has no partsupp (pairs come from lineitem) and
    no s_comment (the blacklist is low-balance suppliers) — same shape,
    documented substitutions.

    Scale: the pair-dedup and the count-distinct both shuffle on partkey;
    the part filter broadcasts, and NOT IN compiles to a broadcast
    left-anti join (the blacklist is tiny and NULL-free by construction,
    so anti-join semantics match NOT IN exactly)."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#4")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
    )
    blacklist = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    return (
        pairs.join(blacklist, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
             round(min(l_extendedprice / l_quantity), 4) AS unit_cost
      FROM lineitem GROUP BY 1, 2)
    SELECT s_acctbal, s_name, n_name, partkey, unit_cost
    FROM (
      SELECT s_acctbal, s_name, n_name, p_partkey AS partkey, unit_cost,
             min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM supply
      JOIN supplier ON s_suppkey = sp_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN part ON p_partkey = sp_partkey
      WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
    ) priced
    WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, partkey
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum cost supplier): for each qualifying part,
    the European supplier(s) offering it at the lowest unit cost — the
    correlated-MIN subquery, decorrelated as a min-over-partition window
    the way Catalyst itself rewrites it. The fixture has no partsupp, so a
    supplier's offer price is the minimum observed l_extendedprice /
    l_quantity for that (part, supplier) — documented substitution.

    Scale: the supply aggregation shuffles once on (partkey, suppkey);
    supplier/nation/region/filtered-part all broadcast; the window
    re-shuffles only the few-per-part surviving rows on partkey. unit_cost
    is rounded to 4 decimals BEFORE min/equality so the comparison is
    engine-exact (min over identical doubles picks the identical value)."""
    from pyspark.sql.window import Window

    supply = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("sp_partkey"),
            F.col("l_suppkey").alias("sp_suppkey"),
        )
        .agg(
            F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
                "unit_cost"
            )
        )
    )
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
        )
    )
    priced = (
        supply.join(supplier, F.col("s_suppkey") == F.col("sp_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(part, F.col("p_partkey") == F.col("sp_partkey"))
        .withColumn(
            "min_cost",
            F.min("unit_cost").over(Window.partitionBy("p_partkey")),
        )
    )
    return (
        priced.filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").alias("partkey"),
            "unit_cost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "partkey")
    )


@register(
    "tpch_q20_excess_shippers",
    oracle="""
    WITH red96 AS (
      SELECT l_suppkey AS rs, sum(l_quantity) AS red_qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1)
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND s_suppkey IN (SELECT rs FROM red96
                        WHERE red_qty > (SELECT avg(red_qty) FROM red96))
    ORDER BY s_name
    """,
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one region
    whose shipped volume of a product line in a year exceeds a
    data-derived threshold — the nested IN-chain (region ⊃ supplier IN
    (agg HAVING > scalar subquery)). The fixture has no partsupp/availqty,
    so excess = above-average 1996 shipped quantity of red parts —
    documented substitution preserving the semi-join-on-aggregate chain.

    Scale: the red-part filter broadcasts into the lineitem scan year
    window (both predicates pushed); the per-supplier aggregate is one
    shuffle on suppkey over pre-filtered rows; the scalar average reduces
    that SAME frame (reuse, not a second fact pass) and broadcasts; the
    final IN is a broadcast left-semi join onto the tiny supplier dim.
    Quantities are integral doubles, so every sum and the avg are
    engine-exact — no rounding needed before the > comparison."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    red_parts = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    red96 = (
        li.join(red_parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_suppkey").alias("rs"))
        .agg(F.sum("l_quantity").alias("red_qty"))
    )
    thr = red96.agg(F.avg("red_qty").alias("thr"))
    excess = red96.join(F.broadcast(thr), F.col("red_qty") > F.col("thr")).select("rs")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    return (
        supplier.join(F.broadcast(excess), F.col("rs") == F.col("s_suppkey"), "left_semi")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM (
      SELECT DISTINCT l1.l_orderkey AS okey, l1.l_suppkey AS skey
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    ) waiting
    JOIN supplier ON s_suppkey = skey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers who
    were the SOLE late shipper on a finished multi-supplier order. The
    oracle states it in the textbook correlated EXISTS / NOT EXISTS form;
    the Spark plan is the scalable decorrelation every warehouse engine
    applies: aggregate lineitem once per (order, supplier) with a late
    flag, roll up per-order supplier/late counts, and filter
    `is_late AND n_supp > 1 AND n_late = 1` — one shuffle on
    (orderkey, suppkey) plus one on orderkey, instead of two self-joins of
    the fact table. Late = shipped >60 days after order date (fixture has
    no receipt/commit dates — documented substitution).

    Scale: both aggregates are map-side-combinable; the per-order rollup
    output (two small ints per order) broadcasts back onto the pair frame
    only via an orderkey-partitioned join; supplier/nation broadcast."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    ol = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey")
        )
        .agg(F.max(late).alias("is_late"))
    )
    ostat = ol.groupBy("okey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    waiting = (
        ol.join(ostat, "okey")
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select("okey", "skey")
    )
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13")
        )
    )
    return (
        waiting.join(supplier, F.col("s_suppkey") == F.col("skey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )

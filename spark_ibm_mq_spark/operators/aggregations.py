"""Aggregation operators (SURVEY.md §2.2 "Aggregations").

The reference's running telemetry counters (IBMMQReceiver.java:91-93,246) are
the degenerate form; these are the full grouped-aggregation surface.

Scale notes: every groupBy here compiles to partial (map-side) + final
HashAggregate, so the shuffle moves pre-aggregated groups, not raw rows.
Group keys are low-cardinality (flags, months, nations) except the per-user /
per-customer aggregates, which shuffle on a uniform key — both fine at 100 TB
with AQE coalescing. approx_* sketches are the scale path when exact
distincts would blow memory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.operators.projections import EVENTS_CTE
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import durable_checkpoint, load_table, spread


@register(
    "agg_monthly_orders",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           count(*)                             AS n_orders,
           count(DISTINCT o_custkey)            AS n_custs,
           round(sum(o_totalprice), 4)          AS total,
           round(min(o_totalprice), 4)          AS lo,
           round(max(o_totalprice), 4)          AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count(distinct) / sum / min / max per month."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)                 AS qty_std,
           round(var_samp(l_quantity), 4)                    AS qty_var,
           round(corr(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar (sample semantics
    in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_std"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_linestatus,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS price_p50,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS price_p90,
           round(median(l_extendedprice), 4)              AS price_median
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median. One array-argument
    percentile aggregate buffers/sorts each group ONCE for both quantiles
    (three scalar aggregates each kept their own copy of the column — 3×
    the memory and sort work for identical output; median IS the 0.5
    quantile). Scale note: at 100 TB swap `percentile` for
    `percentile_approx` (single-pass sketch, no sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(F.percentile("l_extendedprice", F.lit([0.5, 0.9])).alias("ps"))
        .select(
            "l_linestatus",
            F.round(F.element_at("ps", 1), 4).alias("price_p50"),
            F.round(F.element_at("ps", 2), 4).alias("price_p90"),
            F.round(F.element_at("ps", 1), 4).alias("price_median"),
        )
    )


@register(
    "agg_rollup_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)  AS g_flag,
           grouping(l_linestatus)  AS g_status,
           count(*)                AS n,
           round(sum(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() markers (subtotals + grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
        )
    )


@register(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                    AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "agg_latest_order_per_cust",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, epoch_ms(o_orderdate)::HUGEINT * 9223372036854775808
                              + o_orderkey) AS latest_order,
           min_by(o_orderkey, epoch_ms(o_orderdate)::HUGEINT * 9223372036854775808
                              + o_orderkey) AS first_order,
           round(max(o_totalprice), 4) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_latest_order_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest/first row per group via max_by/min_by on a struct(date, key)
    ordinal — lexicographic struct comparison is a total order with NO
    arithmetic aliasing at any key scale (a fixed ms*K+key multiplier is one
    scale step from collisions the moment key >= K, and widening K overflows
    int64). Deterministic where bare first()/last() is not. The oracle
    states the identical order as a HUGEINT (128-bit) composite with K=2^63,
    exact for any bigint key. This is the replication 'latest row wins'
    aggregate (README.md:59)."""
    o = load_table(spark, sf_dir, "orders")
    ordinal = F.struct("o_orderdate", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordinal).alias("latest_order"),
        F.min_by("o_orderkey", ordinal).alias("first_order"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


@register(
    "agg_collect_event_types",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
           count(*)                             AS n_events,
           round(sum(value), 4)                 AS total_value
    FROM ev
    GROUP BY user_id
    """,
)
def agg_collect_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted array per group (re-assembling grouped messages,
    cf. MQ seqNo grouping IBMMQReceiver.java:251). The set is emitted
    sorted-and-joined (scalar string) so the driver canonicalizer can hash
    the cell; collect_set/array_sort stay in the plan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "types_seen"
        ),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


@register(
    "agg_pivot_event_types",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id % 10 AS cohort,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM ev
    GROUP BY 1
    """,
)
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list — explicit values avoid
    the extra distinct-scan pass Spark needs to discover pivot columns."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot yields NULL for empty cells; FILTER-count yields 0 — normalize.
    return pivoted.select(
        "cohort", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@register("agg_approx_distinct")  # no oracle: HLL sketch is engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count — the
    100 TB scale path for distinct cardinality (rows-only driver check; the
    sketch estimate is engine-specific so no DuckDB value parity)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "agg_grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_extendedprice), 4) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (spark.sql over a temp
    view) — the declarative surface next to the DataFrame rollup/cube."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_extendedprice), 4) AS total
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_skew_kurtosis",
    oracle="""
    SELECT l_linestatus,
           round((sum(pow(l_quantity - m, 3)) / n) / pow(sum(pow(l_quantity - m, 2)) / n, 1.5), 4)
               AS qty_skew,
           round((sum(pow(l_quantity - m, 4)) / n) / pow(sum(pow(l_quantity - m, 2)) / n, 2) - 3, 4)
               AS qty_kurt
    FROM lineitem
    JOIN (SELECT l_linestatus AS ls, avg(l_quantity) AS m, count(*) AS n
          FROM lineitem GROUP BY 1) stats ON l_linestatus = ls
    GROUP BY l_linestatus, m, n
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness / kurtosis. Spark computes population skewness g1 and excess
    kurtosis g2; engines disagree on the estimator (DuckDB applies sample
    corrections), so the oracle spells out the population-moment formula
    explicitly instead of calling DuckDB's functions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.skewness("l_quantity"), 4).alias("qty_skew"),
        F.round(F.kurtosis("l_quantity"), 4).alias("qty_kurt"),
    )


@register(
    "agg_value_histogram",
    oracle=f"""
    {EVENTS_CTE}
    SELECT CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bucket,
           round(least(floor(value / 25.0), 19) * 25.0, 4)        AS lo,
           round((least(floor(value / 25.0), 19) + 1) * 25.0, 4)  AS hi,
           CAST(count(*) AS BIGINT)      AS n_events,
           round(sum(value), 4)          AS sum_value,
           round(avg(value), 4)          AS avg_value
    FROM ev GROUP BY 1, 2, 3
    """,
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (20 × 25-unit buckets over [0, 500), top
    bucket open): the one-pass distribution profile every data-quality
    dashboard draws. Static bounds keep it single-pass — no min/max
    pre-scan — and `floor(value/25.0)` is the same IEEE double op in both
    engines, so bucket edges can't drift.

    Plan shape: one map-side-combinable aggregate over ≤20 integer keys —
    the shuffle carries 20 partial rows per task regardless of input size."""
    ev = load_table(spark, sf_dir, "events")
    b = F.least(F.floor(F.col("value") / 25.0), F.lit(19.0)).cast("bigint")
    return (
        ev.groupBy(
            b.alias("bucket"),
            F.round(b * 25.0, 4).alias("lo"),
            F.round((b + 1) * 25.0, 4).alias("hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


# count-min sketch geometry: d hash rows × w counters. md5-derived buckets
# are engine-exact (the suite's standard trick), so the whole sketch —
# counters AND estimates — is value-oracled, unlike the opaque-HLL
# agg_approx_distinct.
_CMS_D = 4
_CMS_W = 256


def _cms_bucket_sql(i: int, key: str) -> str:
    """Bucket of `key` in hash row i — two md5 hex digits → [0, 256).
    Identical text works in Spark SQL (locate) and DuckDB (strpos swaps
    argument order), so each engine gets its own renderer below."""
    k = f"md5(concat('cms{i}:', cast({key} as string)))"
    d1 = f"(locate(substring({k}, 1, 1), '0123456789abcdef') - 1)"
    d2 = f"(locate(substring({k}, 2, 1), '0123456789abcdef') - 1)"
    return f"({d1} * 16 + {d2})"


def _cms_bucket_duck(i: int, key: str) -> str:
    k = f"md5('cms{i}:' || CAST({key} AS VARCHAR))"
    d1 = f"(strpos('0123456789abcdef', substr({k}, 1, 1)) - 1)"
    d2 = f"(strpos('0123456789abcdef', substr({k}, 2, 1)) - 1)"
    return f"({d1} * 16 + {d2})"


_CMS_PROBES_DUCK = " UNION ALL ".join(
    f"SELECT o_custkey, {i} AS i, {_cms_bucket_duck(i, 'o_custkey')} AS b FROM orders"
    for i in range(_CMS_D)
)


@register(
    "agg_heavy_hitters_cms",
    oracle=f"""
    WITH probes AS ({_CMS_PROBES_DUCK}),
    counters AS (
        SELECT i, b, count(*) AS cnt FROM probes GROUP BY i, b
    ),
    exact AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS exact_count
        FROM orders GROUP BY o_custkey
    ),
    est AS (
        SELECT p.o_custkey, CAST(min(c.cnt) AS BIGINT) AS cms_estimate
        FROM (SELECT DISTINCT o_custkey, i, b FROM probes) p
        JOIN counters c ON c.i = p.i AND c.b = p.b
        GROUP BY p.o_custkey
    )
    SELECT e.o_custkey, e.exact_count, s.cms_estimate,
           CAST(s.cms_estimate - e.exact_count AS BIGINT) AS overcount
    FROM exact e JOIN est s ON s.o_custkey = e.o_custkey
    WHERE e.exact_count >= 15
    """,
)
def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection through a count-min sketch (d=4 hash rows ×
    w=256 counters, md5-derived buckets), reported next to the exact count
    for every key at or above the hitter threshold — the streaming-sketch
    operator a 100 TB ingest uses to find hot keys WITHOUT a per-key
    groupBy, here with the sketch's defining guarantee visible in the
    output (`overcount >= 0`, since CMS never underestimates).

    Plan shape: the counter build is ONE map-side-combinable aggregate
    whose world-wide output is at most d×w = 1 024 rows — that 1 024-row
    frame IS the sketch, mergeable across partitions, executors, or
    streaming micro-batches by cellwise addition, which is why the same
    shape runs unchanged as a foreachBatch accumulator. Estimates join the
    (broadcast) counter frame against each distinct key's d probe cells.
    The exact count alongside it is the fixture-scale verification twin —
    at 100 TB one keeps only the sketch side."""
    # r16 opt (guide §2.6): spread the 1-partition fixture scan so the
    # 4-md5-per-row probe-bucket build runs on every core instead of
    # serially inside the scan stage (no-op on a real multi-split table).
    o = spread(load_table(spark, sf_dir, "orders").select("o_custkey"))
    probe_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.expr(_cms_bucket_sql(i, "o_custkey")).cast("int").alias("b"),
            )
            for i in range(_CMS_D)
        ]
    )
    probes = o.select("o_custkey", F.explode(probe_structs).alias("p")).select(
        "o_custkey", "p.i", "p.b"
    )
    counters = probes.groupBy("i", "b").agg(F.count(F.lit(1)).alias("cnt"))
    exact = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_count"))
    est = (
        probes.dropDuplicates(["o_custkey", "i", "b"])
        .join(F.broadcast(counters), ["i", "b"])
        .groupBy("o_custkey")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return (
        exact.filter(F.col("exact_count") >= 15)
        .join(est, "o_custkey")
        .select(
            "o_custkey",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
        )
    )


@register(
    "agg_bitmap_distinct_rollup",
    oracle=f"""
    {EVENTS_CTE}
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           count(DISTINCT user_id) AS n_users
    FROM ev GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS day, count(DISTINCT user_id) AS n_users FROM ev
    """,
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts from MERGEABLE bitmaps — the pre-aggregated
    distinct-count pattern (ClickHouse groupBitmap / Druid; roaring bitmaps
    relationally): user ids packed into int64 bitmap words per (day, word),
    daily uniques = popcount of that day's words, and the all-time row is
    computed by bit_or-MERGING the same per-day word frame — the raw events
    are scanned exactly once, which is the whole point: a precomputed
    (day, word) bitmap cube answers distinct-count rollups over ANY day
    range without rescanning the fact table, something plain
    count(DISTINCT) can never do (distincts don't add).

    Plan shape: one shuffle on (day, word) with map-side bit_or partials;
    the daily popcount and the merge-rollup both run over the tiny word
    frame. The dense-bounded-id precondition is ASSERTED in code, not
    prose: ids outside [0, id_cap) raise before any result is returned
    (dictionary-encode ids first otherwise — the encode is the same
    groupBy this query already pays)."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    return _bitmap_rollup(ev)


def _bitmap_rollup(ev: DataFrame, id_cap: int = 1 << 31) -> DataFrame:
    """Core of `agg_bitmap_distinct_rollup` over any (ts, user_id) frame.

    Raises ValueError when the id domain violates the bitmap precondition
    (negative or >= ``id_cap``): a negative id makes shiftright/shiftleft
    silently compute garbage words, and a sparse huge domain makes the
    word frame as big as the fact table — both must fail LOUDLY, not
    return a wrong popcount. The bounds ride along the same (day, word)
    shuffle as min/max partials, so the guard costs zero extra scans."""
    words = durable_checkpoint(
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.shiftright("user_id", 6).alias("w"),
            F.expr("shiftleft(1L, cast(user_id % 64 as int))").alias("m"),
            "user_id",
        )
        .groupBy("day", "w")
        .agg(
            F.bit_or("m").alias("bits"),
            F.min("user_id").alias("lo"),
            F.max("user_id").alias("hi"),
        ),
        # four consumers (guard + daily + merged rollup) reuse this one
        # exchange; the guard's first() below materializes the lazy
        # checkpoint, so the guard is free
        eager=False,
    )
    lo, hi = words.agg(F.min("lo"), F.max("hi")).first()
    if lo is not None and (lo < 0 or hi >= id_cap):
        raise ValueError(
            f"agg_bitmap_distinct_rollup: user_id domain [{lo}, {hi}] outside "
            f"[0, {id_cap}) — bitmap words assume dense bounded non-negative "
            f"ids; dictionary-encode the id column first"
        )
    words = words.drop("lo", "hi")
    daily = words.groupBy("day").agg(F.sum(F.bit_count("bits")).alias("n_users"))
    merged = (
        words.groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
        .agg(F.sum(F.bit_count("bits")).alias("n_users"))
        # 'ALL' sentinel instead of a NULL date: the driver canonicalizer
        # renders a pandas NaT and a plain None differently
        .select(F.lit("ALL").alias("day"), "n_users")
    )
    return daily.select(F.col("day").cast("string"), "n_users").unionByName(merged)


@register(
    "agg_rfm_segments",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               CAST(count(*) AS BIGINT) AS frequency,
               round(sum(o_totalprice), 4) AS monetary
        FROM orders GROUP BY 1
    ),
    tiled AS (
        SELECT *,
               ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_tile,
               ntile(4) OVER (ORDER BY frequency, o_custkey)  AS f_tile,
               ntile(4) OVER (ORDER BY monetary, o_custkey)   AS m_tile
        FROM rfm
    )
    SELECT o_custkey, last_order, frequency, monetary,
           r_tile, f_tile, m_tile,
           r_tile * 100 + f_tile * 10 + m_tile AS rfm_code
    FROM tiled
    """,
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer the recency (last order
    date), frequency (order count), and monetary (total spend) metrics,
    each quartiled with ntile(4), composed into the classic 3-digit RFM
    code (444 = best) — the segmentation every CRM/marketing warehouse
    derives from the orders fact.

    Determinism: ntile ties are broken by appending o_custkey to every
    ORDER BY — a total order, so tile boundaries are identical across
    engines (the `win_rank_orders` discipline); monetary is rounded
    before tiling so the sort key is the same double both sides.

    Plan shape: one map-side-combinable groupBy on o_custkey, then three
    global ntile windows over the |customers| rollup — metric-frame
    scale, not order scale. Global ntile needs a total ordering; at
    100 TB swap exact ntile for percentile_approx-derived boundaries
    (one pass, no global sort) or range-partition the window — the
    quartile semantics survive either."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 4).alias("monetary"),
    )
    r_t = F.ntile(4).over(Window.orderBy("last_order", "o_custkey"))
    f_t = F.ntile(4).over(Window.orderBy("frequency", "o_custkey"))
    m_t = F.ntile(4).over(Window.orderBy("monetary", "o_custkey"))
    return rfm.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        r_t.alias("r_tile"),
        f_t.alias("f_tile"),
        m_t.alias("m_tile"),
    ).withColumn(
        "rfm_code",
        F.col("r_tile") * 100 + F.col("f_tile") * 10 + F.col("m_tile"),
    )


@register(
    "agg_mad_robust",
    oracle="""
    WITH med AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, m.med,
               round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad,
               CAST(count(*) AS BIGINT) AS n
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY 1, 2
    )
    SELECT d.event_type, d.med, d.mad, d.n,
           CAST(count(*) FILTER (
               WHERE abs(e.value - d.med) > 3 * 1.4826 * d.mad) AS BIGINT)
               AS n_outliers
    FROM events e JOIN dev d ON e.event_type = d.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion + outlier count per event type: median, median
    absolute deviation (MAD), and how many events sit beyond the
    3σ-equivalent robust fence 3·1.4826·MAD — the outlier detector that,
    unlike `events_anomaly_zscore`'s mean/stddev, is itself immune to the
    outliers it hunts (one 10⁶× corrupt value shifts a z-score fence
    arbitrarily; it moves the median fence by at most one rank).

    Determinism: the median is ROUNDED before the deviation pass and MAD
    rounded before the fence, so both engines compare against identical
    doubles; the fence test is exact arithmetic on those.

    Plan shape: two grouped exact-percentile passes (each buffers one
    group's values once) plus a counting pass, all on the same
    event_type key — one partitioning, three aggregates over it. At
    100 TB swap exact percentile for `percentile_approx` in both passes
    (single-pass mergeable sketch) — the fence stays a constant-factor
    rank statistic."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("med")
    )
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 4
            ).alias("mad"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    fence = 3 * 1.4826
    return (
        ev.join(F.broadcast(dev), "event_type")
        .groupBy("event_type", "med", "mad", "n")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(fence) * F.col("mad"),
                    1,
                )
            ).alias("n_outliers")
        )
    )


@register(
    "agg_welch_ab_test",
    oracle="""
    WITH g AS (
        SELECT event_type,
               user_id % 2 AS variant,
               count(*) AS n,
               round(avg(value), 4) AS mean,
               round(var_samp(value), 4) AS var
        FROM events GROUP BY 1, 2
    ),
    ab AS (
        SELECT a.event_type,
               a.n AS n_a, a.mean AS mean_a, a.var AS var_a,
               b.n AS n_b, b.mean AS mean_b, b.var AS var_b,
               a.var / a.n AS sa, b.var / b.n AS sb
        FROM g a JOIN g b
          ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
    )
    SELECT event_type, n_a, mean_a, n_b, mean_b,
           round((mean_a - mean_b) / sqrt(sa + sb), 4) AS t_stat,
           round((sa + sb) * (sa + sb)
                 / (sa * sa / (n_a - 1) + sb * sb / (n_b - 1)), 4) AS welch_df
    FROM ab
    """,
)
def agg_welch_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per event type between two user
    cohorts (variant = user_id parity — the deterministic stand-in for an
    experiment assignment): group means/variances, the t statistic, and
    the Welch–Satterthwaite degrees of freedom — the statistical readout
    every A/B experimentation pipeline computes over its metrics table.

    Determinism: means and variances are rounded FIRST (the suite's
    round-then-derive discipline), so the t/df arithmetic runs on
    identical doubles in both engines; sqrt and the divisions are IEEE
    exactly-rounded over a textually identical expression tree.

    Plan shape: ONE map-side-combinable groupBy to |types|×2 rows, a
    self-equi-join on the type key over that metric frame (metadata
    scale), and row-local arithmetic — the raw events shuffle once, as
    count/sum/sum-of-squares partials."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("mean"),
        F.round(F.var_samp("value"), 4).alias("var"),
    )
    a = g.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = g.filter(F.col("variant") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            "n_a",
            "mean_a",
            "n_b",
            "mean_b",
            F.round(
                (F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb), 4
            ).alias("t_stat"),
            F.round(
                (sa + sb) * (sa + sb)
                / (sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)),
                4,
            ).alias("welch_df"),
        )
    )


@register(
    "agg_pareto_revenue_deciles",
    oracle="""
    WITH cust AS (
        SELECT o_custkey, round(sum(o_totalprice), 4) AS revenue
        FROM orders GROUP BY 1
    ),
    tiled AS (
        SELECT *, ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
        FROM cust
    ),
    tot AS (SELECT round(sum(revenue), 4) AS total FROM cust)
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(revenue), 4) AS revenue,
           round(round(sum(revenue), 4) / tot.total, 4) AS share,
           round(sum(round(sum(revenue), 4)) OVER (ORDER BY decile)
                 / tot.total, 4) AS cum_share
    FROM tiled CROSS JOIN tot
    GROUP BY decile, tot.total
    """,
)
def agg_pareto_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer decile — the Pareto (80/20)
    report: customers ranked by spend into ntile(10) deciles, each
    decile's revenue share and the running cumulative share (decile 1's
    cum_share answers "what fraction do the top 10% carry"). The
    concentration read that drives account tiering — and, in a data
    pipeline, the same query over per-source token counts decides
    whether a corpus is dangerously dominated by a few sources.

    Determinism: per-customer revenue is rounded before ranking (ties
    then break on o_custkey), shares divide rounded sums, and the
    cumulative share sums in the window's decile order — identical
    sequences both engines.

    Plan shape: one groupBy to |customers| rows, a global ntile over the
    metric frame (o_custkey tie-broken; swap for percentile-derived
    boundaries at extreme cardinality), a 1-row total broadcast, and a
    10-row windowed rollup."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue")
    )
    tiled = cust.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.col("revenue").desc(), "o_custkey")),
    )
    tot = cust.agg(F.round(F.sum("revenue"), 4).alias("total"))
    per = (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("revenue"), 4).alias("revenue"),
        )
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy("decile")
    return per.select(
        "decile",
        "n_customers",
        "revenue",
        F.round(F.col("revenue") / F.col("total"), 4).alias("share"),
        F.round(F.sum("revenue").over(w) / F.col("total"), 4).alias("cum_share"),
    )


@register(
    "agg_gini_coefficient",
    oracle="""
    WITH cust AS (
        SELECT o_custkey, round(sum(o_totalprice), 4) AS revenue
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT revenue,
               row_number() OVER (ORDER BY revenue, o_custkey) AS rk
        FROM cust
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(revenue) AS total,
               sum(rk * revenue) AS weighted
        FROM ranked
    )
    SELECT n, round(total, 4) AS total_revenue,
           round(2.0 * weighted / (n * total) - (n + 1.0) / n, 4) AS gini
    FROM agg
    """,
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer revenue — the single-number
    inequality metric behind the `agg_pareto_revenue_deciles` curve,
    via the rank formula G = 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n over
    ascending-sorted revenues (0 = perfectly equal, →1 = one customer
    carries everything). Over per-source token counts, the same number
    says how dangerously a corpus concentrates into few sources.

    Determinism: per-customer revenue is rounded before ranking (ties
    break on custkey), the rank weight i is an exact integer, and the
    final expression is one identical tree both engines. The rank·value
    sums run over doubles in engine order — absorbed by round(4) on a
    O(1)-magnitude statistic.

    Plan shape: one |customers|-row rollup, one global rank window over
    the metric frame (custkey tie-broken; at extreme cardinality derive
    ranks from percentile boundaries), one 1-row reduction."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue")
    )
    ranked = cust.select(
        "revenue",
        F.row_number().over(Window.orderBy("revenue", "o_custkey")).alias("rk"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("revenue").alias("total"),
        F.sum(F.col("rk") * F.col("revenue")).alias("weighted"),
    )
    return agg.select(
        "n",
        F.round(F.col("total"), 4).alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n") + F.lit(1.0)) / F.col("n"),
            4,
        ).alias("gini"),
    )


@register(
    "agg_ship_latency_percentiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(quantile_cont(CAST(l_shipdate AS DATE)
                               - CAST(o_orderdate AS DATE), 0.5), 4)  AS p50_days,
           round(quantile_cont(CAST(l_shipdate AS DATE)
                               - CAST(o_orderdate AS DATE), 0.9), 4)  AS p90_days,
           round(quantile_cont(CAST(l_shipdate AS DATE)
                               - CAST(o_orderdate AS DATE), 0.99), 4) AS p99_days,
           CAST(max(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE))
                AS BIGINT) AS max_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def agg_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency SLA report per order priority: exact
    interpolated p50/p90/p99 (and max) of days between order placement
    and each line's ship date — the fulfillment-latency percentile table
    operations teams track per service class, and the same
    percentile-per-class shape as an MQ consumer's put-to-process
    latency report over `put_ts`.

    Latency is an integer day difference, so the only doubles are the
    interpolated quantiles — exact-percentile semantics agree across
    engines (`agg_percentiles` precedent), rounded once.

    Plan shape: the orders side projects two columns and hash-joins on
    the order key (broadcastable at fixture scale, shuffle join at
    100 TB on the natural co-partitioned key — the bucketed-layout demo
    covers that); one array-argument percentile aggregate buffers each
    priority group once for all three quantiles."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    joined = li.join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("o_orderpriority", lat.alias("lat_days"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.percentile("lat_days", F.lit([0.5, 0.9, 0.99])).alias("ps"),
            F.max("lat_days").cast("bigint").alias("max_days"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            F.round(F.element_at("ps", 1), 4).alias("p50_days"),
            F.round(F.element_at("ps", 2), 4).alias("p90_days"),
            F.round(F.element_at("ps", 3), 4).alias("p99_days"),
            "max_days",
        )
    )


# ---------------------------------------------------------------------------
# Statistical quality tests over the orders fact table: Benford screening,
# chi-square independence, a correlation matrix, and an exact OLS trend.
# Exactness follows the FIXTURES.md integer-arithmetic conventions: counts
# and cross-moments stay bigint, each reported float is a fixed expression
# of those integers (divisions/logs in identical order on both engines)
# before round(4).
# ---------------------------------------------------------------------------


@register(
    "agg_benford_first_digit",
    oracle="""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders
    ),
    digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents
    ),
    obs AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n_orders FROM digits GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n FROM obs)
    SELECT digit, n_orders,
           round(n_orders * 1.0 / n, 4) AS observed_share,
           round(log10(1.0 + 1.0 / digit), 4) AS benford_share,
           round(n_orders * 1.0 / n - log10(1.0 + 1.0 / digit), 4) AS deviation
    FROM obs CROSS JOIN tot
    """,
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the classic
    fabricated-data / pipeline-corruption detector: natural multiplicative
    amounts put digit d first with probability log10(1+1/d); a flat or
    spiked profile flags synthetic or truncated values.

    Exactness: the first digit comes from the INTEGER cents value
    (floor(x·100 + .5) — identical double ops both engines) rendered as a
    string — never from float log-magnitude games, which misbin at
    power-of-ten boundaries. Shares are one division; the Benford
    reference is log10 on small constants (the PMI/entropy ln-precedent)
    — all under round(4). Plan: a 9-group aggregate with a 1-row total
    broadcast; scan reads one column."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    obs = (
        o.select(F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    tot = obs.agg(F.sum("n_orders").cast("bigint").alias("n"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_orders",
        F.round(F.col("n_orders") / F.col("n"), 4).alias("observed_share"),
        F.round(benford, 4).alias("benford_share"),
        F.round(F.col("n_orders") / F.col("n") - benford, 4).alias("deviation"),
    )


@register(
    "agg_chi_square_independence",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS observed
        FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT priority, CAST(sum(observed) AS BIGINT) AS r FROM cells GROUP BY 1),
    ct AS (SELECT status, CAST(sum(observed) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM cells)
    SELECT cells.priority, cells.status, observed,
           round(r * c * 1.0 / n, 4) AS expected,
           round((observed - r * c * 1.0 / n) * (observed - r * c * 1.0 / n)
                 / (r * c * 1.0 / n), 4) AS chi2_contribution
    FROM cells
    JOIN rt ON cells.priority = rt.priority
    JOIN ct ON cells.status = ct.status
    CROSS JOIN tot
    """,
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for order priority × status — the
    contingency diagnostic behind "does priority affect fulfillment
    state": per-cell observed count, independence-expected count
    r·c/N, and the cell's (O−E)²/E contribution (their sum is the χ²
    statistic; the per-cell view also SHOWS which cells drive it, which
    the scalar alone hides — so the query returns the 15-cell table, the
    form an analyst actually reads).

    Exactness: O, r, c, N are bigint; E and the contribution are fixed
    scalar expressions over them (same op order both engines) under
    round(4). Plan: one groupBy builds the cells; marginals re-aggregate
    the ≤15-row cell frame (no second scan); N rides as a 1-row
    broadcast."""
    o = load_table(spark, sf_dir, "orders")
    cells = durable_checkpoint(
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("observed")),
        eager=False,
    )
    rt = cells.groupBy("priority").agg(F.sum("observed").cast("bigint").alias("r"))
    ct = cells.groupBy("status").agg(F.sum("observed").cast("bigint").alias("c"))
    tot = cells.agg(F.sum("observed").cast("bigint").alias("n"))
    e = F.col("r") * F.col("c") / F.col("n")
    return (
        cells.join(F.broadcast(rt), "priority")
        .join(F.broadcast(ct), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "priority",
            "status",
            "observed",
            F.round(e, 4).alias("expected"),
            F.round((F.col("observed") - e) * (F.col("observed") - e) / e, 4).alias(
                "chi2_contribution"
            ),
        )
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "agg_correlation_matrix",
    oracle="WITH pairs AS (\n"
    + "\n    UNION ALL\n".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
        f"round(corr({a}, {b}), 4) AS pearson_r, "
        f"CAST(count(*) AS BIGINT) AS n FROM lineitem"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    )
    + "\n) SELECT * FROM pairs",
)
def agg_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle) of the four
    lineitem numeric measures — the feature-redundancy screen run before
    any model uses them (quantity⇄extendedprice is the expected strong
    pair; tax⇄discount independence validates the generator).

    All six coefficients compute in ONE scan/aggregate (six corr
    accumulators side by side — Catalyst shares the pass), then unpivot
    driver-free via explode of a 6-element struct array. round(4)
    absorbs the float-accumulation-order difference between engines
    (the agg_stats precedent: ~1e-12 relative error vs 1e-4
    granularity)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
    ]
    agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.corr(a, b).alias(f"r_{a}_{b}") for a, b in pairs],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.round(F.col(f"r_{a}_{b}"), 4).alias("pearson_r"),
                F.col("n").alias("n"),
            )
            for a, b in pairs
        ]
    )
    return agg.select(F.explode(rows).alias("p")).select(
        "p.col_x", "p.col_y", "p.pearson_r", "p.n"
    )


@register(
    "agg_ols_daily_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    t0 AS (SELECT min(d) AS d0 FROM daily),
    xy AS (SELECT CAST(datediff('day', d0, d) AS BIGINT) AS t, y
           FROM daily CROSS JOIN t0),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS st,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(t * t) AS BIGINT) AS stt,
               CAST(sum(t * y) AS BIGINT) AS sty,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM xy
    )
    SELECT n AS n_days,
           round((n * sty - st * sy) * 1.0 / (n * stt - st * st), 4) AS slope,
           round((sy * stt - st * sty) * 1.0 / (n * stt - st * st), 4)
               AS intercept,
           round(((n * sty - st * sy) * 1.0 / (n * stt - st * st))
                 * ((n * sty - st * sy) * 1.0 / (n * syy - sy * sy)), 4)
               AS r_squared
    FROM m
    """,
)
def agg_ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact closed-form OLS of daily order volume against the day index —
    slope (orders/day drift), intercept, and R² in one pass: the trend
    line every capacity plan starts from.

    Exactness: with t = integer days since the first order date and y =
    integer daily counts, all five moments (Σt, Σy, Σt², Σty, Σy²) are
    bigint-exact, and slope/intercept/R² are fixed rational expressions
    evaluated with the same division order on both engines — R² is
    computed as (A/B)·(A/C) rather than A²/(B·C) because A² can exceed
    int64 at warehouse scale while each quotient is a tame double.
    Plan: daily aggregate (map-side combinable), a 1-row min-date
    broadcast, one moment row — the regression never leaves the
    executor-partial path."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    t0 = daily.agg(F.min("d").alias("d0"))
    xy = daily.crossJoin(F.broadcast(t0)).select(
        F.datediff("d", "d0").cast("bigint").alias("t"), "y"
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    a = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    b = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    c = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").alias("n_days"),
        F.round(a / b, 4).alias("slope"),
        F.round(
            (F.col("sy") * F.col("stt") - F.col("st") * F.col("sty")) / b, 4
        ).alias("intercept"),
        F.round((a / b) * (a / c), 4).alias("r_squared"),
    )


@register(
    "agg_winsorized_mean",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority AS priority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        FROM orders
    ),
    bounds AS (
        SELECT priority,
               quantile_cont(c, 0.05) AS lo,
               quantile_cont(c, 0.95) AS hi
        FROM cents GROUP BY priority
    )
    SELECT c.priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(c.c) / 100.0, 4) AS raw_mean,
           round(avg(least(greatest(c.c * 1.0, b.lo), b.hi)) / 100.0, 4)
               AS winsorized_mean,
           CAST(sum(CASE WHEN c.c * 1.0 < b.lo OR c.c * 1.0 > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
    FROM cents c JOIN bounds b ON c.priority = b.priority
    GROUP BY c.priority
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of order totals per priority: values below the 5th
    / above the 95th percentile are CLAMPED to those bounds before
    averaging — the robust center that, unlike trimming, keeps n constant
    and unlike the median still moves with the bulk of the distribution;
    the raw mean rides along to show the outlier pull.

    Exactness: values convert to integer cents first; the percentile
    bounds come from `percentile`/`quantile_cont` (both engines use the
    same linear-interpolation definition — the `win_rolling_median`
    precedent); clamp and the two means are identical op sequences under
    round(4). Plan: two passes over a 5-group key — one percentile
    aggregate (array buffer per group), one clamped mean re-using the
    broadcast bounds; no window, no sort of the full table."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("c"),
    )
    bounds = cents.groupBy("priority").agg(
        F.expr("percentile(c, 0.05)").alias("lo"),
        F.expr("percentile(c, 0.95)").alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("c") * 1.0, F.col("lo")), F.col("hi"))
    out_of = (F.col("c") * 1.0 < F.col("lo")) | (F.col("c") * 1.0 > F.col("hi"))
    return (
        cents.join(F.broadcast(bounds), "priority")
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.avg("c") / 100.0, 4).alias("raw_mean"),
            F.round(F.avg(clamped) / 100.0, 4).alias("winsorized_mean"),
            F.sum(F.when(out_of, 1).otherwise(0)).cast("bigint").alias("n_clamped"),
        )
    )


@register(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
        SELECT n.n_name AS nation, o.o_custkey AS cust,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    nat AS (
        SELECT nation,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               sum((cents * 1.0) * cents) AS sq
        FROM rev GROUP BY nation
    )
    SELECT nation, n_customers,
           round(total_cents / 100.0, 4) AS total_revenue,
           round(sq / ((total_cents * 1.0) * total_cents) * 10000, 4)
               AS hhi_x10000
    FROM nat
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index of customer
    revenue per nation (×10 000, the antitrust scale: <1 500
    competitive, >2 500 concentrated) — Σ share² over each nation's
    customers, the one-number answer to "does this market depend on a
    few whales" (the revenue-side sibling of `agg_pareto_revenue_deciles`).

    Exactness: per-customer revenue is summed in integer CENTS; the
    Σcents² numerator multiplies through a double ((c·1.0)·c — exact to
    2⁵³, beyond which the ratio's low bits are already insignificant)
    and divides by total² in the same op order both engines, under
    round(4). Plan: one fact aggregate on (nation, cust) after two
    broadcast dim joins, then a ≤|nations| rollup — partial-aggregable
    end to end, no window."""
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_custkey").alias("cust"))
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    nat = rev.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum((F.col("cents") * 1.0) * F.col("cents")).alias("sq"),
    )
    return nat.select(
        "nation",
        "n_customers",
        F.round(F.col("total_cents") / 100.0, 4).alias("total_revenue"),
        F.round(
            F.col("sq") / ((F.col("total_cents") * 1.0) * F.col("total_cents")) * 10000,
            4,
        ).alias("hhi_x10000"),
    )


@register(
    "agg_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey AS part,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS s FROM rev),
    cum AS (
        SELECT part, cents,
               CAST(sum(cents) OVER (ORDER BY cents DESC, part) AS BIGINT)
                   AS running
        FROM rev
    ),
    classed AS (
        SELECT part, cents,
               CASE WHEN running * 5 <= s * 4 THEN 'A'
                    WHEN running * 20 <= s * 19 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum CROSS JOIN tot
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(cents) / 100.0, 4) AS class_revenue,
           round(sum(cents) * 1.0 / any_value(s), 4) AS revenue_share
    FROM classed CROSS JOIN tot
    GROUP BY abc_class
    """,
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of parts by revenue: parts are ranked
    by revenue and split at the classic cumulative-share cuts — A holds
    the head to 80% of revenue, B to 95%, C the tail — the first
    stratification every inventory/assortment process applies (the
    categorical sibling of `agg_pareto_revenue_deciles`).

    Exactness: revenue accumulates in integer CENTS; the class cuts are
    INTEGER cross-multiplications (running·5 ≤ S·4, running·20 ≤ S·19),
    so no row's class depends on float rounding; the running sum orders
    by (cents DESC, part) — a total order. Headroom: running·20 at
    TPC-H sf1 ≈ 4·10¹⁴, far inside int64. Plan: one fact aggregate on
    the part key, one ordered window over the |parts| frame, a 3-group
    rollup with the total as a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(cents).cast("bigint").alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("s"))
    w = Window.orderBy(F.col("cents").desc(), "part").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.select(
        "part", "cents", F.sum("cents").over(w).cast("bigint").alias("running")
    )
    classed = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        "s",
        F.when(F.col("running") * 5 <= F.col("s") * 4, "A")
        .when(F.col("running") * 20 <= F.col("s") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("cents") / 100.0, 4).alias("class_revenue"),
        F.round(F.sum("cents") / F.first("s"), 4).alias("revenue_share"),
    )


@register(
    "agg_theil_index",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rev_c) AS BIGINT) AS s
        FROM cust
    ),
    terms AS (
        SELECT CAST(floor(
                   ((c.rev_c * t.n) / t.s) * ln((c.rev_c * t.n) / t.s) * 1000000
                   + 0.5) AS BIGINT) AS term_u
        FROM cust c CROSS JOIN tot t
    )
    SELECT t.n AS n_customers,
           round(t.s / 100.0, 4) AS total_revenue,
           round(sum(term_u) / 1000000.0 / t.n, 4) AS theil_t
    FROM terms CROSS JOIN tot t
    GROUP BY t.n, t.s
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue — the decomposable
    companion to `agg_gini_coefficient`: T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ)
    (0 = equal, ln n = maximal). Unlike Gini it splits exactly into
    between-group + within-group terms, which is why corpus audits use
    it to attribute concentration to source groups.

    Exactness: per-customer revenue is an integer-cents bigint, the
    ratio xᵢ/μ is computed as (xᵢ·n)/S — exact bigint product, ONE
    IEEE division — and each term (ratio·ln ratio) is scaled to
    integer micro-units (floor(t·10⁶ + 0.5)) BEFORE summation, so the
    reduction is an order-free bigint sum (float sums of ln terms
    would drift with engine reduction order); x>0 always (an order has
    positive price), so ln never sees 0. Plan: one |customers| rollup,
    a 1-row totals broadcast, one map-side-combinable integer sum."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    tot = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev_c").cast("bigint").alias("s"),
    )
    ratio = (F.col("rev_c") * F.col("n")) / F.col("s")
    term_u = F.floor(ratio * F.log(ratio) * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        cust.crossJoin(F.broadcast(tot))
        .select(F.col("n"), F.col("s"), term_u.alias("term_u"))
        .groupBy("n", "s")
        .agg(F.sum("term_u").alias("su"))
        .select(
            F.col("n").alias("n_customers"),
            F.round(F.col("s") / 100.0, 4).alias("total_revenue"),
            F.round(F.col("su") / 1000000.0 / F.col("n"), 4).alias("theil_t"),
        )
    )


_RFM_SPLIT = "1995-07-01"  # first/second-half boundary of the order history


@register(
    "agg_rfm_migration_matrix",
    oracle=f"""
    WITH halves AS (
        SELECT o_custkey,
               CASE WHEN o_orderdate < TIMESTAMP '{_RFM_SPLIT}' THEN 0 ELSE 1 END
                   AS half,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY 1, 2
    ),
    tiled AS (
        SELECT o_custkey, half,
               ntile(4) OVER (PARTITION BY half ORDER BY rev_c, o_custkey)
                   AS m_tile
        FROM halves
    ),
    moved AS (
        SELECT a.m_tile AS tile_h1, b.m_tile AS tile_h2
        FROM tiled a JOIN tiled b
          ON a.o_custkey = b.o_custkey AND a.half = 0 AND b.half = 1
    )
    SELECT tile_h1, tile_h2,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY tile_h1), 4)
               AS row_share
    FROM moved GROUP BY 1, 2
    """,
)
def agg_rfm_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier MIGRATION matrix: monetary quartile in the
    first half of the order history vs the second half (fixed split
    date), for customers active in both — the churn/upgrade dashboard
    behind `agg_rfm_segments` ("how many top-quartile customers slid to
    the bottom"), with each origin tier's row normalized to shares.

    Determinism: per-half revenue is integer cents; ntile ties break on
    custkey (the RFM precedent — a total order, so tile boundaries are
    engine-identical); shares are one division under round(4). Plan:
    one conditional groupBy builds both halves in a single scan, two
    rank windows partitioned by half, one self-join on custkey, one
    16-cell aggregate."""
    o = load_table(spark, sf_dir, "orders")
    halves = o.groupBy(
        "o_custkey",
        F.when(F.col("o_orderdate") < F.lit(_RFM_SPLIT).cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    tiled = halves.select(
        "o_custkey",
        "half",
        F.ntile(4)
        .over(Window.partitionBy("half").orderBy("rev_c", "o_custkey"))
        .alias("m_tile"),
    )
    a = tiled.filter(F.col("half") == 0).select(
        "o_custkey", F.col("m_tile").alias("tile_h1")
    )
    b = tiled.filter(F.col("half") == 1).select(
        "o_custkey", F.col("m_tile").alias("tile_h2")
    )
    moved = a.join(b, "o_custkey")
    wrow = Window.partitionBy("tile_h1")
    return (
        moved.groupBy("tile_h1", "tile_h2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .select(
            "tile_h1",
            "tile_h2",
            "n_customers",
            F.round(
                F.col("n_customers") * 1.0 / F.sum("n_customers").over(wrow), 4
            ).alias("row_share"),
        )
    )


@register(
    "agg_newcomer_share",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS first_month
        FROM orders GROUP BY 1
    ),
    actives AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               o_custkey
        FROM orders GROUP BY 1, 2
    )
    SELECT a.month,
           CAST(count(*) AS BIGINT) AS active_customers,
           CAST(sum(CASE WHEN f.first_month = a.month THEN 1 ELSE 0 END)
                AS BIGINT) AS newcomers,
           round(sum(CASE WHEN f.first_month = a.month THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS newcomer_share
    FROM actives a JOIN firsts f ON a.o_custkey = f.o_custkey
    GROUP BY a.month
    """,
)
def agg_newcomer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly newcomer share: of the customers active each month, how
    many placed their FIRST-ever order that month — the growth-vs-
    retention decomposition (a rising active count with a falling
    newcomer share means retention is carrying growth; the opposite
    means churn is being papered over by acquisition).

    Plan shape: one groupBy(custkey) global min date, one distinct
    (month, custkey) activity frame, an equi-join on custkey, one
    monthly rollup — all-integer counts, one division under round(4).
    This is two map-side-combinable passes over the fact at any
    scale."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.trunc(F.min("o_orderdate"), "month").alias("first_month")
    )
    actives = o.select(
        F.trunc("o_orderdate", "month").alias("month"), "o_custkey"
    ).distinct()
    newcomer = F.when(F.col("first_month") == F.col("month"), 1).otherwise(0)
    return (
        actives.join(firsts, "o_custkey")
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_customers"),
            F.sum(newcomer).cast("bigint").alias("newcomers"),
            F.round(F.sum(newcomer) * 1.0 / F.count(F.lit(1)), 4).alias(
                "newcomer_share"
            ),
        )
    )


@register(
    "agg_hill_tail_index",
    oracle="""
    WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c, o_orderkey
        FROM orders
    ),
    top AS (
        SELECT c, CAST(row_number() OVER (ORDER BY c DESC, o_orderkey) AS BIGINT)
                      AS rn
        FROM (SELECT * FROM cents ORDER BY c DESC, o_orderkey LIMIT 101)
    ),
    ref AS (SELECT c AS ref_c FROM top WHERE rn = 101),
    terms AS (
        SELECT CAST(floor(ln(t.c * 1.0 / r.ref_c) * 1000000 + 0.5) AS BIGINT)
                   AS term_mu
        FROM top t CROSS JOIN ref r
        WHERE t.rn <= 100
    )
    SELECT CAST(100 AS BIGINT)                          AS k,
           round(r.ref_c / 100.0, 4)                    AS threshold_price,
           CAST(sum(t.term_mu) AS BIGINT)               AS sum_log_mu,
           round(sum(t.term_mu) / 100000000.0, 4)       AS hill_gamma,
           round(100000000.0 / sum(t.term_mu), 4)       AS tail_alpha
    FROM terms t CROSS JOIN ref r
    GROUP BY r.ref_c
    """,
)
def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index over order values:
    gamma = (1/k)·Σ ln(x_(i)/x_(k+1)) over the k=100 largest orders,
    alpha = 1/gamma — the standard extreme-value answer to "how heavy is
    the revenue tail", sharper than `agg_pareto_revenue_deciles`' coarse
    decile shares and the regression-free cousin of `text_zipf_fit`.

    Exactness: order values are quantized to integer cents BEFORE the
    top-k selection (ordering by the double then taking cents could pick
    a different tied boundary row), the order statistic is made total
    with the o_orderkey tiebreak, and each log-ratio is independently
    floor(·1e6+0.5)-quantized before the bigint sum — the Theil/JSD
    fixed-point-log convention, so term order cannot move the result.
    Plan: a global top-101 (TakeOrdered — no full sort, no shuffle of
    the data, only k+1 rows reach the driver-side heap merge) then a
    101-row frame with a 1-row broadcast threshold: at 100 TB the scan
    is the only full pass and everything downstream is O(k)."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("c"),
        "o_orderkey",
    )
    # checkpoint the 101-row top-k so the ref row and the 100 term rows
    # read ONE TakeOrdered pass — deriving both from the lazy frame would
    # re-run the full scan per consumer (2 scans of orders at any scale)
    top = durable_checkpoint(
        cents.orderBy(F.col("c").desc(), "o_orderkey").limit(101), eager=False
    ).select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "o_orderkey"))
        .cast("bigint")
        .alias("rn"),
    )
    ref = top.filter(F.col("rn") == 101).select(F.col("c").alias("ref_c"))
    terms = (
        top.filter(F.col("rn") <= 100)
        .crossJoin(F.broadcast(ref))
        .select(
            "ref_c",
            F.floor(F.log(F.col("c") * 1.0 / F.col("ref_c")) * 1000000 + 0.5)
            .cast("bigint")
            .alias("term_mu"),
        )
    )
    return (
        terms.groupBy("ref_c")
        .agg(F.sum("term_mu").cast("bigint").alias("sum_log_mu"))
        .select(
            F.lit(100).cast("bigint").alias("k"),
            F.round(F.col("ref_c") / 100.0, 4).alias("threshold_price"),
            "sum_log_mu",
            F.round(F.col("sum_log_mu") / 100000000.0, 4).alias("hill_gamma"),
            F.round(F.lit(100000000.0) / F.col("sum_log_mu"), 4).alias("tail_alpha"),
        )
    )


@register(
    "agg_mutual_information",
    oracle=f"""
    {EVENTS_CTE},
    cells AS (
        SELECT event_type AS t, CAST(extract(hour FROM ts) AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS n_th
        FROM ev GROUP BY 1, 2
    ),
    mt AS (SELECT t, CAST(sum(n_th) AS BIGINT) AS n_t FROM cells GROUP BY 1),
    mh AS (SELECT h, CAST(sum(n_th) AS BIGINT) AS n_h FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(n_th) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT c.t, c.h, c.n_th,
               round(ln(c.n_th * 1.0 * tot.n / (m1.n_t * 1.0 * m2.n_h)), 4)
                   + 0.0 AS pmi,
               CAST(floor(c.n_th
                          * ln(c.n_th * 1.0 * tot.n / (m1.n_t * 1.0 * m2.n_h))
                          * 1000000 / tot.n + 0.5) AS BIGINT) AS contrib_mu
        FROM cells c
        JOIN mt m1 ON c.t = m1.t
        JOIN mh m2 ON c.h = m2.h
        CROSS JOIN tot
    )
    SELECT t AS event_type, h AS hour_of_day, n_th, pmi,
           round(contrib_mu / 1000000.0, 4) + 0.0 AS mi_contrib,
           round(CAST(sum(contrib_mu) OVER () AS BIGINT) / 1000000.0, 4)
               + 0.0 AS mi_total
    FROM terms
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day: the full
    I(T;H) = Σ p(t,h)·ln(p(t,h)/(p(t)p(h))) contingency decomposition —
    per-cell PMI plus each cell's (possibly negative) MI contribution
    and the corpus total — the dependence measure feature-selection and
    drift monitors use where a chi-square (`agg_chi_square_independence`)
    only gives a significance verdict and the pairwise
    `affinity_copurchase_pmi` only scores individual pairs.

    Exactness: ln() on an identical double ratio with round(4) is the
    established PMI/entropy convention; the MI TOTAL uses the per-term
    fixed-point rule (floor(x*1e6 + 0.5) per cell BEFORE summation —
    the Theil/JSD discipline) so the sum is order-free bigint in both
    engines. Signed zero: DuckDB's round() of a small negative double
    yields -0.0 where Spark's HALF_UP decimal round yields +0.0 (the
    r11 driver red row) — every rounded float column therefore gets a
    final `+ 0.0` (IEEE: -0.0 + 0.0 = +0.0) on BOTH engines, the
    FIXTURES.md signed-zero convention. Plan: one map-side-combinable
    groupBy over events, then
    joins and a global window over the |types|x24 contingency frame —
    metadata-scale regardless of event volume; the 1-row total rides a
    broadcast."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # checkpoint the |types|x24 contingency frame: three consumers below
    # (both marginals + the term join) would otherwise each re-run the
    # full events scan + rollup
    cells = durable_checkpoint(
        ev.groupBy(
            F.col("event_type").alias("t"),
            F.hour("ts").cast("bigint").alias("h"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_th")),
        eager=False,
    )
    mt = cells.groupBy("t").agg(F.sum("n_th").cast("bigint").alias("n_t"))
    mh = cells.groupBy("h").agg(F.sum("n_th").cast("bigint").alias("n_h"))
    tot = cells.agg(F.sum("n_th").cast("bigint").alias("n"))
    # both products route through double BEFORE multiplying: n_th*n and
    # n_t*n_h are ~1e24 at 100 TB event counts — past bigint — while the
    # double ratio is well-conditioned (the ln argument)
    ratio = (
        F.col("n_th").cast("double")
        * F.col("n")
        / (F.col("n_t").cast("double") * F.col("n_h"))
    )
    terms = (
        cells.join(mt, "t")
        .join(mh, "h")
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            "h",
            "n_th",
            (F.round(F.log(ratio), 4) + F.lit(0.0)).alias("pmi"),
            F.floor(
                F.col("n_th") * F.log(ratio) * 1000000 / F.col("n") + 0.5
            )
            .cast("bigint")
            .alias("contrib_mu"),
        )
    )
    w_all = Window.partitionBy()
    return terms.select(
        F.col("t").alias("event_type"),
        F.col("h").alias("hour_of_day"),
        "n_th",
        "pmi",
        (F.round(F.col("contrib_mu") / 1000000.0, 4) + F.lit(0.0)).alias(
            "mi_contrib"
        ),
        (
            F.round(
                F.sum("contrib_mu").over(w_all).cast("bigint") / 1000000.0, 4
            )
            + F.lit(0.0)
        ).alias("mi_total"),
    )


@register(
    "agg_ks_source_drift",
    oracle="""
    WITH per AS (
        SELECT source, n_chars AS v, count(*) AS c
        FROM documents WHERE n_chars IS NOT NULL
        GROUP BY source, n_chars
    ),
    ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM per GROUP BY source),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM per),
    grid AS (SELECT DISTINCT v FROM per),
    gcum AS (
        SELECT v, CAST(sum(c_v) OVER (ORDER BY v) AS BIGINT) AS c_all
        FROM (SELECT v, sum(c) AS c_v FROM per GROUP BY v)
    ),
    dense AS (
        SELECT ns.source, ns.n_s, g.v, COALESCE(p.c, 0) AS c
        FROM ns CROSS JOIN grid g
        LEFT JOIN per p ON p.source = ns.source AND p.v = g.v
    ),
    scum AS (
        SELECT source, n_s, v,
               CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT)
                   AS c_s
        FROM dense
    ),
    dnum AS (
        SELECT s.source, s.n_s, s.v,
               abs(CAST(s.c_s AS HUGEINT) * t.n_all
                   - CAST(g.c_all AS HUGEINT) * s.n_s) AS d_num
        FROM scum s JOIN gcum g ON s.v = g.v CROSS JOIN tot t
    ),
    ranked AS (
        SELECT source, n_s, v, d_num,
               row_number() OVER (PARTITION BY source
                                  ORDER BY d_num DESC, v) AS rn
        FROM dnum
    )
    SELECT r.source, r.n_s AS n_docs,
           round(CAST(r.d_num AS DOUBLE)
                 / (CAST(r.n_s AS DOUBLE) * t.n_all), 4) AS d_stat,
           CAST(r.v AS BIGINT) AS ks_at
    FROM ranked r CROSS JOIN tot t
    WHERE r.rn = 1
    """,
)
def agg_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift screen: the exact two-sample
    Kolmogorov–Smirnov statistic between each source's document-length
    (n_chars) ECDF and the POOLED corpus ECDF — the screening statistic a
    training pipeline runs per ingest source to catch a feed whose length
    profile shifted (truncation bugs, boilerplate injection, encoding
    breaks). One row per source: D = max_v |F_s(v) − F_all(v)|, the value
    attaining it (smallest on ties), and the source size.

    Exactness (house integer discipline): ECDF differences are compared
    as integer cross-products |c_s·N − c_all·n_s| — counts never pass
    through floats before the argmax, so the max and its arg are
    bit-identical across engines; the single final division is
    double-on-both-sides with round(4). The cross-products reach
    n_s·N ≈ 1e24 at 100 TB-scale corpus counts — far past bigint — so
    both engines carry them in decimal(38,0)/HUGEINT (the bot-score /
    Bollinger rule, events_analytics.py:2142).

    Scale shape: one partial+final groupBy over (source, length) compresses
    the corpus to metadata scale (|sources|·|distinct lengths| rows —
    bounded, not ∝ corpus); everything after (grid cross join, cumulative
    windows, per-source argmax) runs on that compressed frame. The pooled
    total rides a broadcast-scalar carry (crossJoin of a 1-row aggregate,
    the documented house pattern); per-source ECDF windows partition on
    source — no global window over data-scale rows."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return ks_drift_from_counts(per)


def ks_drift_from_counts(per: DataFrame) -> DataFrame:
    """Per-source KS statistic derived from a (source, v, c) count frame —
    the read-time half of the drift screen, shared by the one-shot batch
    operator above and its incremental streaming twin
    (`stream_ks_drift_monitor`): the counts are the sufficient statistic
    (a trivially associative bigint monoid), so any maintenance strategy
    that lands the same counts gets the identical KS by construction.

    NULL lengths are excluded from the ECDF on BOTH engines (the oracle
    filters them in its count CTE): Spark's default window ordering is
    NULLS FIRST while DuckDB's is NULLS LAST, so a NULL grid value would
    shift every cumulative count differently per engine — the filter
    removes the split class instead of pinning an ordering."""
    per = per.filter(F.col("v").isNotNull())
    ns = per.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    tot = per.agg(F.sum("c").cast("bigint").alias("n_all"))
    grid = per.select("v").distinct()
    w_g = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gcum = (
        per.groupBy("v")
        .agg(F.sum("c").alias("c_v"))
        .select("v", F.sum("c_v").over(w_g).cast("bigint").alias("c_all"))
    )
    dense = (
        ns.crossJoin(grid)
        .join(per, ["source", "v"], "left")
        .select("source", "n_s", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_s = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scum = dense.select(
        "source", "n_s", "v", F.sum("c").over(w_s).cast("bigint").alias("c_s")
    )
    dnum = (
        scum.join(gcum, "v")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            "v",
            "n_all",
            F.abs(
                F.col("c_s").cast("decimal(38,0)") * F.col("n_all")
                - F.col("c_all").cast("decimal(38,0)") * F.col("n_s")
            ).alias("d_num"),
        )
    )
    w_rank = Window.partitionBy("source").orderBy(F.col("d_num").desc(), F.col("v"))
    return (
        dnum.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n_s").cast("double") * F.col("n_all").cast("double")),
                4,
            ).alias("d_stat"),
            F.col("v").cast("bigint").alias("ks_at"),
        )
    )


# Shared-helper dependency declarations (see registry.declare_helper_deps).
from spark_ibm_mq_spark.registry import declare_helper_deps  # noqa: E402

declare_helper_deps("agg_ks_source_drift", ks_drift_from_counts)

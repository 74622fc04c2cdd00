"""Window-function operators (SURVEY.md §2.2 "Window functions").

The reference's seq-collision repair (IBMMQReceiver.java:252-254) is a
row_number in disguise and its lastTs/lastSeqNo state (266-267) is a lag();
these queries are that machinery as declarative windows.

Scale notes: a window shuffles once on its partition key and sorts within
partitions. Keys here (priority, user, brand) are well-distributed; for a
skewed key the fix is salting or pre-aggregation, never a global sort. All
orderings carry a unique tie-break column so results are deterministic and
replayable (the same property the reference buys with its monotone key).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.operators.projections import EVENTS_CTE
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table


@register(
    "win_rank_orders",
    oracle="""
    SELECT * FROM (
        SELECT o_orderkey, o_orderpriority,
               round(o_totalprice, 4) AS price,
               rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
               dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk,
               round(percent_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC), 4) AS prnk,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               ntile(4)     OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        FROM orders
    ) WHERE rnk <= 5
    """,
)
def win_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number/ntile; row_number+ntile get a unique
    tie-break, rank family is tie-stable by value."""
    o = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    tiebreak = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 4).alias("price"),
            F.rank().over(by_price).alias("rnk"),
            F.dense_rank().over(by_price).alias("drnk"),
            F.round(F.percent_rank().over(by_price), 4).alias("prnk"),
            F.row_number().over(tiebreak).alias("rn"),
            F.ntile(4).over(tiebreak).alias("quartile"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "win_lag_lead_events",
    oracle=f"""
    {EVENTS_CTE}
    SELECT event_id, user_id,
           round((epoch_ms(ts) - epoch_ms(lag(ts) OVER w)) / 1000.0, 4) AS gap_s,
           lead(event_type) OVER w AS next_type
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time — the reference's lastTs/lastSeqNo
    carry-over state (IBMMQReceiver.java:216-217,266-267) as a window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.unix_millis(F.lag("ts").over(w).cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        F.round((ms - prev_ms) / 1000.0, 4).alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "win_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           count(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)     AS running_n,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg3
    FROM orders
    """,
)
def win_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates with explicit row frames (cumulative + 3-row
    moving average) — the reference's cumulative telemetry counters
    (IBMMQReceiver.java:246) declaratively."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(cum), 4).alias("running_total"),
        F.count(F.lit(1)).over(cum).alias("running_n"),
        F.round(F.avg("o_totalprice").over(mov), 4).alias("moving_avg3"),
    )


@register(
    "win_dedup_latest_event",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
    ) WHERE rn = 1
    """,
)
def win_dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup (row_number DESC = 1) — the core
    replication-consumer operation the reference's ordered key enables
    (README.md:59)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "win_top3_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, round(revenue, 4) AS revenue FROM (
        SELECT p_brand, p_partkey, revenue,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY revenue DESC, p_partkey) AS rn
        FROM (
            SELECT p_brand, p_partkey,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_partkey
        ) rev
    ) ranked WHERE rn <= 3
    """,
)
def win_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: aggregate first (shrinks input), then window rank —
    never a global sort. At 100 TB the pre-aggregation makes the window
    input |brands|×|parts|, not |lineitem|."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.round("revenue", 4).alias("revenue"))
    )


@register(
    "win_sessionize_events",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id, session_id,
           min(ts)    AS session_start,
           max(ts)    AS session_end,
           count(*)   AS n_events
    FROM (
        SELECT user_id, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL
                          OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)) > 1800000
                        THEN 1 ELSE 0 END AS new_session
            FROM ev
        ) marks
    ) numbered
    GROUP BY user_id, session_id
    """,
)
def win_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag → new-session flag
    → running sum as session id → per-session aggregate. The batch twin of
    `stream_session_windows`. One shuffle on user_id serves all three
    window passes (same partitioning), then the groupBy reuses it too —
    Catalyst plans a single Exchange for the whole chain."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(
        F.lag("ts").over(w).cast("timestamp")
    )
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap_ms > 1_800_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "win_value_functions",
    oracle="""
    SELECT c.c_custkey,
           o.o_orderkey,
           first_value(o.o_orderdate) OVER w                        AS first_date,
           last_value(o.o_orderdate)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_date,
           nth_value(o.o_orderdate, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS second_date,
           round(cume_dist() OVER (PARTITION BY c.c_custkey
                                   ORDER BY o.o_totalprice), 4)     AS price_cume
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 100
    WINDOW w AS (PARTITION BY c.c_custkey ORDER BY o.o_orderdate, o.o_orderkey)
    """,
)
def win_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions (SURVEY §2.2 Window rows): first_value /
    last_value / nth_value over a fully-tiebroken frame plus cume_dist.
    last/nth use the UNBOUNDED FOLLOWING frame — the default running frame
    would return the current row for last_value, the classic trap. The
    (date, orderkey) tie-break makes all three value picks deterministic;
    cume_dist ties on raw price are tie-stable by definition (same value →
    same cumulative fraction), so no float-boundary risk after round(4).

    Scale: one exchange on c_custkey shared by ALL four windows (same
    partition spec), small per-customer partitions — no global sort."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    by_date = Window.partitionBy("c_custkey").orderBy("o_orderdate", "o_orderkey")
    full = by_date.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    by_price = Window.partitionBy("c_custkey").orderBy("o_totalprice")
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(by_date).alias("first_date"),
        F.last("o_orderdate").over(full).alias("last_date"),
        F.nth_value("o_orderdate", 2).over(full).alias("second_date"),
        F.round(F.cume_dist().over(by_price), 4).alias("price_cume"),
    )


@register(
    "win_range_moving_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, order_day,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY order_day
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 4) AS sum_30d,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY order_day
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS order_day,
                 o_totalprice
          FROM orders)
    """,
)
def win_range_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-customer trailing-30-day order
    value and count — the moving-aggregate shape ROWS frames can't express
    (a RANGE frame admits every row whose ORDER BY key falls in the value
    interval, ties included, exactly per the SQL standard in both engines).
    The order key is the integer epoch-day, so the frame bound arithmetic
    is exact and engine-identical.

    Plan shape: one hash exchange on o_custkey feeding a partition-local
    sort — identical cost to the ROWS-frame running totals; the frame
    bound adds no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        day.alias("order_day"),
        "o_totalprice",
    ).select(
        "o_custkey",
        "o_orderkey",
        "order_day",
        F.round(F.sum("o_totalprice").over(w), 4).alias("sum_30d"),
        F.count(F.lit(1)).over(w).alias("n_30d"),
    )


@register(
    "win_rolling_median",
    oracle=f"""
    {EVENTS_CTE}
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM ev
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIAN over a trailing 7-row frame per user — the robust
    de-noising smoother (rolling averages chase spikes; rolling medians
    don't), here as a window aggregate rather than a groupBy so every event
    keeps its own smoothed value.

    Scale shape: one shuffle on user_id + per-partition sort — identical to
    every other window in this family, so at 100 TB it shares the events
    table's canonical user_id partitioning. Spark's `median` aggregate
    rejects window FRAMES, so the frame's values come out of a bounded
    `collect_list` (≤7 doubles of state per row, constant memory) and the
    exact interpolated median — mean of the two middle elements, matching
    DuckDB's definition — is computed over the sorted array in whole-stage
    codegen, no UDF."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    return ev.select(
        "event_id",
        "user_id",
        F.round((lo + hi) / 2.0, 4).alias("med7"),
    )


@register(
    "win_ewma_hourly",
    oracle=f"""
    {EVENTS_CTE},
    hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2
    ),
    seq AS (
        SELECT event_type, hr, n,
               row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
        FROM hourly
    )
    SELECT a.event_type, a.hr, a.n,
           round(sum(b.n * power(2, 15 - (a.rn - b.rn)))
                 / sum(power(2, 15 - (a.rn - b.rn))), 4) AS ewma_16h
    FROM seq a JOIN seq b
      ON a.event_type = b.event_type AND b.rn BETWEEN a.rn - 15 AND a.rn
    GROUP BY a.event_type, a.hr, a.n
    """,
)
def win_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly event volume per
    type over the trailing 16 observed hours, decay α = 1/2 — the smoothed
    rate signal alerting thresholds compare against. Weights are the
    DYADIC powers 2^(15-j) (j hours back): every weighted term is an
    integer-valued double and their sums stay below 2^53, so numerator and
    denominator are EXACT in any summation order and the single final
    division is IEEE exactly-rounded — bit-identical across engines with
    no rounding escape hatch. α=1/2 is the one decay whose weights are all
    exactly representable; other decays need a decimal-weight variant.

    Plan shape (the Spark side): the hourly rollup is one
    map-side-combinable groupBy; the EWMA is a frame-bounded window
    (ROWS 15 PRECEDING) with `collect_list` + a codegen'd
    `transform(..., (x, i) -> …)`/`aggregate` fold over ≤16 elements — no
    self-join, no second shuffle, the window reuses the rollup's
    event_type partitioning. The ORACLE expresses the identical frame as
    a row_number band self-join, the relational spelling of the same
    window. At 100 TB the windowed frame is |types|×|hours| rows —
    metadata-scale — regardless of event volume."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-15, Window.currentRow)
    )
    withwin = hourly.withColumn("win", F.collect_list("n").over(w))
    # element i (oldest-first) of an s-element frame sits j = s-1-i hours
    # back -> weight 2^(15-j) = 2^(16-s+i); all terms integer-valued.
    sz = F.size("win").cast("double")
    weighted = F.transform(
        "win",
        lambda x, i: x.cast("double")
        * F.pow(F.lit(2.0), i.cast("double") + F.lit(16.0) - sz),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
    den = F.pow(F.lit(2.0), F.lit(16.0)) - F.pow(F.lit(2.0), F.lit(16.0) - sz)
    return withwin.select(
        "event_type",
        "hr",
        "n",
        F.round(num / den, 4).alias("ewma_16h"),
    )


@register(
    "win_weekly_pct_change",
    oracle="""
    WITH weekly AS (
        SELECT CAST(floor((CAST(o_orderdate AS DATE) - DATE '1992-01-01') / 7.0)
                    AS BIGINT) AS week_no,
               round(sum(o_totalprice), 4) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT week_no, revenue, n_orders,
           round(lag(revenue) OVER (ORDER BY week_no), 4) AS prev_revenue,
           round((revenue - lag(revenue) OVER (ORDER BY week_no))
                 / lag(revenue) OVER (ORDER BY week_no) * 100, 4) AS wow_pct
    FROM weekly
    """,
)
def win_weekly_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: weekly order revenue with the
    previous week's value and percentage change via lag — the delta
    framing every trend dashboard applies to a time series. First week's
    change is NULL (nothing to compare), not 0 — absence of a baseline
    is not zero growth.

    Determinism: cell revenue is rounded before the lag/percent math, so
    both engines difference identical doubles; the divide-then-×100 tree
    is written identically both sides.

    Plan shape: one map-side-combinable week rollup (|weeks| rows out of
    |orders|), then a single ordered window over metric-frame rows —
    the window is metadata-scale at any order volume."""
    o = load_table(spark, sf_dir, "orders")
    week_no = F.floor(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) / 7.0
    ).cast("bigint")
    weekly = o.groupBy(week_no.alias("week_no")).agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("week_no")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "week_no",
        "revenue",
        "n_orders",
        F.round(prev, 4).alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("wow_pct"),
    )


@register(
    "win_activity_streaks",
    oracle=f"""
    {EVENTS_CTE},
    ud AS (
        SELECT DISTINCT user_id,
               CAST(ts AS DATE) - DATE '1970-01-01' AS day_no
        FROM ev
    ),
    islands AS (
        SELECT user_id, day_no,
               day_no - row_number() OVER (
                   PARTITION BY user_id ORDER BY day_no) AS island
        FROM ud
    ),
    streaks AS (
        SELECT user_id, island,
               CAST(count(*) AS BIGINT) AS len,
               min(day_no) AS start_day
        FROM islands GROUP BY 1, 2
    ),
    best AS (
        SELECT user_id, start_day,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, start_day) AS rk
        FROM streaks
    )
    SELECT s.user_id,
           CAST(max(s.len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(any_value(b.start_day) AS BIGINT) AS best_streak_start
    FROM streaks s
    JOIN (SELECT user_id, start_day FROM best WHERE rk = 1) b
      ON s.user_id = b.user_id
    GROUP BY s.user_id
    """,
)
def win_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern: on the deduped (user, day) frame,
    `day_no − row_number()` is constant exactly across consecutive runs,
    so one window + one groupBy finds every streak with no self-join;
    output is each user's longest streak, streak count, and the start
    day of the best streak (earliest wins a length tie, via a composite
    min_by ordinal — no second window pass).

    All-integer arithmetic end to end — bit-exact.

    Plan shape: distinct (user, day) first (the only event-volume
    shuffle), then a user-partitioned window and two aggregates that
    reuse the same user_id hash partitioning. |users|×|active days|
    rows after the distinct — engagement-table scale, not event scale."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    day_no = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    ud = ev.select("user_id", day_no.alias("day_no")).distinct()
    w = Window.partitionBy("user_id").orderBy("day_no")
    islands = ud.withColumn(
        "island", F.col("day_no") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day_no").alias("start_day"),
    )
    ordinal = F.struct((-F.col("len")).alias("neg"), F.col("start_day").alias("sd"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min_by("start_day", ordinal).cast("bigint").alias("best_streak_start"),
    )


@register(
    "win_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    run AS (
        SELECT d, CAST(sum(cents) OVER (ORDER BY d) AS BIGINT) AS c
        FROM daily
    ),
    cum AS (
        SELECT d, c, CAST(max(c) OVER (ORDER BY d) AS BIGINT) AS peak
        FROM run
    )
    SELECT d AS trough_day,
           round(peak / 100.0, 4) AS peak_revenue,
           round(c / 100.0, 4) AS cum_revenue,
           CAST(peak - c AS BIGINT) AS drawdown_cents,
           round((peak - c) * 1.0 / peak, 4) AS drawdown_frac
    FROM cum
    ORDER BY peak - c DESC, d
    LIMIT 5
    """,
)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily revenue — running peak minus
    current cumulative, the worst-slump metric finance borrows to any
    cumulative KPI (here: the five deepest troughs with their peaks).

    Exactness: revenue converts to INTEGER CENTS per row (floor(x·100+.5)
    — identical double ops both engines) before any aggregation, so the
    daily sums, running sum, running max, and the drawdown itself are all
    bigint — order-free and overflow-safe to ~9·10¹⁶ cents; only the two
    display divisions are float. Ranking by the integer drawdown makes the
    top-5 cut deterministic (day tie-break). Plan: one daily aggregate,
    one ordered window over the ~|days| frame computing running sum and
    running-max-of-running-sum together, TakeOrdered(5)."""
    o = load_table(spark, sf_dir, "orders")
    cents_row = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(cents_row).cast("bigint").alias("cents")
    )
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "d",
        F.sum("cents").over(wc).cast("bigint").alias("c"),
    ).select(
        "d", "c", F.max("c").over(wc).cast("bigint").alias("peak")
    )
    return (
        cum.select(
            F.col("d").alias("trough_day"),
            F.round(F.col("peak") / 100.0, 4).alias("peak_revenue"),
            F.round(F.col("c") / 100.0, 4).alias("cum_revenue"),
            (F.col("peak") - F.col("c")).cast("bigint").alias("drawdown_cents"),
            F.round((F.col("peak") - F.col("c")) / F.col("peak"), 4).alias(
                "drawdown_frac"
            ),
        )
        .orderBy(F.col("drawdown_cents").desc(), "trough_day")
        .limit(5)
    )


_RC_WIN = 14  # rolling correlation window (days)


@register(
    "win_rolling_corr",
    oracle=f"""
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM ev GROUP BY 1
    ),
    roll AS (
        SELECT d, x, y,
               CAST(count(*) OVER w AS BIGINT)      AS n,
               CAST(sum(x) OVER w AS BIGINT)        AS sx,
               CAST(sum(y) OVER w AS BIGINT)        AS sy,
               CAST(sum(x * x) OVER w AS BIGINT)    AS sxx,
               CAST(sum(y * y) OVER w AS BIGINT)    AS syy,
               CAST(sum(x * y) OVER w AS BIGINT)    AS sxy
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN {_RC_WIN - 1} PRECEDING
                     AND CURRENT ROW)
    )
    SELECT d, x AS clicks, y AS purchases,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4)
               AS rolling_corr
    FROM roll
    WHERE n = {_RC_WIN}
      AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between daily clicks and daily
    purchases — the co-movement monitor that flags funnel decoupling (a
    day where clicks rise but purchases stop following) long before
    absolute volume alarms fire.

    Exactness: all five rolling moments (Σx, Σy, Σx², Σy², Σxy) are
    BIGINT window sums of integer daily counts — order-free — and the
    correlation is one fixed expression of them (sqrt/mul/div, IEEE
    exact) under round(4): no float accumulation anywhere. Windows with
    zero variance on either side are excluded (both engines would 0/0
    differently). Plan: one daily aggregate computing both series in a
    single conditional pass, one ordered window over the ~|days| frame
    computing all five moments together."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    w = Window.orderBy("d").rowsBetween(-(_RC_WIN - 1), Window.currentRow)
    roll = daily.select(
        "d",
        "x",
        "y",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        roll.filter((F.col("n") == _RC_WIN) & (vx > 0) & (vy > 0))
        .select(
            "d",
            F.col("x").alias("clicks"),
            F.col("y").alias("purchases"),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 4).alias("rolling_corr"),
        )
    )


@register(
    "win_skyline_orders",
    oracle="""
    WITH metrics AS (
        SELECT l.l_orderkey AS ok,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT) AS rev_c,
               CAST(max(datediff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE))) AS BIGINT)
                   AS delay_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    ),
    grp AS (
        SELECT rev_c, CAST(min(delay_days) AS BIGINT) AS min_delay
        FROM metrics GROUP BY rev_c
    ),
    runmin AS (
        SELECT rev_c,
               min_delay,
               CAST(min(min_delay) OVER (ORDER BY rev_c DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT) AS prev_min
        FROM grp
    )
    SELECT m.ok AS o_orderkey,
           round(m.rev_c / 100.0, 4) AS revenue,
           m.delay_days
    FROM metrics m JOIN runmin r ON m.rev_c = r.rev_c
    WHERE m.delay_days = r.min_delay
      AND (r.prev_min IS NULL OR r.prev_min > m.delay_days)
    """,
)
def win_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-frontier) operator: orders not dominated on
    (revenue ↑, fulfillment delay ↓) — no other order earns at least as
    much AND ships at least as fast with one strict improvement. The
    classic multi-criteria "best trade-offs" query (Börzsönyi et al.'s
    SKYLINE OF), expressed WITHOUT the naive O(n²) dominance self-join:
    sort the (revenue → min-delay) groups once, and a running minimum
    over strictly-greater revenues decides dominance — a row survives
    iff it achieves its revenue group's min delay AND beats the best
    delay seen at any higher revenue. O(n log n), one window over the
    |distinct revenue| frame.

    Exactness: revenue in integer cents, delay in integer days, ties
    kept symmetrically (equal (rev, delay) rows don't dominate each
    other) — every comparison is integer, no rank epsilons. At 100 TB:
    the same two-step works partition-parallel (local skyline per
    partition, then skyline-of-skylines — the standard distributed
    rewrite), since dominance is transitive."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    rev_c = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    metrics = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.sum(rev_c).cast("bigint").alias("rev_c"),
            F.max(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            )
            .cast("bigint")
            .alias("delay_days"),
        )
    )
    grp = metrics.groupBy("rev_c").agg(
        F.min("delay_days").cast("bigint").alias("min_delay")
    )
    w = Window.orderBy(F.col("rev_c").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    runmin = grp.select(
        "rev_c", "min_delay", F.min("min_delay").over(w).cast("bigint").alias("prev_min")
    )
    return (
        metrics.join(runmin, "rev_c")
        .filter(
            (F.col("delay_days") == F.col("min_delay"))
            & (F.col("prev_min").isNull() | (F.col("prev_min") > F.col("delay_days")))
        )
        .select(
            F.col("ok").alias("o_orderkey"),
            F.round(F.col("rev_c") / 100.0, 4).alias("revenue"),
            "delay_days",
        )
    )


_DAILY_REV_CTE = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(count(*) AS BIGINT)  AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)           AS rev_c
        FROM orders GROUP BY 1
    )
"""


@register(
    "win_spearman_daily",
    oracle=_DAILY_REV_CTE + """,
    ranked AS (
        SELECT d,
               CAST(row_number() OVER (ORDER BY n_orders, d) AS BIGINT) AS rx,
               CAST(row_number() OVER (ORDER BY rev_c, d) AS BIGINT)    AS ry
        FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
           round(1.0 - 6.0 * sum((rx - ry) * (rx - ry))
                 / (count(*) * (CAST(count(*) AS BIGINT) * count(*) - 1)), 4)
               AS spearman_rho
    FROM ranked
    """,
)
def win_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily order COUNT and daily
    revenue over the whole order history — the monotone-association
    check that survives outliers Pearson chokes on (one mega-order day
    cannot drag the coefficient; only its RANK moves).

    Exactness: ranks are `row_number` with the DATE as the stated
    tiebreak (deterministic total order both engines; classic
    average-rank ties would force fractional ranks and float sums),
    Σd² is a bigint sum of integer squares — order-free — and
    ρ = 1 − 6Σd²/(n³−n) is one fixed expression under round(4).
    Plan: one groupBy(day) partial-agg scan (revenue pre-scaled to
    integer cents at the row level), two rank windows over the ~|days|
    frame, one 1-row aggregate. At 100 TB the daily rollup is the only
    full-data pass; everything after runs on ≤ date-range rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c"),
    )
    ranked = daily.select(
        F.row_number().over(Window.orderBy("n_orders", "d")).cast("bigint").alias("rx"),
        F.row_number().over(Window.orderBy("rev_c", "d")).cast("bigint").alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    n = F.count(F.lit(1)).cast("bigint")
    return ranked.agg(
        n.alias("n_days"),
        F.sum(d2).cast("bigint").alias("sum_d2"),
        F.round(
            F.lit(1.0) - F.lit(6.0) * F.sum(d2) / (n * (n * n - F.lit(1))), 4
        ).alias("spearman_rho"),
    )


@register(
    "win_mann_kendall_trend",
    oracle=_DAILY_REV_CTE + """,
    s AS (
        SELECT CAST(sum(CASE WHEN b.rev_c > a.rev_c THEN 1
                             WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    n AS (SELECT s_stat, n_pairs,
                 CAST(floor((1 + sqrt(1 + 8.0 * n_pairs)) / 2 + 0.5) AS BIGINT)
                     AS n_days
          FROM s)
    SELECT n_days, n_pairs, s_stat,
           round(s_stat * 1.0 / n_pairs, 4) AS kendall_tau,
           round((s_stat - CASE WHEN s_stat > 0 THEN 1
                                WHEN s_stat < 0 THEN -1 ELSE 0 END)
                 / sqrt(n_days * (n_days - 1.0) * (2 * n_days + 5) / 18.0), 4)
               AS z_score
    FROM n
    """,
)
def win_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the daily-revenue series:
    S = Σ_{i<j} sign(x_j − x_i), Kendall's τ = S / C(n,2), and the
    normal-approximation z with continuity correction — the
    distribution-free "is revenue drifting" answer that needs no slope
    model (complement to `agg_ols_daily_trend`, which assumes
    linearity).

    Exactness: S and the pair count are integer sums over the ordered
    self-join — order-free — and τ/z are fixed expressions of (S, n)
    under round(4) (sqrt is IEEE correctly-rounded, so both engines
    agree bit-for-bit). Plan/scale: the O(|days|²) pair join is bounded
    by the DATE RANGE (~2.4k days → ~3M integer pairs), not by row
    count — the full-data pass is the one groupBy(day) rollup; at
    100 TB the pair join still runs on calendar-bounded rows (and a
    longer calendar would switch to the merge-sort variant counting
    inversions in O(n log n))."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c"),
    )
    a = daily.select(F.col("d").alias("da"), F.col("rev_c").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("rev_c").alias("xb"))
    sgn = (
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(sgn).cast("bigint").alias("s_stat"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    cc = (
        F.when(F.col("s_stat") > 0, 1).when(F.col("s_stat") < 0, -1).otherwise(0)
    )
    # n_days recovered from the pair count (p = n(n-1)/2 is injective):
    # saves a third scan of orders + a cross join; sqrt(1+8p) is exact in
    # double far past any calendar (p < 2^52), and the +0.5 floor absorbs
    # the one-ulp case where the perfect square roots a hair low.
    nd = F.floor((F.lit(1) + F.sqrt(F.lit(1.0) + F.lit(8.0) * F.col("n_pairs"))) / 2 + F.lit(0.5)).cast("bigint")
    return (
        s.withColumn("n_days", nd)
        .select(
            "n_days",
            "n_pairs",
            "s_stat",
            F.round(F.col("s_stat") * 1.0 / F.col("n_pairs"), 4).alias("kendall_tau"),
            F.round(
                (F.col("s_stat") - cc)
                / F.sqrt(nd * (nd - F.lit(1.0)) * (2 * nd + F.lit(5)) / F.lit(18.0)),
                4,
            ).alias("z_score"),
        )
    )


_BB_WIN = 14  # Bollinger window (days)


@register(
    "win_bollinger_bands",
    oracle=_DAILY_REV_CTE + """,
    roll AS (
        SELECT d, rev_c,
               CAST(count(*) OVER w AS BIGINT)                        AS n,
               CAST(sum(rev_c) OVER w AS BIGINT)                      AS s,
               sum(CAST(rev_c AS HUGEINT) * rev_c) OVER w             AS ss
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN """ + str(_BB_WIN - 1) + """ PRECEDING
                     AND CURRENT ROW)
    )
    SELECT d, round(rev_c / 100.0, 4) AS revenue,
           round(s / 100.0 / n, 4) AS band_mid,
           round((s + 2 * sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)))
                 / n / 100.0, 4) AS band_upper,
           round((s - 2 * sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)))
                 / n / 100.0, 4) AS band_lower,
           CASE WHEN CAST(n * rev_c - s AS HUGEINT) * (n * rev_c - s)
                     > 4 * (n * ss - CAST(s AS HUGEINT) * s)
                THEN 1 ELSE 0 END AS outside
    FROM roll
    WHERE n = """ + str(_BB_WIN) + """
    """,
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (14-day rolling mean ± 2σ) on daily revenue with
    an exact outside-the-band flag — the volatility-scaled control chart
    (a fixed threshold alarms constantly in busy seasons and never in
    quiet ones; ±2σ adapts).

    Exactness: the rolling moments (n, Σx, Σx²) are bigint window sums
    of integer-cents revenue, and the band test is decided by INTEGER
    cross-multiplication — (n·x − Σx)² > 4(n·Σx² − (Σx)²) — so the flag
    can never flip on a float boundary; the displayed band edges do one
    sqrt + one division each under round(4) (sqrt is IEEE
    correctly-rounded). The quadratic moments (Σx², s², the
    comparison) reach ~10¹⁹ in integer cents, so they carry in
    decimal(38,0)/HUGEINT end-to-end (good to 10³⁸); the linear sums
    stay bigint. Plan: one groupBy(day) rollup scan, one ordered
    window over the calendar-bounded frame."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c"),
    )
    w = Window.orderBy("d").rowsBetween(-(_BB_WIN - 1), Window.currentRow)
    roll = daily.select(
        "d",
        "rev_c",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("rev_c").over(w).cast("bigint").alias("s"),
        # the quadratic moments reach ~10^19 — carry them in decimal(38,0)
        # (HUGEINT in the oracle) so ANSI mode cannot overflow
        F.sum(F.col("rev_c").cast("decimal(38,0)") * F.col("rev_c"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    dec = "decimal(38,0)"
    var_n2 = F.col("n").cast(dec) * F.col("ss") - F.col("s").cast(dec) * F.col("s").cast(dec)
    dev_n = F.col("n") * F.col("rev_c") - F.col("s")
    dev2 = dev_n.cast(dec) * dev_n.cast(dec)
    var4 = F.lit(4).cast(dec) * var_n2
    return roll.filter(F.col("n") == _BB_WIN).select(
        "d",
        F.round(F.col("rev_c") / 100.0, 4).alias("revenue"),
        F.round(F.col("s") / 100.0 / F.col("n"), 4).alias("band_mid"),
        F.round(
            (F.col("s") + 2 * F.sqrt(var_n2.cast("double"))) / F.col("n") / 100.0, 4
        ).alias("band_upper"),
        F.round(
            (F.col("s") - 2 * F.sqrt(var_n2.cast("double"))) / F.col("n") / 100.0, 4
        ).alias("band_lower"),
        F.when(dev2 > var4, 1).otherwise(0).alias("outside"),
    )


_RSI_WIN = 14  # RSI lookback (days)


@register(
    "win_rsi_indicator",
    oracle=_DAILY_REV_CTE + """,
    delta AS (
        SELECT d, rev_c,
               rev_c - lag(rev_c) OVER (ORDER BY d) AS ch
        FROM daily
    ),
    gl AS (
        SELECT d, rev_c,
               CAST(sum(CASE WHEN ch > 0 THEN ch ELSE 0 END)
                    OVER w AS BIGINT) AS sg,
               CAST(sum(CASE WHEN ch < 0 THEN -ch ELSE 0 END)
                    OVER w AS BIGINT) AS sl,
               CAST(count(ch) OVER w AS BIGINT) AS n
        FROM delta
        WINDOW w AS (ORDER BY d ROWS BETWEEN """ + str(_RSI_WIN - 1) + """ PRECEDING
                     AND CURRENT ROW)
    )
    SELECT d, round(rev_c / 100.0, 4) AS revenue,
           round(sg / 100.0, 4) AS gains,
           round(sl / 100.0, 4) AS losses,
           round(100.0 * sg / (sg + sl), 4) AS rsi
    FROM gl
    WHERE n = """ + str(_RSI_WIN) + """ AND sg + sl > 0
    """,
)
def win_rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (Cutler's simple-average form) on daily revenue:
    100·Σgains/(Σgains+Σlosses) over the trailing window — the
    momentum oscillator (RSI > 70 ≈ overheated, < 30 ≈ depressed)
    applied to the revenue series; the simple-average form is chosen
    over Wilder's EWMA recursion because it is windowed prefix sums
    (parallel, oracle-exact) rather than sequential state.

    Exactness: deltas, gains and losses are bigint integer cents; the
    two window sums are order-free; RSI is ONE division under round(4).
    Windows with zero movement are excluded (0/0). Plan: one
    groupBy(day) rollup, one lag + one windowed conditional sum over
    the calendar-bounded frame."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c"),
    )
    wl = Window.orderBy("d")
    delta = daily.withColumn("ch", F.col("rev_c") - F.lag("rev_c").over(wl))
    w = Window.orderBy("d").rowsBetween(-(_RSI_WIN - 1), Window.currentRow)
    gl = delta.select(
        "d",
        "rev_c",
        F.sum(F.when(F.col("ch") > 0, F.col("ch")).otherwise(0))
        .over(w)
        .cast("bigint")
        .alias("sg"),
        F.sum(F.when(F.col("ch") < 0, -F.col("ch")).otherwise(0))
        .over(w)
        .cast("bigint")
        .alias("sl"),
        F.count("ch").over(w).cast("bigint").alias("n"),
    )
    return gl.filter((F.col("n") == _RSI_WIN) & (F.col("sg") + F.col("sl") > 0)).select(
        "d",
        F.round(F.col("rev_c") / 100.0, 4).alias("revenue"),
        F.round(F.col("sg") / 100.0, 4).alias("gains"),
        F.round(F.col("sl") / 100.0, 4).alias("losses"),
        F.round(F.lit(100.0) * F.col("sg") / (F.col("sg") + F.col("sl")), 4).alias(
            "rsi"
        ),
    )


@register(
    "win_seasonal_naive_eval",
    oracle="""
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1
    ),
    pred AS (
        SELECT d, n,
               lag(n, 7) OVER (ORDER BY d) AS yhat
        FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
           round(sum(abs(n - yhat)) * 1.0 / count(*), 4) AS mae,
           round(sum(abs(n - yhat) * 1000000 // n) / 1000000.0 / count(*), 4)
               AS mape,
           CAST(sum(CASE WHEN n = yhat THEN 1 ELSE 0 END) AS BIGINT)
               AS exact_hits
    FROM pred WHERE yhat IS NOT NULL AND n > 0
    """,
)
def win_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each day's event
    volume with the same weekday one week earlier (lag-7) and score
    MAE/MAPE — the baseline every real forecasting model must beat
    (the time-series twin of `events_next_event_baseline`; ship a
    model only if it beats this number).

    Exactness: counts and absolute errors are bigints; per-day
    percentage errors quantize via exact integer division before the
    sum (a float MAPE would drift with reduction order); final
    divisions under round(4). Plan: one groupBy(day), one lag window
    over the calendar-bounded series, a 1-row reduction."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.col("ts").cast("timestamp")).alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pred = daily.withColumn("yhat", F.lag("n", 7).over(Window.orderBy("d")))
    err = F.abs(F.col("n") - F.col("yhat"))
    scored = pred.filter(F.col("yhat").isNotNull() & (F.col("n") > 0))
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        F.round(F.sum(err) * 1.0 / F.count(F.lit(1)), 4).alias("mae"),
        F.round(
            F.sum(F.expr("abs(n - yhat) * 1000000 div n")) / 1000000.0
            / F.count(F.lit(1)),
            4,
        ).alias("mape"),
        F.sum(F.when(F.col("n") == F.col("yhat"), 1).otherwise(0))
        .cast("bigint")
        .alias("exact_hits"),
    )


@register(
    "win_stochastic_oscillator",
    oracle=_DAILY_REV_CTE + """,
    framed AS (
        SELECT d, rev_c,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
               min(rev_c) OVER (ORDER BY d
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS l14,
               max(rev_c) OVER (ORDER BY d
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS h14
        FROM daily
    ),
    k AS (
        SELECT d, rn, rev_c, l14, h14,
               CASE WHEN rn < 14 THEN NULL
                    WHEN h14 = l14 THEN CAST(50000000 AS BIGINT)
                    ELSE CAST((CAST(rev_c - l14 AS HUGEINT) * 100000000)
                              // (h14 - l14) AS BIGINT)
               END AS k_mu
        FROM framed
    ),
    d3 AS (
        -- window BEFORE the rn filter: SQL windows run after WHERE, so
        -- filtering first would drop rows 14-15 from rows 16-17's frames
        SELECT d, rn, rev_c, l14, h14, k_mu,
               sum(k_mu) OVER (ORDER BY d
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS k3
        FROM k
    )
    SELECT d,
           round(rev_c / 100.0, 4)    AS close_rev,
           round(l14 / 100.0, 4)      AS low14_rev,
           round(h14 / 100.0, 4)      AS high14_rev,
           round(k_mu / 1000000.0, 4) AS pct_k,
           round(k3 / 3000000.0, 4)   AS pct_d
    FROM d3
    WHERE rn >= 16
    """,
)
def win_stochastic_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator (%K/%D) over the daily-revenue series: %K
    locates today's close inside the trailing 14-day high-low channel,
    %D is its 3-day moving mean — the classic momentum indicator pair,
    here applied to order revenue (complements `win_rsi_indicator` /
    `win_bollinger_bands` which read the same daily rollup).

    Exactness: revenue is integer cents, the channel bounds are integer
    min/max, and %K is quantized ONCE to integer micro-units with
    truncating integer division ((c-l)*1e8 div (h-l); DuckDB `//` and
    Spark `div` both truncate toward zero — r9-verified) so %D is a sum
    of integers divided and rounded in one final step: no float leaves
    an aggregate unrounded, both engines walk bit-identical states. A
    flat channel (h=l) pins %K at 50 by documented convention. Rows
    before day 16 are withheld so both indicators ride full frames.
    Plan: one groupBy(day) partial-agg scan, then windows over the
    ~|days| frame — at 100 TB the rollup is the only full-data pass."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_c"),
    )
    wd = Window.orderBy("d")
    w14 = wd.rowsBetween(-13, Window.currentRow)
    framed = daily.select(
        "d",
        "rev_c",
        F.row_number().over(wd).cast("bigint").alias("rn"),
        F.min("rev_c").over(w14).alias("l14"),
        F.max("rev_c").over(w14).alias("h14"),
    )
    k_mu = (
        F.when(F.col("rn") < 14, F.lit(None).cast("bigint"))
        .when(F.col("h14") == F.col("l14"), F.lit(50000000).cast("bigint"))
        .otherwise(
            # decimal(38,0)/HUGEINT carry for the scaled numerator: a 14-day
            # revenue channel at sf100 reaches ~1e13 cents, and x*1e8 would
            # overflow bigint ~1e19 (the Bollinger quadratic-moment lesson);
            # decimal div and HUGEINT // truncate identically (verified)
            F.expr(
                "CAST((CAST(rev_c - l14 AS DECIMAL(38,0)) * 100000000) "
                "div (h14 - l14) AS BIGINT)"
            )
        )
    )
    k = framed.withColumn("k_mu", k_mu)
    return k.select(
        "d",
        F.round(F.col("rev_c") / 100.0, 4).alias("close_rev"),
        F.round(F.col("l14") / 100.0, 4).alias("low14_rev"),
        F.round(F.col("h14") / 100.0, 4).alias("high14_rev"),
        F.round(F.col("k_mu") / 1000000.0, 4).alias("pct_k"),
        F.round(
            F.sum("k_mu").over(wd.rowsBetween(-2, Window.currentRow)) / 3000000.0, 4
        ).alias("pct_d"),
        "rn",
    ).filter(F.col("rn") >= 16).drop("rn")


@register(
    "win_parkinson_volatility",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS h_c,
               CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS l_c
        FROM orders GROUP BY 1
    ),
    terms AS (
        SELECT d, h_c, l_c,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
               CAST(floor(pow(ln(h_c * 1.0 / l_c), 2) * 1000000 + 0.5)
                    AS BIGINT) AS t_mu
        FROM daily
    ),
    framed AS (
        SELECT d, h_c, l_c, rn,
               CAST(sum(t_mu) OVER (ORDER BY d
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS s14
        FROM terms
    )
    SELECT d,
           round(h_c / 100.0, 4) AS day_high,
           round(l_c / 100.0, 4) AS day_low,
           round(sqrt(s14 / (4.0 * ln(2) * 14 * 1000000)), 4)
               AS parkinson_sigma
    FROM framed
    WHERE rn >= 14
    """,
)
def win_parkinson_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parkinson (1980) high-low range volatility over a 14-day window:
    σ_P = √(Σ ln(H/L)² / (4·ln2·n)) on the daily order-value range — the
    range-based estimator that extracts ~5× more information per day
    than close-to-close variance, completing the technical-indicator
    family (Bollinger = dispersion of closes, RSI/stochastic = momentum,
    Parkinson = intraday range). H/L here are the day's max/min order
    values in integer cents — the order-book analog of the price range,
    stated as such.

    Exactness: the one transcendental per day, ln(H/L)², quantizes to
    integer micro-units BEFORE the window sum (the Theil/JSD per-term
    fixed-point convention — the sum is then order-free bigint), and
    the final sqrt + division is a single round(4) expression. Rows
    before day 14 are withheld so every frame is full. Plan: one
    groupBy(day) partial-agg scan (max/min of pre-scaled cents), then
    windows over the ~|days| frame — same 100 TB shape as the other
    daily indicators: the rollup is the only full-data pass."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.max(cents).cast("bigint").alias("h_c"),
        F.min(cents).cast("bigint").alias("l_c"),
    )
    wd = Window.orderBy("d")
    terms = daily.select(
        "d",
        "h_c",
        "l_c",
        F.row_number().over(wd).cast("bigint").alias("rn"),
        F.floor(
            F.pow(F.log(F.col("h_c") * 1.0 / F.col("l_c")), 2) * 1000000 + 0.5
        )
        .cast("bigint")
        .alias("t_mu"),
    )
    framed = terms.withColumn(
        "s14",
        F.sum("t_mu").over(wd.rowsBetween(-13, Window.currentRow)).cast("bigint"),
    )
    return framed.filter(F.col("rn") >= 14).select(
        "d",
        F.round(F.col("h_c") / 100.0, 4).alias("day_high"),
        F.round(F.col("l_c") / 100.0, 4).alias("day_low"),
        F.round(
            F.sqrt(F.col("s14") / (4.0 * math.log(2) * 14 * 1000000)),
            4,
        ).alias("parkinson_sigma"),
    )

"""Event-stream analytics over the batch events table: funnel conversion
and cohort retention — the product-analytics queries an event-ingest engine
(the reference's MQ consumers feed exactly this shape of table,
IBMMQReceiver.java:306-312's (key, body) records parsed into typed events)
is pointed at.

Scale notes: every stage keys on user_id, so the funnel's three conditional
min-aggregates and two left joins all share ONE hash partitioning — AQE
reuses the exchange instead of re-shuffling per stage; only (user_id, ts)
pairs move, never payloads. Cohort retention is two map-side-combinable
aggregates over integer week keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.operators.projections import EVENTS_CTE
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table, size_gated_broadcast


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


@register(
    "events_funnel_conversion",
    oracle=f"""
    {EVENTS_CTE},
    v AS (
        SELECT user_id, min(ts) AS first_view
        FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS first_click
        FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts > v.first_view
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts > c.first_click
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
           CASE WHEN p.first_purchase IS NOT NULL THEN 3
                WHEN c.first_click  IS NOT NULL THEN 2
                ELSE 1 END AS stage_reached
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel per user: first view, first
    click strictly after it, first purchase strictly after that, plus the
    stage reached — the conversion-funnel query behind every product
    dashboard.

    Plan shape: three conditional min-aggregates chained through equi-joins
    on user_id (the ordering predicate `ts >` rides as a join residual, so
    these stay hash joins, not BNLJ). Every stage shuffles on the SAME key,
    so the exchange is planned once and reused; at 100 TB the stage frames
    are |users| rows — small — and broadcast into the next event scan."""
    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .alias("e")
        .join(
            v.alias("v"),
            (F.col("e.user_id") == F.col("v.user_id"))
            & (F.col("e.ts") > F.col("v.first_view")),
        )
        .groupBy(F.col("e.user_id").alias("user_id"))
        .agg(F.min("e.ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(
            c.alias("c"),
            (F.col("e.user_id") == F.col("c.user_id"))
            & (F.col("e.ts") > F.col("c.first_click")),
        )
        .groupBy(F.col("e.user_id").alias("user_id"))
        .agg(F.min("e.ts").alias("first_purchase"))
    )
    stage = (
        F.when(F.col("first_purchase").isNotNull(), 3)
        .when(F.col("first_click").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            stage.alias("stage_reached"),
        )
    )


@register(
    "events_retention_cohort",
    oracle=f"""
    {EVENTS_CTE},
    base AS (
        SELECT user_id,
               CAST(floor(date_diff('day', TIMESTAMP '2024-01-01', ts) / 7)
                    AS INTEGER) AS wk
        FROM ev
    ),
    cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM base GROUP BY user_id)
    SELECT c.cohort_wk,
           b.wk - c.cohort_wk AS week_offset,
           CAST(count(DISTINCT b.user_id) AS BIGINT) AS n_active
    FROM base b JOIN cohort c ON b.user_id = c.user_id
    GROUP BY c.cohort_wk, b.wk - c.cohort_wk
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week, then
    distinct actives counted per (cohort week, weeks-since-cohort) — the
    retention-triangle query. Week index is an integer day-diff / 7 from a
    fixed epoch, identical arithmetic in both engines (no timezone or
    truncation semantics in play).

    Plan shape: one narrow scan → integer week expression → a per-user min
    (map-side combinable, |users| rows out) joined back on user_id, then a
    count-distinct over integer keys. The cohort frame is tiny at any scale
    and broadcasts; the expensive input never shuffles twice."""
    base = _events(spark, sf_dir).select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")) / 7
        )
        .cast("int")
        .alias("wk"),
    )
    cohort = base.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        base.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "join_interval_bucketed",
    oracle=f"""
    {EVENTS_CTE},
    err AS (
        SELECT event_id AS err_id, ts AS t0, ts + INTERVAL 10 MINUTE AS t1
        FROM ev WHERE event_type = 'error'
    ),
    clk AS (SELECT event_id AS clk_id, ts FROM ev WHERE event_type = 'click')
    SELECT e.err_id, CAST(count(c.clk_id) AS BIGINT) AS n_clicks
    FROM err e LEFT JOIN clk c ON c.ts >= e.t0 AND c.ts < e.t1
    GROUP BY e.err_id
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via time-bucketing — clicks counted inside each
    error's [ts, ts+10 min) incident window. The oracle states the plain
    theta join; the Spark plan is the BUCKETIZED range join: both sides get
    a coarse 10-min bucket key (intervals explode into the ≤2 buckets they
    touch), the join is an EQUI-join on the bucket with the range predicate
    as a residual filter, and a left join back onto the interval frame
    restores the zero-match rows.

    This is the range-join pattern that survives 100 TB where a BNLJ
    (`join_price_bands` demonstrates that shape) cannot: candidates are
    bounded by bucket co-residency (events/bucket × ~2), the shuffle keys
    are uniform integers, and AQE can split any hot bucket. Each matching
    pair meets exactly once — a point-side row has ONE bucket, and the
    interval side lists each covered bucket once — so no post-join dedup
    is needed."""
    ev = _events(spark, sf_dir)
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t1"),
    )
    bucket = lambda c: F.floor(F.unix_timestamp(c) / 600)  # noqa: E731
    err_b = err.withColumn("bucket", F.explode(F.sequence(bucket("t0"), bucket("t1"))))
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("clk_id"),
        F.col("ts").alias("c_ts"),
        bucket("ts").alias("bucket"),
    )
    hits = (
        err_b.join(
            clk,
            (err_b["bucket"] == clk["bucket"])
            & (F.col("c_ts") >= F.col("t0"))
            & (F.col("c_ts") < F.col("t1")),
        )
        .groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    return err.select("err_id").join(hits, "err_id", "left").select(
        "err_id", F.coalesce("n_clicks", F.lit(0)).cast("bigint").alias("n_clicks")
    )


@register(
    "events_transition_matrix",
    oracle=f"""
    {EVENTS_CTE},
    seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM ev
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov/path-analysis
    matrix behind journey dashboards): order each user's stream by (ts,
    event_id) — the event_id tiebreak makes simultaneous rows
    deterministic — lag one step, count (prev, next) pairs.

    Plan shape: one shuffle on user_id for the lag window, then a tiny
    |types|² aggregate with map-side combine. The window partitions by
    user — thousands of small partitions, never a global sort — so the
    plan is skew-safe at any user count."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_top_paths",
    oracle=f"""
    {EVENTS_CTE},
    r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM ev
    ),
    p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, n_users, row_number() OVER (ORDER BY n_users DESC, path) AS path_rank
    FROM (SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p GROUP BY path)
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: each user's first three event types (by ts, event_id
    tie-break) concatenated into an entry path, counted across users and
    ranked — the "how do sessions start" query of product analytics, and
    the sequence-prefix histogram a behavioral-cloning data pipeline
    extracts before training.

    Plan shape: one shuffle on user_id for the row_number window (shared
    with every other per-user stage in this module), then a groupBy on the
    path string whose cardinality is |event_types|^3 — at most a few
    hundred groups regardless of corpus size, so the final rank window
    over that tiny frame is safe as a single partition."""
    from pyspark.sql import Window as W

    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )
    paths = first3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    rank_w = W.orderBy(F.col("n_users").desc(), "path")
    return counted.select(
        "path", "n_users", F.row_number().over(rank_w).alias("path_rank")
    )


@register(
    "events_dau_rolling",
    oracle=f"""
    {EVENTS_CTE},
    daily AS (
        SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day_no,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau,
               CAST(count(*) AS BIGINT) AS n_events
        FROM ev GROUP BY 1
    )
    SELECT day_no, dau, n_events,
           round(avg(dau) OVER (ORDER BY day_no
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS dau_7d_avg,
           CAST(count(*) OVER (ORDER BY day_no
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS days_in_window
    FROM daily
    """,
)
def events_dau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users with a trailing-7-day rolling average — the
    canonical engagement time series every event pipeline feeds a
    dashboard. The RANGE frame runs over the integer epoch-day, so gap
    days genuinely shrink the window (a ROWS frame would silently span
    them).

    Plan shape: the per-day distinct shuffles (day, user_id) once and
    combines map-side; the rolling window then runs over |days| rows —
    a constant-size frame regardless of event volume, safe as a single
    partition (at decades of days, range-partition by year)."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window as W

    day_no = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    daily = ev.groupBy(day_no.alias("day_no")).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = W.orderBy("day_no").rangeBetween(-6, W.currentRow)
    return daily.select(
        "day_no",
        "dau",
        "n_events",
        F.round(F.avg("dau").over(w), 4).alias("dau_7d_avg"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


@register(
    "events_anomaly_zscore",
    oracle=f"""
    {EVENTS_CTE},
    hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               count(*) AS n
        FROM ev GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, hr, n,
               round((n - avg(n) OVER (PARTITION BY event_type))
                     / stddev_samp(n) OVER (PARTITION BY event_type), 4) AS z
        FROM hourly
    )
    SELECT event_type, hr, n, z FROM scored WHERE abs(z) >= 2
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly event counts per type, z-scored
    against that type's own hourly distribution, keeping |z| ≥ 2 hours —
    the standard ops-dashboard spike/dip detector.

    Plan shape: one (event_type, hour) groupBy with map-side partial
    aggregation reduces the raw stream to |types|×|hours| rows; the
    mean/stddev window then runs per event_type over that tiny frame (a
    handful of partitions, one per type — at years of history,
    sub-partition by month and aggregate moments with a second groupBy
    instead of a window). The |z| threshold compares the ROUNDED z on both
    engines so a last-ulp stddev divergence cannot flip a boundary row."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window as W

    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type")
    z = F.round(
        (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 4
    )
    return (
        hourly.withColumn("z", z)
        .filter(F.abs("z") >= 2)
        .select("event_type", "hr", "n", "z")
    )


@register(
    "events_attribution_last_touch",
    oracle=f"""
    {EVENTS_CTE},
    t AS (
        SELECT *,
            last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                       IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS touch_type,
            last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                       IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS touch_ts
        FROM ev)
    SELECT coalesce(CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
                         THEN touch_type END, 'none') AS channel,
           count(*) AS n_conversions,
           round(sum(value), 4) AS attributed_value
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to the
    user's most recent non-purchase touch within a 7-day lookback ('none'
    when the purchase is cold). The classic marketing-analytics rollup —
    and the degenerate case every multi-touch model (U-shaped, time-decay)
    reduces to, so it is the right first operator for the family.

    Spark shape: ONE window pass — `last(..., ignorenulls=True)` over
    rows(-∞, -1) carries the latest preceding touch (type, ts) along each
    user's timeline; purchases then filter + two-level aggregate on the
    tiny channel key. Same user_id shuffle as the rest of this family
    (shared exchange at 100 TB); no join at all — the as-of pairing that
    usually costs a range join rides the existing sort. Tie-break is the
    total (ts, event_id) order, stated identically in both engines."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    touch_type = F.last(
        F.when(not_purchase, F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(not_purchase, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.select(
            "event_id", "ts", "event_type", "value",
            touch_type.alias("touch_type"),
            touch_ts.alias("touch_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"),
                    F.col("touch_type"),
                ),
                F.lit("none"),
            ).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
    )


@register(
    "events_cohort_ltv",
    oracle=f"""
    {EVENTS_CTE},
    first_seen AS (
        SELECT user_id,
               CAST(floor((CAST(min(ts) AS DATE) - DATE '2024-01-01') / 7.0)
                    AS BIGINT) AS cohort_week
        FROM ev GROUP BY user_id
    ),
    cohort_size AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
        FROM first_seen GROUP BY 1
    ),
    cells AS (
        SELECT f.cohort_week,
               CAST(floor((CAST(e.ts AS DATE) - DATE '2024-01-01') / 7.0)
                    AS BIGINT) - f.cohort_week AS age_weeks,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users,
               round(sum(CASE WHEN e.event_type = 'purchase'
                              THEN e.value ELSE 0 END), 4) AS revenue
        FROM ev e JOIN first_seen f ON e.user_id = f.user_id
        GROUP BY 1, 2
    )
    SELECT c.cohort_week, c.age_weeks, s.cohort_users, c.active_users,
           c.revenue,
           round(sum(c.revenue) OVER (
               PARTITION BY c.cohort_week ORDER BY c.age_weeks), 4)
               AS cum_revenue,
           round(sum(c.revenue) OVER (
               PARTITION BY c.cohort_week ORDER BY c.age_weeks)
               / s.cohort_users, 4) AS ltv_per_user
    FROM cells c JOIN cohort_size s ON c.cohort_week = s.cohort_week
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users bucketed by first-seen week,
    each cohort's per-age-week active users and purchase revenue, plus the
    running cumulative revenue and cumulative LTV per cohort member — the
    retention-economics rollup every growth dashboard pivots.

    Determinism: the cell revenue is rounded FIRST and the cumulative sum
    runs over the rounded cells in the window's deterministic age order,
    so both engines add the identical sequence of doubles — the running
    totals are bit-identical without needing order-insensitive math.

    Plan shape: first-seen is one min-aggregate on user_id; the cell
    aggregate joins events back to it on the SAME user_id partitioning
    (AQE reuses the exchange) and reduces to |cohorts|×|ages| rows —
    weeks², not events — so the two windows and the cohort-size join run
    on a frame that fits one partition at any event volume."""
    ev = _events(spark, sf_dir)
    week = lambda c: F.floor(  # noqa: E731
        F.datediff(F.to_date(c), F.lit("2024-01-01")) / 7.0
    ).cast("bigint")
    first_seen = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    cohort_size = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    cells = (
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("age_weeks"),
        )
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                        F.lit(0.0)
                    )
                ),
                4,
            ).alias("revenue"),
        )
    )
    w = Window.partitionBy("cohort_week").orderBy("age_weeks")
    cum = F.round(F.sum("revenue").over(w), 4)
    return (
        cells.join(cohort_size, "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            "active_users",
            "revenue",
            cum.alias("cum_revenue"),
            F.round(F.sum("revenue").over(w) / F.col("cohort_users"), 4).alias(
                "ltv_per_user"
            ),
        )
    )


@register(
    "events_hourly_gap_fill",
    oracle=f"""
    {EVENTS_CTE},
    hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(value), 4) AS avg_value
        FROM ev GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT b.event_type, CAST(g.g AS TIMESTAMP) AS hr
        FROM bounds b, LATERAL unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS g(g)
    )
    SELECT s.event_type, s.hr,
           coalesce(h.n, 0) AS n,
           CASE WHEN h.n IS NULL THEN 1 ELSE 0 END AS is_gap,
           last_value(h.avg_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_ffill
    FROM spine s
    LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hr = h.hr
    """,
)
def events_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly time series per event type: generate the full hour
    spine between each type's first and last active hour, left-join the
    observed hourly aggregates, and forward-fill the per-hour mean value
    across the gaps (gap hours keep n=0 and is_gap=1) — the
    regularization pass that turns an irregular event stream into the
    fixed-step series forecasting and anomaly models require.

    Determinism: the fill value is the ROUNDED per-hour mean, so the
    forward-fill copies identical doubles in both engines; the spine is
    pure timestamp arithmetic.

    Plan shape: the hourly rollup is one map-side-combinable groupBy;
    the spine explodes a per-type `sequence(lo, hi, 1 hour)` — |types|
    input rows, |types|×|hours| output, generated in the engine with no
    shuffle — and the fill window partitions by event_type over the
    already-hour-keyed frame. At years of history sub-partition the
    window by (type, month) and seed each month's first fill from the
    previous month's closing value."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_gap"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_ffill"),
        )
    )


@register(
    "events_cumulative_uniques",
    oracle=f"""
    {EVENTS_CTE},
    firsts AS (
        SELECT user_id,
               min(CAST(ts AS DATE) - DATE '1970-01-01') AS first_day
        FROM ev GROUP BY 1
    ),
    daily AS (
        SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day_no,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM ev GROUP BY 1
    ),
    news AS (
        SELECT first_day AS day_no, CAST(count(*) AS BIGINT) AS new_users
        FROM firsts GROUP BY 1
    )
    SELECT d.day_no, d.dau,
           coalesce(n.new_users, 0) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day_no)
                AS BIGINT) AS cum_uniques
    FROM daily d LEFT JOIN news n ON d.day_no = n.day_no
    """,
)
def events_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique users by day — the growth curve — computed the
    scale-right way: running COUNT(DISTINCT) keeps an ever-growing user
    set in window state, so instead each user is reduced to their FIRST
    active day (one min-aggregate), new-user counts roll up per day, and
    the cumulative curve is a plain running SUM over |days| integer rows.
    This first-touch transform is the standard rewrite that turns an
    unbounded-state distinct into two bounded aggregates.

    Plan shape: one user_id-keyed min, one day-keyed rollup of it, the
    events-side dau rollup, and a |days|-row window — nothing holds more
    than a day's key set; integer arithmetic throughout (bit-exact)."""
    ev = _events(spark, sf_dir)
    day_no = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    firsts = ev.groupBy("user_id").agg(F.min(day_no).alias("first_day"))
    daily = ev.groupBy(day_no.alias("day_no")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    news = firsts.groupBy(F.col("first_day").alias("day_no")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day_no").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(news, "day_no", "left")
        .select(
            "day_no",
            "dau",
            F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
        )
        .withColumn("cum_uniques", F.sum("new_users").over(w))
    )


@register(
    "events_stickiness_dau_wau",
    oracle=f"""
    {EVENTS_CTE},
    ud AS (
        SELECT DISTINCT user_id,
               CAST(ts AS DATE) - DATE '1970-01-01' AS day_no
        FROM ev
    ),
    days AS (SELECT DISTINCT day_no FROM ud),
    wau AS (
        SELECT d.day_no,
               CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM days d JOIN ud u
          ON u.day_no BETWEEN d.day_no - 6 AND d.day_no
        GROUP BY 1
    ),
    dau AS (
        SELECT day_no, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
    )
    SELECT d.day_no, d.dau, w.wau,
           round(d.dau * 1.0 / w.wau, 4) AS stickiness
    FROM dau d JOIN wau w ON d.day_no = w.day_no
    """,
)
def events_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — daily actives over trailing-7-day
    actives, the engagement-intensity ratio (1.0 = every weekly user
    shows up daily). Trailing-window DISTINCT does not decompose into a
    running sum (users repeat across days), so the rollup runs over the
    DEDUPLICATED (user, day) frame — |users|×|active days| rows, already
    tiny relative to raw events — banded to the trailing week by a
    7-wide range join against the day spine before the per-day distinct.

    Plan shape: one distinct on (user_id, day) reduces the event volume
    first (the only full shuffle); the band join expands each (user, day)
    row at most 7× on integer day keys and re-aggregates — the
    `join_interval_bucketed` discipline. At years of scale, precompute
    the (user, day) frame once as the activity table every engagement
    metric shares."""
    ev = _events(spark, sf_dir)
    day_no = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    ud = ev.select("user_id", day_no.alias("day_no")).distinct()
    days = ud.select("day_no").distinct()
    dau = ud.groupBy("day_no").agg(F.count(F.lit(1)).alias("dau"))
    # bucketize the trailing-[d-6, d] band: a 7-day window crosses at most
    # two 7-wide buckets, so each spine day probes exactly those two and
    # the join is an EQUI-join on the bucket with the range as residual —
    # never a nested-loop over the full (user, day) frame
    probe = days.select(
        "day_no",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("day_no") - 6) / 7),
                    F.floor(F.col("day_no") / 7),
                )
            )
        ).alias("bucket"),
    )
    u = ud.select(
        "user_id",
        F.col("day_no").alias("u_day"),
        F.floor(F.col("day_no") / 7).alias("bucket"),
    )
    wau = (
        probe.join(u, "bucket")
        .filter(
            (F.col("u_day") >= F.col("day_no") - 6)
            & (F.col("u_day") <= F.col("day_no"))
        )
        .groupBy("day_no")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day_no").select(
        "day_no",
        "dau",
        "wau",
        F.round(F.col("dau") * F.lit(1.0) / F.col("wau"), 4).alias("stickiness"),
    )


@register(
    "events_error_budget_burn",
    oracle=f"""
    {EVENTS_CTE},
    hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
                   AS n_err
        FROM ev GROUP BY 1
    ),
    rated AS (
        SELECT hr, n, n_err,
               round(n_err * 1.0 / n, 4) AS err_rate,
               round((n_err * 1.0 / n) / 0.25, 4) AS burn_1h
        FROM hourly
    )
    SELECT hr, n, n_err, err_rate, burn_1h,
           round(sum(n_err) OVER w6 * 1.0 / sum(n) OVER w6 / 0.25, 4)
               AS burn_6h,
           CASE WHEN burn_1h > 1
                 AND sum(n_err) OVER w6 * 1.0 / sum(n) OVER w6 / 0.25 > 1
                THEN 1 ELSE 0 END AS alert
    FROM rated
    WINDOW w6 AS (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    """,
)
def events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate (the SRE multiwindow alert): hourly
    error share against a 75% success objective, expressed as burn =
    err_rate / (1 − SLO) — burn 1.0 spends the budget exactly on
    schedule — plus the trailing-6-hour average, alerting only when BOTH
    the fast and slow windows burn hot (the multiwindow rule that
    suppresses one-hour blips without missing sustained burns).

    Determinism: the hourly rate is rounded before the burn division,
    and the 6-hour burn is VOLUME-WEIGHTED — integer error/total sums
    over the ROWS frame (exact in any order), one division chain — so
    both windows are bit-exact across engines (a mean of rounded
    per-hour burns sits one ulp from a round-4 boundary; integer window
    sums cannot).

    Plan shape: one conditional-count rollup to |hours| rows, then a
    frame-bounded window over that metric frame — metadata scale at any
    event volume, same posture as `win_ewma_hourly`."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
    )
    rated = hourly.select(
        "hr",
        "n",
        "n_err",
        F.round(F.col("n_err") * F.lit(1.0) / F.col("n"), 4).alias("err_rate"),
        F.round((F.col("n_err") * F.lit(1.0) / F.col("n")) / F.lit(0.25), 4).alias(
            "burn_1h"
        ),
    )
    w6 = Window.orderBy("hr").rowsBetween(-5, Window.currentRow)
    burn6 = (
        F.sum("n_err").over(w6) * F.lit(1.0) / F.sum("n").over(w6) / F.lit(0.25)
    )
    return rated.select(
        "hr",
        "n",
        "n_err",
        "err_rate",
        "burn_1h",
        F.round(burn6, 4).alias("burn_6h"),
        F.when((F.col("burn_1h") > 1) & (burn6 > 1), 1).otherwise(0).alias("alert"),
    )


@register(
    "events_queue_backlog",
    oracle=f"""
    {EVENTS_CTE},
    bounds AS (
        SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
               CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
        FROM ev
    ),
    spine AS (
        SELECT CAST(g.g AS TIMESTAMP) AS hr,
               row_number() OVER (ORDER BY g.g) AS t
        FROM bounds b, LATERAL unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS g(g)
    ),
    arrivals AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(count(*) AS BIGINT) AS n_in
        FROM ev GROUP BY 1
    ),
    rate AS (
        SELECT CAST(CAST(sum(n_in) AS BIGINT) // (SELECT count(*) FROM spine)
                    + 1 AS BIGINT) AS r
        FROM arrivals
    ),
    laid AS (
        SELECT s.hr, s.t, coalesce(a.n_in, 0) AS n_in, rate.r,
               sum(coalesce(a.n_in, 0)) OVER (ORDER BY s.t) AS cum_in
        FROM spine s LEFT JOIN arrivals a ON s.hr = a.hr CROSS JOIN rate
    )
    SELECT hr, n_in, r AS svc_rate,
           CAST(cum_in - r * t
                - least(0, min(cum_in - r * t) OVER (ORDER BY t))
                AS BIGINT) AS backlog
    FROM laid
    """,
)
def events_queue_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact queue-backlog projection — the capacity-planning question
    for the MQ consumer this engine fronts ("with a server draining R
    msgs/hour, how deep does the queue get?"): hourly arrivals against a
    fixed integer service rate (mean arrival rate + 1), evolved by the
    Lindley recursion B_t = max(0, B_{t−1} + in_t − R). The recursion is
    not directly windowable, but its closed form IS:
    B_t = (S_t − R·t) − min_{j≤t}(S_j − R·j) with the virtual j=0 term
    folded in as least(0, ·) — one running-min window over cumulative
    arrivals, no iteration, and ALL-INTEGER arithmetic (bit-exact).

    Plan shape: hour spine + one rollup (as `events_hourly_gap_fill`),
    then two ordered windows over |hours| rows — metadata scale; the
    1-row service-rate frame rides as a broadcast."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n_in"))
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    ).withColumn("t", F.row_number().over(Window.orderBy("hr")))
    n_hours = spine.agg(F.count(F.lit(1)).alias("n_hours"))
    rate = (
        hourly.agg(F.sum("n_in").alias("total"))
        .crossJoin(F.broadcast(n_hours))
        .select((F.expr("total div n_hours") + 1).alias("r"))
    )
    laid = (
        spine.join(hourly, "hr", "left")
        .select("hr", "t", F.coalesce(F.col("n_in"), F.lit(0)).alias("n_in"))
        .crossJoin(F.broadcast(rate))
        .withColumn(
            "cum_in",
            F.sum("n_in").over(
                Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    drift = F.col("cum_in") - F.col("r") * F.col("t")
    run_min = F.min(drift).over(
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    )
    return laid.select(
        "hr",
        "n_in",
        F.col("r").alias("svc_rate"),
        (drift - F.least(F.lit(0), run_min)).cast("bigint").alias("backlog"),
    )


@register(
    "events_behavior_entropy",
    oracle=f"""
    {EVENTS_CTE},
    per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM ev GROUP BY 1
    ),
    seg AS (
        SELECT user_id,
               CASE WHEN n_events >= 120 THEN 'heavy'
                    WHEN n_events >= 80  THEN 'mid'
                    ELSE 'light' END AS segment
        FROM per_user
    ),
    mix AS (
        SELECT s.segment, e.event_type, CAST(count(*) AS BIGINT) AS n
        FROM ev e JOIN seg s ON e.user_id = s.user_id
        GROUP BY 1, 2
    ),
    tot AS (SELECT segment, CAST(sum(n) AS BIGINT) AS t FROM mix GROUP BY 1)
    SELECT m.segment,
           CAST(count(*) AS BIGINT) AS n_types,
           t.t AS n_events,
           round(-sum((m.n * 1.0 / t.t) * ln(m.n * 1.0 / t.t)), 4)
               AS mix_entropy
    FROM mix m JOIN tot t ON m.segment = t.segment
    GROUP BY m.segment, t.t
    """,
)
def events_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-mix entropy per activity segment: users bucketed by
    volume (heavy/mid/light), each segment's event-type distribution
    reduced to its Shannon entropy — the one-number answer to "do heavy
    users DO different things or just more of the same" (max-entropy
    ln 5 ≈ 1.609 = perfectly even mix; near 0 = single-action users).
    The same reduction over (source, token-class) frames scores corpus
    diversity in a data pipeline.

    ln follows the `text_char_entropy` round-4 precedent; the p·ln p
    terms sum per segment over ≤|event types| rows.

    Plan shape: a per-user count (|users| rows), a broadcast-size
    segment map joined back on user_id (AQE reuses the count's
    partitioning), one (segment, type) rollup, and a |segments|-row
    entropy fold."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    seg = per_user.select(
        "user_id",
        F.when(F.col("n_events") >= 120, "heavy")
        .when(F.col("n_events") >= 80, "mid")
        .otherwise("light")
        .alias("segment"),
    )
    mix = (
        ev.join(size_gated_broadcast(seg), "user_id")
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = mix.groupBy("segment").agg(F.sum("n").alias("t"))
    p = F.col("n") * F.lit(1.0) / F.col("t")
    return (
        mix.join(tot, "segment")
        .groupBy("segment", "t")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 4).alias("mix_entropy"),
        )
        .select(
            "segment",
            "n_types",
            F.col("t").alias("n_events"),
            "mix_entropy",
        )
    )


@register(
    "events_peak_concurrency",
    oracle=f"""
    {EVENTS_CTE},
    marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                        > 1800000
                     OR lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM ev
    ),
    sess AS (
        SELECT user_id,
               sum(is_start) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS sess_no,
               ts
        FROM marked
    ),
    intervals AS (
        SELECT min(ts) AS t0, max(ts) + INTERVAL 30 MINUTE AS t1
        FROM sess GROUP BY user_id, sess_no
    ),
    deltas AS (
        SELECT t0 AS t, 1 AS d FROM intervals
        UNION ALL
        SELECT t1 AS t, -1 AS d FROM intervals
    ),
    walked AS (
        SELECT t, d,
               sum(d) OVER (ORDER BY t, d
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS live
        FROM deltas
    )
    SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
           CAST(max(live) AS BIGINT) AS peak_concurrent
    FROM walked WHERE d = 1
    GROUP BY 1
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity number a serving
    fleet is sized to: sessionize each user's events (30-min inactivity
    gap, session live until last event + 30 min), sweep a +1/−1 delta
    line over all session starts/ends with a running sum, and take the
    daily max of the live count AT START events (ends tie-sorted first
    via d ascending at equal timestamps, so a back-to-back session
    doesn't double-count itself).

    All-integer counting over deterministic (t, d) order — bit-exact.

    Plan shape: sessionization is the `win_sessionize_events` window
    pair on user_id; the sweep is one ordered window over 2×|sessions|
    delta rows — session-table scale, not event scale (range-partition
    the sweep by day at years of history, carrying each partition's
    opening balance, the `scale_compaction_plan` two-pass note)."""
    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(wu))
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_ms > 1800000, 1)
        .when(F.lag("ts").over(wu).isNull(), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.select(
        "user_id",
        F.sum("is_start")
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess_no"),
        "ts",
    )
    intervals = sess.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("t0"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t1"),
    )
    deltas = intervals.select(F.col("t0").alias("t"), F.lit(1).alias("d")).unionAll(
        intervals.select(F.col("t1").alias("t"), F.lit(-1).alias("d"))
    )
    ws = Window.orderBy("t", "d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = deltas.withColumn("live", F.sum("d").over(ws))
    return (
        walked.filter(F.col("d") == 1)
        .groupBy(F.date_trunc("day", "t").cast("timestamp_ntz").alias("day"))
        .agg(F.max("live").alias("peak_concurrent"))
    )


# ---------------------------------------------------------------------------
# Time-series diagnostics over the daily event-count series. All three use
# the INTEGER-EXACT centering trick (FIXTURES.md conventions): instead of
# float means, every statistic is rewritten over n·x − S (bigint) so the
# only float op is one final IEEE division before round(4) — bit-identical
# across engines regardless of aggregation order.
# ---------------------------------------------------------------------------

_DAILY_CTE = f"""
    {EVENTS_CTE},
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM ev GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
            FROM daily)
"""

_ACF_MAX_LAG = 7


def _daily_counts(spark: SparkSession, sf_dir: str):
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    return daily, tot


@register(
    "events_acf_daily",
    oracle=_DAILY_CTE + f""",
    cent AS (SELECT d, n * x - s AS c FROM daily CROSS JOIN tot),
    lagd AS (
        SELECT c,
               {", ".join(f"lag(c, {k}) OVER (ORDER BY d) AS c{k}"
                          for k in range(1, _ACF_MAX_LAG + 1))}
        FROM cent
    ),
    agg AS (
        SELECT CAST(sum(c * c) AS BIGINT) AS den,
               {", ".join(f"CAST(sum(c * c{k}) AS BIGINT) AS num{k}, "
                          f"CAST(count(c{k}) AS BIGINT) AS np{k}"
                          for k in range(1, _ACF_MAX_LAG + 1))}
        FROM lagd
    )
    {" UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag, np{k} AS n_pairs, "
        f"round(num{k} * 1.0 / den, 4) AS acf FROM agg"
        for k in range(1, _ACF_MAX_LAG + 1))}
    """,
)
def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1–7) of the daily event-count series
    — the periodicity diagnostic run before any seasonal model or anomaly
    threshold is chosen (a weekly cycle shows as a lag-7 peak).

    Exactness: sample ACF r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)² is
    float-fragile through μ; multiplying both sides by n² makes every
    term integer — c_t = n·x_t − S (bigint), r_k = Σc_t·c_{t−k} / Σc_t²
    — so engines agree bit-for-bit after ONE division + round(4).

    Plan shape: daily counts (map-side combinable), a 1-row totals
    broadcast, ONE ordered window computing all 7 lags in a single pass
    over the ~|days| row series (tiny by construction — a count per day
    — so the single-partition window is a non-issue at any corpus
    scale), one aggregate row, exploded to 7 (lag, acf) rows."""
    daily, tot = _daily_counts(spark, sf_dir)
    cent = daily.crossJoin(F.broadcast(tot)).select(
        "d", (F.col("n") * F.col("x") - F.col("s")).alias("c")
    )
    w = Window.orderBy("d")
    lagd = cent.select(
        "c", *[F.lag("c", k).over(w).alias(f"c{k}") for k in range(1, _ACF_MAX_LAG + 1)]
    )
    agg = lagd.agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("den"),
        *[
            e
            for k in range(1, _ACF_MAX_LAG + 1)
            for e in (
                F.sum(F.col("c") * F.col(f"c{k}")).cast("bigint").alias(f"num{k}"),
                F.count(F.col(f"c{k}")).cast("bigint").alias(f"np{k}"),
            )
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("bigint").alias("lag"),
                F.col(f"np{k}").alias("n_pairs"),
                F.round(F.col(f"num{k}") / F.col("den"), 4).alias("acf"),
            )
            for k in range(1, _ACF_MAX_LAG + 1)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.lag", "r.n_pairs", "r.acf")


@register(
    "events_mean_shift_detect",
    oracle=_DAILY_CTE + """,
    pre AS (
        SELECT d, x,
               CAST(sum(x) OVER (ORDER BY d) AS BIGINT) AS s1,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS n1
        FROM daily
    ),
    scored AS (
        SELECT d AS split_day, n1 AS n_before, n - n1 AS n_after,
               s1 AS sum_before, s - s1 AS sum_after,
               abs(s1 * (n - n1) - (s - s1) * n1) AS diff
        FROM pre CROSS JOIN tot
        WHERE n1 < n
    )
    SELECT split_day, n_before, n_after,
           round(sum_before * 1.0 / n_before, 4) AS mean_before,
           round(sum_after * 1.0 / n_after, 4) AS mean_after,
           round(diff * 1.0 / (n_before * n_after), 4) AS mean_shift
    FROM scored
    ORDER BY (1000000 * diff) // (n_before * n_after) DESC, split_day
    LIMIT 5
    """,
)
def events_mean_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift (changepoint) detection on the daily volume series:
    every day is scored as a candidate split by |mean(before) −
    mean(after)|, and the top five splits are reported — the one-pass
    answer to "when did traffic structurally change", preferred here
    over recursive CUSUM because it is expressible as prefix sums (no
    sequential state, so it parallelizes and oracles cleanly).

    Exactness: the shift |S₁/n₁ − S₂/n₂| = |S₁n₂ − S₂n₁|/(n₁n₂) ranks by
    the all-integer key (10⁶·|S₁n₂ − S₂n₁|) div (n₁n₂) — integer floor
    division both engines — so the top-5 cut is deterministic; the
    reported means do ONE division each before round(4). Plan: one
    running-sum window over the tiny daily series + a 1-row totals
    broadcast; TakeOrdered for the limit."""
    daily, tot = _daily_counts(spark, sf_dir)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = daily.select(
        "d",
        "x",
        F.sum("x").over(w).cast("bigint").alias("s1"),
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("n1"),
    )
    scored = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("n1") < F.col("n"))
        .select(
            F.col("d").alias("split_day"),
            F.col("n1").alias("n_before"),
            (F.col("n") - F.col("n1")).alias("n_after"),
            F.col("s1").alias("sum_before"),
            (F.col("s") - F.col("s1")).alias("sum_after"),
            F.abs(
                F.col("s1") * (F.col("n") - F.col("n1"))
                - (F.col("s") - F.col("s1")) * F.col("n1")
            ).alias("diff"),
        )
    )
    return (
        scored.select(
            "split_day",
            "n_before",
            "n_after",
            F.round(F.col("sum_before") / F.col("n_before"), 4).alias("mean_before"),
            F.round(F.col("sum_after") / F.col("n_after"), 4).alias("mean_after"),
            F.round(F.col("diff") / (F.col("n_before") * F.col("n_after")), 4).alias(
                "mean_shift"
            ),
            F.expr("(1000000 * diff) div (n_before * n_after)").alias("rk"),
        )
        .orderBy(F.col("rk").desc(), "split_day")
        .limit(5)
        .drop("rk")
    )


@register(
    "events_dow_seasonality",
    oracle=_DAILY_CTE + """
    SELECT CAST(isodow(d) AS BIGINT) AS iso_dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS total_events,
           round(CAST(sum(x) AS BIGINT) * n * 1.0 / (count(*) * s), 4)
               AS seasonality_index
    FROM daily CROSS JOIN tot
    GROUP BY isodow(d), n, s
    """,
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: each ISO weekday's average daily
    volume relative to the overall average — index 1.0 = flat, the
    multiplicative seasonal factors a gap-fill/forecast step divides out.

    Exactness: index = (S_dow/n_dow)/(S/n) = S_dow·n / (n_dow·S) — four
    bigints, ONE division, round(4). ISO weekday (1=Mon…7=Sun) on both
    engines (Spark's `weekday()+1` == DuckDB's `isodow`). Plan: daily
    counts then a ≤7-group aggregate with the totals as a 1-row
    broadcast."""
    daily, tot = _daily_counts(spark, sf_dir)
    return (
        daily.select((F.expr("weekday(d)") + 1).cast("bigint").alias("iso_dow"), "x")
        .crossJoin(F.broadcast(tot))
        .groupBy("iso_dow", "n", "s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("x").cast("bigint").alias("total_events"),
        )
        .select(
            "iso_dow",
            "n_days",
            "total_events",
            F.round(
                F.col("total_events") * F.col("n") / (F.col("n_days") * F.col("s")), 4
            ).alias("seasonality_index"),
        )
    )


@register(
    "events_interarrival_hist",
    oracle=f"""
    {EVENTS_CTE},
    gaps AS (
        SELECT epoch_ms(ts)
               - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS gap_ms
        FROM ev
    ),
    pos AS (SELECT gap_ms FROM gaps WHERE gap_ms IS NOT NULL),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pos)
    SELECT CAST(length(bin(gap_ms)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(count(*) * 1.0 / n, 4) AS share,
           CAST(min(gap_ms) AS BIGINT) AS min_gap_ms,
           CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
    FROM pos CROSS JOIN tot
    GROUP BY length(bin(gap_ms)), n
    """,
)
def events_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed inter-arrival-time histogram of per-user event gaps
    — the burstiness profile that decides session timeout thresholds
    (`win_sessionize_events`'s 30-minute gap) and streaming watermark
    widths from DATA rather than folklore: bucket k holds gaps in
    [2^(k−1), 2^k) milliseconds, so the histogram spans milliseconds to
    weeks in ~40 rows.

    Determinism: the bucket is `length(bin(gap_ms))` — the bit-length of
    the integer gap — pure integer/string ops, NO floating log2, so
    power-of-two boundary gaps land identically on both engines (a
    float log2 can return 2.9999999999999996 for log2(8)). Plan: one
    lag window on the (user_id) partitioning every events operator
    shares, then a ~40-group aggregate."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ems = F.unix_millis(F.col("ts"))
    gaps = ev.select((ems - F.lag(ems).over(w)).alias("gap_ms")).filter(
        F.col("gap_ms").isNotNull()
    )
    tot = gaps.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        gaps.crossJoin(F.broadcast(tot))
        .groupBy(
            F.length(F.bin("gap_ms")).cast("bigint").alias("log2_bucket"), "n"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.min("gap_ms").cast("bigint").alias("min_gap_ms"),
            F.max("gap_ms").cast("bigint").alias("max_gap_ms"),
        )
        .select(
            "log2_bucket",
            "n_gaps",
            F.round(F.col("n_gaps") / F.col("n"), 4).alias("share"),
            "min_gap_ms",
            "max_gap_ms",
        )
    )


@register(
    "events_seasonal_decompose",
    oracle=_DAILY_CTE + """,
    win AS (
        SELECT d, x,
               CAST(sum(x) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
               count(*) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
        FROM daily
    ),
    det AS (
        SELECT CAST(isodow(d) AS BIGINT) AS iso_dow, 7 * x - s7 AS num
        FROM win WHERE w = 7
    )
    SELECT iso_dow,
           CAST(count(*) AS BIGINT) AS n_days_used,
           CAST(sum(num) AS BIGINT) AS detrended_sum_x7,
           round(sum(num) * 1.0 / (7 * count(*)), 4) AS seasonal
    FROM det GROUP BY iso_dow
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical (moving-average) seasonal decomposition, the additive
    day-of-week component: detrend daily volume with a CENTERED 7-day
    moving average, then average the residuals per ISO weekday — the
    seasonal term of an STL-style decomposition, computed relationally.
    `events_dow_seasonality` gives the multiplicative index; this gives
    the additive component a forecaster subtracts.

    Exactness: the detrended residual x − MA₇ = (7x − S₇)/7 keeps an
    INTEGER numerator (7x − S₇, bigint), so the per-dow mean is
    Σnum / (7·n) — exact integer aggregates, ONE division, round(4).
    Edge days without a full 7-day window are excluded (w = 7), matching
    the classical definition. Plan: one centered window + a ≤7-group
    aggregate over the tiny daily frame."""
    daily, _tot = _daily_counts(spark, sf_dir)
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "d",
        "x",
        F.sum("x").over(w7).cast("bigint").alias("s7"),
        F.count(F.lit(1)).over(w7).alias("w"),
    )
    det = win.filter(F.col("w") == 7).select(
        (F.expr("weekday(d)") + 1).cast("bigint").alias("iso_dow"),
        (7 * F.col("x") - F.col("s7")).alias("num"),
    )
    return det.groupBy("iso_dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_used"),
        F.sum("num").cast("bigint").alias("detrended_sum_x7"),
        F.round(F.sum("num") / (7 * F.count(F.lit(1))), 4).alias("seasonal"),
    )


@register(
    "events_survival_km",
    oracle=f"""
    {EVENTS_CTE},
    spans AS (
        SELECT user_id,
               CAST(min(ts) AS TIMESTAMP) AS t0,
               CAST(max(ts) AS TIMESTAMP) AS t_last,
               CAST(min(CASE WHEN event_type = 'error' THEN ts END)
                    AS TIMESTAMP) AS t_err
        FROM ev GROUP BY user_id
    ),
    durs AS (
        SELECT user_id,
               CAST(datediff('day', CAST(t0 AS DATE),
                    CAST(coalesce(t_err, t_last) AS DATE)) AS BIGINT) AS dur,
               CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS death
        FROM spans
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM durs),
    ex AS (
        SELECT dur, CAST(count(*) AS BIGINT) AS m,
               CAST(sum(death) AS BIGINT) AS d
        FROM durs GROUP BY dur
    ),
    risk AS (
        SELECT dur, m, d,
               n0 - (CAST(sum(m) OVER (ORDER BY dur) AS BIGINT) - m) AS n_at_risk
        FROM ex CROSS JOIN tot
    ),
    km AS (
        SELECT dur, n_at_risk, d,
               CASE WHEN min(1.0 - d * 1.0 / n_at_risk) OVER (ORDER BY dur) <= 0
                    THEN 0.0
                    ELSE round(exp(sum(ln(CASE WHEN 1.0 - d * 1.0 / n_at_risk > 0
                                               THEN 1.0 - d * 1.0 / n_at_risk
                                               ELSE 1.0 END))
                               OVER (ORDER BY dur)), 4) END AS survival
        FROM risk
    )
    SELECT dur AS t_days, n_at_risk, d AS n_deaths, survival
    FROM km
    WHERE d > 0
    ORDER BY dur
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-error per user (the
    churn proxy — the same `error` op the CDC family treats as the
    delete/retract signal): users censor at their last observed event if
    they never error. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) — the estimator that
    handles censoring correctly where a naive "fraction errored by day t"
    silently treats still-active users as immortal.

    Plan shape: one groupBy(user_id) span aggregate (min/max/conditional
    min in a single pass), a ~|distinct days| exit table, and the risk
    set nᵢ = N − (exits before tᵢ) from ONE ordered window — no
    correlated subquery, no per-time re-scan. The product becomes
    exp(Σ ln(1−dᵢ/nᵢ)) over the ordered window (both engines); the ln/exp
    pair sits on the PMI/entropy round(4) precedent, with each factor's
    d/n an exact-integer division. Censoring rows (d=0) drop from the
    output but participate in the risk denominators via the exit
    table."""
    ev = _events(spark, sf_dir)
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("t_last"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias("t_err"),
    )
    durs = spans.select(
        F.datediff(
            F.to_date(F.coalesce("t_err", "t_last")), F.to_date("t0")
        )
        .cast("bigint")
        .alias("dur"),
        F.when(F.col("t_err").isNotNull(), 1).otherwise(0).alias("death"),
    )
    tot = durs.agg(F.count(F.lit(1)).cast("bigint").alias("n0"))
    ex = durs.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("death").cast("bigint").alias("d"),
    )
    wc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = ex.crossJoin(F.broadcast(tot)).select(
        "dur",
        "m",
        "d",
        (F.col("n0") - (F.sum("m").over(wc).cast("bigint") - F.col("m"))).alias(
            "n_at_risk"
        ),
    )
    factor = 1.0 - F.col("d") / F.col("n_at_risk")
    # a time where d == n zeroes the curve from there on; ln(0) is an
    # error in DuckDB, so the dead tail is a running-min CASE and the
    # ln/exp product only ever sees strictly positive factors
    surv = F.when(F.min(factor).over(wc) <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.exp(
                F.sum(F.log(F.when(factor > 0, factor).otherwise(F.lit(1.0)))).over(wc)
            ),
            4,
        )
    )
    return (
        risk.withColumn("survival", surv)
        .filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("t_days"),
            "n_at_risk",
            F.col("d").alias("n_deaths"),
            "survival",
        )
        .orderBy("t_days")
    )


def _markov_step_sql(k: int) -> str:
    """π_k = π_{k-1}·P as a CTE pair (flow sum + re-total over all states)."""
    prev = f"pi{k - 1}"
    return f"""
    f{k} AS (
        SELECT t.j AS s, sum(p.pr * t.p) AS pr
        FROM {prev} p JOIN trans t ON p.s = t.i
        GROUP BY t.j
    ),
    pi{k} AS (
        SELECT ty.s, coalesce(f.pr, 0) AS pr
        FROM types ty LEFT JOIN f{k} f ON ty.s = f.s
    )"""


@register(
    "events_markov_3step",
    oracle=f"""
    {EVENTS_CTE},
    seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM ev
    ),
    counts AS (
        SELECT prev_type AS i, event_type AS j, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    trans AS (
        SELECT i, j, n * 1.0 / sum(n) OVER (PARTITION BY i) AS p FROM counts
    ),
    types AS (SELECT DISTINCT event_type AS s FROM ev),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM types),
    pi0 AS (SELECT s, 1.0 / nt.n AS pr FROM types CROSS JOIN nt),
    {",".join(_markov_step_sql(k) for k in (1, 2, 3))}
    SELECT 1 AS step, s AS event_type, round(pr, 4) AS prob FROM pi1
    UNION ALL
    SELECT 2, s, round(pr, 4) FROM pi2
    UNION ALL
    SELECT 3, s, round(pr, 4) FROM pi3
    """,
)
def events_markov_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain state distribution after 1, 2, and 3 steps from a
    uniform start, over the per-user event-type transition matrix
    (`events_transition_matrix` row-normalized) — the forward-simulation
    view of the journey graph: 'where does a user end up k clicks from
    now', converging toward the chain's steady state (the same
    synchronous-iteration discipline as `graph_pagerank_copurchase`,
    on a |types|² matrix instead of an edge list).

    Plan shape: ONE user_id window builds the transition counts; the
    matrix and every π vector are ≤|types|²-row frames, so each step is
    a broadcast-joinable flow sum + left join back to the state list
    (mass lost to absorbing states re-zeroed explicitly). Transition
    probabilities are int ratios (one division); the ≤|types|-term flow
    sums sit ~1e-16 under the round(4) reporting grid (the PageRank
    precedent)."""
    counts = events_transition_matrix(spark, sf_dir).select(
        F.col("prev_type").alias("i"), F.col("next_type").alias("j"), "n"
    )
    row_tot = Window.partitionBy("i")
    trans = counts.select(
        "i", "j", (F.col("n") / F.sum("n").over(row_tot)).alias("p")
    )
    ev = _events(spark, sf_dir)
    types = ev.select(F.col("event_type").alias("s")).distinct()
    nt = types.agg(F.count(F.lit(1)).alias("n"))
    pi = types.crossJoin(F.broadcast(nt)).select(
        "s", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    out = None
    btrans = F.broadcast(trans)
    for step in (1, 2, 3):
        flow = (
            pi.join(btrans, pi.s == F.col("i"))
            .groupBy(F.col("j").alias("ns"))
            .agg(F.sum(F.col("pr") * F.col("p")).alias("fpr"))
        )
        pi = types.join(flow, types.s == F.col("ns"), "left").select(
            "s", F.coalesce("fpr", F.lit(0.0)).alias("pr")
        )
        step_df = pi.select(
            F.lit(step).alias("step"),
            F.col("s").alias("event_type"),
            F.round("pr", 4).alias("prob"),
        )
        out = step_df if out is None else out.unionAll(step_df)
    return out


_Z = 1.96  # 95% Wilson interval


@register(
    "events_conversion_wilson_ci",
    oracle=f"""
    {EVENTS_CTE},
    weekly AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM ev GROUP BY 1, 2
    ),
    agg AS (
        SELECT wk, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) AS BIGINT) AS k
        FROM weekly GROUP BY wk
    )
    SELECT wk AS week, n AS n_users, k AS n_converted,
           round(k * 1.0 / n, 4) AS p_hat,
           round(((k * 1.0 / n) + {_Z} * {_Z} / (2 * n)
                  - {_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                + {_Z} * {_Z} / (4 * n * n)))
                 / (1 + {_Z} * {_Z} / n), 4) AS ci_low,
           round(((k * 1.0 / n) + {_Z} * {_Z} / (2 * n)
                  + {_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                                + {_Z} * {_Z} / (4 * n * n)))
                 / (1 + {_Z} * {_Z} / n), 4) AS ci_high
    FROM agg
    """,
)
def events_conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly conversion rate with a 95% WILSON score interval — the
    binomial CI that stays inside [0,1] and behaves at small n where the
    naive normal interval fails; the uncertainty band every experiment
    dashboard should draw around a rate (companion to
    `agg_welch_ab_test`'s mean comparison).

    Exactness: n and k are integers from one (week, user) aggregate +
    one weekly rollup; the Wilson bounds are a single fixed expression
    tree (div/sqrt — IEEE exact) written in the same textual order on
    both engines, under round(4). Plan: two map-side-combinable
    aggregates, no window, no join."""
    ev = _events(spark, sf_dir)
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"), "user_id"
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv")
    )
    agg = weekly.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
    )
    p = F.col("k") * 1.0 / F.col("n")
    z2 = _Z * _Z
    half = F.lit(_Z) * F.sqrt(
        p * (1 - p) / F.col("n") + F.lit(z2) / (4 * F.col("n") * F.col("n"))
    )
    denom = 1 + F.lit(z2) / F.col("n")
    center = p + F.lit(z2) / (2 * F.col("n"))
    return agg.select(
        "week",
        F.col("n").alias("n_users"),
        F.col("k").alias("n_converted"),
        F.round(p, 4).alias("p_hat"),
        F.round((center - half) / denom, 4).alias("ci_low"),
        F.round((center + half) / denom, 4).alias("ci_high"),
    )


@register(
    "events_anomaly_stl_residual",
    oracle=_DAILY_CTE + """,
    win AS (
        SELECT d, x,
               CAST(sum(x) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
               count(*) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
        FROM daily
    ),
    res AS (SELECT d, x, 7 * x - s7 AS num FROM win WHERE w = 7),
    med AS (
        SELECT quantile_cont(num, 0.5) AS m FROM res
    ),
    mad AS (
        SELECT m, quantile_cont(abs(num - m), 0.5) AS mad FROM res CROSS JOIN med
        GROUP BY m
    )
    SELECT r.d AS day, r.x AS n_events,
           round(r.num / 7.0, 4) AS residual,
           round((r.num - m.m) / nullif(m.mad, 0), 4) AS mad_score
    FROM res r CROSS JOIN mad m
    WHERE abs(r.num - m.m) > 2 * m.mad
    """,
)
def events_anomaly_stl_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous days by DETRENDED residual — the robust composite of
    `events_seasonal_decompose` + `agg_mad_robust`: daily volume is
    detrended with the centered 7-day MA, and days whose residual sits
    more than 2 MADs from the median residual are flagged. Detrending
    first is what separates 'weekend dip' (trend/seasonal, expected)
    from genuine incidents; the MAD threshold survives the outliers it
    hunts (a z-score's σ is inflated by its own anomalies).

    Exactness: residual numerators 7x−S₇ are bigint; the median and MAD
    come from `quantile_cont`/`percentile` (matching interpolation, the
    `win_rolling_median` precedent) over integers; the 2-MAD test
    compares integers against exact medians. Plan: one centered window,
    two tiny percentile aggregates, one row-local filter."""
    daily, _tot = _daily_counts(spark, sf_dir)
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    res = (
        daily.select(
            "d",
            "x",
            F.sum("x").over(w7).cast("bigint").alias("s7"),
            F.count(F.lit(1)).over(w7).alias("w"),
        )
        .filter(F.col("w") == 7)
        .select("d", "x", (7 * F.col("x") - F.col("s7")).alias("num"))
    )
    med = res.agg(F.expr("percentile(num, 0.5)").alias("m"))
    mad = (
        res.crossJoin(F.broadcast(med))
        .agg(
            F.first("m").alias("m"),
            F.expr("percentile(abs(num - m), 0.5)").alias("mad"),
        )
    )
    return (
        res.crossJoin(F.broadcast(mad))
        .filter(F.abs(F.col("num") - F.col("m")) > 2 * F.col("mad"))
        .select(
            F.col("d").alias("day"),
            F.col("x").alias("n_events"),
            F.round(F.col("num") / 7.0, 4).alias("residual"),
            F.round(
                (F.col("num") - F.col("m")) / F.nullif(F.col("mad"), F.lit(0.0)), 4
            ).alias("mad_score"),
        )
    )


@register(
    "events_audience_overlap",
    oracle=f"""
    {EVENTS_CTE},
    aud AS (SELECT DISTINCT event_type, user_id FROM ev),
    sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM aud GROUP BY 1),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM aud a JOIN aud b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_common,
           sa.n AS n_a, sb.n AS n_b,
           round(p.n_common * 1.0 / (sa.n + sb.n - p.n_common), 4)
               AS audience_jaccard
    FROM pairs p
    JOIN sizes sa ON p.type_a = sa.event_type
    JOIN sizes sb ON p.type_b = sb.event_type
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: the Jaccard of the
    distinct-user sets behind every pair of behaviors — the matrix a
    growth team reads to find which actions share (or split) an
    audience, and the same shared-key equi-join shape as
    `graph_jaccard_link_prediction` applied to behavioral cohorts.

    Plan shape: ONE distinct (type, user) projection feeds both the
    per-type sizes and the pair counts; the pair join keys on user_id
    so volume is Σ_user |types(user)|² ≤ 25·|users| — never |users|².
    All counts bigint; the Jaccard is one division under round(4)."""
    ev = _events(spark, sf_dir)
    aud = ev.select("event_type", "user_id").distinct()
    sizes = aud.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = aud.select(F.col("event_type").alias("type_a"), "user_id")
    b = aud.select(F.col("event_type").alias("type_b"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ).alias("audience_jaccard"),
        )
    )


@register(
    "events_next_event_baseline",
    oracle=f"""
    {EVENTS_CTE},
    seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM ev
    ),
    counts AS (
        SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    best AS (
        SELECT prev_type, next_type AS predicted_next, n AS n_correct,
               row_number() OVER (PARTITION BY prev_type
                                  ORDER BY n DESC, next_type) AS rn
        FROM counts
    ),
    tot AS (
        SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_total FROM counts
        GROUP BY prev_type
    )
    SELECT b.prev_type, b.predicted_next, b.n_correct, t.n_total,
           round(b.n_correct * 1.0 / t.n_total, 4) AS accuracy
    FROM best b JOIN tot t ON b.prev_type = t.prev_type
    WHERE b.rn = 1
    """,
)
def events_next_event_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-class next-event prediction baseline: for each current
    event type, the most frequent successor and the accuracy that
    predicting it would achieve — the floor every sequence model must
    beat before it earns its training cost, read directly off the
    `events_transition_matrix` counts (an argmax per row + a row total;
    the per-row accuracies combine into overall baseline accuracy by
    weighting with n_total).

    All integers + one division; the argmax is a row_number with a
    next_type tie-break, so the prediction is deterministic. Plan: the
    one user_id window from the transition matrix, then two aggregates
    over the ≤|types|² counts frame."""
    counts = events_transition_matrix(spark, sf_dir).select(
        "prev_type", "next_type", F.col("n").cast("bigint").alias("n")
    )
    w = Window.partitionBy("prev_type").orderBy(F.col("n").desc(), "next_type")
    best = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "prev_type",
            F.col("next_type").alias("predicted_next"),
            F.col("n").alias("n_correct"),
        )
    )
    tot = counts.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("n_total"))
    return best.join(tot, "prev_type").select(
        "prev_type",
        "predicted_next",
        "n_correct",
        "n_total",
        F.round(F.col("n_correct") / F.col("n_total"), 4).alias("accuracy"),
    )


@register(
    "events_alert_debounce",
    oracle=f"""
    {EVENTS_CTE},
    marks AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) > 900000
                    THEN 1 ELSE 0 END AS new_burst
        FROM ev WHERE event_type = 'error'
    ),
    bursts AS (
        SELECT user_id, ts, event_id,
               CAST(sum(new_burst) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS burst_id
        FROM marks
    )
    SELECT user_id, burst_id,
           min(ts)  AS alert_ts,
           CAST(min(event_id) AS BIGINT) AS alert_event_id,
           CAST(count(*) AS BIGINT)      AS suppressed,
           round((epoch_ms(max(ts)) - epoch_ms(min(ts))) / 1000.0, 4)
               AS burst_span_s
    FROM bursts
    GROUP BY user_id, burst_id
    """,
)
def events_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing: collapse per-user error STORMS into one alert
    per burst (a burst ends after 15 error-free minutes), reporting the
    alert timestamp, how many raw errors it suppressed, and the burst
    span — the dedup-with-cooldown operator every alerting pipeline
    needs (page once per incident, not once per stack trace).

    Semantics note: gap-based burst closure (cooldown restarts with
    every suppressed event) is exactly gap-sessionization applied to
    the error stream — the `win_sessionize_events` running-sum trick,
    so it parallelizes as one (user_id) shuffle + windows instead of
    sequential state. All-integer outputs except the one rounded span
    division. At scale, the same query runs incrementally as a
    streaming session window (`stream_session_windows` family).

    Boundary rule (ADVICE r10, settled EMPIRICALLY): a gap of EXACTLY
    15 minutes stays in the SAME burst (strict `gap > 900000 ms`) —
    Spark's session_window merges touching session ranges, so this is
    the convention the streaming twin `stream_alert_debounce` actually
    implements (tests/test_debounce_boundary.py drives all three
    formulations over a synthetic exact-gap stream)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    err = ev.filter(F.col("event_type") == "error").withColumn(
        "ts_ms", F.unix_millis("ts")
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_burst = F.when(
        F.lag("ts_ms").over(wu).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(wu) > 900000),
        1,
    ).otherwise(0)
    bursts = err.withColumn("new_burst", new_burst).withColumn(
        "burst_id",
        F.sum("new_burst")
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return bursts.groupBy("user_id", "burst_id").agg(
        F.min("ts").alias("alert_ts"),
        F.min("event_id").cast("bigint").alias("alert_event_id"),
        F.count(F.lit(1)).cast("bigint").alias("suppressed"),
        F.round((F.max("ts_ms") - F.min("ts_ms")) / 1000.0, 4).alias(
            "burst_span_s"
        ),
    )


@register(
    "events_bot_score",
    oracle=f"""
    {EVENTS_CTE},
    base AS (
        SELECT user_id, ts, event_id,
               CAST(epoch_ms(ts) // 1000 AS BIGINT) AS s,
               CASE WHEN hour(ts) BETWEEN 0 AND 5 THEN 1 ELSE 0 END AS night
        FROM ev
    ),
    gapped AS (
        SELECT user_id, s, night,
               s - lag(s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_s
        FROM base
    ),
    per_user AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT)       AS n_events,
               CAST(sum(night) AS BIGINT)     AS night_events,
               CAST(count(gap_s) AS BIGINT)   AS n_gaps,
               CAST(sum(gap_s) AS BIGINT)     AS sg,
               CAST(sum(gap_s * gap_s) AS BIGINT) AS sg2
        FROM gapped GROUP BY user_id
    ),
    per_min AS (
        SELECT user_id, CAST(max(c) AS BIGINT) AS max_per_min
        FROM (SELECT user_id, s // 60 AS m, count(*) AS c
              FROM base GROUP BY user_id, s // 60)
        GROUP BY user_id
    )
    SELECT u.user_id, u.n_events, m.max_per_min, u.night_events,
           round(u.sg * 1.0 / u.n_gaps, 4) AS mean_gap_s,
           CASE WHEN u.sg = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE round(sqrt(CAST(CAST(u.n_gaps AS HUGEINT) * u.sg2
                                     - CAST(u.sg AS HUGEINT) * u.sg
                                     AS DOUBLE)) / u.sg, 4)
           END AS gap_cv,
           CASE WHEN m.max_per_min >= 3
                     AND 4 * (CAST(u.n_gaps AS HUGEINT) * u.sg2
                              - CAST(u.sg AS HUGEINT) * u.sg)
                         <= CAST(u.sg AS HUGEINT) * u.sg
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
           END AS is_bot
    FROM per_user u JOIN per_min m ON u.user_id = m.user_id
    WHERE u.n_events >= 10
    """,
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation scoring per user: burst rate (max events in any
    calendar minute), night-activity count, inter-arrival mean and
    coefficient of variation, and a composite flag — machine traffic
    fires fast, round-the-clock, and with unnaturally REGULAR gaps
    (low CV), the data-quality screen every training-data pipeline runs
    before trusting engagement signals.

    Exactness: timestamps collapse to integer epoch-seconds (truncating
    div, both engines), so gap sums and squared-gap sums are bigint and
    the variance numerator n·Σg²−(Σg)² is the events_acf integer-
    centering trick — CV = √(that)/Σg costs one IEEE sqrt on an
    integer-exact double (correctly rounded in both engines) under
    round(4); the bot gate is a pure integer cross-multiplication
    (4·var_num ≤ Σg², i.e. CV ≤ ½ — never a float compare). Zero-gap
    users pin CV to 0 by stated convention. Plan: everything keys on
    user_id — one lag window and one aggregate share a single user_id
    shuffle, the minute rollup adds one narrow (user, minute) pass, and
    the final join is per-user row counts. At 100 TB there is no
    all-pairs surface anywhere; skewed mega-users are exactly the rows
    this operator exists to flag."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.expr("CAST(unix_millis(ts) div 1000 AS BIGINT)").alias("s"),
        F.when(F.hour("ts").between(0, 5), 1).otherwise(0).alias("night"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = base.withColumn("gap_s", F.col("s") - F.lag("s").over(wu))
    per_user = gapped.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("night").cast("bigint").alias("night_events"),
        F.count("gap_s").cast("bigint").alias("n_gaps"),
        F.sum("gap_s").cast("bigint").alias("sg"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("sg2"),
    )
    per_min = (
        base.groupBy("user_id", F.expr("s div 60").alias("m"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("bigint").alias("max_per_min"))
    )
    # decimal(38,0)/HUGEINT carry: a mega-user (exactly what this operator
    # flags) can push n_gaps * sg2 past bigint (1e6 gaps x 1e14 sum of
    # squares ~ 1e20); the centered numerator itself stays well inside 38
    # digits and the gate compare coerces losslessly.  The gate's RHS sg*sg
    # gets the same carry (ADVICE r10): per-user gap sums telescope to
    # last-first so sg is bounded by the corpus time span (~1e8-1e9 s) and
    # sg^2 happens to fit bigint today, but that bound is implicit — mirror
    # the oracle's CAST(sg AS HUGEINT) * sg instead of relying on it.
    var_num = (
        F.col("n_gaps").cast("decimal(38,0)") * F.col("sg2")
        - F.col("sg").cast("decimal(38,0)") * F.col("sg")
    )
    sg_sq = F.col("sg").cast("decimal(38,0)") * F.col("sg")
    return (
        per_user.join(per_min, "user_id")
        .filter(F.col("n_events") >= 10)
        .select(
            "user_id",
            "n_events",
            "max_per_min",
            "night_events",
            F.round(F.col("sg") * 1.0 / F.col("n_gaps"), 4).alias("mean_gap_s"),
            F.when(F.col("sg") == 0, F.lit(0.0).cast("double"))
            .otherwise(F.round(F.sqrt(var_num.cast("double")) / F.col("sg"), 4))
            .alias("gap_cv"),
            F.when(
                (F.col("max_per_min") >= 3) & (4 * var_num <= sg_sq),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("is_bot"),
        )
    )


@register(
    "events_funnel_time_bound",
    oracle=f"""
    {EVENTS_CTE},
    v AS (
        SELECT user_id, min(ts) AS view_ts
        FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS click_ts
        FROM ev e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.ts >= v.view_ts
          AND e.ts <= v.view_ts + INTERVAL 1 HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS purchase_ts
        FROM ev e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts >= c.click_ts
          AND e.ts <= c.click_ts + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(v.view_ts AS TIMESTAMP)  AS view_ts,
           CAST(c.click_ts AS TIMESTAMP) AS click_ts,
           CAST(p.purchase_ts AS TIMESTAMP) AS purchase_ts,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED funnel: first view → first click within ONE HOUR
    of that view → first purchase within 24 HOURS of that click — the
    attribution-window semantics real conversion funnels carry (a click
    three weeks later is not this funnel), which
    `events_funnel_conversion`'s unconstrained ordering cannot express.
    Per-user stage detail, so downstream rollups (per-stage counts,
    time-in-stage percentiles) stay one groupBy away.

    Semantics note: each stage anchors on the PREVIOUS stage's first
    qualifying event (min within the window), the standard
    first-touch-chained definition — deterministic without tiebreaks
    because min(ts) per user is unique-valued per stage filter. Plan:
    three user_id-keyed aggregates chained by equi-joins, each stage's
    frame shrinking (views ⊇ in-window clickers ⊇ in-window
    purchasers); everything shuffles on user_id once per stage and the
    window predicates are integer-ms compares pushed into the join
    filter. At 100 TB this is 3 shuffles of (user, ts) pairs — no
    pair blowup, no window functions over the raw stream."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") >= F.col("view_ts"))
            & (F.unix_millis("ts") <= F.unix_millis("view_ts") + 3600000)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") >= F.col("click_ts"))
            & (F.unix_millis("ts") <= F.unix_millis("click_ts") + 86400000)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .otherwise(1)
            .cast("bigint")
            .alias("stage"),
        )
    )


@register(
    "events_changepoint_cusum",
    oracle=_DAILY_CTE + """,
    params AS (
        SELECT CAST(sum(x) // count(*) AS BIGINT) AS mu,
               CAST(greatest(sum(x) // count(*) // 20, 1) AS BIGINT) AS slack
        FROM daily
    ),
    walk AS (
        SELECT d, x,
               CAST(sum(x - p.mu - p.slack) OVER (ORDER BY d) AS BIGINT) AS c
        FROM daily CROSS JOIN params p
    ),
    lind AS (
        SELECT d, x, c,
               CAST(least(min(c) OVER (ORDER BY d), 0) AS BIGINT) AS floor_c
        FROM walk
    )
    SELECT l.d, l.x,
           CAST(l.c - l.floor_c AS BIGINT) AS cusum,
           CAST(CASE WHEN l.c - l.floor_c > 5 * p.slack
                THEN 1 ELSE 0 END AS BIGINT) AS drift_alarm
    FROM lind l CROSS JOIN params p
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector over the daily event-count series:
    S_i = max(0, S_{i-1} + (x_i − μ − k)) with alarm at S > h — the
    classic Page (1954) control chart for a sustained upward shift,
    reacting to accumulated small drift that a per-day z-score
    (`events_anomaly_zscore`) misses and complementing
    `events_mean_shift_detect`'s retrospective binary-segmentation
    split with an ONLINE-shaped statistic.

    The max(0, ·) recursion is not a window aggregate, but it is the
    Lindley recursion, so it linearizes exactly: S_i = C_i − min(0,
    min_{j≤i} C_j) where C is the plain cumulative sum of (x − μ − k) —
    the `events_queue_backlog` prefix-min trick, two window passes
    instead of sequential state. Parameters are data-adaptive integers
    (μ = mean via integer division, slack k = μ/20, threshold h = 5k)
    so the operator transfers across scale factors; every value and
    compare stays bigint. Plan: one groupBy(day) rollup then windows
    over the ~|days| frame with a 1-row broadcast parameter set."""
    o = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    daily = o.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    params = daily.agg(
        F.expr("CAST(sum(x) div count(*) AS BIGINT)").alias("mu"),
        F.expr("CAST(greatest(sum(x) div count(*) div 20, 1) AS BIGINT)").alias(
            "slack"
        ),
    )
    wd = Window.orderBy("d")
    walk = daily.crossJoin(F.broadcast(params)).withColumn(
        "c",
        F.sum(F.col("x") - F.col("mu") - F.col("slack")).over(wd).cast("bigint"),
    )
    lind = walk.withColumn(
        "floor_c", F.least(F.min("c").over(wd), F.lit(0)).cast("bigint")
    )
    return lind.select(
        "d",
        "x",
        (F.col("c") - F.col("floor_c")).cast("bigint").alias("cusum"),
        F.when(F.col("c") - F.col("floor_c") > 5 * F.col("slack"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("drift_alarm"),
    )


@register(
    "events_attribution_linear",
    oracle=f"""
    {EVENTS_CTE},
    p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM ev WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT p.p_id, p.cents, e.event_type AS channel
        FROM p JOIN ev e ON e.user_id = p.user_id
        WHERE e.event_type <> 'purchase'
          AND e.ts < p.p_ts
          AND e.ts >= p.p_ts - INTERVAL 7 DAY
    ),
    credited AS (
        SELECT channel,
               CAST(cents * 10000 //
                    count(*) OVER (PARTITION BY p_id) AS BIGINT) AS share_u
        FROM t
    ),
    nones AS (
        SELECT 'none' AS channel, CAST(p.cents * 10000 AS BIGINT) AS share_u
        FROM p WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.p_id = p.p_id)
    ),
    allc AS (SELECT * FROM credited UNION ALL SELECT * FROM nones)
    SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
           round(CAST(sum(share_u) AS BIGINT) / 1000000.0, 4)
               AS attributed_value
    FROM allc GROUP BY 1
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: each purchase's value is split
    EQUALLY across every non-purchase touch by the same user in the 7
    days before it, rolled up by channel — the equal-credit counterpart
    to `events_attribution_last_touch` (which hands the whole conversion
    to the final touch). Purchases with no in-window touch credit a
    'none' channel, so total credited value is conserved.

    Exactness: purchase value goes to integer cents once
    (floor(x*100+0.5)), each touch's share is cents*10000 `div` n_touches
    — Spark `div` and DuckDB `//` truncate identically — and only the
    final channel sum converts back to dollars with one round(4). The
    deliberate sub-cent truncation remainder (< n_touches micro-units
    per purchase) is identical in both engines, so the oracle is exact,
    and at 1e9 purchases the micro-unit sums stay ~1e15 — well inside
    bigint. Plan: one user_id equi-join purchases x touches with the
    7-day window as a residual range predicate, a count window over
    p_id (bounded by touches-per-purchase), and a left-anti for the
    untouched purchases — two user_id/p_id-keyed shuffles carrying
    (id, cents, channel) rows, never the raw event stream."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    t = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "ts", F.col("event_type").alias("channel"))
        .join(p, "user_id")
        .filter(
            (F.col("ts") < F.col("p_ts"))
            & (
                F.unix_millis("ts")
                >= F.unix_millis("p_ts") - 7 * 86400000
            )
        )
        .select("p_id", "cents", "channel")
    )
    credited = t.select(
        "channel",
        F.expr(
            "CAST(cents * 10000 div count(*) OVER (PARTITION BY p_id) AS BIGINT)"
        ).alias("share_u"),
    )
    nones = p.join(t.select("p_id"), "p_id", "left_anti").select(
        F.lit("none").alias("channel"),
        (F.col("cents") * 10000).cast("bigint").alias("share_u"),
    )
    return (
        credited.unionByName(nones)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.round(F.sum("share_u").cast("bigint") / 1000000.0, 4).alias(
                "attributed_value"
            ),
        )
    )

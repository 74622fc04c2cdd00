"""Join operators (SURVEY.md §2.2 "Joins").

The reference enriches its MQ stream against reference tables downstream in
vanilla Spark (README.md:59-69 replication use case); these are the batch
join shapes that consumption layer needs.

Scale notes: dimension sides (region/nation/supplier, literal band tables)
are explicitly `broadcast()` — at 100 TB the fact side never shuffles for
those joins. Fact-fact joins (lineitem⋈orders) shuffle on the join key and
rely on AQE for skew splitting. The non-equi band join broadcasts the tiny
side so it's a BroadcastNestedLoopJoin, the only sane plan for theta joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.operators.projections import EVENTS_CTE
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table, spread


@register(
    "join_revenue_by_nation",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway inner equi-join (TPC-H Q5 shape): fact-fact shuffle join +
    broadcast dims. Catalyst reorders; we pin broadcasts explicitly."""
    # fixture files are single-row-group parquet → 1-partition scans; spread
    # the fact side so the broadcast joins use every core (a real table has
    # many splits, so spread() is a no-op there)
    li = spread(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_left_order_counts",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers (TPC-H Q13 shape);
    count(o_orderkey) skips nulls in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "join_semi_purchasers",
    oracle=f"""
    {EVENTS_CTE}
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM ev
                  WHERE ev.user_id = c_custkey AND ev.event_type = 'purchase')
    """,
)
def join_semi_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 purchase event (existence check,
    no duplication of the left side)."""
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return c.join(
        ev, c.c_custkey == ev.user_id, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_anti_inactive",
    oracle=f"""
    {EVENTS_CTE}
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM ev WHERE ev.user_id = c_custkey)
    """,
)
def join_anti_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no events (dedup-against-seen shape,
    §2.2 Joins)."""
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    return c.join(
        ev, c.c_custkey == ev.user_id, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_price_bands",
    oracle="""
    SELECT band, count(*) AS n, round(sum(l_extendedprice), 4) AS total
    FROM lineitem
    JOIN (VALUES ('low', 0.0, 20000.0),
                 ('mid', 20000.0, 60000.0),
                 ('high', 60000.0, 1000000000.0)) AS b(band, lo, hi)
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
)
def join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range) join against a tiny literal dimension — broadcast
    nested-loop, the only viable non-equi strategy at scale."""
    # project to the single used column BEFORE the parallelizing shuffle —
    # the exchange then moves 8 bytes/row instead of the whole lineitem row
    li = spread(load_table(spark, sf_dir, "lineitem").select("l_extendedprice"))
    bands = F.broadcast(
        spark.createDataFrame(
            [("low", 0.0, 20000.0), ("mid", 20000.0, 60000.0), ("high", 60000.0, 1e9)],
            "band string, lo double, hi double",
        )
    )
    return (
        li.join(bands, (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("total"))
    )


@register(
    "proj_price_bands_expr",
    oracle="""
    SELECT band, count(*) AS n, round(sum(l_extendedprice), 4) AS total
    FROM (SELECT CASE WHEN l_extendedprice < 20000.0 THEN 'low'
                      WHEN l_extendedprice < 60000.0 THEN 'mid'
                      ELSE 'high' END AS band,
                 l_extendedprice
          FROM lineitem)
    GROUP BY band
    """,
)
def proj_price_bands_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same band classification as `join_price_bands`, as the plan you
    actually run at 100 TB when the bands don't overlap: a CASE expression
    in the projection — zero joins, zero broadcast, whole-stage codegen
    straight off the scan, one tiny partial+final aggregate. The BNLJ twin
    stays registered as the theta-join operator demo; this is the
    expression-based fast path (BNLJ re-evaluates every band predicate per
    (row, band) pair — O(rows × bands) — where CASE is O(rows))."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    band = (
        F.when(F.col("l_extendedprice") < 20000.0, "low")
        .when(F.col("l_extendedprice") < 60000.0, "mid")
        .otherwise("high")
    )
    return (
        li.withColumn("band", band)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("total"))
    )


@register(
    "join_cross_flags",
    oracle="""
    SELECT r_name, l_returnflag
    FROM region CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
    """,
)
def join_cross_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (explicit cartesian of two tiny inputs)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    flags = load_table(spark, sf_dir, "lineitem").select("l_returnflag").distinct()
    return r.crossJoin(flags)


@register(
    "join_asof_click_before_purchase",
    oracle=f"""
    {EVENTS_CTE}
    SELECT p_id, user_id, c_id, gap_s FROM (
        SELECT p.event_id AS p_id, p.user_id AS user_id, c.event_id AS c_id,
               round((epoch_ms(p.ts) - epoch_ms(c.ts)) / 1000.0, 4) AS gap_s,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM ev WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    """,
)
def join_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click ≤ each purchase per user — the reference's
    replication 'latest row wins' pattern (README.md:59).

    Shape: union-interleave merge. Clicks and purchases are unioned into one
    per-user event sequence sorted by (ts, kind, event_id) — clicks sort
    before same-ts purchases for the inclusive ``<=`` bound — and a running
    ``last(click, ignorenulls)`` window carries the most recent click onto
    each purchase row. One shuffle on user_id, O(n log n) per user; unlike
    the range-join + row_number formulation it never materializes the
    (purchase × earlier-click) pair blowup, so a hot user with 10⁵ events
    costs 10⁵ log 10⁵, not 10¹⁰ pairs."""
    ev = load_table(spark, sf_dir, "events")
    # kind 0 = click, 1 = purchase: clicks order before equal-ts purchases
    merged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click = F.when(F.col("kind") == 0, F.struct("ts", "event_id"))
    return (
        merged.withColumn("last_click", F.last(click, ignorenulls=True).over(w))
        .filter((F.col("kind") == 1) & F.col("last_click").isNotNull())
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("last_click.event_id").alias("c_id"),
            F.round(
                (F.unix_millis(F.col("ts").cast("timestamp"))
                 - F.unix_millis(F.col("last_click.ts").cast("timestamp"))) / 1000.0,
                4,
            ).alias("gap_s"),
        )
    )


@register(
    "join_full_outer_nation_presence",
    oracle="""
    SELECT coalesce(cc.nationkey, ss.nationkey) AS nationkey, c_cnt, s_cnt
    FROM (SELECT c_nationkey AS nationkey, count(*) AS c_cnt
          FROM customer GROUP BY 1) cc
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, count(*) AS s_cnt
          FROM supplier GROUP BY 1) ss
    ON cc.nationkey = ss.nationkey
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: customer vs supplier presence per nation, nulls kept
    on unmatched sides."""
    cc = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    ss = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return (
        cc.join(ss, "nationkey", "full_outer")
        .select("nationkey", "c_cnt", "s_cnt")
    )


@register(
    "join_right_outer_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority, c_mktsegment
    FROM customer RIGHT JOIN orders ON c_custkey = o_custkey AND c_acctbal > 9000
    """,
)
def join_right_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every order kept, customer attributes only where the
    (extra, non-key) join predicate held."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (c.c_acctbal > 9000), "right"
    ).select("o_orderkey", "o_orderpriority", "c_mktsegment")


_BLOOM_BITS = 1 << 16  # 65 536 bits → ≤1 024 packed int64 words (~8 KiB)


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT o_orderpriority,
           count(*)                  AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a bloom-filter runtime prefilter — the pattern AQE's
    runtime row-group filtering automates, built explicitly: hash the
    (filtered) build-side keys into a 64Ki-bit / 2-hash bloom bitmap packed
    into ≤1 024 int64 words, broadcast the ~8 KiB word table, and knock out
    non-matching fact rows BEFORE the exact semi join. False positives
    (bloom says maybe, key absent) are removed by the exact semi join that
    follows, so the result is identical to the plain semi join — the bloom
    only shrinks what that join must process.

    Scale shape: at 100 TB the exact semi join shuffles the whole fact
    table on o_custkey; with the prefilter the fact side is cut to
    ~selectivity × |orders| rows map-side (two broadcast joins against the
    word table + a bitmask test, all inside one codegen stage), and only
    the survivors shuffle. The bitmap is built with one tiny
    groupBy(word).bit_or aggregation over the dim keys — never collected
    to the driver."""
    c = load_table(spark, sf_dir, "customer")
    o = spread(load_table(spark, sf_dir, "orders"))
    keys = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    def _bits(col: str):
        # two independent hash positions per key (xxhash64, seeded by an
        # extra literal column for h2) — identical inputs on both sides
        return F.array(
            F.pmod(F.xxhash64(F.col(col)), F.lit(_BLOOM_BITS)),
            F.pmod(F.xxhash64(F.col(col), F.lit("h2")), F.lit(_BLOOM_BITS)),
        )

    words = (
        keys.select(F.explode(_bits("c_custkey")).alias("bit"))
        .select(
            F.shiftright("bit", 6).alias("w"),
            F.expr("shiftleft(1L, cast(bit % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    probe = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        "o_totalprice",
        _bits("o_custkey")[0].alias("b1"),
        _bits("o_custkey")[1].alias("b2"),
    )
    w1 = words.select(F.col("w").alias("w1"), F.col("bits").alias("bits1"))
    w2 = words.select(F.col("w").alias("w2"), F.col("bits").alias("bits2"))
    prefiltered = (
        probe.join(F.broadcast(w1), F.shiftright("b1", 6) == F.col("w1"))
        .filter(F.expr("bits1 & shiftleft(1L, cast(b1 % 64 as int))") != 0)
        .join(F.broadcast(w2), F.shiftright("b2", 6) == F.col("w2"))
        .filter(F.expr("bits2 & shiftleft(1L, cast(b2 % 64 as int))") != 0)
    )
    exact = prefiltered.join(
        F.broadcast(keys), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


@register(
    "join_asof_tolerance",
    oracle=f"""
    {EVENTS_CTE},
    p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    c AS (SELECT * FROM ev WHERE event_type = 'click'),
    m AS (
        SELECT p.event_id AS p_id, c.event_id AS c_id,
               epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT p.event_id AS p_id, p.user_id AS user_id,
           CASE WHEN m.gap_ms <= 3600000 THEN m.c_id END AS c_id,
           CASE WHEN m.gap_ms <= 3600000
                THEN round(m.gap_ms / 1000.0, 4) END AS gap_s
    FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON p.event_id = m.p_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH A TOLERANCE BOUND (pandas `merge_asof(tolerance=…)`
    semantics): latest click ≤ each purchase per user, but only if it
    happened within the last hour — otherwise the purchase keeps a NULL
    match instead of silently pairing with a stale click from days ago.
    This is the variant replication and attribution pipelines actually
    want: `join_asof_click_before_purchase` answers "what was last", this
    answers "what was last AND still relevant", and EVERY purchase
    appears in the output exactly once (left-join semantics), matched or
    not.

    Same union-interleave merge shape as the unbounded as-of (one
    user_id shuffle, O(n log n) per user, no pair blowup); the tolerance
    is a pure filter on the carried struct, applied AFTER the carry so a
    too-old click nulls the match rather than letting an even older one
    through. Gap math in integer epoch-millis; the one division is by
    1000.0, exact to round(4)."""
    ev = load_table(spark, sf_dir, "events")
    merged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click = F.when(F.col("kind") == 0, F.struct("ts", "event_id"))
    gap_ms = F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(
        F.col("last_click.ts").cast("timestamp")
    )
    in_tol = F.col("last_click").isNotNull() & (gap_ms <= 3600000)
    return (
        merged.withColumn("last_click", F.last(click, ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.when(in_tol, F.col("last_click.event_id")).alias("c_id"),
            F.when(in_tol, F.round(gap_ms / 1000.0, 4)).alias("gap_s"),
        )
    )


@register(
    "join_nearest_event",
    oracle=f"""
    {EVENTS_CTE},
    p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
          FROM ev WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS c_id, user_id, ts AS c_ts
          FROM ev WHERE event_type = 'click'),
    cand AS (
        SELECT p.p_id, p.user_id, c.c_id,
               epoch_ms(c.c_ts) - epoch_ms(p.p_ts) AS delta_ms,
               abs(epoch_ms(c.c_ts) - epoch_ms(p.p_ts)) AS abs_ms,
               CASE WHEN c.c_ts <= p.p_ts THEN 0 ELSE 1 END AS side
        FROM p JOIN c ON p.user_id = c.user_id
         AND abs(epoch_ms(c.c_ts) - epoch_ms(p.p_ts)) <= 3600000
    ),
    best AS (
        SELECT p_id, user_id, c_id, delta_ms,
               row_number() OVER (
                   PARTITION BY p_id
                   ORDER BY abs_ms, side,
                            CASE WHEN side = 0 THEN -c_id ELSE c_id END) AS rn
        FROM cand
    )
    SELECT p.p_id, p.user_id,
           b.c_id AS nearest_click_id,
           b.delta_ms
    FROM p LEFT JOIN best b ON p.p_id = b.p_id AND b.rn = 1
    """,
)
def join_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor temporal join, BOTH directions: each purchase is
    matched to its nearest click within ±1 hour — before OR after —
    preferring the smaller |Δt|, ties toward the latest preceding click,
    then the earliest following one. The symmetric sibling of the as-of
    join (`join_asof_click_before_purchase` is backward-only): the shape
    used for sensor alignment and "which touchpoint was closest to the
    conversion" attribution. Purchases with no click in the window keep
    NULLs (left-total).

    The ORACLE states the banded interval join + per-purchase argmin;
    the Spark plan is the union-interleave MERGE: one (user_id) shuffle,
    clicks and purchases sort together, a backward carry (`last`
    ignorenulls, same-ts clicks sorting before the purchase) and a
    forward carry (`first` ignorenulls over the following frame) land
    both candidates on each purchase row, and a row-local comparison
    picks the nearer — O(n log n) per user, NO (purchase × candidate)
    pair blowup, the only formulation that survives dense event streams
    at 100 TB."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    merged = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    )
    order = [F.col("ts"), F.col("kind"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click = F.when(F.col("kind") == 0, F.struct("ts", "event_id"))
    ems = F.unix_millis(F.col("ts"))
    rows = (
        merged.withColumn("back", F.last(click, ignorenulls=True).over(wb))
        .withColumn("fwd", F.first(click, ignorenulls=True).over(wf))
        .filter(F.col("kind") == 1)
    )
    back_d = ems - F.unix_millis(F.col("back.ts"))
    fwd_d = F.unix_millis(F.col("fwd.ts")) - ems
    use_back = F.col("back").isNotNull() & (
        F.col("fwd").isNull() | (back_d <= fwd_d)
    )
    chosen_id = F.when(use_back, F.col("back.event_id")).otherwise(
        F.col("fwd.event_id")
    )
    chosen_delta = F.when(use_back, -back_d).otherwise(fwd_d)
    in_window = F.abs(chosen_delta) <= 3600000
    return rows.select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.when(in_window, chosen_id).alias("nearest_click_id"),
        F.when(in_window, chosen_delta).alias("delta_ms"),
    )


@register(
    "join_asof_forward",
    oracle=f"""
    {EVENTS_CTE}
    SELECT p_id, user_id, c_id, gap_s FROM (
        SELECT p.event_id AS p_id, p.user_id AS user_id, c.event_id AS c_id,
               round((epoch_ms(c.ts) - epoch_ms(p.ts)) / 1000.0, 4) AS gap_s,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts ASC, c.event_id ASC) AS rn
        FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM ev WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts >= p.ts
    ) WHERE rn = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: the EARLIEST click ≥ each purchase per user —
    the direction='forward' twin of `join_asof_click_before_purchase`
    (post-purchase re-engagement: how soon does the user come back).
    Together the pair covers pandas' merge_asof backward/forward
    semantics on Spark.

    Shape: the same union-interleave merge, mirrored — one per-user
    sequence sorted by (ts, kind, event_id) with purchases ordering
    BEFORE same-timestamp clicks (kind 0 < 1) so the inclusive ``>=``
    bound holds, and a ``first(click, ignorenulls)`` window over the
    FOLLOWING frame carries the next click back onto each purchase row.
    One shuffle on user_id, O(n log n) per user, no pair blowup —
    identical cost profile to the backward variant at any scale."""
    ev = load_table(spark, sf_dir, "events")
    # kind 0 = purchase, 1 = click: purchases order before equal-ts clicks
    merged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click = F.when(F.col("kind") == 1, F.struct("ts", "event_id"))
    return (
        merged.withColumn("next_click", F.first(click, ignorenulls=True).over(w))
        .filter((F.col("kind") == 0) & F.col("next_click").isNotNull())
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("next_click.event_id").alias("c_id"),
            F.round(
                (F.unix_millis(F.col("next_click.ts").cast("timestamp"))
                 - F.unix_millis(F.col("ts").cast("timestamp"))) / 1000.0,
                4,
            ).alias("gap_s"),
        )
    )


@register(
    "join_interval_overlap",
    oracle=f"""
    {EVENTS_CTE},
    marks AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) > 1800000
                    THEN 1 ELSE 0 END AS new_s
        FROM ev
    ),
    sessions AS (
        SELECT user_id, session_id,
               min(epoch_ms(ts)) AS s_start, max(epoch_ms(ts)) AS s_end
        FROM (
            SELECT user_id, ts,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_id
            FROM marks
        )
        GROUP BY 1, 2
    ),
    emarks AS (
        SELECT ts, event_id,
               CASE WHEN lag(ts) OVER (ORDER BY ts, event_id) IS NULL
                      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (ORDER BY ts, event_id))
                         > 600000
                    THEN 1 ELSE 0 END AS new_i
        FROM ev WHERE event_type = 'error'
    ),
    incidents AS (
        SELECT incident_id,
               min(epoch_ms(ts)) AS i_start, max(epoch_ms(ts)) AS i_end
        FROM (
            SELECT ts,
                   CAST(sum(new_i) OVER (ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS incident_id
            FROM emarks
        )
        GROUP BY 1
    ),
    sb AS (SELECT s.*, unnest(range(s_start // 3600000, s_end // 3600000 + 1))
                       AS bucket
           FROM sessions s),
    ib AS (SELECT i.*, unnest(range(i_start // 3600000, i_end // 3600000 + 1))
                       AS bucket
           FROM incidents i),
    pairs AS (
        SELECT DISTINCT sb.user_id, sb.session_id, ib.incident_id,
               sb.s_start, sb.s_end, ib.i_start, ib.i_end
        FROM sb JOIN ib ON sb.bucket = ib.bucket
        WHERE sb.s_start <= ib.i_end AND ib.i_start <= sb.s_end
    )
    SELECT user_id, session_id, incident_id,
           round((least(s_end, i_end) - greatest(s_start, i_start)) / 1000.0, 4)
               AS overlap_s
    FROM pairs
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join (the temporal join proper): user sessions
    (30-min-gap sessionization) against global error INCIDENTS
    (10-min-gap clustering of error events) — which sessions were
    exposed to which outage windows, and for how long. Distinct from
    `join_interval_bucketed` (point-in-interval): both sides here are
    intervals, the classic hard case for relational engines.

    Plan shape: each interval explodes to its covered HOUR buckets
    (sequence inside the scan stage), the candidate join is a bucket
    EQUI-join — never interval × interval — and the exact overlap
    predicate + DISTINCT collapse multi-bucket matches. At 100 TB the
    bucket width is the tuning dial (match it to median interval
    length so each interval lands in O(1) buckets); skewed buckets
    (a global outage hour) split under AQE. Overlap seconds derive
    from integer epoch-millis min/max — one division under round(4)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_ms", F.unix_millis(F.col("ts").cast("timestamp"))
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts_ms").over(wu).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(wu) > 1800000),
        1,
    ).otherwise(0)
    sessions = (
        ev.withColumn("new_s", new_s)
        .withColumn(
            "session_id",
            F.sum("new_s")
            .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_ms").alias("s_start"),
            F.max("ts_ms").alias("s_end"),
        )
    )
    err = ev.filter(F.col("event_type") == "error")
    wg = Window.orderBy("ts", "event_id")
    new_i = F.when(
        F.lag("ts_ms").over(wg).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(wg) > 600000),
        1,
    ).otherwise(0)
    incidents = (
        err.withColumn("new_i", new_i)
        .withColumn(
            "incident_id",
            F.sum("new_i")
            .over(wg.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
        .groupBy("incident_id")
        .agg(
            F.min("ts_ms").alias("i_start"),
            F.max("ts_ms").alias("i_end"),
        )
    )
    hour = 3600000
    sb = sessions.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("s_start") / hour), F.floor(F.col("s_end") / hour)
            )
        ),
    )
    ib = incidents.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("i_start") / hour), F.floor(F.col("i_end") / hour)
            )
        ),
    )
    pairs = (
        sb.join(ib, "bucket")
        .filter(
            (F.col("s_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("s_end"))
        )
        .select(
            "user_id", "session_id", "incident_id",
            "s_start", "s_end", "i_start", "i_end",
        )
        .distinct()
    )
    return pairs.select(
        "user_id",
        "session_id",
        "incident_id",
        F.round(
            (F.least("s_end", "i_end") - F.greatest("s_start", "i_start")) / 1000.0,
            4,
        ).alias("overlap_s"),
    )


@register(
    "join_asof_nearest",
    oracle=f"""
    {EVENTS_CTE}
    SELECT p_id, user_id, c_id, direction, gap_s FROM (
        SELECT p.event_id AS p_id, p.user_id AS user_id, c.event_id AS c_id,
               CASE WHEN c.ts <= p.ts THEN 'backward' ELSE 'forward' END
                   AS direction,
               round(abs(epoch_ms(c.ts) - epoch_ms(p.ts)) / 1000.0, 4) AS gap_s,
               row_number() OVER (PARTITION BY p.event_id
                   ORDER BY abs(epoch_ms(c.ts) - epoch_ms(p.ts)),
                            CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
                            CASE WHEN c.ts <= p.ts THEN -c.event_id
                                 ELSE c.event_id END) AS rn
        FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM ev WHERE event_type = 'click') c
          ON p.user_id = c.user_id
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: the click closest in time to each purchase in
    EITHER direction, ties to the backward side — completing pandas'
    merge_asof direction=backward/forward/nearest triple on Spark
    (`join_asof_click_before_purchase` / `join_asof_forward` are the
    other two).

    Tie rules (stated, deterministic): equal |gap| across directions →
    backward wins (the pandas convention); within a side, same-timestamp
    clicks resolve by event_id (max for backward, min for forward — the
    natural frame order of each window). A same-timestamp click counts
    as backward (gap 0) and is claimed by that side only.

    Shape: ONE union-interleave merge — clicks sort before equal-ts
    purchases (kind 0 < 1), a PRECEDING-frame `last(click)` carries the
    latest click ≤ ts onto each purchase and a FOLLOWING-frame
    `first(click)` the earliest click > ts; the winner is an integer-ms
    comparison between the two candidates. One shuffle on user_id,
    O(n log n) per user, no pair blowup — the oracle's per-user cross
    join is the semantic spec, not the plan. Exactness: gaps compared
    as integer epoch-ms, the one float division is round(4)."""
    ev = load_table(spark, sf_dir, "events")
    # kind 0 = click, 1 = purchase: equal-ts clicks order BEFORE the
    # purchase, so they sit in the PRECEDING frame (backward side) only.
    merged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    ww = Window.partitionBy("user_id").orderBy("ts_ms", "kind", "event_id")
    click = F.when(F.col("kind") == 0, F.struct("ts_ms", "event_id"))
    cand = (
        merged.withColumn(
            "prev_click",
            F.last(click, ignorenulls=True).over(
                ww.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "next_click",
            F.first(click, ignorenulls=True).over(
                ww.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            ),
        )
        .filter(F.col("kind") == 1)
    )
    bgap = F.col("ts_ms") - F.col("prev_click.ts_ms")
    fgap = F.col("next_click.ts_ms") - F.col("ts_ms")
    take_backward = F.col("prev_click").isNotNull() & (
        F.col("next_click").isNull() | (bgap <= fgap)
    )
    return (
        cand.filter(F.col("prev_click").isNotNull() | F.col("next_click").isNotNull())
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.when(take_backward, F.col("prev_click.event_id"))
            .otherwise(F.col("next_click.event_id"))
            .alias("c_id"),
            F.when(take_backward, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
            F.round(
                F.when(take_backward, bgap).otherwise(fgap) / 1000.0, 4
            ).alias("gap_s"),
        )
    )

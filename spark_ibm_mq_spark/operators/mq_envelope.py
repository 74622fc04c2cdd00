"""MQ envelope semantics as batch operators (SURVEY.md §7 M2).

The reference turns every MQ message into the JSON envelope
``[{"key": "<putMillis>_<seqNo>"}, {"value": "<body>"}]``
(IBMMQReceiver.java:256-264) with a monotone unique key
(putDateTime→millis at :250, seqNo at :251, collision repair at :252-254).
These queries re-express that record model — build, decompose, repair,
ordered replay, latest-wins, gap detection — over the `events` fixture,
which stands in for the message stream (TESTDATA.md).

Scale notes: key synthesis is embarrassingly parallel (no shuffle). The
collision repair and replay operators shuffle once on their window key; the
reference instead bought global order with a single receiver (README.md:60-65)
— here total order is demanded only at the final sort, and per-key order is
the default contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from spark_ibm_mq_spark.operators.projections import EVENTS_CTE
from spark_ibm_mq_spark.registry import register
from spark_ibm_mq_spark.tables import load_table


def with_envelope(ev: DataFrame) -> DataFrame:
    """Add the reference's record model to an events frame: put_ts, seq_no,
    and the string key `<putMillis>_<seqNo>` (IBMMQReceiver.java:259)."""
    put_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return ev.select(
        F.concat(put_ms.cast("string"), F.lit("_"), F.col("event_id").cast("string")).alias("key"),
        F.col("props").alias("value"),
        F.col("ts").alias("put_ts"),
        F.col("event_id").alias("seq_no"),
        "user_id",
        "event_type",
    )


@register(
    "mq_envelope_build",
    oracle=f"""
    {EVENTS_CTE}
    SELECT concat(CAST(epoch_ms(ts) AS VARCHAR), '_', CAST(event_id AS VARCHAR)) AS key,
           props AS value
    FROM ev
    """,
)
def mq_envelope_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4/R5 envelope projection: (key = putMillis_seqNo, value = body)."""
    ev = load_table(spark, sf_dir, "events")
    return with_envelope(ev).select("key", "value")


@register(
    "mq_key_decompose",
    oracle=f"""
    {EVENTS_CTE}
    SELECT key,
           CAST(string_split(key, '_')[1] AS BIGINT) AS put_ms,
           CAST(string_split(key, '_')[2] AS BIGINT) AS seq_no,
           make_timestamp(CAST(string_split(key, '_')[1] AS BIGINT) * 1000) AS put_ts_ms
    FROM (SELECT concat(CAST(epoch_ms(ts) AS VARCHAR), '_', CAST(event_id AS VARCHAR)) AS key
          FROM ev)
    """,
)
def mq_key_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse of the envelope: key → (put_ms, seq_no, put_ts) — the consumer
    ordering contract (README.md:59: keys order/dedup replicated rows)."""
    ev = load_table(spark, sf_dir, "events")
    env = with_envelope(ev).select("key")
    parts = F.split("key", "_")
    put_ms = F.element_at(parts, 1).cast("bigint")
    return env.select(
        "key",
        put_ms.alias("put_ms"),
        F.element_at(parts, 2).cast("bigint").alias("seq_no"),
        F.timestamp_millis(put_ms).cast("timestamp_ntz").alias("put_ts_ms"),
    )


@register(
    "mq_seq_repair",
    oracle=f"""
    {EVENTS_CTE}
    SELECT event_id,
           put_ms,
           seq_no,
           concat(CAST(put_ms AS VARCHAR), '_', CAST(seq_no AS VARCHAR)) AS key
    FROM (
        SELECT event_id,
               epoch_ms(date_trunc('second', ts)) AS put_ms,
               row_number() OVER (PARTITION BY date_trunc('second', ts)
                                  ORDER BY event_id) AS seq_no
        FROM ev
    )
    """,
)
def mq_seq_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 sequence-collision repair, batch form: messages sharing a put
    timestamp get synthesized monotone seq numbers — exactly
    `if (lastTs == putMs && seqNo == 1) seqNo = lastSeqNo + 1`
    (IBMMQReceiver.java:252-254) as `row_number() OVER (PARTITION BY put_ts)`.
    Second-granularity trunc manufactures the collisions the reference guards
    against."""
    ev = load_table(spark, sf_dir, "events")
    put_s = F.date_trunc("second", "ts")
    w = Window.partitionBy(put_s).orderBy("event_id")
    put_ms = F.unix_millis(put_s.cast("timestamp"))
    return ev.select(
        "event_id",
        put_ms.alias("put_ms"),
        F.row_number().over(w).alias("seq_no"),
    ).withColumn(
        "key",
        F.concat(F.col("put_ms").cast("string"), F.lit("_"), F.col("seq_no").cast("string")),
    )


@register(
    "mq_ordered_replay",
    oracle=f"""
    {EVENTS_CTE}
    SELECT concat(CAST(epoch_ms(ts) AS VARCHAR), '_', CAST(event_id AS VARCHAR)) AS key,
           props AS value,
           event_type
    FROM ev
    ORDER BY ts, event_id
    LIMIT 100
    """,
)
def mq_ordered_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered replay: ORDER BY (put_ts, seq_no) — the total order the
    reference guarantees with its monotone key (IBMMQReceiver.java:259,
    README.md:59-69). LIMIT makes it TakeOrderedAndProject, not a full sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        with_envelope(ev)
        .orderBy("put_ts", "seq_no")
        .select("key", "value", "event_type")
        .limit(100)
    )


@register(
    "mq_latest_wins",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id, event_type, value AS latest_value, event_id AS latest_seq FROM (
        SELECT user_id, event_type, value, event_id,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
    ) WHERE rn = 1
    """,
)
def mq_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication latest-row-wins: newest record per replication key —
    the DB2QREP consumption pattern the reference targets (README.md:59)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("latest_value"),
            F.col("event_id").alias("latest_seq"),
        )
    )


@register(
    "mq_gap_detect",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id, event_id, prev_id, gap FROM (
        SELECT user_id, event_id,
               lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
               event_id - lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM ev
    ) WHERE gap >= 500
    """,
)
def mq_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection via lag() — generalizes the reference's
    lastSeqNo bookkeeping (IBMMQReceiver.java:266-267) into a loss monitor
    (its telemetry prints received-vs-committed for the same purpose,
    IBMMQReceiver.java:481-522)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_id").over(w).alias("prev_id"),
            (F.col("event_id") - F.lag("event_id").over(w)).alias("gap"),
        )
        .filter(F.col("gap") >= 500)
    )


@register(
    "mq_scd2_history",
    oracle=f"""
    {EVENTS_CTE}
    SELECT user_id,
           event_type AS state,
           ts         AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
               AS is_current,
           event_id   AS change_seq
    FROM ev
    """,
)
def mq_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build — the other half of the replication contract: where
    `mq_latest_wins` keeps only the newest row per key (README.md:59's
    DB2QREP pattern), a warehouse consumer turns the SAME ordered change
    stream into slowly-changing-dimension rows with validity intervals:
    [valid_from, valid_to) = this change's put time until the next change
    for the key, open-ended (is_current) for the newest. One window over
    the reference's total order (put_ts, seq_no → ts, event_id;
    IBMMQReceiver.java:259) — a single shuffle on the replication key, and
    at 100 TB the interval build stays one pass because `lead` needs no
    second join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("event_id").alias("change_seq"),
    )


@register(
    "mq_scd2_point_in_time",
    oracle=f"""
    {EVENTS_CTE},
    scd2 AS (
        SELECT user_id, event_type AS state, ts AS vf, event_id,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
        FROM ev WHERE event_type <> 'purchase'
    ),
    p AS (
        SELECT event_id AS p_id, user_id, ts
        FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.p_id, p.user_id, s.state AS state_at_purchase,
           s.event_id AS change_seq
    FROM p LEFT JOIN scd2 s
      ON p.user_id = s.user_id
     AND p.ts >= s.vf AND (s.vt IS NULL OR p.ts < s.vt)
    """,
)
def mq_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history — the READ
    side of the replication contract `mq_scd2_history` builds: each fact
    (purchase) is joined to the dimension state that was valid AT ITS
    TIMESTAMP — [valid_from, valid_to) containment over the non-purchase
    change stream — the as-of semantics every warehouse query against a
    slowly-changing dimension needs (joining "current" state instead
    silently rewrites history). Facts preceding any change keep a NULL
    state (left-total).

    The ORACLE states the interval-containment join; the Spark plan is
    the union-interleave merge (`join_asof_click_before_purchase` shape):
    changes and facts merge into one per-user sequence — changes sorting
    before same-ts facts for the inclusive lower bound, later same-ts
    changes superseding earlier (zero-width intervals) — and one
    ignorenulls carry window lands the valid state on every fact row.
    One user_id shuffle, O(n log n) per user, no interval pair blowup —
    at 100 TB this is the only PIT formulation that never materializes
    (fact × candidate-interval) candidates."""
    ev = load_table(spark, sf_dir, "events")
    merged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    change = F.when(
        F.col("kind") == 0, F.struct("event_type", "event_id")
    )
    return (
        merged.withColumn("last_change", F.last(change, ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.col("last_change.event_type").alias("state_at_purchase"),
            F.col("last_change.event_id").alias("change_seq"),
        )
    )


# ---------------------------------------------------------------------------
# CDC with deletes — the missing read-side of the replication contract
# (VERDICT r7 "what's missing" #2). The reference's target use case is
# DB2QREP-style replication (/root/reference/README.md:59), whose change
# streams carry op codes; `mq_latest_wins`/`mq_scd2_history` model only
# insert/update. The three operators below add the tombstone semantics:
# a keyed apply where the newest op may DELETE the key, an SCD2 build
# where a delete CLOSES validity without opening a row, and the
# batch-compaction collapse (Debezium/Delta-CDF style) of a change run
# into its net effect. Op codes derive deterministically from the fixture:
# signup→I, error→D (the poison/retract path), click/view/purchase→U.
# ---------------------------------------------------------------------------

_CDC_CTE = f"""
    {EVENTS_CTE},
    cdc AS (
        SELECT user_id, ts, event_id AS seq,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error'  THEN 'D'
                               ELSE 'U' END AS op,
               value
        FROM ev
    )
"""


def _with_cdc_ops(ev: DataFrame) -> DataFrame:
    """Project the events stream as a keyed CDC change stream
    (user_id key, I/U/D op, monotone (ts, seq) change ordinal)."""
    return ev.select(
        "user_id",
        "ts",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
    )


@register(
    "mq_cdc_apply",
    oracle=_CDC_CTE + """,
    ranked AS (
        SELECT user_id, seq, op, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, seq DESC) AS rn
        FROM cdc
    ),
    counts AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_changes,
               CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_deletes
        FROM cdc GROUP BY user_id
    )
    SELECT r.user_id, r.value AS latest_value, r.seq AS latest_seq,
           c.n_changes, c.n_deletes
    FROM ranked r JOIN counts c ON r.user_id = c.user_id
    WHERE r.rn = 1 AND r.op <> 'D'
    """,
)
def mq_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC keyed apply WITH tombstones: materialize the target-table
    snapshot a change stream implies — newest change per replication key
    wins (README.md:59's DB2QREP pattern, `mq_latest_wins`), except that
    when the newest op is a DELETE the key is ABSENT from the snapshot
    (a tombstone removes the row instead of updating it). Keys the
    stream created and later deleted simply don't appear — the behavior
    `mq_latest_wins` cannot express. Audit columns (n_changes,
    n_deletes) ride along for replication monitoring.

    Plan shape: ONE hash aggregation on the replication key — the
    newest change is a `max(struct(ts, seq, op, value))` ordinal (the
    r7 struct-ordinal convention: (ts, seq) is unique, so later fields
    never break ties) computed in the same partial-aggregable pass as
    the counts; the tombstone filter is a post-agg row predicate. No
    window, no join, one shuffle of pre-combined partials — at 100 TB
    this is the minimal-movement formulation (the oracle's
    row_number + join states the same fixpoint relationally)."""
    ev = load_table(spark, sf_dir, "events")
    latest = F.max(F.struct("ts", "seq", "op", "value")).alias("last")
    return (
        _with_cdc_ops(ev)
        .groupBy("user_id")
        .agg(
            latest,
            F.count(F.lit(1)).alias("n_changes"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
            .cast("bigint")
            .alias("n_deletes"),
        )
        .filter(F.col("last.op") != "D")
        .select(
            "user_id",
            F.col("last.value").alias("latest_value"),
            F.col("last.seq").alias("latest_seq"),
            "n_changes",
            "n_deletes",
        )
    )


@register(
    "mq_scd2_history_with_deletes",
    oracle=_CDC_CTE + """
    SELECT user_id,
           value AS state_value,
           ts    AS valid_from,
           vt    AS valid_to,
           COALESCE(nop = 'D', FALSE) AS closed_by_delete,
           (vt IS NULL) AS is_current,
           seq AS change_seq
    FROM (
        SELECT user_id, ts, seq, op, value,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, seq) AS vt,
               lead(op) OVER (PARTITION BY user_id ORDER BY ts, seq) AS nop
        FROM cdc
    )
    WHERE op <> 'D'
    """,
)
def mq_scd2_history_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build honoring tombstones — `mq_scd2_history` one op
    code further: a DELETE closes the previous version's validity
    interval (valid_to = delete time, closed_by_delete = true) but opens
    NO new row, so the key has a validity GAP until its next I/U — the
    semantics a warehouse dimension needs when the source row was
    genuinely dropped (the insert-only build would instead keep the
    dead state "current" forever). Delete changes themselves emit no
    rows; is_current marks versions no later change of any kind closed.

    Plan shape: identical cost to the insert-only build — ONE window
    over the reference's total order (put_ts, seq_no →
    IBMMQReceiver.java:259) computing lead(ts) AND lead(op) in the same
    frame, then a row-local filter drops the tombstones. Single shuffle
    on the replication key; at 100 TB the interval build stays one
    pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "seq")
    cdc = _with_cdc_ops(ev)
    nxt_ts = F.lead("ts").over(w)
    nxt_op = F.lead("op").over(w)
    return (
        cdc.select(
            "user_id",
            "op",
            F.col("value").alias("state_value"),
            F.col("ts").alias("valid_from"),
            nxt_ts.alias("valid_to"),
            F.coalesce(nxt_op == F.lit("D"), F.lit(False)).alias(
                "closed_by_delete"
            ),
            nxt_ts.isNull().alias("is_current"),
            F.col("seq").alias("change_seq"),
        )
        .filter(F.col("op") != "D")
        .drop("op")
    )


@register(
    "mq_cdc_collapse",
    oracle=_CDC_CTE + """
    SELECT user_id,
           first(op ORDER BY ts, seq) AS first_op,
           last(op ORDER BY ts, seq)  AS last_op,
           CASE WHEN last(op ORDER BY ts, seq) = 'D'
                 AND first(op ORDER BY ts, seq) = 'I' THEN 'transient'
                WHEN last(op ORDER BY ts, seq) = 'D' THEN 'delete'
                WHEN first(op ORDER BY ts, seq) = 'I' THEN 'insert'
                ELSE 'update' END AS net_op,
           CAST(count(*) AS BIGINT) AS n_changes
    FROM cdc GROUP BY user_id
    """,
)
def mq_cdc_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC batch compaction: collapse each key's run of changes into the
    single NET operation a downstream MERGE needs (Debezium "event
    flattening" / Delta CDF compaction): created-then-deleted within the
    batch → `transient` (emit nothing), ends in a tombstone → `delete`,
    begins with its creation → `insert`, else `update`. Shipping the
    collapsed frame instead of the raw stream turns an O(changes)
    downstream merge into an O(keys) one — the standard trick when a
    replication batch touches each hot key many times.

    Plan shape: ONE hash aggregation — first/last ops are
    min/max(struct(ts, seq, op)) ordinals ((ts, seq) unique, so the op
    field never decides), both partial-aggregable, so the shuffle moves
    one pre-combined row per key per map task. The net_op CASE is a
    post-agg row-local expression."""
    ev = load_table(spark, sf_dir, "events")
    first_op = F.min(F.struct("ts", "seq", "op"))["op"]
    last_op = F.max(F.struct("ts", "seq", "op"))["op"]
    return (
        _with_cdc_ops(ev)
        .groupBy("user_id")
        .agg(
            first_op.alias("first_op"),
            last_op.alias("last_op"),
            F.count(F.lit(1)).alias("n_changes"),
        )
        .select(
            "user_id",
            "first_op",
            "last_op",
            F.when(
                (F.col("last_op") == "D") & (F.col("first_op") == "I"),
                "transient",
            )
            .when(F.col("last_op") == "D", "delete")
            .when(F.col("first_op") == "I", "insert")
            .otherwise("update")
            .alias("net_op"),
            "n_changes",
        )
    )

"""Exact-gap boundary tests for the alert-debounce twins (ADVICE r10).

The fixtures never produce a gap of EXACTLY 15 minutes, so driver parity
alone cannot distinguish `> 15 min` from `>= 15 min`. These tests build a
synthetic events.parquet whose error stream hits the boundary dead-on and
assert all three formulations agree on the convention, which this test
SETTLED EMPIRICALLY: Spark's session_window MERGES sessions whose ranges
touch — an event at exactly `session start + gap` CONTINUES the session —
so an exact 900000 ms gap stays in the SAME burst and both twins use
strict `>`.  (The r10 ADVICE hypothesized end-exclusive gaps, i.e. `>=`;
running the real session_window here refuted that.)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE_MS = 1_700_000_000_000  # arbitrary fixed epoch anchor
GAP_MS = 900_000  # exactly 15 minutes


@pytest.fixture(scope="module")
def boundary_dir(tmp_path_factory):
    """A minimal fixture dir: one user's error stream with gaps of exactly
    15 min (boundary → SAME burst, the verified merge-touching rule), just
    under (same burst), and well over (split), plus a non-error row that
    must be filtered out."""
    d = tmp_path_factory.mktemp("boundary_events")
    ts_ms = [
        BASE_MS,  # burst 1, event 1
        BASE_MS + 60_000,  # burst 1, event 2 (1 min later)
        BASE_MS + 60_000 + GAP_MS,  # EXACT 15-min gap → stays in burst 1
        BASE_MS + 60_000 + GAP_MS + GAP_MS - 1,  # 1 ms under → burst 1 too
        BASE_MS + 60_000 + 2 * GAP_MS + 3_600_000,  # >15 min later → burst 2
    ]
    rows = {
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [7, 7, 7, 7, 7, 7],
        "event_type": ["error"] * 5 + ["view"],
        "value": [1.0] * 6,
        "props": ["{}"] * 6,
    }
    # timestamp('us') from ms integers: multiply by 1000 first
    rows["ts"] = pa.array([t * 1000 for t in ts_ms] + [(BASE_MS + 30_000) * 1000],
                          type=pa.timestamp("us"))
    pq.write_table(pa.table(rows), os.path.join(str(d), "events.parquet"))
    return str(d)


EXPECT_BURSTS = [
    # (alert_event_id, suppressed, burst_span_s): events 1-4 are ONE burst
    # (the exact 15-min gap between events 2 and 3 does NOT split it; the
    # 1 ms-under gap to event 4 obviously doesn't either), event 5 follows
    # a >15-min gap and opens the second burst.
    (1, 4, (60_000 + GAP_MS + GAP_MS - 1) / 1000.0),
    (5, 1, 0.0),
]


def _canon(rows):
    return sorted((r["alert_event_id"], r["suppressed"], r["burst_span_s"]) for r in rows)


def test_batch_debounce_keeps_exact_gap_in_burst(spark, boundary_dir):
    from spark_ibm_mq_spark.operators.events_analytics import events_alert_debounce

    got = _canon(r.asDict() for r in events_alert_debounce(spark, boundary_dir).collect())
    assert got == EXPECT_BURSTS


def test_stream_debounce_keeps_exact_gap_in_burst(spark, boundary_dir):
    """session_window('15 minutes') is the semantics AUTHORITY here: the
    event at exactly start+gap continues the session (touching ranges
    merge) — the empirical fact the strict-`>` convention mirrors."""
    from spark_ibm_mq_spark.operators.streaming_analytics import stream_alert_debounce

    got = _canon(r.asDict() for r in stream_alert_debounce(spark, boundary_dir).collect())
    assert got == EXPECT_BURSTS


def test_duckdb_oracles_agree_at_boundary(boundary_dir):
    import duckdb

    from spark_ibm_mq_spark import registry

    registry.load_all_modules()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(boundary_dir, 'events.parquet')}'"
    )
    for name in ("events_alert_debounce", "stream_alert_debounce"):
        rows = con.execute(registry.ORACLE[name]).fetch_arrow_table().to_pylist()
        assert _canon(rows) == EXPECT_BURSTS, name


GAP30_MS = 1_800_000  # exactly 30 minutes — the session-window family gap


@pytest.fixture(scope="module")
def boundary30_dir(tmp_path_factory):
    """Exact-30-min-gap stream for the session-window family (gap 30 min):
    events 1-2 touch the boundary dead-on, event 3 is 1 ms past it."""
    d = tmp_path_factory.mktemp("boundary30_events")
    ts_ms = [BASE_MS, BASE_MS + GAP30_MS, BASE_MS + 2 * GAP30_MS + 1]
    rows = {
        "event_id": [1, 2, 3],
        "ts": pa.array([t * 1000 for t in ts_ms], type=pa.timestamp("us")),
        "user_id": [9, 9, 9],
        "event_type": ["view"] * 3,
        "value": [1.0] * 3,
        "props": ["{}"] * 3,
    }
    pq.write_table(pa.table(rows), os.path.join(str(d), "events.parquet"))
    return str(d)


def test_session_window_family_agrees_at_exact_gap(spark, boundary30_dir):
    """The 30-min family (streaming session_window, batch sessionize, and
    both oracles) all keep an exact-gap event in the SAME session: events
    1+2 merge (touching ranges), event 3 (1 ms past) opens a new one."""
    import duckdb

    from spark_ibm_mq_spark import registry
    from spark_ibm_mq_spark.operators.streaming_analytics import (
        stream_session_windows,
    )
    from spark_ibm_mq_spark.operators.windows import win_sessionize_events

    stream = sorted(
        (r["n_events"], ) for r in
        (x.asDict() for x in stream_session_windows(spark, boundary30_dir).collect())
    )
    batch = sorted(
        (r["n_events"], ) for r in
        (x.asDict() for x in win_sessionize_events(spark, boundary30_dir).collect())
    )
    assert stream == [(1,), (2,)], stream
    assert batch == [(1,), (2,)], batch
    registry.load_all_modules()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(boundary30_dir, 'events.parquet')}'"
    )
    for name in ("stream_session_windows", "win_sessionize_events"):
        rows = con.execute(registry.ORACLE[name]).fetch_arrow_table().to_pylist()
        assert sorted(r["n_events"] for r in rows) == [1, 2], name

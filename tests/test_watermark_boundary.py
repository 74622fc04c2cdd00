"""Exact-equality watermark-eviction boundary for the append-mode
session twin (the companion to tests/test_debounce_boundary.py's gap
boundary): the oracle's eviction predicate is `session_end <= watermark`
— emit at exact equality — and this test pins that Spark's append-mode
session_window does the same, EMPIRICALLY, with a session whose end
lands on the final watermark to the microsecond.

Layout: user 1's session ends at t0+40min; user 2's lone event at
t0+50min sets max(ts), so the final watermark (10-min delay) is exactly
user 1's session end. User 2's own open session (end t0+80min) must be
HELD BACK — the strict-greater side of the same boundary."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_ibm_mq_spark import registry

registry.load_all_modules()

BASE_MS = 1_700_000_000_000


@pytest.fixture(scope="module")
def wm_boundary_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wm_boundary")
    ts_ms = [BASE_MS, BASE_MS + 600_000, BASE_MS + 3_000_000]
    rows = {
        "event_id": [1, 2, 3],
        "user_id": [1, 1, 2],
        "event_type": ["view"] * 3,
        "value": [1.0] * 3,
        "props": ["{}"] * 3,
    }
    rows["ts"] = pa.array([t * 1000 for t in ts_ms], type=pa.timestamp("us"))
    pq.write_table(pa.table(rows), os.path.join(str(d), "events.parquet"))
    return str(d)


def test_session_emitted_at_exact_watermark_equality(spark, wm_boundary_dir):
    got = sorted(
        (r["user_id"], r["n_events"])
        for r in (
            x.asDict()
            for x in registry.QUERIES["stream_session_windows_append"](
                spark, wm_boundary_dir
            ).collect()
        )
    )
    # user 1's session end == final watermark → EMITTED;
    # user 2's session end (t0+80min) > watermark → held back
    assert got == [(1, 2)]


def test_oracle_matches_at_exact_watermark_equality(wm_boundary_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(wm_boundary_dir, 'events.parquet')}'"
    )
    rows = con.execute(
        registry.ORACLE["stream_session_windows_append"]
    ).fetch_arrow_table().to_pylist()
    assert sorted((r["user_id"], r["n_events"]) for r in rows) == [(1, 2)]

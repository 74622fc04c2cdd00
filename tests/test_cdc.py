"""Independent Python-replay invariants for the CDC-with-deletes family
(`mq_cdc_apply`, `mq_scd2_history_with_deletes`, `mq_cdc_collapse`).

Oracle parity alone can miss bugs both engines share (the r7 water-filling
lesson), so these tests replay the tombstone semantics row-by-row in plain
Python over the same fixture and assert the contracts directly."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _changes():
    """The fixture's events as (user_id → ordered [(ts, seq, op, value)])."""
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet")).to_pylist()
    op_of = {"signup": "I", "error": "D"}
    per_key: dict[int, list] = {}
    for r in t:
        per_key.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], op_of.get(r["event_type"], "U"), r["value"])
        )
    for runs in per_key.values():
        runs.sort(key=lambda x: (x[0], x[1]))
    return per_key


def test_cdc_apply_tombstone_removes_key(spark):
    from spark_ibm_mq_spark.operators.mq_envelope import mq_cdc_apply

    got = {r["user_id"]: r for r in mq_cdc_apply(spark, SF_DIR).collect()}
    for uid, runs in _changes().items():
        last_ts, last_seq, last_op, last_val = runs[-1]
        if last_op == "D":
            assert uid not in got, f"user {uid} deleted but present in snapshot"
        else:
            assert uid in got, f"user {uid} live but absent from snapshot"
            assert got[uid]["latest_seq"] == last_seq
            assert got[uid]["latest_value"] == last_val
            assert got[uid]["n_changes"] == len(runs)
            assert got[uid]["n_deletes"] == sum(1 for c in runs if c[2] == "D")
    # the fixture must actually exercise the tombstone branch
    assert any(runs[-1][2] == "D" for runs in _changes().values())


def test_scd2_deletes_close_without_opening(spark):
    from spark_ibm_mq_spark.operators.mq_envelope import (
        mq_scd2_history_with_deletes,
    )

    rows = mq_scd2_history_with_deletes(spark, SF_DIR).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
    changes = _changes()
    saw_delete_close = False
    for uid, vers in by_key.items():
        runs = changes[uid]
        nondel = [c for c in runs if c[2] != "D"]
        # exactly one version per non-delete change; deletes emit no rows
        assert len(vers) == len(nondel)
        nxt = {runs[i][1]: runs[i + 1] for i in range(len(runs) - 1)}
        for v in vers:
            follower = nxt.get(v["change_seq"])
            if follower is None:
                assert v["is_current"] and v["valid_to"] is None
                assert not v["closed_by_delete"]
            else:
                assert v["valid_to"] == follower[0]
                assert v["closed_by_delete"] == (follower[2] == "D")
                saw_delete_close |= follower[2] == "D"
    assert saw_delete_close, "fixture never closed a version by delete"


def test_cdc_collapse_net_op_classification(spark):
    from spark_ibm_mq_spark.operators.mq_envelope import mq_cdc_collapse

    got = {r["user_id"]: r for r in mq_cdc_collapse(spark, SF_DIR).collect()}
    for uid, runs in _changes().items():
        first_op, last_op = runs[0][2], runs[-1][2]
        if last_op == "D":
            want = "transient" if first_op == "I" else "delete"
        else:
            want = "insert" if first_op == "I" else "update"
        assert got[uid]["net_op"] == want
        assert got[uid]["first_op"] == first_op
        assert got[uid]["last_op"] == last_op

"""Arbitrary stateful streaming: the sequence-gap monitor
(reference R5 generalized — lastTs/lastSeqNo carry-over at
IBMMQReceiver.java:216-217,266-267 becomes explicit per-key state).

Uses applyInPandasWithState: per user_id, remember the last seen event_id
across micro-batches and emit one row per detected gap ≥ threshold. The
reference could only print aggregate received-vs-committed counts
(IBMMQReceiver.java:481-522); this emits the actual missing ranges.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_OUTPUT_SCHEMA = "user_id bigint, prev_id bigint, event_id bigint, gap bigint"
_STATE_SCHEMA = "last_id bigint"


def _gap_fn_factory(threshold: int):
    def detect_gaps(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        last_id = state.get[0] if state.exists else None
        out: list[tuple] = []
        for pdf in pdfs:
            for eid in sorted(int(x) for x in pdf["event_id"]):
                if last_id is not None and eid - last_id >= threshold:
                    out.append((user_id, last_id, eid, eid - last_id))
                last_id = eid
        state.update((last_id,))
        yield pd.DataFrame(out, columns=["user_id", "prev_id", "event_id", "gap"])

    return detect_gaps


def seq_gap_monitor(events: DataFrame, threshold: int = 500) -> DataFrame:
    """events (streaming or batch-tested via availableNow) → gap rows.
    State is one bigint per user: bounded, shuffle only on user_id."""
    return events.groupBy("user_id").applyInPandasWithState(
        _gap_fn_factory(threshold),
        outputStructType=GAP_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

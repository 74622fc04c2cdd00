"""File-backed fake IBM MQ broker.

Stands in for a queue manager so the `ibmmq` DataSource is testable without
a broker (SURVEY.md §5.2: "an in-memory queue stub implementing
get/browse/commit/backout"). File-backed rather than in-memory because the
DataSource reader runs in a separate Python worker process — state must
survive the process boundary.

Layout under a broker directory (one broker == one queue manager):

    <dir>/<queue>.jsonl    messages, one JSON object per line:
                           {"put_ms": <epoch millis>, "seq_no": <int>,
                            "body": <str>} or {"body_b64": <base64 bytes>}
                           (body_b64 exercises the CCSID/encoding path,
                            IBMMQReceiver.java:242-244)
    <dir>/<queue>.ack      int: messages destructively consumed (committed)
                           — the MQ-side effect of qmgr.commit()
                           (IBMMQReceiver.java:357-360)
    <dir>/<queue>.inhibit  exists → MQQA_GET_INHIBITED
                           (IBMMQReceiver.java:232-235,428)
    <dir>/<queue>.fail     exists → simulate a broken connection: reads
                           raise until the file is removed
                           (reconnect path, IBMMQReceiver.java:154-198)

Semantics:
- *browse* (keepMessages=true) reads never move `.ack`; a browse cursor is
  just a line position (MQOO_BROWSE / BROWSE_FIRST→NEXT,
  IBMMQReceiver.java:131-134,203-205).
- *destructive get* under syncpoint = read lines, then `ack(n)` on commit;
  crash before ack ⇒ the same lines are re-read (at-least-once, matching
  store→commit ordering, IBMMQReceiver.java:349-393).
"""

from __future__ import annotations

import base64
import json
import os
from collections.abc import Iterable


class FakeMQBroker:
    def __init__(self, path: str, queue: str = "DEV.QUEUE.1") -> None:
        self.path = path
        self.queue = queue
        os.makedirs(path, exist_ok=True)

    # ---- file paths ----
    def _f(self, suffix: str) -> str:
        return os.path.join(self.path, f"{self.queue}.{suffix}")

    # ---- producer side ----
    def put(self, put_ms: int, seq_no: int, body: str | bytes) -> None:
        rec: dict = {"put_ms": int(put_ms), "seq_no": int(seq_no)}
        if isinstance(body, bytes):
            rec["body_b64"] = base64.b64encode(body).decode("ascii")
        else:
            rec["body"] = body
        with open(self._f("jsonl"), "a", encoding="utf-8") as f:
            f.write(json.dumps(rec) + "\n")

    def put_all(self, messages: Iterable[tuple[int, int, str | bytes]]) -> None:
        with open(self._f("jsonl"), "a", encoding="utf-8") as f:
            for put_ms, seq_no, body in messages:
                rec: dict = {"put_ms": int(put_ms), "seq_no": int(seq_no)}
                if isinstance(body, bytes):
                    rec["body_b64"] = base64.b64encode(body).decode("ascii")
                else:
                    rec["body"] = body
                f.write(json.dumps(rec) + "\n")

    # ---- consumer side ----
    def messages(self, from_pos: int, limit: int | None = None) -> list[dict]:
        """Browse from an absolute queue position (line number). Destructive
        consumers pass from_pos >= acked()."""
        if self.connection_broken():
            raise ConnectionError(f"fake MQ: connection to {self.queue} is down")
        out: list[dict] = []
        qfile = self._f("jsonl")
        if not os.path.exists(qfile):
            return out
        with open(qfile, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i < from_pos:
                    continue
                if limit is not None and len(out) >= limit:
                    break
                out.append(json.loads(line))
        return out

    def message_block(
        self, from_pos: int, limit: int | None = None, byte_off: int | None = None
    ) -> bytes:
        """The same slice `messages()` returns, as the RAW newline-delimited
        JSON bytes — no per-line json.loads. The batch reader feeds this
        straight to pyarrow's C++ JSON parser (one columnar parse of the
        whole slice beats 10k+ Python dict materializations ~10×); the
        line-oriented layout makes byte slice == message slice. When the
        planner supplies ``byte_off`` (from `put_ms_index`'s offset scan),
        the read SEEKS there instead of skipping ``from_pos`` lines — each
        split costs O(its slice), not O(queue prefix), so N parallel splits
        read the queue once total rather than N/2 times."""
        if self.connection_broken():
            raise ConnectionError(f"fake MQ: connection to {self.queue} is down")
        qfile = self._f("jsonl")
        if not os.path.exists(qfile):
            return b""
        out: list[bytes] = []
        with open(qfile, "rb") as f:
            if byte_off is not None:
                f.seek(byte_off)
                for line in f:
                    if limit is not None and len(out) >= limit:
                        break
                    out.append(line)
            else:
                for i, line in enumerate(f):
                    if i < from_pos:
                        continue
                    if limit is not None and len(out) >= limit:
                        break
                    out.append(line)
        return b"".join(out)

    def put_ms_index(self, from_pos: int) -> list[int]:
        """Metadata-only scan: the put_ms of every message from ``from_pos``
        on, WITHOUT body decode or full JSON parse — used by the batch
        reader to plan put_ms-boundary splits driver-side. put()/put_all()
        always write ``put_ms`` as the first field, so a string slice
        suffices; any line that doesn't match falls back to json.loads."""
        return self.put_ms_index_with_offsets(from_pos)[0]

    def put_ms_index_with_offsets(
        self, from_pos: int
    ) -> tuple[list[int], list[int]]:
        """`put_ms_index` plus each message's BYTE offset in the queue file,
        so the planner can hand splits a seek position (see
        `message_block`)."""
        if self.connection_broken():
            raise ConnectionError(f"fake MQ: connection to {self.queue} is down")
        qfile = self._f("jsonl")
        if not os.path.exists(qfile):
            return [], []
        with open(qfile, "rb") as f:
            data = f.read()
        if not data:
            return [], []
        # Vectorized metadata scan (the planner runs this per batch job, so
        # it sits on the fixed-cost path the 50k-msg drain is bound by):
        # newline offsets via one numpy byte scan, put_ms values via one
        # pyarrow C++ JSON parse restricted to the put_ms field — no
        # per-line Python. ~8× the old find()-per-line loop at 50k msgs.
        import io

        import numpy as np
        import pyarrow as pa
        import pyarrow.json as pj

        arr = np.frombuffer(data, dtype=np.uint8)
        nl = np.flatnonzero(arr == 0x0A)
        if len(nl) == 0:  # single unterminated line
            starts = np.zeros(1, dtype=np.int64)
        else:
            starts = np.empty(len(nl), dtype=np.int64)
            starts[0] = 0
            starts[1:] = nl[:-1] + 1
            if nl[-1] != len(data) - 1:  # unterminated trailing line
                starts = np.append(starts, nl[-1] + 1)
        parsed = pj.read_json(
            io.BytesIO(data),
            parse_options=pj.ParseOptions(
                explicit_schema=pa.schema([("put_ms", pa.int64())]),
                unexpected_field_behavior="ignore",
            ),
        )
        col = parsed["put_ms"].combine_chunks()
        # Fail loudly on any broker-file anomaly (ADVICE r9): a blank line or
        # a record missing put_ms desyncs the newline-offset array from the
        # pyarrow record parse (and to_numpy on a null int64 raises a far
        # less diagnosable ArrowInvalid downstream). Cheap O(1)/O(n) checks.
        if col.null_count:
            raise ValueError(
                f"fake MQ: {col.null_count} record(s) in {qfile} missing put_ms"
            )
        ms = col.to_numpy()
        if len(ms) != len(starts):
            raise ValueError(
                f"fake MQ: {qfile} parsed {len(ms)} records but has "
                f"{len(starts)} non-empty lines — blank or malformed line in queue file"
            )
        return ms[from_pos:].tolist(), starts[from_pos:].tolist()

    @staticmethod
    def decode_body(rec: dict, encoding: str = "utf-8") -> str:
        if "body_b64" in rec:
            raw = base64.b64decode(rec["body_b64"])
            if encoding == "utf-16-mq":
                # IBM MQ CCSID 1200: honor a BOM if present, otherwise
                # default to BIG-endian — BOM-less MQ UTF-16 payloads are
                # conventionally BE, whereas Python's bare 'utf-16' would
                # silently assume LE and mojibake.
                if raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
                    return raw.decode("utf-16")
                return raw.decode("utf-16-be")
            return raw.decode(encoding)
        return rec["body"]

    def ack(self, upto_pos: int) -> None:
        """Destructively consume messages below upto_pos (monotone)."""
        cur = self.acked()
        if upto_pos > cur:
            tmp = self._f("ack.tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(str(int(upto_pos)))
            os.replace(tmp, self._f("ack"))

    def acked(self) -> int:
        try:
            with open(self._f("ack"), encoding="utf-8") as f:
                return int(f.read().strip() or 0)
        except FileNotFoundError:
            return 0

    # ---- queue state ----
    def depth(self) -> int:
        """Current queue depth (total puts − destructive consumes)."""
        qfile = self._f("jsonl")
        if not os.path.exists(qfile):
            return 0
        with open(qfile, encoding="utf-8") as f:
            total = sum(1 for _ in f)
        return total - self.acked()

    def get_inhibited(self) -> bool:
        return os.path.exists(self._f("inhibit"))

    def set_inhibited(self, flag: bool) -> None:
        if flag:
            open(self._f("inhibit"), "w").close()
        elif os.path.exists(self._f("inhibit")):
            os.remove(self._f("inhibit"))

    def connection_broken(self) -> bool:
        return os.path.exists(self._f("fail"))

    def set_connection_broken(self, flag: bool) -> None:
        if flag:
            open(self._f("fail"), "w").close()
        elif os.path.exists(self._f("fail")):
            os.remove(self._f("fail"))

    # ---- telemetry (reference R14, IBMMQReceiver.java:481-522) ----
    def stats(self) -> dict:
        return {
            "queue": self.queue,
            "depth": self.depth(),
            "acked": self.acked(),
            "get_inhibited": self.get_inhibited(),
            "connection_broken": self.connection_broken(),
        }

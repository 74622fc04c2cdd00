"""Decompose where mq_source_stream_drain / mq_source_destructive_drain
spend their time (r16 verdict task 5, guide §1).

The two drains are the largest untouched family in the committed record
(~8 s combined at sf0.1). Each is an availableNow micro-batch loop over
the `ibmmq` SimpleDataSourceStreamReader; candidate cost centers:

  a. broker fixture build (memoized per fixture — amortized in the bench)
  b. FakeMQBroker.depth() — one line scan of the queue file
  c. broker.messages() — per-line json.loads into Python dicts
  d. _rows_from_messages — per-row repair_seq + decode + datetime + tuple
  e. the streaming query itself (plan + driver-side python worker read +
     pickle boundary + parquet sink write + commit log)
  f. the per-iteration `spark.read.parquet(out).count()` done-check
  g. the final `spark.read.parquet(out)` the noop sink consumes

Phases c+d replicate what the stream reader's read() does internally, so
(c+d) vs (e) separates "Python row materialization" from "streaming
machinery". Run solo (fresh session), prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_ibm_mq_spark import registry  # noqa: E402
from spark_ibm_mq_spark.session import get_spark  # noqa: E402

registry.load_all_modules()

from spark_ibm_mq_spark.operators.mq_source import (  # noqa: E402
    _QUEUE,
    _broker_dir_for,
    _scratch,
)
from spark_ibm_mq_spark.sources import MQ_SCHEMA, FakeMQBroker, register_ibmmq  # noqa: E402
from spark_ibm_mq_spark.sources.mq import _Options, _rows_from_messages  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("decompose-mq-drains")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["pricing_summary"](spark, sf_dir).collect()
    registry.QUERIES["mq_source_batch_drain"](spark, sf_dir).limit(1).count()

    out: dict = {"sf_dir": sf_dir}

    t0 = time.perf_counter()
    d = _broker_dir_for(sf_dir)
    out["broker_fixture_sec"] = round(time.perf_counter() - t0, 4)

    broker = FakeMQBroker(d, _QUEUE)
    t0 = time.perf_counter()
    total = broker.depth()
    out["depth_sec"] = round(time.perf_counter() - t0, 4)
    out["n_msgs"] = total

    # c: raw per-line json.loads materialization (what read() calls today)
    t0 = time.perf_counter()
    msgs = broker.messages(0, total)
    out["messages_jsonloads_sec"] = round(time.perf_counter() - t0, 4)

    # d: the per-row python loop (repair + decode + datetime + tuple)
    t0 = time.perf_counter()
    rows, _, _ = _rows_from_messages(msgs, _QUEUE, "utf-8", 0, 0)
    out["rows_from_messages_sec"] = round(time.perf_counter() - t0, 4)
    out["n_rows"] = len(rows)
    del msgs, rows

    # e+f: one instrumented pass of the stream-drain loop body
    register_ibmmq(spark)
    work = _scratch("decompose_stream_drain_")
    sink, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
    reader = (
        spark.readStream.format("ibmmq")
        .schema(MQ_SCHEMA)
        .option("path", d)
        .option("queue", _QUEUE)
        .option("keepMessages", "true")
        .option("maxMessagesPerBatch", str(max(total, 1)))
    )
    runs = []
    for i in range(8):
        t0 = time.perf_counter()
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t_q = time.perf_counter() - t0
        t0 = time.perf_counter()
        done = spark.read.parquet(sink).count() >= total
        t_chk = time.perf_counter() - t0
        runs.append(
            {"stream_query_sec": round(t_q, 4), "done_check_sec": round(t_chk, 4)}
        )
        if done:
            break
    out["loop_iterations"] = runs

    # g: the final readback the noop sink would consume
    t0 = time.perf_counter()
    spark.read.parquet(sink).write.format("noop").mode("overwrite").save()
    out["final_readback_noop_sec"] = round(time.perf_counter() - t0, 4)
    shutil.rmtree(work, ignore_errors=True)

    # reference: the registered queries end-to-end, bench protocol (median 3)
    import statistics

    for name in ("mq_source_stream_drain", "mq_source_destructive_drain",
                 "mq_source_batch_drain", "mq_sink_roundtrip"):
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        out[name] = {"median": round(statistics.median(samples), 4), "samples": samples}

    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""End-to-end: the `ibmmq` source feeding streaming analytics — the full
reference deployment shape (receiver → micro-batches → windowed consumer,
README.md:5-17) on Structured Streaming. Plus foreachBatch and rate-source
coverage (SURVEY.md §2.2 sinks / test sources)."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F

from spark_ibm_mq_spark.sources import FakeMQBroker, register_ibmmq


def test_mq_stream_to_windowed_agg(spark, tmp_path):
    """MQ queue → ibmmq stream → from_json payload parse → event-time
    tumbling window aggregation → parquet sink. The consumer pattern from
    the reference README, fully typed end to end."""
    broker = FakeMQBroker(str(tmp_path / "broker"), "Q.E2E")
    base = 1_700_000_000_000  # window-aligned epoch millis
    msgs = []
    for i in range(100):
        # two 1-minute windows, 50 messages each, alternating instrument
        put_ms = base + (i % 2) * 60_000 + (i // 2) * 100
        msgs.append((put_ms, 1, json.dumps({"sym": "A" if i % 4 < 2 else "B", "qty": i})))
    broker.put_all(msgs)
    register_ibmmq(spark)
    # a second wave far in the future arrives between drains: its event time
    # advances the watermark past both real windows so append mode closes them
    late_wave = [(base + 3_600_000, 1, json.dumps({"sym": "A", "qty": 0}))]

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("ibmmq")
        .option("path", broker.path)
        .option("queue", broker.queue)
        .load()
        .withColumn("put_ts", F.col("put_ts").cast("timestamp"))
        .withColumn("payload", F.from_json("value", "sym string, qty int"))
        .select("put_ts", "seq_no", F.col("payload.sym").alias("sym"), F.col("payload.qty").alias("qty"))
        .withWatermark("put_ts", "10 seconds")
        .groupBy(F.window("put_ts", "1 minute"), "sym")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").alias("total_qty"))
        .select(F.col("window.start").alias("ws"), "sym", "n", "total_qty")
    )
    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()                       # wave 1 ingested; watermark still inside window 2
    broker.put_all(late_wave)     # future event arrives on the queue
    drain()                       # watermark jumps 1h past both real windows
    # emission happens in the NEXT batch WITH data (no-data runs schedule no
    # batch), so a second future event flushes the now-closed windows
    broker.put_all([(base + 7_200_000, 1, json.dumps({"sym": "B", "qty": 0}))])
    drain()
    rows = {(r.ws.isoformat(), r.sym): (r.n, r.total_qty) for r in spark.read.parquet(out).collect()}
    closed = {k: v for k, v in rows.items() if v[0] > 1}
    assert len(closed) == 4, rows  # 2 windows × 2 symbols
    for (_, sym), (n, _) in closed.items():
        assert sym in ("A", "B") and n == 25  # 50 msgs/window split across 2 syms


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch: arbitrary per-micro-batch logic (here: write batch
    summaries) — the escape hatch for sinks Spark lacks."""
    src = str(tmp_path / "in")
    spark.createDataFrame([(i, i % 5) for i in range(100)], "id bigint, k bigint") \
        .write.parquet(src)
    summary_path = str(tmp_path / "summaries.jsonl")

    def handle_batch(df, batch_id: int) -> None:
        n = df.count()
        with open(summary_path, "a", encoding="utf-8") as f:
            f.write(json.dumps({"batch": batch_id, "rows": n}) + "\n")

    q = (
        spark.readStream.schema("id bigint, k bigint")
        .parquet(src)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lines = [json.loads(x) for x in open(summary_path)]
    assert sum(x["rows"] for x in lines) == 100


def test_rate_source_smoke(spark):
    """The rate test source produces monotonically-increasing typed rows."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .writeStream.format("memory")
        .queryName("ratesink")
        .start()
    )
    try:
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            if spark.sql("select count(*) c from ratesink").collect()[0].c > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("select * from ratesink").collect()
    assert rows and all(r.value >= 0 for r in rows)
    assert set(spark.table("ratesink").columns) == {"timestamp", "value"}


def test_cms_counters_merge_across_micro_batches(spark, tmp_path):
    """The count-min counter frame's defining property: per-micro-batch
    partial sketches merged by cellwise ADDITION equal the one-shot batch
    sketch — so `agg_heavy_hitters_cms`'s counter build runs unchanged as a
    foreachBatch accumulator on a stream (the 100 TB ingest shape its
    docstring claims)."""
    import pyspark.sql.functions as F

    from spark_ibm_mq_spark.operators.aggregations import _CMS_D, _cms_bucket_sql
    from spark_ibm_mq_spark.tables import load_table

    src = str(tmp_path / "orders_stream")
    load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_custkey"
    ).repartition(4).write.parquet(src)

    def sketch(df):
        probes = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            F.expr(_cms_bucket_sql(i, "o_custkey")).cast("int").alias("b"),
                        )
                        for i in range(_CMS_D)
                    ]
                )
            ).alias("p")
        ).select("p.i", "p.b")
        return probes.groupBy("i", "b").agg(F.count(F.lit(1)).alias("cnt"))

    merged: dict[tuple[int, int], int] = {}
    n_batches = 0

    def accumulate(df, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        for r in sketch(df).collect():
            merged[(r.i, r.b)] = merged.get((r.i, r.b), 0) + r.cnt

    q = (
        spark.readStream.schema("o_custkey bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(accumulate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert n_batches >= 2, "need multiple micro-batches to prove mergeability"
    batch = {
        (r.i, r.b): r.cnt
        for r in sketch(spark.read.parquet(src)).collect()
    }
    assert merged == batch


def test_topk_update_mode_emits_incrementally(spark):
    """The update-mode aggregation must prove it is genuinely
    incremental: over the ts-ORDERED 4-file replay the registered query
    uses (maxFilesPerTrigger=1, mtime-stamped range files, 10-min
    watermark), at least one boundary-straddling (window, type) key is
    emitted MORE than once (an early batch's partial count, then a later
    refresh), and max-recovery equals the batch ground truth for EVERY
    key — which simultaneously proves the in-order replay kept the
    watermark from dropping owed rows."""
    import pyspark.sql.functions as F

    from spark_ibm_mq_spark.operators.streaming_analytics import (
        _replay_src,
        _run_to_memory,
    )
    from spark_ibm_mq_spark.tables import load_table

    # sf0.01: at sf0.001 the quartile range boundaries can land between
    # hours, leaving no straddling window to re-emit
    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = _replay_src(ev, "topk_update_test", sf, ("events",), order_by="ts")
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = _run_to_memory(agg, "update")
    emissions = (
        sink.groupBy("window", "event_type")
        .agg(F.count(F.lit(1)).alias("n_emissions"), F.max("n").alias("n_final"))
        .collect()
    )
    assert any(r["n_emissions"] > 1 for r in emissions), (
        "update mode never re-emitted a key: the drain is not exercising "
        "incremental refinement"
    )
    truth = {
        (r["w"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r["window"]["start"], r["event_type"]): r["n_final"] for r in emissions}
    assert got == truth


def test_alert_debounce_stream_equals_batch_twin(spark):
    """Cross-twin consistency: the streaming session-window debounce and
    the batch gap-sessionization twin must report the same bursts."""
    from spark_ibm_mq_spark.operators.events_analytics import (
        events_alert_debounce,
    )
    from spark_ibm_mq_spark.operators.streaming_analytics import (
        stream_alert_debounce,
    )

    sf = "/root/testdata/sf0.001"
    stream_rows = {
        (r["user_id"], r["alert_event_id"]): (r["suppressed"], r["burst_span_s"])
        for r in stream_alert_debounce(spark, sf).collect()
    }
    batch_rows = {
        (r["user_id"], r["alert_event_id"]): (r["suppressed"], r["burst_span_s"])
        for r in events_alert_debounce(spark, sf).collect()
    }
    assert stream_rows == batch_rows and stream_rows

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

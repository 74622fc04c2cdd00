"""Streaming readers over the fixture tables.

`events_file_stream` replays events.parquet as a file-source stream — the
deterministic stand-in for the live `ibmmq` stream (same columns the MQ
source's envelope decomposes to), used by the M4 oracle queries so their
results are batch-reproducible.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA_NS = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)
EVENTS_SCHEMA_US = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def events_file_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet, adaptive to the fixture's physical
    ts type the same way the batch loader is (tables.load_table checks the
    loaded dtype; a streaming source needs the schema up front, so here the
    parquet footer is sniffed driver-side — metadata only, no data read).

    - TIMESTAMP(NANOS) fixtures: Spark can't read ns natively → read as
      long (nanosAsLong) and convert ns→µs with exact integer DIV.
    - TIMESTAMP(MICROS) fixtures: read as TIMESTAMP directly.

    Either way ts comes back as TIMESTAMP (ltz): watermarks/event-time
    require it; the session is pinned UTC so values match the batch NTZ
    loader."""
    ts_type = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    stream = spark.readStream
    if str(ts_type).startswith("timestamp"):
        ev = (
            stream.schema(EVENTS_SCHEMA_US)
            # FileStreamSource wants a directory; glob-filter to the file
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = (
            stream.schema(EVENTS_SCHEMA_NS)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        )
    return ev


DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def documents_file_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over documents.parquet — the deterministic stand-in for a
    live document-ingest stream (the multimodal twin of
    `events_file_stream`). Documents carry no event time, so consumers are
    stateless append-mode maps (decode, featurize) rather than windowed
    aggregations; no watermark is needed or set."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )

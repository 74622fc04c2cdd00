"""Streaming readers over the fixture tables.

`events_file_stream` replays events.parquet as a file-source stream — the
deterministic stand-in for the live `ibmmq` stream (same columns the MQ
source's envelope decomposes to), used by the M4 oracle queries so their
results are batch-reproducible.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def events_file_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with the same ns→µs conversion as the
    batch loader (tables.load_table): ts comes back as TIMESTAMP_NTZ."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        # FileStreamSource wants a directory; glob-filter to the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        # TIMESTAMP (ltz), not NTZ: watermarks/event-time require it; the
        # session is pinned UTC so values match the batch NTZ loader.
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )

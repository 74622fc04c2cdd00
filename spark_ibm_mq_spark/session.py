"""SparkSession helpers.

Scale posture: these configs are what we'd set on a 1000-executor cluster,
expressed here for local[32]. AQE handles runtime re-planning (skew joins,
shuffle coalescing); shuffle partitions are sized so an sf0.1 partition fits
comfortably in memory and would be raised (or left to AQE) at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session (including the driver's) so
# oracle comparisons are deterministic: UTC session time, ANSI off (we want
# permissive casts like the reference's stringly-typed envelope), Arrow on
# for the pandas-UDF paths.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS) which Spark can't read natively;
    # read as long and convert via exact integer division (tables.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # fixtures are small; broadcast threshold default (10MB) already catches
    # region/nation/supplier/part — keep explicit for clarity at scale.
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
}


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session.

    The correctness driver creates its own SparkSession; every registered
    query routes through here first so results don't depend on the ambient
    session timezone or Arrow settings.
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this session — accept ambient value
    return spark


def get_spark(app_name: str = "spark-ibm-mq-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a local session sized for this container."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # local[32] runs every task in the driver JVM: an undersized heap
        # turns the pair-heavy dedup queries into GC churn (3× run-to-run
        # variance observed at 8g); the container has 128 GiB
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune_for_oracle(builder.getOrCreate())

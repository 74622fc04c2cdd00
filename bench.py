"""Benchmark harness: runs every registered headline query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ibm_mq_spark import registry
from spark_ibm_mq_spark.session import get_spark

registry.load_all_modules()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    spark = get_spark("spark-ibm-mq-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once with the flagship query
    registry.QUERIES["pricing_summary"](spark, sf_dir).collect()

    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: executes the full physical plan (all columns, sorts,
        # joins) without driver-side collect skewing the measurement
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

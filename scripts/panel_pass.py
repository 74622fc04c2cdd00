"""One measured pass of a fixed query panel against ONE code tree.

Subprocess unit of scripts/code_ab_panel.py (VERDICT r13 task 2): loads
the package from ``--repo`` (HEAD or a worktree of an older commit),
starts one Spark session, warms it the way bench.py does (flagship
collect + one Python-worker action), then times each panel query once
with bench-style isolation (noop sink, clearCache + JVM GC between
queries). Prints ONE JSON line
``{"queries": {name: sec}, "ambient_start": {"cpu": s, "membw": s},
"ambient_end": {...}}`` on stdout (everything else goes to stderr).

Run from the target repo's root so relative paths (spark-warehouse)
resolve inside that tree.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ambient() -> dict:
    import numpy as np

    a = np.ones((2500, 2500))
    a @ a
    cpu = []
    for _ in range(3):
        t0 = time.perf_counter()
        a @ a
        cpu.append(time.perf_counter() - t0)
    # buffers allocated once; the timed loop copies in place so the
    # sample measures bandwidth, not 256 MB/iter of page faults (same
    # fix as bench._ambient_membw_calibration)
    b = np.ones(32_000_000, dtype=np.float64)
    c = np.empty_like(b)
    np.copyto(c, b)
    float(c.sum())
    mem = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(c, b)
        float(c.sum())
        mem.append(time.perf_counter() - t0)
    return {"cpu": round(min(cpu), 4), "membw": round(min(mem), 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True, help="comma-separated names")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from spark_ibm_mq_spark import registry
    from spark_ibm_mq_spark.session import get_spark

    registry.load_all_modules()
    spark = get_spark("code-ab-panel")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up bench.py uses: JVM + parquet footers, then the Python
    # worker pool (fork + package-zip distribution is one-time cost)
    registry.QUERIES["pricing_summary"](spark, args.sf_dir).collect()
    registry.QUERIES["mq_source_batch_drain"](spark, args.sf_dir).limit(
        1
    ).count()

    amb_start = _ambient()
    timings: dict[str, float] = {}
    for name in args.queries.split(","):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    amb_end = _ambient()

    print(
        json.dumps(
            {
                "queries": timings,
                "ambient_start": amb_start,
                "ambient_end": amb_end,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

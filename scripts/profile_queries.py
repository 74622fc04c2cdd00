"""Per-query profiling harness for optimization rounds (guide §1).

Usage::

    python scripts/profile_queries.py q1 q2 ...          # time + plan
    PROFILE_RUNS=5 python scripts/profile_queries.py q1
    PROFILE_PLAN_DIR=plans/r16 PROFILE_PLAN_SUFFIX=_before \
        python scripts/profile_queries.py q1             # also dump plans

Times each named query with the noop sink (guide §1.4) in ONE session,
median of PROFILE_RUNS (default 3) AFTER clearing catalog cache between
queries exactly like bench.py, and prints a compact table.  When
PROFILE_PLAN_DIR is set, writes ``<dir>/<query><suffix>.txt`` with the
``explain("formatted")`` output so plan claims are checkable offline.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_ibm_mq_spark import registry  # noqa: E402
from spark_ibm_mq_spark.session import get_spark  # noqa: E402

registry.load_all_modules()


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_queries.py <query> [query ...]", file=sys.stderr)
        return 2
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plan_dir = os.environ.get("PROFILE_PLAN_DIR")
    suffix = os.environ.get("PROFILE_PLAN_SUFFIX", "")
    spark = get_spark("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py so first-profiled query isn't charged JVM warmup
    registry.QUERIES["pricing_summary"](spark, sf_dir).collect()
    registry.QUERIES["mq_source_batch_drain"](spark, sf_dir).limit(1).count()

    out = {}
    for name in names:
        if name not in registry.QUERIES:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            continue
        fn = registry.QUERIES[name]
        if plan_dir:
            os.makedirs(os.path.join(REPO, plan_dir), exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(REPO, plan_dir, f"{name}{suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        out[name] = {
            "median": round(statistics.median(samples), 4),
            "samples": samples,
        }
        print(f"{name:45s} median {out[name]['median']:7.3f}  {samples}")
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "timings": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Interleaved A/B micro-benchmark for named registry queries (VERDICT r8
task 7: make perf claims attributable on a host whose ambient load swings
same-code runs ±25%).

Usage::

    python scripts/ab_bench.py QUERY_A QUERY_B [--rounds N] [--sf-dir DIR]
    python scripts/ab_bench.py dedup_minhash_lsh dedup_minhash_lsh_md5

``--sf-dir`` takes a fixture DIRECTORY (e.g. /root/testdata/sf0.1), not a
scale factor; bare factors are accepted and resolved against /root/testdata
(``--sf-dir 0.1`` → /root/testdata/sf0.1).  ``--sf`` is kept as an alias.

Runs the two queries strictly interleaved (A B A B ... after one unmeasured
warm-up each) inside ONE Spark session, with the same per-query isolation
bench.py uses (clearCache + JVM GC between runs), and reports per-query
median / min / max plus the median A/B ratio of ADJACENT pairs.  Because
each A sample has a B sample measured within seconds of it, ambient drift
hits both sides equally — the pairwise ratio is meaningful where two
separate bench.py runs are not.

Comparing one query across two CODE versions: run this script once per
checkout with the SAME --rounds and quote both outputs, or pass the same
query name twice on one checkout to measure pure run-to-run noise floor.

Output: one human block + ONE machine-readable JSON line (``{"ab": ...}``)
suitable for pasting into a commit message.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_ibm_mq_spark import registry  # noqa: E402
from spark_ibm_mq_spark.session import get_spark  # noqa: E402


def _run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("query_a")
    ap.add_argument("query_b")
    ap.add_argument("--rounds", type=int, default=5)
    # VERDICT r10 task 5: the flag was named --sf but takes a DIRECTORY;
    # `--sf 0.1` used to die with a raw pyarrow FileNotFoundError. Primary
    # spelling is now --sf-dir (old --sf kept as an alias), a bare scale
    # factor is resolved against /root/testdata, and a missing dir fails
    # with a one-line hint naming the expected layout.
    ap.add_argument(
        "--sf-dir", "--sf", dest="sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    if not os.path.isdir(args.sf):
        guess = f"/root/testdata/sf{args.sf}"
        if os.path.isdir(guess):
            args.sf = guess
        else:
            sys.exit(
                f"--sf-dir expects a fixture directory like /root/testdata/sf0.1 "
                f"(containing lineitem.parquet etc.); got {args.sf!r} and "
                f"{guess!r} does not exist either"
            )

    registry.load_all_modules()
    for q in (args.query_a, args.query_b):
        if q not in registry.QUERIES:
            sys.exit(f"unknown query: {q}")

    spark = get_spark("spark-ibm-mq-spark-ab")
    spark.sparkContext.setLogLevel("WARN")
    fa, fb = registry.QUERIES[args.query_a], registry.QUERIES[args.query_b]

    # unmeasured warm-up: JVM, parquet footers, python worker pool
    _run_once(spark, fa, args.sf)
    _run_once(spark, fb, args.sf)

    a_samples, b_samples = [], []
    for i in range(args.rounds):
        a_samples.append(_run_once(spark, fa, args.sf))
        b_samples.append(_run_once(spark, fb, args.sf))
        print(
            f"  round {i + 1}/{args.rounds}: "
            f"A={a_samples[-1]:.3f}s  B={b_samples[-1]:.3f}s",
            file=sys.stderr,
        )

    ratios = [a / b for a, b in zip(a_samples, b_samples)]
    rec = {
        "ab": {
            "a": args.query_a,
            "b": args.query_b,
            "sf_dir": args.sf,
            "rounds": args.rounds,
            "a_median": round(statistics.median(a_samples), 4),
            "a_min": round(min(a_samples), 4),
            "a_max": round(max(a_samples), 4),
            "b_median": round(statistics.median(b_samples), 4),
            "b_min": round(min(b_samples), 4),
            "b_max": round(max(b_samples), 4),
            "pairwise_ratio_median": round(statistics.median(ratios), 4),
            "run_label": os.environ.get(
                "SPARK_GRAFT_BENCH_LABEL",
                # An unset env var must be distinguishable from a genuine
                # labelled run (ADVICE r9): driver/final runs were being
                # stamped "builder". Fall back to the invoking user, never
                # to a role name.
                "unlabeled-" + os.environ.get("USER", "unknown"),
            ),
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
    }
    print(
        f"A {args.query_a}: median {rec['ab']['a_median']}s "
        f"[{rec['ab']['a_min']}..{rec['ab']['a_max']}]\n"
        f"B {args.query_b}: median {rec['ab']['b_median']}s "
        f"[{rec['ab']['b_min']}..{rec['ab']['b_max']}]\n"
        f"median adjacent-pair A/B ratio: {rec['ab']['pairwise_ratio_median']}",
        file=sys.stderr,
    )
    print(json.dumps(rec, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()

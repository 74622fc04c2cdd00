"""A/B the md5-minhash funnel's SIGNATURE-frame strategy (VERDICT r12
task 2): lazy forced-exchange sig (the r11-r12 choice, superseded) vs a
session-checkpointed sig (the live choice since r13, picked by this
script's records in scripts/sig_ab*.json) — re-measured after
`dedup_lsh_band_profile` became a THIRD sig-consuming action (the
1.38-vs-3.21 interleaved ratio that justified laziness predates it).

Usage::

    python scripts/sig_strategy_ab.py [--sessions N] [--sf-dir DIR]

Protocol: alternating FRESH Spark sessions (new applicationId ⇒ fresh
session memo), each running the full funnel FAMILY in bench order
(sorted names, like bench.py's main loop) with bench.py's per-query
isolation (noop write, clearCache + JVM GC). The signal is the FAMILY
SUM per session — per-query numbers mislead because cand/sig
materialization cost lands on whichever consumer runs first. The arms
differ ONLY by the live `dedup._SIG_CHECKPOINT` flag (flipped per
session before the memo builds), so both execute the same committed
operator code; the historical records in scripts/sig_ab*.json were
taken when lazy was the committed default, with the ckpt arm seeded
via a memo override — same contrast, opposite baseline.

Output: one human block + ONE JSON line (``{"sig_ab": ...}``) for the
bench provenance trail.
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
from spark_ibm_mq_spark.operators import dedup  # noqa: E402
from spark_ibm_mq_spark.session import get_spark  # noqa: E402
# the funnel consumers + the truth-pair sibling, in bench.py's sorted
# execution order — the family VERDICT r12 flagged (+16% best-to-best)
FAMILY = [
    "dedup_lsh_band_profile",
    "dedup_minhash_lsh_md5",
    "dedup_minhash_recall_eval",
    "dedup_ngram_jaccard",
]


def _run_family(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in FAMILY:  # module global so --family overrides apply
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return out


def _session(variant: str, sf_dir: str, passes: int) -> list[dict[str, float]]:
    spark = get_spark(f"sig-ab-{variant}")
    spark.sparkContext.setLogLevel("WARN")
    try:
        # flip the live funnel's strategy flag per arm (dedup.py
        # _SIG_CHECKPOINT): since r13 the committed default IS the
        # checkpoint, so the 'lazy' arm must explicitly disable it —
        # both arms otherwise execute identical committed code.
        dedup._SIG_CHECKPOINT = variant == "ckpt"
        # pass 1 is the cold profile (what bench.py's first-of-3 runs
        # pay); passes 2+ are the warm profile (what bench.py's
        # median-of-3 scores) — report both, they answer different
        # questions.
        return [_run_family(spark, sf_dir) for _ in range(passes)]
    finally:
        dedup._SIG_CHECKPOINT = True  # restore the committed default
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sessions", type=int, default=4,
                    help="sessions PER VARIANT (alternating)")
    ap.add_argument("--passes", type=int, default=1,
                    help="family passes per session (1=cold; 2+ adds warm)")
    ap.add_argument(
        "--sf-dir", dest="sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--family", default=None,
        help="comma-separated query-name override (r15: the xxhash "
             "dedup_minhash_lsh now reads the same _SIG_CHECKPOINT flag, "
             "so its sig strategy is measurable with the same protocol)",
    )
    args = ap.parse_args()
    registry.load_all_modules()
    if args.family:
        global FAMILY
        names = [n.strip() for n in args.family.split(",") if n.strip()]
        unknown = [n for n in names if n not in registry.QUERIES]
        if not names or unknown:
            ap.error(
                "--family: "
                + (f"unknown queries {unknown}" if unknown else "no names given")
            )
        FAMILY = names

    # sums[variant][pass_idx] = list of per-session family sums
    sums: dict[str, list[list[float]]] = {
        "lazy": [[] for _ in range(args.passes)],
        "ckpt": [[] for _ in range(args.passes)],
    }
    for i in range(args.sessions):
        for variant in ("lazy", "ckpt"):
            per_pass = _session(variant, args.sf, args.passes)
            for p, t in enumerate(per_pass):
                sums[variant][p].append(round(sum(t.values()), 4))
            print(
                f"  session {i + 1}/{args.sessions} {variant}: "
                + "  ".join(
                    f"pass{p + 1}={sums[variant][p][-1]:.2f}s"
                    for p in range(args.passes)
                )
                + f"  last={per_pass[-1]}",
                file=sys.stderr,
            )

    rec = {
        "sig_ab": {
            "family": FAMILY,
            "sf_dir": args.sf,
            "sessions_per_variant": args.sessions,
            "passes_per_session": args.passes,
            "per_pass": {
                v: [
                    {
                        "sums": s,
                        "median": round(statistics.median(s), 4),
                    }
                    for s in sums[v]
                ]
                for v in ("lazy", "ckpt")
            },
            "pairwise_lazy_over_ckpt_by_pass": [
                [round(a / b, 4) for a, b in zip(sums["lazy"][p], sums["ckpt"][p])]
                for p in range(args.passes)
            ],
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
    }
    for p in range(args.passes):
        print(
            f"pass {p + 1}: lazy median "
            f"{rec['sig_ab']['per_pass']['lazy'][p]['median']}s vs ckpt "
            f"{rec['sig_ab']['per_pass']['ckpt'][p]['median']}s  ratios "
            f"{rec['sig_ab']['pairwise_lazy_over_ckpt_by_pass'][p]}",
            file=sys.stderr,
        )
    print(json.dumps(rec, separators=(",", ":")))


if __name__ == "__main__":
    main()

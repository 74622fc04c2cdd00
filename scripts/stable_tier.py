#!/usr/bin/env python
"""Stable-query-tier ledger (the VERDICT r9 task 5 proposal, made
runnable).

A query is TIER-S (stable) when:
  1. it has hash-green driver rows from >= 2 distinct rounds,
  2. at least ONE of those greens was earned at the current source +
     oracle fingerprint (sha256, tracked here from r10 on), and
  3. it is covered by the per-commit sf0.001 parity sweep (every oracled
     query is, via tests/test_oracle_parity.py).

Condition (2) is deliberately "one green at the current fingerprint",
not "all greens": fingerprints only exist from r10, so requiring every
green to be fingerprint-attested would make pre-r10 greens worthless
and force every query through two more window rounds.  The provenance
gap between a historical green and the fingerprinted one is bridged by
condition (3) — the sf0.001 parity sweep runs per commit, so a query
whose semantics drifted between those rounds would have failed parity
in between.  (This is the judge-prescribed r11 flip rule: "pending =
needs one more green at the current fingerprint".)

TIER-S queries can leave the window rotation pool: any commit that
changes their fingerprint re-enters them at never-checked priority, and
a small sentinel sample guards against environment drift.

Ledger: STABLE_TIER.json at the repo root —
  {query: {"fingerprint": sha, "fingerprint_since_round": N}}
Fingerprints are recorded from r10 on; condition (2) is therefore
enforceable for green rows earned in rounds >= fingerprint_since_round.
Run with --update after an operator batch to refresh the ledger (the
diff shows exactly which queries a commit destabilized).

Usage:
  python scripts/stable_tier.py             # report tiers for the NEXT round
  python scripts/stable_tier.py --update    # also rewrite STABLE_TIER.json
  python scripts/stable_tier.py --window 50 # emit the proposed _CHECK_FIRST
                                            # window under the tier rule
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "STABLE_TIER.json")
sys.path.insert(0, REPO)


def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(f)))
    ]
    return (max(rounds) + 1) if rounds else 1


def _green_rounds() -> dict[str, list[int]]:
    """Per-query list of rounds with a fully green driver row (basename
    round aggregation — the judge's method)."""
    greens: dict[str, set[int]] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                greens.setdefault(name, set()).add(rnd)
    return {k: sorted(v) for k, v in greens.items()}


def _fingerprints() -> dict[str, str]:
    from spark_ibm_mq_spark import registry

    registry.load_all_modules()
    fps = {}
    for name, fn in registry.QUERIES.items():
        src = inspect.getsource(getattr(fn, "__wrapped__", fn))
        oracle = registry.ORACLE.get(name, "")
        fps[name] = hashlib.sha256((src + "\x00" + oracle).encode()).hexdigest()
    return fps


def _helper_fingerprints() -> dict[str, str]:
    """sha256 per DECLARED shared helper (registry.HELPER_DEPS) — keyed
    "module.qualname".  Tracked separately from query fingerprints so a
    helper edit destabilizes its consumers through an effective-since
    bump (never by rewriting their own fingerprints, which would
    misattribute the change)."""
    from spark_ibm_mq_spark import registry

    registry.load_all_modules()
    out = {}
    for fns in registry.HELPER_DEPS.values():
        for fn in fns:
            key = f"{fn.__module__}.{fn.__qualname__}"
            if key not in out:
                out[key] = hashlib.sha256(
                    inspect.getsource(fn).encode()
                ).hexdigest()
    return out


def _helper_key(fn) -> str:
    return f"{fn.__module__}.{fn.__qualname__}"


def _effective_since(name: str, ledger: dict, meta: dict) -> int:
    """A query's change round = max(own fingerprint bump, the latest
    change round of any shared helper it declares).  Queries whose
    memo/engine moved under them re-enter the window even though their
    own source is untouched — the r12 review's gate-blind-spot fix."""
    from spark_ibm_mq_spark import registry

    since = ledger[name]["fingerprint_since_round"]
    changed = meta.get("helper_changed_round", {})
    for fn in registry.HELPER_DEPS.get(name, ()):
        since = max(since, changed.get(_helper_key(fn), 0))
    return since


def main() -> None:
    update = "--update" in sys.argv
    rnd = _current_round()
    greens = _green_rounds()
    fps = _fingerprints()
    ledger = json.load(open(LEDGER)) if os.path.exists(LEDGER) else {}
    # "_meta" is a reserved non-query key: it pins the ledger's bootstrap
    # round PERSISTENTLY.  A running min over fingerprint_since_round
    # values would drift upward as bootstrap-era entries get legitimately
    # re-stamped, silently un-classifying the oldest real changes as
    # destabilized (r12 review finding).  Migration: absent meta, the min
    # of the current since values IS the bootstrap (no entry can predate
    # it), recorded once here and stable thereafter.
    meta = ledger.pop("_meta", None) or {
        "bootstrap_round": min(
            (e["fingerprint_since_round"] for e in ledger.values()), default=rnd
        )
    }
    # Shared-helper change tracking: record each declared helper's source
    # sha; when it moves, stamp the round — consumers' effective-since
    # picks it up without touching their own fingerprints.  First sight
    # of a helper records it at the current sha with no change round
    # (nothing destabilizes retroactively).
    helper_fps = _helper_fingerprints()
    meta.setdefault("helper_fingerprints", {})
    meta.setdefault("helper_changed_round", {})
    helpers_changed = []
    for key, sha in sorted(helper_fps.items()):
        prev_sha = meta["helper_fingerprints"].get(key)
        if prev_sha is not None and prev_sha != sha:
            meta["helper_changed_round"][key] = rnd
            helpers_changed.append(key)
        meta["helper_fingerprints"][key] = sha
    for key in [k for k in meta["helper_fingerprints"] if k not in helper_fps]:
        del meta["helper_fingerprints"][key]
        meta["helper_changed_round"].pop(key, None)
    changed, fresh = [], []
    for name, fp in sorted(fps.items()):
        prev = ledger.get(name)
        if prev is None:
            fresh.append(name)
            ledger[name] = {
                "fingerprint": fp,
                "fingerprint_since_round": rnd,
                # first-registration round, persisted so --window can defer
                # same-round registrations (they go AFTER the window by the
                # registration-cap house rule, not at never-checked priority)
                "first_tracked_round": rnd,
            }
        elif prev["fingerprint"] != fp:
            changed.append(name)
            ledger[name] = {
                "fingerprint": fp,
                "fingerprint_since_round": rnd,
                "first_tracked_round": prev.get("first_tracked_round"),
            }
    dropped = [n for n in ledger if n not in fps]
    for n in dropped:
        del ledger[n]

    tier_s, tier_pending, tier_active = [], [], []
    for name in sorted(fps):
        since = _effective_since(name, ledger, meta)
        all_greens = greens.get(name, [])
        # `r >= since` counts a round-N green as attesting a round-N
        # fingerprint.  That equality is sound under the round workflow:
        # within one round every builder edit precedes the driver run
        # (the driver checks out HEAD at round end), so a same-round
        # green always post-dates the same-round stamp.  The aliasing
        # case — an edit AFTER round N's driver run but before
        # CORRECTNESS_rN lands — cannot occur in-session; if a driver
        # crash ever produced it, the per-commit sf0.001 parity sweep is
        # the backstop (condition 3).
        stable_greens = [r for r in all_greens if r >= since]
        if len(all_greens) >= 2 and stable_greens:
            tier_s.append(name)
        elif len(all_greens) >= 2:
            # green twice historically, but not yet at this fingerprint:
            # needs one more green at the current fingerprint
            tier_pending.append(name)
        else:
            tier_active.append(name)

    print(f"round under construction: r{rnd}")
    print(f"registered queries:       {len(fps)}")
    print(f"TIER-S (out of rotation): {len(tier_s)}")
    print(f"pending (1 more green at current fingerprint): {len(tier_pending)}")
    print(f"active rotation pool:     {len(tier_active)}")
    if changed:
        print(f"destabilized this run ({len(changed)}): {', '.join(changed)}")
    if helpers_changed:
        print(f"shared helpers changed ({len(helpers_changed)}): "
              f"{', '.join(helpers_changed)}")
    if fresh and os.path.exists(LEDGER):
        print(f"newly tracked ({len(fresh)}): {', '.join(fresh)}")
    never = [n for n in fps if not greens.get(n)]
    print(f"never driver-green ({len(never)}): {', '.join(sorted(never))}")
    for name in ledger:
        ledger[name]["tier"] = (
            "S" if name in tier_s else "pending" if name in tier_pending else "active"
        )
    if update:
        json.dump(
            {"_meta": meta, **ledger}, open(LEDGER, "w"), indent=1, sort_keys=True
        )
        print(f"ledger written: {LEDGER}")

    if "--window" in sys.argv:
        idx = sys.argv.index("--window")
        n_slots = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 50
        _propose_window(n_slots, rnd, greens, fps, ledger, tier_s, meta)


def _propose_window(
    n_slots: int,
    rnd: int,
    greens: dict[str, list[int]],
    fps: dict[str, str],
    ledger: dict,
    tier_s: list[str],
    meta: dict,
) -> None:
    """Proposed _CHECK_FIRST under the tier rule, in priority order:
    (1) never-driver-checked oracled queries EXCEPT those first
    registered in the round under construction — the registration-cap
    house rule places same-round registrations AFTER the window (they
    lead the NEXT round's never-checked set), and the tool enforces that
    so the emitted window stays reproducible against the committed one;
    (2) destabilized queries — fingerprint changed after the ledger
    bootstrap and every driver green predates the change (their greens
    attest dead code; re-enter at never-checked priority), (3) the
    rotation pool oldest-latest-green first, (4) a deterministic TIER-S
    sentinel sample (rotates with the round number) filling any
    remaining slots.  Rows-only queries (no oracle) never consume a
    slot — the r7 policy."""
    from spark_ibm_mq_spark import registry

    oracled = set(registry.ORACLE)
    never_all = sorted(n for n in fps if n in oracled and not greens.get(n))
    deferred = [
        n
        for n in never_all
        if ledger.get(n, {}).get("first_tracked_round") == rnd
    ]
    never = [n for n in never_all if n not in deferred]
    bootstrap = meta["bootstrap_round"]
    destabilized = sorted(
        n
        for n in fps
        if n in oracled
        and greens.get(n)
        and _effective_since(n, ledger, meta) > bootstrap
        and max(greens[n]) < _effective_since(n, ledger, meta)
    )
    taken = set(never) | set(destabilized)
    pool = sorted(
        (
            n
            for n in fps
            if n in oracled and n not in taken and n not in tier_s and greens.get(n)
        ),
        key=lambda n: (max(greens[n]), n),
    )
    window = never + destabilized + pool[: max(n_slots - len(never) - len(destabilized), 0)]
    window = window[:n_slots]
    # component counts computed from the TRUNCATED window, so the header
    # arithmetic always sums to len(window) even when never-checked +
    # destabilized overflow the slot budget (r12 review finding)
    wset = set(window)
    n_never = len(wset & set(never))
    n_destab = len(wset & set(destabilized))
    n_rotation = len(window) - n_never - n_destab
    spare = n_slots - len(window)
    sentinels = []
    if spare > 0 and tier_s:
        ss = sorted(set(tier_s) - set(window))
        if ss:
            off = (rnd * 7) % len(ss)
            sentinels = (ss + ss)[off : off + min(spare, len(ss))]
            window += sentinels
    print(
        f"\nproposed r{rnd} window ({len(window)}/{n_slots} slots: "
        f"{n_never} never-checked + "
        f"{n_destab} destabilized + {n_rotation} rotation + "
        f"{len(sentinels)} TIER-S sentinels):"
    )
    for name in window:
        print(f'    "{name}",')
    if deferred:
        print(
            f"deferred same-round registrations ({len(deferred)}, placed "
            f"AFTER the window; they lead r{rnd + 1}): {', '.join(deferred)}"
        )
    _warn_if_diverged_from_committed(window)


def _warn_if_diverged_from_committed(window: list[str]) -> None:
    """ADVICE r14 #5: the committed _CHECK_FIRST can legitimately
    diverge from --window at a later HEAD (a post-install commit that
    moves a window row's fingerprint re-queues it as destabilized while
    the installed window deliberately keeps its verified order). That
    used to be documented only in a header comment; emit an explicit
    comparison so anyone re-running the tool sees the divergence —
    and sees agreement as agreement — machine-checked."""
    try:
        import __spark_entry__ as entry_mod

        committed = list(getattr(entry_mod, "_CHECK_FIRST", []))
    except Exception as exc:  # pragma: no cover - import-env dependent
        print(f"(committed-window comparison unavailable: {exc})")
        return
    if window == committed:
        print(
            "committed _CHECK_FIRST: EXACT MATCH with this proposal "
            f"({len(window)} rows, same order)"
        )
        return
    only_prop = [n for n in window if n not in committed]
    only_comm = [n for n in committed if n not in window]
    print(
        "WARNING: proposal DIVERGES from the committed _CHECK_FIRST "
        f"({len(window)} proposed vs {len(committed)} committed)."
    )
    if only_prop:
        print(f"  proposed-only rows: {', '.join(only_prop)}")
    if only_comm:
        print(f"  committed-only rows: {', '.join(only_comm)}")
    if not only_prop and not only_comm:
        print("  same row set, different ORDER.")
    print(
        "  Expected mid-round if a post-install commit destabilized a "
        "window row (the installed window keeps its verified order; the "
        "row re-queues next round). If you are INSTALLING a window now, "
        "copy this proposal verbatim."
    )


if __name__ == "__main__":
    main()

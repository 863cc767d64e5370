#!/usr/bin/env python
"""Gate-rotation planner / auditor.

The driver's correctness gate runs the FIRST ``WINDOW`` entries of
``__spark_entry__.queries()`` each round, so dict order is the rotation
mechanism (entry.py::queries docstring).  This script makes the rotation
auditable:

* reads every ``CORRECTNESS_r*.json`` in the repo root and computes, for
  each query, the latest round with a green row (rows+schema match, and
  hash match when the oracle produced one);
* checks the ordering INVARIANT the cadence promise rests on — no
  INVERSION, i.e. no query outside the upcoming window staler than a
  query inside it (semantics-changed and never-gated entries are exempt:
  they must lead regardless of history);
* reports recovery debt — queries that will exceed the steady-state
  ceil(N / WINDOW) staleness bound even under optimal rotation (this
  happens after an idle round and is informational, not an error);
* prints the recommended NEXT window: semantics-changed / never-gated
  queries first (callers flag changed ones by name), then stalest-first.

Usage:
    python scripts/rotation_plan.py [--next-round N] [--window 50]
        [--changed q1,q2,...]

Exit status 1 on an ordering inversion (the window wastes a slot on a
fresh query while a staler one waits outside), so it can run as a
pre-commit check when reordering ``queries()``.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_history() -> tuple[dict[str, int], int]:
    """Latest-green map (single source of truth: rotation.green_history,
    same criteria + error handling as the driver-facing path) plus the
    newest CORRECTNESS round seen on disk (derived from filenames only —
    a malformed file still counts toward "which round are we in")."""
    from dbt_scd2_utils_spark.rotation import green_history as gh

    newest = 0
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", os.path.basename(path))
        if m:
            newest = max(newest, int(m.group(1)))
    return gh(ROOT), newest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--next-round",
        type=int,
        default=None,
        help="round being planned (default: newest CORRECTNESS round + 1)",
    )
    ap.add_argument(
        "--changed",
        default=None,
        help="comma-separated queries whose semantics changed (must lead); "
        "default: entry.SEMANTICS_CHANGED (the pins rotation.rotate uses)",
    )
    args = ap.parse_args()

    import __spark_entry__ as em
    from dbt_scd2_utils_spark.entry import SEMANTICS_CHANGED
    from dbt_scd2_utils_spark.rotation import active_pins

    order = list(em.queries().keys())
    latest, newest = green_history()
    next_round = args.next_round or newest + 1
    changed = (
        [q for q in args.changed.split(",") if q]
        if args.changed is not None
        else sorted(active_pins(SEMANTICS_CHANGED, latest))
    )

    n = len(order)
    bound = math.ceil(n / args.window)  # cadence promise: gated every
    # `bound` rounds, so max allowed staleness entering a window is
    # bound - 1 (it gets gated in that window before falling further).

    window = order[: args.window]
    rest = order[args.window :]

    print(f"queries: {n}  window: {args.window}  cadence bound: {bound} rounds")
    print(f"planning round r{next_round} (latest CORRECTNESS: r{newest})")

    def staleness(q: str) -> int:
        return next_round - latest.get(q, 0)

    # ---- audit the current order ------------------------------------
    never = [q for q in order if q not in latest]
    exempt = set(changed) | set(never)
    # Inversion: a slot in the window holds a query FRESHER than one
    # waiting outside (exempt entries hold their slot by fiat, on BOTH
    # sides: a never-gated query outside the window has staleness ==
    # next_round and would otherwise flag every window entry).
    max_out = max(
        (staleness(q) for q in rest if q not in exempt), default=0
    )
    inversions = [
        q for q in window
        if q not in exempt and staleness(q) < max_out
    ]
    # Recovery debt: queries that cannot make the steady-state bound
    # this cycle no matter the ordering (informational).
    debt = [(q, latest.get(q, 0)) for q in rest if staleness(q) >= bound]
    in_window_changed = [q for q in changed if q not in window]

    print(f"\nupcoming window ({len(window)}): staleness histogram "
          f"{_hist(staleness(q) for q in window)}")
    print(f"outside window ({len(rest)}): staleness histogram "
          f"{_hist(staleness(q) for q in rest)}")
    if never:
        print(f"never gated: {never}")
    if inversions:
        print("\nORDERING INVERSIONS (window slot wasted on a fresh query "
              f"while a {max_out}-round-stale query waits outside):")
        for q in inversions:
            print(f"  {q}: last green r{latest.get(q, 0)}")
    if debt:
        print(f"\nrecovery debt ({len(debt)} queries miss the {bound}-round "
              "bound this cycle; informational):")
        for q, r in debt[:5]:
            print(f"  {q}: last green r{r}")
        if len(debt) > 5:
            print(f"  ... and {len(debt) - 5} more")
    if in_window_changed:
        print("\nSEMANTICS-CHANGED queries NOT in the upcoming window:")
        for q in in_window_changed:
            print(f"  {q}")

    # ---- recommended next window ------------------------------------
    ranked = sorted(
        order,
        key=lambda q: (
            q not in changed and q in latest,  # changed/never-gated first
            latest.get(q, 0),  # then stalest
            order.index(q),  # stable
        ),
    )
    print(f"\nrecommended r{next_round + 1} window (plan the round after):")
    for q in ranked[: args.window]:
        tag = "CHANGED" if q in changed else (
            "never" if q not in latest else f"r{latest[q]}"
        )
        print(f"  {tag:>7}  {q}")

    return 1 if (inversions or in_window_changed) else 0


def _hist(vals) -> str:
    from collections import Counter

    c = Counter(vals)
    return " ".join(f"{k}r:{c[k]}" for k in sorted(c))


if __name__ == "__main__":
    sys.exit(main())

"""Self-rotating gate-window ordering for ``__spark_entry__.queries()``.

The driver's correctness gate runs the FIRST ~50 entries of ``queries()``
each round, so dict order is the rotation mechanism.  Hand-maintaining
that order decays the moment a round is skipped (the r6 verdict's
headline finding: 18 queries went three rounds without a driver row
because the reorder never happened).  This module makes the rotation
MECHANICAL: the order is computed from the committed
``CORRECTNESS_r*.json`` history, so every round's window is
stalest-first by construction with zero per-round editing.

Ordering (stable within each tier, by registry order):

1. ``semantics_changed`` names — operators whose behavior changed this
   round must re-gate NOW regardless of how fresh their last green row
   is (callers pin them in ``entry.SEMANTICS_CHANGED``);
2. never-gated queries (no green row in any round) — new surface gates
   in the round that adds it;
3. everything else, ascending by latest green round (stalest first).

Determinism: the inputs are committed files plus the registry literal,
so the driver, ``scripts/gate_preflight.py``, and
``scripts/rotation_plan.py`` all see the same order within a round.
Outside the repo checkout (no CORRECTNESS files), the order degrades to
the registry literal — harmless, rotation only matters under the
driver.

A green row means rows+schema matched and the value hash matched when
the oracle produced one (``hash_match in (True, None)``) with no error —
the same criteria as ``scripts/rotation_plan.py::green_history``.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Callable, TypeVar

_V = TypeVar("_V")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_history(root: str = _ROOT) -> dict[str, int]:
    """Map query name -> latest round with a green CORRECTNESS row."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for q, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if ok:
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def active_pins(
    semantics_changed: dict[str, int],
    latest: dict[str, int],
) -> set[str]:
    """Pins that still need a re-gate: latest green row predates the
    first gate round that includes the change.  A pin expires the moment
    the history shows a green row at-or-after its change round — no
    per-round hand reset (the r7-ADVICE decay fix)."""
    return {
        q for q, rnd in semantics_changed.items() if latest.get(q, 0) < rnd
    }


def rotate(
    registry: dict[str, Callable[..., _V]],
    semantics_changed: dict[str, int] | None = None,
    root: str = _ROOT,
) -> dict[str, Callable[..., _V]]:
    """Return ``registry`` reordered stalest-first (see module docstring).

    ``semantics_changed`` maps query name -> the FIRST gate round whose
    driver row would reflect the change (for a change landed after round
    N's gating, that is N+1).  The pin holds a leading slot until the
    committed history shows a green row in a round >= that value, then
    expires mechanically.
    """
    latest = green_history(root)
    index = {q: i for i, q in enumerate(registry)}
    changed = active_pins(semantics_changed or {}, latest) & set(registry)

    def key(q: str) -> tuple[int, int, int]:
        if q in changed:
            tier = 0
        elif q not in latest:
            tier = 1
        else:
            tier = 2
        return (tier, latest.get(q, 0), index[q])

    return {q: registry[q] for q in sorted(registry, key=key)}

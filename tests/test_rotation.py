"""Unit tests for the self-rotating gate-window ordering (rotation.py)."""

import json

from dbt_scd2_utils_spark.rotation import active_pins, green_history, rotate


def _write_round(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
GREEN_NOHASH = {"rows_match": True, "schema_match": True, "hash_match": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False}
ERR = {"rows_match": True, "schema_match": True, "hash_match": True,
       "err": "boom"}


def test_green_history_latest_green_only(tmp_path):
    _write_round(tmp_path, 1, {"a": GREEN, "b": GREEN, "c": RED})
    _write_round(tmp_path, 2, {"a": RED, "b": GREEN_NOHASH, "d": ERR})
    latest = green_history(root=str(tmp_path))
    # a's r2 row is red: latest green stays r1; rows-only (no-hash) counts;
    # red/err rows never count.
    assert latest == {"a": 1, "b": 2}


def test_active_pins_expire_on_regate():
    latest = {"done": 7, "pending": 6, "stale": 4}
    pins = {"done": 7, "pending": 7, "stale": 8, "never": 5}
    # done re-gated at its change round -> expired; pending's green row
    # predates the change -> active; stale pinned for a future round ->
    # active; never has no green row at all -> active.
    assert active_pins(pins, latest) == {"pending", "stale", "never"}


def test_rotate_tiers_and_stability(tmp_path):
    _write_round(tmp_path, 1, {"old": GREEN, "fresh": GREEN, "pinned": GREEN})
    _write_round(tmp_path, 2, {"fresh": GREEN, "pinned": GREEN})
    reg = {"fresh": 1, "never_b": 2, "old": 3, "pinned": 4, "never_a": 5}
    out = list(rotate(reg, {"pinned": 3}, root=str(tmp_path)))
    # pinned leads despite being r2-fresh (change round 3 > latest green 2);
    # never-gated next in registry order; then stalest-first; freshest
    # closes.
    assert out == ["pinned", "never_b", "never_a", "old", "fresh"]


def test_rotate_expired_pin_rejoins_staleness_order(tmp_path):
    _write_round(tmp_path, 1, {"old": GREEN, "pinned": GREEN})
    _write_round(tmp_path, 2, {"pinned": GREEN})
    reg = {"pinned": 1, "old": 2}
    # pinned's green r2 row >= change round 2 -> pin expired -> plain
    # stalest-first puts old ahead.
    assert list(rotate(reg, {"pinned": 2}, root=str(tmp_path))) == [
        "old", "pinned",
    ]


def test_rotate_no_history_degrades_to_registry_order(tmp_path):
    reg = {"b": 1, "a": 2, "c": 3}
    assert list(rotate(reg, root=str(tmp_path))) == ["b", "a", "c"]


def test_rotate_preserves_values_and_ignores_unknown_pins(tmp_path):
    reg = {"a": "fa", "b": "fb"}
    out = rotate(reg, {"nonexistent": 99}, root=str(tmp_path))
    assert out == {"a": "fa", "b": "fb"}


def test_entry_window_is_stalest_first():
    """The live queries() order: no query outside the 50-slot window may
    be staler than a non-pinned, previously-gated query inside it (the
    invariant scripts/rotation_plan.py audits)."""
    import __spark_entry__ as em
    from dbt_scd2_utils_spark.entry import SEMANTICS_CHANGED

    latest = green_history()
    if not latest:  # no CORRECTNESS files in this checkout
        return
    order = list(em.queries())
    window, rest = order[:50], order[50:]
    exempt = active_pins(SEMANTICS_CHANGED, latest) | {
        q for q in order if q not in latest
    }
    stalest_outside = min(
        (latest.get(q, 0) for q in rest if q not in exempt), default=0
    )
    for q in window:
        if q in exempt:
            continue
        assert latest[q] <= stalest_outside, (
            f"{q} (green r{latest[q]}) wastes a window slot while an "
            f"r{stalest_outside}-green query waits outside"
        )

"""Order-preserving, optionally case-insensitive column-list set algebra.

Python equivalents of the reference's Jinja list utilities
(``macros/list_union.sql:22-56``, ``macros/list_intersection.sql:22-76``,
``macros/list_difference.sql:20-35``, ``macros/is_array.sql:16-18``,
``macros/prefix_array_elements.sql:19-44``, ``macros/get_quoted_csv.sql:17-30``).
These run in the *planner* (driver-side Python), never on executors.

Column matching throughout the reference is case-insensitive
(``scd_plan.sql:92``, ``get_incremental_scd2_sql.sql:68``), so the
case-insensitive variants here are the ones the SCD planner uses.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence


def _key(item: str, case_insensitive: bool) -> str:
    return item.upper() if case_insensitive else item


def list_union(*lists: Sequence[str], case_insensitive: bool = False) -> list[str]:
    """Order-preserving, deduping union (first occurrence's casing wins)."""
    seen: set[str] = set()
    out: list[str] = []
    for lst in lists:
        for item in lst:
            k = _key(item, case_insensitive)
            if k not in seen:
                seen.add(k)
                out.append(item)
    return out


def list_intersection(
    a: Sequence[str], b: Sequence[str], case_insensitive: bool = False
) -> list[str]:
    """Items of ``a`` (in order, deduped) that also appear in ``b``."""
    b_keys = {_key(x, case_insensitive) for x in b}
    seen: set[str] = set()
    out: list[str] = []
    for item in a:
        k = _key(item, case_insensitive)
        if k in b_keys and k not in seen:
            seen.add(k)
            out.append(item)
    return out


def list_difference(
    a: Sequence[str], b: Sequence[str], case_insensitive: bool = False
) -> list[str]:
    """Items of ``a`` (in order, deduped) that do NOT appear in ``b``."""
    b_keys = {_key(x, case_insensitive) for x in b}
    seen: set[str] = set()
    out: list[str] = []
    for item in a:
        k = _key(item, case_insensitive)
        if k not in b_keys and k not in seen:
            seen.add(k)
            out.append(item)
    return out


def is_array(value: object) -> bool:
    """List/tuple guard (strings are not arrays) — ``is_array.sql:16-18``."""
    return isinstance(value, (list, tuple))


def prefix_array_elements(items: Iterable[str], prefix: str) -> list[str]:
    """``['a','b'], 'p.'`` → ``['p.a','p.b']`` — ``prefix_array_elements.sql``."""
    return [f"{prefix}{item}" for item in items]


def get_from_object(obj: object, path: str | Sequence[str], default=None):
    """Nested dict/list path lookup — ``get_from_object.sql:31-58``.

    ``path`` may be a dotted string or a sequence of keys/indices.
    """
    if isinstance(path, str):
        parts: list = path.split(".")
    else:
        parts = list(path)
    cur = obj
    for part in parts:
        if isinstance(cur, dict):
            if part in cur:
                cur = cur[part]
            else:
                return default
        elif isinstance(cur, (list, tuple)):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return default
        else:
            return default
    return default if cur is None else cur

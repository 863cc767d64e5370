"""The reference's SCD2 sequence-test seed batches, as package data.

Port of ``/root/reference/integration_tests/seeds/scd2_materialization/
customers_raw_1..6.csv`` — the input to the reference's hardest behavioral
test, the 6-iteration incremental choreography
(``integration_tests/test_scd2_sequence.sh:133-183``: full-refresh clean,
then one ``dbt build`` per iteration).  Exact duplicate multiplicities
(17× key 2 in batch 1, 29× key 1 in batch 4) are preserved — they
exercise the dedup path.  ``tests/fixtures/seeds.py`` re-exports these
rows; the driver-gated ``scd2_sequence_replay`` query replays them
end-to-end against a DuckDB full-refresh oracle (valid because the
batches split chronologically enough for the README.md:178 equivalence —
proven by ``tests/test_scd2_incremental.py::
test_incremental_equals_full_refresh``).
"""

from __future__ import annotations

from datetime import datetime

TS = lambda s: datetime.fromisoformat(s)  # noqa: E731 — naive UTC wall-clock

CUSTOMERS_SCHEMA = (
    "customer_id int, customer_name string, email string, status string, "
    "deleted_at timestamp, _updated_at timestamp"
)

CUSTOMERS_COLS = (
    "customer_id", "customer_name", "email", "status",
    "deleted_at", "_updated_at",
)


def _c(cid, name, email, status, deleted, updated):
    return (
        cid, name, email, status,
        TS(deleted) if deleted else None, TS(updated),
    )


CUSTOMERS_RAW = {
    1: (
        [_c(1, "John Doe", "john@example.com", "INACTIVE", None, "2024-01-01 09:00:00")]
        + [_c(1, "John Doe", "john@example.com", "ACTIVE", None, "2024-01-01 10:00:00")]
        + [_c(2, "Jane Smith", "jane@example.com", "ACTIVE", None, "2024-01-01 10:00:00")] * 17
        + [_c(3, "Bob Wilson", "bob@example.com", "INACTIVE", None, "2024-01-01 10:00:00")]
        + [
            _c(9, "Full Lifecycle", "lifecycle@example.com", "ACTIVE", None, "2024-01-01 08:00:00"),
            _c(9, "Full Lifecycle Updated", "lifecycle@example.com", "ACTIVE", None, "2024-01-01 08:30:00"),
            _c(9, "Full Lifecycle Updated", "lifecycle@example.com", "ACTIVE", "2024-01-01 09:00:00", "2024-01-01 09:00:00"),
            _c(9, "Full Lifecycle Resurrected", "lifecycle@example.com", "ACTIVE", None, "2024-01-01 09:30:00"),
            _c(10, "Multi Delete", "multidelete@example.com", "ACTIVE", None, "2024-01-01 10:00:00"),
        ]
    ),
    2: [
        _c(1, "John Doe", "john.updated@example.com", "ACTIVE", None, "2024-01-02 10:00:00"),
        _c(1, "John Doe Jr", "john.doe.final@example.com", "INACTIVE", None, "2024-01-04 10:00:00"),
        _c(2, "Jane Smith", "jane@example.com", "INACTIVE", None, "2024-01-01 11:00:00"),
        _c(3, "Bob Wilson", "bob@example.com", "ACTIVE", None, "2024-01-02 10:00:00"),
        _c(4, "Alice Brown", "alice@example.com", "ACTIVE", None, "2024-01-02 10:00:00"),
        _c(10, "Multi Delete", "multidelete@example.com", "ACTIVE", "2024-01-02 10:00:00", "2024-01-02 10:00:00"),
    ],
    3: [
        _c(1, "John Doe Jr", "john.doe.new@example.com", "ACTIVE", "2024-01-03 10:00:00", "2024-01-03 10:00:00"),
        _c(2, "Jane Smith", "jane@example.com", "ACTIVE", None, "2024-01-03 10:00:00"),
        _c(4, "Alice Brown", "alice.brown@example.com", "INACTIVE", None, "2024-01-03 10:00:00"),
        _c(5, "Charlie Davis", "charlie@example.com", "ACTIVE", None, "2024-01-03 10:00:00"),
        _c(10, "Multi Delete", "multidelete@example.com", "ACTIVE", "2024-01-03 10:00:00", "2024-01-03 10:00:00"),
    ],
    4: (
        [_c(1, "John Doe Jr", "john.doe.temp@example.com", "ACTIVE", None, "2024-01-04 09:00:00")] * 29
        + [
            _c(3, "Bob Wilson", "bob.wilson.updated@example.com", "ACTIVE", "2024-01-04 10:00:00", "2024-01-04 10:00:00"),
            _c(5, "Charlie Davis", "charlie.davis@example.com", "INACTIVE", None, "2024-01-04 10:00:00"),
            _c(6, "Diana Evans", "diana@example.com", "ACTIVE", None, "2024-01-04 10:00:00"),
        ]
    ),
    5: [
        _c(1, "John Doe", "late.john@example.com", "INACTIVE", None, "2024-01-03 10:00:01"),
        _c(2, "Jane Smith", "jane.retroactive@example.com", "INACTIVE", None, "2024-01-04 15:00:00"),
        _c(2, "Jane Smith-Johnson", "jane.married@example.com", "ACTIVE", None, "2024-01-05 10:00:00"),
        _c(4, "Alice Brown", "alice.brown.new@example.com", "ACTIVE", None, "2024-01-05 10:00:00"),
        _c(6, "Diana Evans", "diana.evans@example.com", "INACTIVE", None, "2024-01-05 10:00:00"),
        _c(7, "Edward Foster", "edward@example.com", "ACTIVE", None, "2024-01-05 10:00:00"),
    ],
    6: [
        _c(i, name, f"{slug}.backfill@example.com", "ACTIVE", None, "2024-01-01 08:00:00")
        for i, (name, slug) in enumerate(
            [
                ("John Doe", "john"), ("Jane Smith", "jane"), ("Bob Wilson", "bob"),
                ("Alice Brown", "alice"), ("Charlie Davis", "charlie"),
                ("Diana Evans", "diana"), ("Edward Foster", "edward"),
            ],
            start=1,
        )
    ],
}


def _lit(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, datetime):
        return f"timestamp '{v.isoformat(sep=' ')}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def customers_union_sql(upto: int = 6) -> str:
    """ANSI-SQL VALUES rendering of batches ``1..upto`` unioned (the
    full-refresh source), with ``_created_at = _updated_at`` appended —
    mirroring the model projection of
    ``integration_tests/models/scd_materialization/customers_scd2.sql``.
    Self-contained: references no tables, so any oracle engine can run
    it."""
    rows = [r for i in range(1, upto + 1) for r in CUSTOMERS_RAW[i]]
    values = ",\n  ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows
    )
    cols = ", ".join(CUSTOMERS_COLS)
    return f"""
select cast(customer_id as int) as customer_id,
       cast(customer_name as varchar) as customer_name,
       cast(email as varchar) as email,
       cast(status as varchar) as status,
       cast(deleted_at as timestamp) as deleted_at,
       cast(_updated_at as timestamp) as _created_at,
       cast(_updated_at as timestamp) as _updated_at
from (values
  {values}
) as t({cols})
"""

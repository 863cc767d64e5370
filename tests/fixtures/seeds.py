"""The reference integration-test seeds, ported to Python rows.

Sources (all under /root/reference/integration_tests/seeds/):
  scd2_materialization/customers_raw_1..6.csv   — main SCD2 sequence
  scd2_materialization/born_deleted_raw_{1,2}.csv
  scd2_materialization/null_key_raw_{1,2}.csv
  scd2_materialization/ooo_backfill_raw_{1,2}.csv
Exact duplicate multiplicities (17× key 2 in batch 1, 29× key 1 in batch 4)
are preserved — they exercise the dedup path.
"""

from __future__ import annotations

from datetime import datetime

TS = lambda s: datetime.fromisoformat(s)  # noqa: E731 — naive UTC wall-clock

CUSTOMERS_SCHEMA = (
    "customer_id int, customer_name string, email string, status string, "
    "deleted_at timestamp, _updated_at timestamp"
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

BORN_DELETED_SCHEMA = (
    "customer_id int, customer_name string, email string, status string, "
    "deleted_at timestamp, _created_at timestamp, _updated_at timestamp"
)

BORN_DELETED_RAW = {
    1: [
        (100, "Gone Already", "gone@example.com", "INACTIVE", TS("2024-02-01 00:00:00"), TS("2024-01-01 00:00:00"), TS("2024-03-01 00:00:00")),
        (102, "Resurrected Later", "res@example.com", "INACTIVE", TS("2024-02-10 00:00:00"), TS("2024-01-10 00:00:00"), TS("2024-02-10 00:00:00")),
        (102, "Resurrected Later", "res@example.com", "ACTIVE", None, TS("2024-01-10 00:00:00"), TS("2024-04-10 00:00:00")),
    ],
    2: [
        (100, "Gone Already", "gone@example.com", "INACTIVE", TS("2024-02-01 00:00:00"), TS("2024-01-01 00:00:00"), TS("2024-03-01 00:00:00")),
        (101, "Born Deleted Two", "bd2@example.com", "INACTIVE", TS("2024-05-01 00:00:00"), TS("2024-04-01 00:00:00"), TS("2024-06-01 00:00:00")),
        (102, "Resurrected Later", "res@example.com", "INACTIVE", TS("2024-02-10 00:00:00"), TS("2024-01-10 00:00:00"), TS("2024-02-10 00:00:00")),
        (102, "Resurrected Later", "res@example.com", "ACTIVE", None, TS("2024-01-10 00:00:00"), TS("2024-04-10 00:00:00")),
    ],
}

NULL_KEY_SCHEMA = "customer_id int, region string, status string, _updated_at timestamp"

NULL_KEY_RAW = {
    1: [
        (1, None, "active", TS("2024-01-01 00:00:00")),
        (2, "US", "active", TS("2024-01-01 00:00:00")),
    ],
    2: [
        (1, None, "suspended", TS("2024-01-02 00:00:00")),
        (2, "US", "active", TS("2024-01-01 00:00:00")),
    ],
}

OOO_BACKFILL_SCHEMA = BORN_DELETED_SCHEMA

OOO_BACKFILL_RAW = {
    1: [
        (99, "Out Of Order", "ooo@example.com", "ACTIVE", None, TS("2024-01-10 10:00:00"), TS("2024-01-10 10:00:00")),
    ],
    2: [
        (99, "Out Of Order", "ooo@example.com", "ACTIVE", None, TS("2024-01-05 10:00:00"), TS("2024-01-05 10:00:00")),
    ],
}

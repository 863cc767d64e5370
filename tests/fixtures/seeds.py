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

# The customers sequence batches moved into the package (the driver-gated
# scd2_sequence_replay query replays them); re-exported here unchanged.
from dbt_scd2_utils_spark.sources.reference_seeds import (  # noqa: F401
    CUSTOMERS_RAW,
    CUSTOMERS_SCHEMA,
)

TS = lambda s: datetime.fromisoformat(s)  # noqa: E731 — naive UTC wall-clock

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

"""Stateful streaming SCD2: per-key state via ``applyInPandasWithState``.

The ``foreachBatch`` sink (scd2_stream.py) gives exact batch parity by
re-running the batch merge per micro-batch.  This module is the
lower-latency alternative the prompt's streaming mapping calls for: a
custom stateful operator keyed by the business key that emits SCD2 *change
events* (CDC-style) as data arrives, keeping only the current version per
key in the state store.

Semantics contract (documented restriction vs the batch path): events are
reconciled in event-time order WITHIN each micro-batch, but an event older
than the state's current version (cross-batch out-of-order) is DROPPED with
``_op='late'`` rather than retro-splicing history — exact retro-correction
requires the batch merge (collapse_redundant_versions), which operates on
the stored table.  This is the standard trade: streaming gives latency,
`foreachBatch` gives full out-of-order reconciliation.

Output rows carry ``_op``:
  'insert' — a new current version (change_type I/U/D as in batch);
  'expire' — the previously-current version with its _valid_to/_is_current
             rewritten (apply both to a sink to mirror the MERGE's
             matched-update + not-matched-insert clauses);
  'late'   — dropped out-of-order event (observability).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.hashing import SURROGATE_KEY_NULL
from ..plans.config import ScdConfig


def _row_hash(values: list[Any]) -> str:
    parts = [
        SURROGATE_KEY_NULL if v is None or v != v else str(v) for v in values
    ]
    return hashlib.md5("-".join(parts).encode()).hexdigest()


def scd2_streaming_changes(
    stream: DataFrame,
    cfg: ScdConfig,
    default_valid_to: str | None = None,
) -> DataFrame:
    """Attach the stateful SCD2 change-event operator to a keyed stream."""
    cfg.validate()
    business_cols = cfg.business_columns(stream.columns)
    check_cols = cfg.check_columns(stream.columns)
    u = cfg.updated_at_column
    far = pd.Timestamp(default_valid_to or cfg.default_valid_to)
    deleted = cfg.deleted_at_column

    out_schema = StructType(
        [stream.schema[c] for c in business_cols]
        + [
            StructField(cfg.is_current_column, BooleanType()),
            StructField(cfg.valid_from_column, TimestampType()),
            StructField(cfg.valid_to_column, TimestampType()),
            StructField(cfg.change_type_column, StringType()),
            StructField("_op", StringType()),
        ]
    )
    # State: the current version's full business row + its content hash.
    state_schema = StructType(
        [stream.schema[c] for c in business_cols]
        + [
            StructField("_hash", StringType()),
            StructField(cfg.valid_from_column, TimestampType()),
            StructField(cfg.change_type_column, StringType()),
        ]
    )
    n_biz = len(business_cols)
    check_idx = [business_cols.index(c) for c in check_cols]
    u_idx = business_cols.index(u)
    del_idx = business_cols.index(deleted) if deleted else None

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(u, kind="stable")

        cur: tuple | None = tuple(state.get) if state.exists else None
        out: list[list] = []

        for row in batch[business_cols].itertuples(index=False):
            # NaT/NaN → None: pandas missing markers don't survive Arrow
            # state/output serialization.
            vals = [None if pd.isna(v) else v for v in row]
            ts = vals[u_idx]
            hash_ = _row_hash([vals[i] for i in check_idx])
            if cur is not None:
                cur_vals, cur_hash = list(cur[:n_biz]), cur[n_biz]
                cur_vf, cur_ct = cur[n_biz + 1], cur[n_biz + 2]
                cur_ts = cur_vals[u_idx]
                if ts is None or (cur_ts is not None and ts <= cur_ts):
                    out.append(vals + [None, None, None, None, "late"])
                    continue
                if hash_ == cur_hash:
                    continue  # no content change → no new version
                # expire the previous current version
                out.append(
                    cur_vals + [False, cur_vf, ts, cur_ct, "expire"]
                )
                is_del = del_idx is not None and vals[del_idx] is not None
                was_del = del_idx is not None and cur_vals[del_idx] is not None
                ct = "D" if is_del else ("I" if was_del else "U")
                vf = ts
            else:
                is_del = del_idx is not None and vals[del_idx] is not None
                ct = "D" if is_del else "I"
                # born-deleted / first version: coalesce(deleted, created, u)
                vf = ts
                if del_idx is not None and vals[del_idx] is not None:
                    vf = vals[del_idx]
                elif cfg.created_at_column:
                    ca = vals[business_cols.index(cfg.created_at_column)]
                    vf = ca if ca is not None else ts
            out.append(vals + [True, vf, far, ct, "insert"])
            cur = tuple(vals) + (hash_, vf, ct)

        if cur is not None:
            state.update(cur)
        if out:
            yield pd.DataFrame(out, columns=list(out_schema.names))

    grouped = stream.groupBy(*[stream[k] for k in cfg.unique_key])
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""DuckDB-dialect oracle SQL generators.

For every Spark operator pipeline the engine exposes through the driver
contract (``__spark_entry__.queries()``), this module renders an equivalent
ANSI/DuckDB SQL statement over the same parquet tables.  The SQL mirrors the
DataFrame pipeline CTE-for-CTE (which itself mirrors the reference's
generated Snowflake SQL), so the driver's side-by-side compare is a genuine
independent re-derivation.

Cross-engine determinism rules observed throughout:
* hash VALUES differ between engines (cast-to-string formats differ) but the
  *equality pattern* matches because each engine's rendering is injective —
  hashes are only ever compared within one engine;
* every dedup/window ORDER BY uses actual column values (never hashes) with
  explicit NULLS LAST, matching Spark's ``asc_nulls_last``;
* all computed columns are aliased identically on both sides (the driver
  sorts columns by name before value-hashing).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from ..functions.hashing import surrogate_key_sql


@dataclass(frozen=True)
class OracleSpec:
    """Column bookkeeping for one SCD pipeline's SQL twin."""

    keys: Sequence[str]
    business_cols: Sequence[str]  # ordered; includes keys + updated_at etc.
    updated_at: str
    check_cols: Sequence[str]
    created_at: str | None = None
    deleted_at: str | None = None
    loaded_at: str = "_loaded_at"
    default_valid_to: str = "2999-12-31 23:59:59"

    @property
    def scd2_key_cols(self) -> list[str]:
        return list(self.keys) + [self.updated_at]

    @property
    def keys_csv(self) -> str:
        return ", ".join(self.keys)

    @property
    def business_csv(self) -> str:
        return ", ".join(self.business_cols)

    def dedup_order(self, with_priority: bool) -> str:
        """Mirror of operators.scd2._dedup_order: priority, then the
        loaded-at watermark when the feed carries one, then business values
        (minus updated_at), NULLS LAST."""
        parts = ["_priority asc"] if with_priority else []
        cols = [
            c for c in self.business_cols
            if c.lower() != self.updated_at.lower()
        ]
        if self.loaded_at.lower() in {c.lower() for c in cols}:
            parts.append(f"{self.loaded_at} asc nulls last")
            cols = [c for c in cols if c.lower() != self.loaded_at.lower()]
        parts += [f"{c} asc nulls last" for c in cols]
        return ", ".join(parts) or "1"

    # ---- audit column SQL (mirror of functions/audit.py) ------------------

    def w(self) -> str:
        return f"partition by {self.keys_csv} order by {self.updated_at} asc nulls last"

    def is_current_sql(self) -> str:
        return (
            f"(row_number() over (partition by {self.keys_csv} "
            f"order by {self.updated_at} desc nulls last) = 1)"
        )

    def valid_from_sql(self) -> str:
        u = f"cast({self.updated_at} as timestamp)"
        if self.created_at is None and self.deleted_at is None:
            return u
        first = []
        if self.deleted_at is not None:
            first.append(f"cast({self.deleted_at} as timestamp)")
        if self.created_at is not None:
            first.append(f"cast({self.created_at} as timestamp)")
        first.append(u)
        return (
            f"case when lag({self.updated_at}) over ({self.w()}) is null "
            f"then coalesce({', '.join(first)}) else {u} end"
        )

    def valid_to_sql(self) -> str:
        return (
            f"coalesce(lead(cast({self.updated_at} as timestamp)) over ({self.w()}), "
            f"timestamp '{self.default_valid_to}')"
        )

    def change_type_sql(self) -> str:
        first = f"row_number() over ({self.w()}) = 1"
        if self.deleted_at is None:
            return f"case when {first} then 'I' else 'U' end"
        return (
            f"case when {self.deleted_at} is not null then 'D' "
            f"when {first} then 'I' "
            f"when lag({self.deleted_at}) over ({self.w()}) is not null then 'I' "
            f"else 'U' end"
        )

    def audit_select_sql(self) -> str:
        return (
            f"{self.is_current_sql()} as _is_current,\n"
            f"  {self.valid_from_sql()} as _valid_from,\n"
            f"  {self.valid_to_sql()} as _valid_to,\n"
            f"  {self.change_type_sql()} as _change_type"
        )


def scd2_initial_load_sql(source_sql: str, s: OracleSpec) -> str:
    """Twin of operators.scd2.scd2_initial_load
    (≡ get_initial_load_scd2_sql.sql:52-96)."""
    return f"""
with source_data as (
  select {s.business_csv},
    {surrogate_key_sql(s.scd2_key_cols)} as _scd2_key,
    {surrogate_key_sql(list(s.check_cols))} as _scd2_hash
  from ({source_sql})
),
pick_a_key_any_key as (
  select * from source_data
  qualify row_number() over (partition by _scd2_key order by {s.dedup_order(False)}) = 1
),
compare_versions as (
  select *, lag(_scd2_hash) over ({s.w()}) as _prev_hash
  from pick_a_key_any_key
),
changes_only as (
  select * from compare_versions
  where _prev_hash is null or _scd2_hash != _prev_hash
)
select
  {s.business_csv},
  {s.audit_select_sql()}
from changes_only
"""


def scd2_current_snapshot_sql(source_sql: str, s: OracleSpec) -> str:
    """Current rows only (the classic dimension read path)."""
    return (
        f"select {s.business_csv} from ({scd2_initial_load_sql(source_sql, s)})"
        " where _is_current"
    )


def scd2_incremental_no_collapse_sql(
    b1_sql: str, b2_sql: str, s: OracleSpec, update_all: bool = True,
    predicates: Sequence[str] = (),
) -> str:
    """Twin of the staged pipeline: target = initial_load(b1), then one
    incremental merge of b2 with collapse_redundant_versions=false
    (≡ get_incremental_scd2_sql.sql keep-previous branch + MERGE without the
    delete clause).

    ``update_all=False`` adds the J2 temporal pruning predicate
    (``n.updated_at <= p.valid_to``) to the previous-record EXISTS and drops
    ``_change_type`` from the matched-update column set
    (scd_plan.sql:156-187).

    ``predicates`` mirrors incremental_predicates ANDed into the MERGE ON
    (get_incremental_scd2_sql.sql:247-255): the target splits into a
    predicate-passing slice (merged) and a passthrough slice, and the
    inserts NOT EXISTS runs against the passing slice only — CTE-for-CTE
    the engine's split."""
    sk_scd2 = surrogate_key_sql(s.scd2_key_cols)
    sk_bkey = surrogate_key_sql(list(s.keys))
    sk_check = surrogate_key_sql(list(s.check_cols))
    p_scd2 = surrogate_key_sql([f"p.{c}" for c in s.scd2_key_cols])
    p_bkey = surrogate_key_sql([f"p.{c}" for c in s.keys])
    p_check = surrogate_key_sql([f"p.{c}" for c in s.check_cols])
    t_scd2 = surrogate_key_sql([f"t.{c}" for c in s.scd2_key_cols])
    update_cols = (
        {"_is_current", "_valid_to", "_change_type"}
        if update_all
        else {"_is_current", "_valid_to"}
    )
    prune = (
        ""
        if update_all
        else f"\n    and n.{s.updated_at} <= p._valid_to"
    )
    all_cols = list(s.business_cols) + [
        "_is_current", "_valid_from", "_valid_to", "_change_type"
    ]
    matched_proj = ",\n    ".join(
        (
            f"case when u._scd2_key is not null then u.{c} else t.{c} end as {c}"
            if c in update_cols
            else f"t.{c} as {c}"
        )
        for c in all_cols
    )
    insert_proj = ", ".join(f"u.{c}" for c in all_cols)
    if predicates:
        pred = " and ".join(f"({p})" for p in predicates)
        pred_ctes = f"""
tgt_in as (
  select * from tgtk where coalesce(({pred}), false)
),
tgt_out as (
  select * from tgtk where not coalesce(({pred}), false)
),"""
        tgt_merge = "tgt_in"
        passthrough = (
            "\nunion all\nselect "
            + ", ".join(f"{c} as {c}" for c in all_cols)
            + " from tgt_out"
        )
    else:
        pred_ctes = ""
        tgt_merge = "tgtk"
        passthrough = ""
    return f"""
with b1 as ({b1_sql}),
b2 as ({b2_sql}),
tgt as ({scd2_initial_load_sql("select * from b1", s)}),
new_records as (
  select {s.business_csv}, 'new' as _source, 17 as _priority,
    {sk_scd2} as _scd2_key, {sk_bkey} as _scd2_business_key,
    {sk_check} as _scd2_hash
  from b2
),
previous_record as (
  select {", ".join(f"p.{c}" for c in s.business_cols)},
    'previous' as _source, 0 as _priority,
    {p_scd2} as _scd2_key, {p_check} as _scd2_hash
  from tgt as p
  where exists (
    select 1 from new_records as n
    where {p_bkey} = n._scd2_business_key{prune}
  )
),
all_records as (
  select {s.business_csv}, _source, _priority, _scd2_key, _scd2_hash from new_records
  union all
  select {s.business_csv}, _source, _priority, _scd2_key, _scd2_hash from previous_record
),
pick_a_key_any_key as (
  select * from all_records
  qualify row_number() over (partition by _scd2_key order by {s.dedup_order(True)}) = 1
),
compare_versions as (
  select *, lag(_scd2_hash) over ({s.w()}) as _prev_hash
  from pick_a_key_any_key
),
changes_only as (
  select * from compare_versions
  where _prev_hash is null or _scd2_hash != _prev_hash or _source = 'previous'
),
upserts as (
  select {s.business_csv},
  {s.audit_select_sql()},
  _scd2_key
  from changes_only
),
tgtk as (
  select t.*, {t_scd2} as _scd2_key from tgt as t
),{pred_ctes}
matched as (
  select
    {matched_proj}
  from {tgt_merge} t left join upserts u on t._scd2_key = u._scd2_key
),
inserts as (
  select {insert_proj}
  from upserts u
  where not exists (select 1 from {tgt_merge} t where t._scd2_key = u._scd2_key)
)
select * from matched
union all
select * from inserts{passthrough}
"""


def scd1_initial_load_sql(source_sql: str, s: OracleSpec) -> str:
    """Twin of scd1_initial_load (latest row per key, constant audit)."""
    vf = (
        f"cast(coalesce({s.created_at}, {s.updated_at}) as timestamp)"
        if s.created_at
        else f"cast({s.updated_at} as timestamp)"
    )
    return f"""
with source_data as ({source_sql}),
dedup as (
  select * from source_data
  qualify row_number() over (
    partition by {s.keys_csv}
    order by {s.updated_at} desc nulls last, {s.dedup_order(False)}
  ) = 1
)
select {s.business_csv},
  true as _is_current,
  {vf} as _valid_from,
  timestamp '{s.default_valid_to}' as _valid_to,
  'I' as _change_type
from dedup
"""


def scd0_initial_load_sql(source_sql: str, s: OracleSpec) -> str:
    """Twin of scd0_initial_load (earliest row per key)."""
    vf = (
        f"cast(coalesce({s.created_at}, {s.updated_at}) as timestamp)"
        if s.created_at
        else f"cast({s.updated_at} as timestamp)"
    )
    return f"""
with source_data as ({source_sql}),
dedup as (
  select * from source_data
  qualify row_number() over (
    partition by {s.keys_csv}
    order by {s.updated_at} asc nulls last, {s.dedup_order(False)}
  ) = 1
)
select {s.business_csv},
  true as _is_current,
  {vf} as _valid_from,
  timestamp '{s.default_valid_to}' as _valid_to,
  'I' as _change_type
from dedup
"""


def scd1_incremental_sql(b1_sql: str, b2_sql: str, s: OracleSpec) -> str:
    """Twin of scd1_initial_load(b1) + scd1_incremental(b2): matched keys
    keep batch-1 _valid_from but take batch-2 business values; new keys
    insert batch-2 latest."""
    keys_lower = {k.lower() for k in s.keys}
    non_key = [c for c in s.business_cols if c.lower() not in keys_lower]
    key_proj = ", ".join(
        f"coalesce(l1.{k}, l2.{k}) as {k}" for k in s.keys
    )
    biz_proj = ",\n  ".join(
        f"case when l2.{s.keys[0]} is not null then l2.{c} else l1.{c} end as {c}"
        for c in non_key
    )
    join_cond = " and ".join(f"l1.{k} = l2.{k}" for k in s.keys)
    return f"""
with b1 as ({b1_sql}),
b2 as ({b2_sql}),
l1 as (
  select * from b1
  qualify row_number() over (
    partition by {s.keys_csv}
    order by {s.updated_at} desc nulls last, {s.dedup_order(False)}
  ) = 1
),
l2 as (
  select * from b2
  qualify row_number() over (
    partition by {s.keys_csv}
    order by {s.updated_at} desc nulls last, {s.dedup_order(False)}
  ) = 1
)
select {key_proj},
  {biz_proj},
  true as _is_current,
  cast(coalesce(l1.{s.updated_at}, l2.{s.updated_at}) as timestamp) as _valid_from,
  timestamp '{s.default_valid_to}' as _valid_to,
  'I' as _change_type
from l1 full outer join l2 on {join_cond}
"""


def scd2_join_sql(
    rel_sqls: Sequence[str],
    payload_cols: Sequence[Sequence[str]],
    keys: Sequence[str],
    default_valid_to: str = "2999-12-31 23:59:59",
) -> str:
    """Twin of operators.temporal_join.scd2_join (≡ scd2_join.sql:21-66).

    ``rel_sqls[i]`` must yield an SCD2 table with ``keys``, ``payload_cols[i]``
    and ``_valid_from/_valid_to`` columns (payload names must be disjoint)."""
    keys_csv = ", ".join(keys)
    rel_ctes = ",\n".join(f"r{i} as ({sql})" for i, sql in enumerate(rel_sqls))
    instants = "\n  union\n".join(
        f"  select {keys_csv}, cast(_valid_from as timestamp) as _updated_at from r{i}"
        for i in range(len(rel_sqls))
    )
    w = f"partition by {keys_csv} order by _updated_at asc nulls last"
    joins = "\n".join(
        f"left join r{i} on "
        + " and ".join(f"spine.{k} = r{i}.{k}" for k in keys)
        + f" and spine._valid_from >= r{i}._valid_from"
        + f" and spine._valid_to <= r{i}._valid_to"
        for i in range(len(rel_sqls))
    )
    payload = ",\n  ".join(
        f"r{i}.{c} as {c}"
        for i, cols in enumerate(payload_cols)
        for c in cols
    )
    return f"""
with {rel_ctes},
distinct_updates as (
{instants}
),
temporal_spine as (
  select {keys_csv},
    (row_number() over (partition by {keys_csv} order by _updated_at desc nulls last) = 1) as _is_current,
    cast(_updated_at as timestamp) as _valid_from,
    coalesce(lead(cast(_updated_at as timestamp)) over ({w}), timestamp '{default_valid_to}') as _valid_to
  from distinct_updates
)
select {", ".join(f"spine.{k} as {k}" for k in keys)},
  {payload},
  spine._is_current as _is_current,
  spine._valid_from as _valid_from,
  spine._valid_to as _valid_to
from temporal_spine as spine
{joins}
where spine._valid_from < spine._valid_to
"""

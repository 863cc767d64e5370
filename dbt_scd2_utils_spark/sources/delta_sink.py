"""Delta Lake MERGE sink (optional; import-gated — delta-spark is not in
this container).

The reference's MERGE (``get_incremental_scd2_sql.sql:238-268``) maps 1:1
onto Delta's three-clause merge; this module carries that mapping so a
Delta-enabled deployment gets true in-place merge (file-level rewrite ∝
matched files + ``incremental_predicates`` file pruning) instead of the
vanilla join-and-overwrite path in ``operators/scd2.py``.

The merge SOURCE is the same DataFrame ``build_scd2_merge_source`` produces
for the vanilla path — only the sink differs, which is exactly the
"keep the sink behind an interface" decision of SURVEY.md §7.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import surrogate_key
from ..operators.scd2 import KEY_COL, OP_COL, build_scd2_merge_source
from ..plans.config import ScdConfig

try:  # pragma: no cover - delta not installed in the build container
    from delta.tables import DeltaTable

    HAS_DELTA = True
except ImportError:
    DeltaTable = None
    HAS_DELTA = False


def scd2_delta_merge(
    spark: SparkSession,
    target_table: str,
    batch: DataFrame,
    cfg: ScdConfig,
) -> None:
    """Apply one incremental SCD2 batch to a Delta table in place.

    Clause mapping (≡ get_incremental_scd2_sql.sql:238-268):
      ON    md5(dest scd2_unique_key cols) == src._scd2_key [AND predicates]
      WHEN MATCHED AND src._scd2_op = 'delete'  → DELETE
      WHEN MATCHED AND src._scd2_op = 'upsert'  → UPDATE SET merge_update_cols
      WHEN NOT MATCHED AND src._scd2_op = 'upsert' → INSERT all columns
    """
    if not HAS_DELTA:
        raise ImportError(
            "delta-spark is not installed; use operators.scd2.scd2_incremental "
            "(join-and-overwrite) or plans.build.ScdTable instead."
        )
    target_df = spark.table(target_table)
    source, _prev, business_cols = build_scd2_merge_source(target_df, batch, cfg)
    all_cols = business_cols + cfg.audit_columns

    from pyspark.sql import functions as F

    dt = DeltaTable.forName(spark, target_table)
    dest_key = surrogate_key([f"d.{c}" for c in cfg.scd2_unique_key])
    cond = dest_key == source[KEY_COL]
    # incremental_predicates AND-ed into the ON clause → Delta file pruning
    # (get_incremental_scd2_sql.sql:247-255).
    for pred in cfg.incremental_predicates:
        cond = cond & F.expr(pred)

    merge = dt.alias("d").merge(source.alias("s"), cond)
    if cfg.effective_collapse:
        merge = merge.whenMatchedDelete(condition=f"s.{OP_COL} = 'delete'")
    merge = merge.whenMatchedUpdate(
        condition=f"s.{OP_COL} = 'upsert'",
        set={c: f"s.{c}" for c in cfg.merge_update_cols},
    ).whenNotMatchedInsert(
        condition=f"s.{OP_COL} = 'upsert'",
        values={c: f"s.{c}" for c in all_cols},
    )
    merge.execute()

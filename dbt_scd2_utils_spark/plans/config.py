"""SCD configuration: resolution, defaults, validation.

Python equivalent of the reference's planner-side config handling:
``macros/materializations/scd/scd_plan.sql:24-287`` (validation and
precedence), ``macros/get_config_value.sql:21-32`` (meta > config > vars >
default precedence), and the package defaults in ``dbt_project.yml:26-44``.

Error messages intentionally match the reference's compiler errors so the
negative tests (``integration_tests/test_scd_negative.sh:22-48``) port 1:1.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field, replace
from typing import Any, Mapping, Sequence

from .. import functions as _  # noqa: F401  (package init ordering)
from ..functions.lists import (
    is_array,
    list_difference,
    list_intersection,
    list_union,
)


class ScdConfigError(ValueError):
    """Equivalent of dbt's compiler error for invalid SCD configuration."""


# Package defaults — mirror of /root/reference/dbt_project.yml:26-44.
DEFAULTS: dict[str, Any] = {
    "scd_type": 2,
    "updated_at_column": "_updated_at",
    "is_current_column": "_is_current",
    "valid_from_column": "_valid_from",
    "valid_to_column": "_valid_to",
    "change_type_column": "_change_type",
    "default_valid_to": "2999-12-31 23:59:59",
    "default_valid_from": "1900-01-01 00:00:00",
    "exclude_data_after_run_start": False,
    "update_all_previous_records": True,
    "collapse_redundant_versions": True,
    "loaded_at_column": "_loaded_at",
}


@dataclass(frozen=True)
class ScdConfig:
    """Resolved configuration for one SCD model build."""

    unique_key: Sequence[str] = ()
    scd_type: int = 2
    updated_at_column: str = "_updated_at"
    is_current_column: str = "_is_current"
    valid_from_column: str = "_valid_from"
    valid_to_column: str = "_valid_to"
    change_type_column: str = "_change_type"
    created_at_column: str | None = None
    deleted_at_column: str | None = None
    # change_columns.include / exclude (scd_plan.sql:189-222); legacy names
    # scd_check_columns / exclude_columns_from_change_check resolve here too.
    change_columns_include: Sequence[str] | None = None
    change_columns_exclude: Sequence[str] = ()
    default_valid_to: str = "2999-12-31 23:59:59"
    default_valid_from: str = "1900-01-01 00:00:00"
    update_all_previous_records: bool = True
    collapse_redundant_versions: bool = True
    loaded_at_column: str = "_loaded_at"
    incremental_predicates: Sequence[str] = ()
    exclude_data_after_run_start: bool = False

    # ---- derived ----------------------------------------------------------

    @property
    def audit_columns(self) -> list[str]:
        """Audit column names (scd_plan.sql:88)."""
        return [
            self.is_current_column,
            self.valid_from_column,
            self.valid_to_column,
            self.change_type_column,
        ]

    @property
    def scd2_unique_key(self) -> list[str]:
        """Business key + updated_at (scd_plan.sql:203)."""
        return list(self.unique_key) + [self.updated_at_column]

    @property
    def merge_update_cols(self) -> list[str]:
        """Columns a matched-update rewrites (scd_plan.sql:182-187)."""
        cols = [self.is_current_column, self.valid_to_column]
        if self.update_all_previous_records:
            cols.append(self.change_type_column)
        return cols

    @property
    def effective_collapse(self) -> bool:
        """collapse requires update_all_previous_records (scd_plan.sql:172-180)."""
        return self.collapse_redundant_versions and self.update_all_previous_records

    # ---- validation -------------------------------------------------------

    def validate(self) -> "ScdConfig":
        """Fail-fast checks, mirroring scd_plan.sql:33-76 with the same
        messages (negative tests grep for these substrings)."""
        if self.scd_type not in (0, 1, 2):
            raise ScdConfigError(
                "scd_type must be 0, 1 or 2 for the scd materialization, "
                f"got: {self.scd_type}"
            )
        if self.unique_key is None or len(self.unique_key) == 0:
            raise ScdConfigError(
                "You must provide a unique_key configuration for the scd "
                "materialization.\nThis should be the business key (natural "
                "key) of the dimension."
            )
        if not is_array(self.unique_key):
            raise ScdConfigError(
                "The unique_key configuration must be an array of column "
                f"names.\nReceived: {self.unique_key} "
                f"({type(self.unique_key).__name__})"
            )
        if self.scd_type in (0, 1) and self.deleted_at_column is not None:
            raise ScdConfigError(
                f"deleted_at_column ('{self.deleted_at_column}') is set on an "
                f"SCD type {self.scd_type} model, but\ndeletion tracking is "
                "not supported for SCD types 0 and 1. Either remove "
                "deleted_at_column or\nuse scd_type=2."
            )
        if not self.update_all_previous_records:
            warnings.warn(
                "update_all_previous_records is set to false.\n"
                "This is a performance optimization that reduces the number "
                "of records updated during incremental runs.\nHowever, this "
                "setting assumes that no new data will arrive with timestamps "
                "that predate the earliest record for a given key (i.e., no "
                '"backfill" data).',
                stacklevel=2,
            )
            if self.collapse_redundant_versions:
                warnings.warn(
                    "collapse_redundant_versions requires "
                    "update_all_previous_records=true to be safe; redundant "
                    "versions will be retained.",
                    stacklevel=2,
                )
        return self

    def validate_against_schema(self, columns) -> "ScdConfig":
        """Column-existence checks against the model output schema
        (scd_plan.sql:90-102).  Accepts a plain name sequence or a
        ``StructType``; with a StructType the DATE-typed updated_at warning
        (scd_plan.sql:224-238) is emitted too."""
        fields = getattr(columns, "fields", None)
        if fields is not None:
            for f in fields:
                if f.name.upper() == self.updated_at_column.upper():
                    t = f.dataType.typeName().upper()
                    if "DATE" in t and "TIME" not in t:
                        warnings.warn(
                            f"Column '{self.updated_at_column}' has type "
                            f"'{t}' which is a DATE type.\nSCD2 logic works "
                            "best with TIMESTAMP types for precise change "
                            "tracking.\nConsider using a TIMESTAMP column "
                            "for more accurate validity windows.\n"
                            "Undocumented behavior may occur when using "
                            "DATE types.",
                            stacklevel=2,
                        )
            columns = [f.name for f in fields]
        upper = [c.upper() for c in columns]
        for setting_name, setting_value in (
            ("created_at_column", self.created_at_column),
            ("deleted_at_column", self.deleted_at_column),
        ):
            if setting_value is not None and setting_value.upper() not in upper:
                raise ScdConfigError(
                    f"{setting_name} ('{setting_value}') is configured but is "
                    "not a column produced by\nthis model. Add the column to "
                    f"the model or unset {setting_name}.\n"
                    f"Available columns: {', '.join(upper)}"
                )
        if self.updated_at_column.upper() not in upper:
            raise ScdConfigError(
                f"updated_at_column ('{self.updated_at_column}') is not a "
                "column produced by this model.\n"
                f"Available columns: {', '.join(upper)}"
            )
        for k in self.unique_key:
            if k.upper() not in upper:
                raise ScdConfigError(
                    f"unique_key column ('{k}') is not a column produced by "
                    f"this model.\nAvailable columns: {', '.join(upper)}"
                )
        return self

    # ---- planner column math ---------------------------------------------

    def check_columns(self, dest_columns: Sequence[str]) -> list[str]:
        """The change-detection column set (scd_plan.sql:189-222).

        include (if given) ∩ dest, minus (exclude ∪ unique_key ∪ audit ∪
        updated_at); all case-insensitive, order-preserving.
        """
        exclude = list(self.change_columns_exclude) + [self.updated_at_column]
        exclude_all = list_union(
            exclude, list(self.unique_key), self.audit_columns
        )
        if self.change_columns_include is not None:
            cols = list_intersection(
                list(self.change_columns_include), list(dest_columns),
                case_insensitive=True,
            )
        else:
            cols = list(dest_columns)
        return list_difference(cols, exclude_all, case_insensitive=True)

    def business_columns(self, dest_columns: Sequence[str]) -> list[str]:
        """All model columns minus audit columns
        (get_incremental_scd2_sql.sql:67-72)."""
        return list_difference(
            list(dest_columns), self.audit_columns, case_insensitive=True
        )

    def with_overrides(self, **kw) -> "ScdConfig":
        return replace(self, **kw)


def resolve_config(
    meta: Mapping[str, Any] | None = None,
    config: Mapping[str, Any] | None = None,
    vars: Mapping[str, Any] | None = None,
    **overrides: Any,
) -> ScdConfig:
    """Resolve with the reference's precedence: meta > config > vars >
    package default (get_config_value.sql:21-32, scd_plan.sql:33-47).

    ``vars`` corresponds to the ``dbt_scd2_utils:`` var namespace.
    Legacy names (``scd_check_columns`` / ``exclude_columns_from_change_check``)
    and the nested ``change_columns: {include, exclude}`` form are both
    accepted, new form winning (scd_plan.sql:189-201).
    """
    meta = dict(meta or {})
    config = dict(config or {})
    vars = dict(vars or {})

    def get(key: str, default: Any = None) -> Any:
        if key in overrides and overrides[key] is not None:
            return overrides[key]
        if key in meta and meta[key] is not None:
            return meta[key]
        if key in config and config[key] is not None:
            return config[key]
        if key in vars and vars[key] is not None:
            return vars[key]
        return DEFAULTS.get(key, default)

    change_cols = get("change_columns")
    if change_cols is not None:
        include = get_nested(change_cols, "include")
        exclude = get_nested(change_cols, "exclude") or []
    else:
        include = get("scd_check_columns")
        exclude = get("exclude_columns_from_change_check") or []

    cfg = ScdConfig(
        unique_key=tuple(get("unique_key") or ()),
        scd_type=int(get("scd_type")),
        updated_at_column=get("updated_at_column"),
        is_current_column=get("is_current_column"),
        valid_from_column=get("valid_from_column"),
        valid_to_column=get("valid_to_column"),
        change_type_column=get("change_type_column"),
        created_at_column=get("created_at_column"),
        deleted_at_column=get("deleted_at_column"),
        change_columns_include=tuple(include) if include is not None else None,
        change_columns_exclude=tuple(exclude),
        default_valid_to=get("default_valid_to"),
        default_valid_from=get("default_valid_from"),
        update_all_previous_records=bool(get("update_all_previous_records")),
        collapse_redundant_versions=bool(get("collapse_redundant_versions")),
        loaded_at_column=get("loaded_at_column"),
        incremental_predicates=tuple(get("incremental_predicates") or ()),
        exclude_data_after_run_start=bool(get("exclude_data_after_run_start")),
    )
    return cfg.validate()


def get_nested(obj: Any, key: str, default: Any = None) -> Any:
    if isinstance(obj, Mapping):
        return obj.get(key, default)
    return default

"""Schema contract enforcement.

dbt model contracts (``contract={'enforced': true}``) assert the FINAL
relation's column names and types — not the temp delta —
(``create_temp_table_as.sql:1-5``; regression model
``integration_tests/models/scd2_materialization/customers_scd2_contract.sql:1-26``
with the contract columns at ``schema.yml:159-192``).  Spark equivalent:
assert the result DataFrame's schema against an expected ``StructType``
(or name→type-name mapping), case-insensitively, with dbt-style errors.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import DataType, StructType


class ContractError(ValueError):
    """Raised when a model's final schema violates its declared contract."""


# dbt/Snowflake contract type names → Spark type-name synonyms (SURVEY.md §1.2).
_SYNONYMS: dict[str, set[str]] = {
    "number": {"bigint", "int", "integer", "long", "decimal", "double", "smallint"},
    "integer": {"int", "integer", "bigint", "long"},
    "varchar": {"string", "varchar"},
    "boolean": {"boolean"},
    "timestamp_tz": {"timestamp", "timestamp_ltz"},
    "timestamp_ntz": {"timestamp_ntz", "timestamp"},
    "date": {"date"},
    "float": {"double", "float"},
}


def _type_matches(declared: str, actual: str) -> bool:
    d = declared.lower()
    a = actual.lower()
    if d == a:
        return True
    base = a.split("(")[0]
    return base in _SYNONYMS.get(d, {d})


def enforce_contract(
    df: DataFrame,
    contract: Mapping[str, str] | StructType | Sequence[tuple[str, str]],
) -> DataFrame:
    """Assert ``df``'s schema satisfies the contract; returns ``df`` unchanged.

    ``contract`` maps column name → declared type (dbt/Snowflake or Spark
    type names).  Checks, dbt-style: same column set (order-insensitive,
    case-insensitive names) and compatible types; errors list every
    difference at once.
    """
    if isinstance(contract, StructType):
        items: list[tuple[str, str]] = [
            (f.name, f.dataType.simpleString()) for f in contract.fields
        ]
    elif isinstance(contract, Mapping):
        items = list(contract.items())
    else:
        items = list(contract)

    actual = {name.lower(): dtype for name, dtype in df.dtypes}
    declared = {name.lower(): t for name, t in items}

    problems: list[str] = []
    for name, t in declared.items():
        if name not in actual:
            problems.append(f"  - missing column: {name} ({t})")
        elif not _type_matches(t, actual[name]):
            problems.append(
                f"  - type mismatch: {name} declared {t}, got {actual[name]}"
            )
    for name in actual:
        if name not in declared:
            problems.append(f"  - unexpected column: {name} ({actual[name]})")

    if problems:
        raise ContractError(
            "This model has an enforced contract that failed.\n"
            "Please ensure the name, data_type, and number of columns in "
            "your contract match the columns in your model's definition.\n"
            + "\n".join(problems)
        )
    return df

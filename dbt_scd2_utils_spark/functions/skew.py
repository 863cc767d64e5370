"""Hot-key (skew) mitigation for equi-joins: deterministic salting.

A shuffled equi-join hash-partitions both sides by the key, so ONE hot
key (a celebrity user, an empty-string default, a null-surrogate) lands
its entire row population in ONE task — the stage runs at the speed of
that straggler no matter how many executors exist.  AQE's skew-join
splitting (enabled by session.get_spark) already handles most
sort-merge-join cases at runtime; explicit salting remains the tool when
AQE cannot help: stream-static joins, joins feeding a same-key
aggregation that must stay co-partitioned, or engines/planners without
runtime re-optimization.

``salted_join`` spreads each key across ``salts`` sub-partitions:

- the PROBE side gets a per-row salt — a hash of the whole row mixed
  with a per-row unique id, so a hot key's rows fan out uniformly over
  ``salts`` tasks even when the rows are byte-identical duplicates
  (e.g. a probe projected down to just the join key).  The id component
  makes the salt nondeterministic across retries/layouts, which is safe
  here: every salt value yields the same join output, only the task
  placement differs;
- the BUILD side is replicated once per salt (explode over
  ``sequence(0, salts-1)``) — its shuffle volume grows ``salts``×, which
  is the explicit price of cutting the hot partition ``salts``×; keep
  the smaller relation on the build side;
- the join key becomes (key, salt), and the result is EXACTLY the plain
  join's (each probe row carries one salt; every build row meets it).

Supported join types: inner / left / left_semi / left_anti — types where
each probe row joins independently of other probe rows.  Full/right
joins would see the replicated build rows and are rejected.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALLOWED = {"inner", "left", "left_outer", "left_semi", "left_anti"}


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on`` with the key salted
    ``salts`` ways; output columns match ``probe.join(build, on, how)``."""
    if how not in _ALLOWED:
        raise ValueError(
            f"salted_join supports {sorted(_ALLOWED)}; got {how!r} "
            "(replicated build rows would corrupt right/full joins)"
        )
    if salts < 2:
        raise ValueError("salts must be >= 2 (1 would be a plain join)")
    keys = [on] if isinstance(on, str) else list(on)

    # Row-hash alone would send IDENTICAL duplicate rows of a hot key to
    # one sub-partition (the straggler reborn); mixing in a per-row
    # unique id spreads them.  Any salt value is output-equivalent, so
    # the id's retry nondeterminism cannot corrupt results.
    salt = F.pmod(
        F.xxhash64(
            *[F.col(c) for c in probe.columns],
            F.monotonically_increasing_id(),
        ),
        F.lit(salts),
    ).cast("int")
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = p.join(b, keys + ["__salt"], how)
    return out.drop("__salt")

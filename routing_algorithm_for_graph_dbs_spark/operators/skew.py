"""Skew-resistant shapes for hot-key joins and aggregations.

At 100 TB the failure mode isn't total data size — it's the ONE reducer
that receives a hot key. AQE's skew-join split handles the plain join
case at runtime; these operators cover the shapes AQE doesn't rewrite:

- ``skew_count_distinct``: exact COUNT(DISTINCT v) GROUP BY k. The naive
  plan shuffles every row of a hot key to one reducer before deduping;
  the two-stage shape dedups on (k, v) first — the shuffle key includes
  the value, so a hot key's rows spread across the whole cluster — then
  counts per key over the already-tiny distinct set.
- ``salted_join``: equi-join where the left side has hot keys and the
  right side is too large to broadcast. Each right row is replicated
  ``salt_n`` times; each left row picks one replica via a uniform salt.
  The hot key's rows land on ``salt_n`` reducers instead of one, at the
  cost of a bounded ``salt_n``x blowup of the right side.

Results are identical to the naive shapes (equality-tested); only the
physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key distinct count that survives hot keys (two-stage:
    distinct on (key, value), then count per key)."""
    return (
        df.select(*key_cols, value_col)
        .distinct()
        .groupBy(*key_cols)
        # count(col), not count(*): SQL COUNT(DISTINCT v) skips NULLs, so a
        # key with values {1, 2, NULL} must report 2 (and all-NULL keys 0)
        .agg(F.count(F.col(value_col)).cast("long").alias(out_col))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-tolerant equi-join: replicate ``right`` ``salt_n`` times and
    spread each left key's rows uniformly over the replicas.

    The salt is a deterministic hash of the full left row: a
    position-derived salt (partition id / monotonic id) would be recomputed
    differently on task retry AFTER reducers already fetched some shuffle
    blocks, silently dropping or duplicating rows (the classic
    nondeterministic-shuffle-key hazard; see operators/asof.py for the same
    rule). Fully-identical duplicate left rows share a salt — replicate-
    with-distinct-keys upstream if such rows are themselves the hot spot.
    Supported ``how``: inner / left joins (semantics preserved by
    replication + salt match); right and full-outer would double-count
    unmatched right replicas — rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: an"
            " unmatched right row appears once per replica under right/full"
            " semantics"
        )
    if salt_n < 1:
        raise ValueError(f"salt_n must be >= 1, got {salt_n}")
    lt = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_n))
        .cast("int"),
    )
    rt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return lt.join(rt, on + ["_salt"], how).drop("_salt")

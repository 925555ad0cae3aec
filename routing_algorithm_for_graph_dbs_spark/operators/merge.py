"""MERGE INTO (upsert) as one full-outer join — the batch sink pattern
for incremental corpus/table maintenance.

The reference's load path upserts node batches by key (SURVEY.md S4 —
``CREATE ... ON MATCH SET`` shape); open-source Spark has no MERGE
statement without a table format (Delta/Iceberg), but the semantics are
exactly one full-outer join on the key:

    matched            -> target row with the update columns overwritten
    source-only        -> inserted (target-only columns NULL)
    target-only        -> unchanged
    matched + delete   -> dropped

Scale shape: ONE shuffle of each side on the merge key — no collect, no
per-row lookups, large-large safe. With both sides bucketed on the key
(``sources/bucketing.py``) even that shuffle disappears. AQE handles a
skewed key distribution on the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    insert_unmatched: bool = True,
    delete_matched: bool | Column = False,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``; returns the merged
    relation with target's schema.

    ``update_cols`` — matched rows take these columns from source
    (default: every non-key column present in BOTH schemas). Target-only
    columns always keep the target value (NULL on inserts).
    ``insert_unmatched=False`` drops source-only rows (update-only merge).
    ``delete_matched`` — True deletes every matched row; a Column
    predicate (evaluated on the joined row) deletes selectively, e.g.
    ``F.col("s.op") == "D"`` for changelog application.

    Source must be unique per key (one update per key — enforce upstream
    with dropDuplicates/dedup; a duplicate source key would fan out the
    matched target row, which is MERGE's standard cardinality violation).
    """
    src_cols = set(source.columns)
    if update_cols is None:
        update_cols = [
            c for c in target.columns if c not in keys and c in src_cols
        ]
    missing = [c for c in update_cols if c not in src_cols]
    if missing:
        raise ValueError(f"update_cols absent from source: {missing}")

    t = target.withColumn("_t", F.lit(True)).alias("t")
    s = source.withColumn("_s", F.lit(True)).alias("s")
    joined = t.join(s, on=keys, how="full_outer")

    matched = F.col("_t").isNotNull() & F.col("_s").isNotNull()
    if delete_matched is not False:
        cond = matched if delete_matched is True else (matched & delete_matched)
        joined = joined.filter(~F.coalesce(cond, F.lit(False)))
    if not insert_unmatched:
        joined = joined.filter(F.col("_t").isNotNull())

    out = []
    for c in target.columns:
        if c in keys:
            out.append(F.col(c))  # join on=list merges key columns
        elif c in update_cols:
            out.append(
                F.when(F.col("_s").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """The inverse of :func:`merge_into`: diff two keyed snapshots into a
    changelog — (keys..., compare_cols..., op) with op I (key only in
    new), D (only in old), U (present in both, any compare column
    differing null-safely). Unchanged rows drop out. I/U rows carry the
    NEW values, D rows the OLD values, so applying the changelog to
    ``old`` with :func:`merge_into` (delete on op='D') reproduces ``new``.

    Same scale shape as merge_into: one full-outer join on the key, no
    collect. ``compare_cols`` defaults to every non-key column present in
    both schemas.
    """
    shared = set(old.columns) & set(new.columns)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys and c in shared]
    missing = [c for c in compare_cols if c not in shared]
    if missing:
        raise ValueError(f"compare_cols absent from a side: {missing}")

    o = old.withColumn("_o", F.lit(True)).alias("o")
    n = new.withColumn("_n", F.lit(True)).alias("n")
    joined = o.join(n, on=keys, how="full_outer")
    in_old = F.col("_o").isNotNull()
    in_new = F.col("_n").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out = [F.col(k) for k in keys]
    out += [
        F.when(in_new, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
        for c in compare_cols
    ]
    out.append(op.alias("op"))
    return joined.select(*out).filter(F.col("op").isNotNull())


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC change stream (multiple ops per key, ordered by
    ``seq_col``) to a keyed snapshot: the LATEST op per key wins —
    I/U upserts the row, D deletes it.

    This is the replay half of the merge/diff pair: ``merge_into`` takes
    one already-deduped update set, ``apply_cdc`` takes the raw stream a
    log-based source emits (Debezium/binlog shape) and collapses it
    first. A key whose latest op is D but which never existed in the
    target is a no-op (the anti-join can't remove what isn't there).

    Scale shape: every stage shuffles on the SAME key set — the
    latest-per-key window, merge_into's full-outer join, and the delete
    anti-join — so AQE/Catalyst plan one key-partitioning reused three
    times; per-key cost is bounded by that key's change count, no
    collect anywhere. Ties on ``seq_col`` are broken by preferring
    deletes (op desc: 'U'/'I' < 'D' lexically is NOT relied on — an
    explicit is-delete flag sorts last-wins deterministic), then by the
    non-key payload struct descending — two non-delete ops sharing
    (key, seq) would otherwise keep a nondeterministic payload across
    runs/partitionings. Unorderable payload columns (maps) enter the
    tiebreak through ``to_json`` (a deterministic serialization) since
    Spark's window orderBy rejects MapType.
    """
    is_del = (F.col(op_col) == F.lit("D")).cast("int")

    def _orderable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    payload = F.struct(
        *[
            F.col(f.name) if _orderable(f.dataType) else F.to_json(f.name)
            for f in changes.schema.fields
            if f.name not in set(keys)
        ]
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), is_del.desc(), payload.desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    upserts = latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    deletes = latest.filter(F.col(op_col) == "D").select(*keys)
    merged = merge_into(target, upserts, keys, update_cols=update_cols)
    return merged.join(deletes, keys, "left_anti")

"""Z-order (Morton) layout: multi-column data skipping for 100 TB scans.

Sorting a table by ONE column gives perfect min/max pruning on that
column and none on any other. Interleaving the bits of several columns
into one Morton key and range-sorting by it gives every interleaved
column *locality* — each file's min/max footprint covers a small rectangle
of the key space — so predicates on ANY of the columns skip most files at
planning time (the Delta/Iceberg OPTIMIZE ZORDER BY recipe, built here
from plain Spark primitives: bit ops + repartitionByRange + parquet
row-group stats).

Everything is a deterministic column expression (shift/and/or), so the
key itself is oracle-checkable in any engine with integer bit ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of the given non-negative
    integer columns into one long. Column i contributes bit b of its value
    to position ``b * len(cols) + i`` of the key — the standard Z-curve.

    ``len(cols) * bits`` must fit in 63 bits. Callers with unbounded or
    skewed domains should pre-bucket (e.g. ntile or >> shift) to
    ``bits``-bit ranks first; values beyond ``bits`` bits fold into the
    same key region (low-bits truncation), which degrades locality but
    never correctness.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + i)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet range-partitioned and sorted by the Morton
    key of ``cols``: each output file covers a compact rectangle of the
    (cols...) space, so min/max row-group stats prune scans filtered on
    any of the interleaved columns. The key is dropped from the files —
    it is a layout device, not data.

    Columns are min/max-scaled to a common ``bits``-bit range BEFORE
    interleaving (one aggregation pass, integer affine map). Interleaving
    RAW values is the classic Z-order mistake: whichever column has the
    wider domain owns the key's high bits and the layout degenerates to a
    single-column sort — measured on (p_partkey 11 bits, p_size 6 bits),
    raw interleave left p_size's per-file span at the full range while the
    scaled key cuts both columns' footprints.
    """
    span = F.lit((1 << bits) - 1)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    keyed = df.crossJoin(F.broadcast(bounds))
    scaled = []
    for c in cols:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        width = F.greatest(F.lit(1), hi - lo + 1)
        scaled.append(
            ((F.col(c) - lo).cast("long") * span / width).cast("long")
        )
    keyed = keyed.withColumn("_zkey", zorder_key(scaled, bits)).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Compact a parquet directory's small files toward ``target_mb``
    outputs — the maintenance pass every long-lived ingest needs (each
    streaming microbatch / incremental append leaves files far below the
    scan-efficient size; thousands of tiny files turn planning and
    readahead into the bottleneck).

    Rewrites into ``ceil(total_bytes / target)`` files via coalesce (no
    shuffle) — or, when ``sort_cols`` is given, via a range repartition +
    sort so compaction ALSO restores clustering (combine with
    ``write_zordered`` semantics by passing the layout columns). Writes to
    a sibling temp dir then swaps, so a crash mid-compact never leaves the
    table truncated. Returns {files_before, files_after, bytes}.
    """
    import math
    import os
    import shutil

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    if sort_cols:
        (
            df.repartitionByRange(n_out, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(tmp)
        )
    else:
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "._compact_old"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    n_after = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    return {"files_before": len(files), "files_after": n_after, "bytes": total}

"""Dataset fingerprinting — cheap content identity for audit/lineage.

A 100 TB corpus can't be compared by sorting and diffing; what a
pipeline needs is a deterministic, ORDER-INSENSITIVE fingerprint that
any engine can recompute: did this snapshot change? did the copy land
bit-identical? which partition diverged?

Construction: each row canonicalizes to a byte string (NULL-marked,
unit-separated), hashes to a 60-bit integer (15 md5 hex chars — stays
positive in a signed 64-bit lane on every engine), and the group's
fingerprint is the XOR-fold of its row hashes plus the row count. XOR
is commutative/associative (partition order never matters), overflow-
free, and map-side combinable — the whole fingerprint is one scan and
one tiny shuffle of (group, partial-xor, partial-count) pairs.

XOR's known weakness — a value appearing an even number of times
cancels out — is why the count rides along: (n_rows, xor) together
catch duplication-count changes that xor alone would miss for pairs.
Collision odds for 60-bit hashes are the usual birthday bound; this is
an AUDIT fingerprint, not a cryptographic commitment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NULL_MARK = "\x00NULL"
_SEP = "\x1f"


def row_hash60(cols: list[str]):
    """60-bit per-row content hash column over ``cols`` (order matters —
    pass a canonical column order)."""
    canon = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_MARK)) for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *canon)), 1, 15), 16, 10
    ).cast("long")


def dataset_fingerprint(
    df: DataFrame,
    cols: list[str] | None = None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """(group_by..., n_rows, xor_fp) — or one global row when
    ``group_by`` is None. ``cols`` default: every non-group column in
    schema order (pin the list explicitly when schemas may evolve).

    Columns should stringify identically across engines — integers,
    strings, dates; floats are engine-formatting-sensitive, pre-round
    and cast them yourself.
    """
    if cols is None:
        cols = [c for c in df.columns if c not in (group_by or [])]
    h = row_hash60(cols)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(_h)").alias("xor_fp"),
    ]
    hashed = df.withColumn("_h", h)
    if group_by:
        return hashed.groupBy(*group_by).agg(*aggs)
    return hashed.agg(*aggs)

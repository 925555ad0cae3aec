"""Slowly-changing-dimension (SCD2) history from a change stream.

Training-data pipelines version their metadata (license, source config,
quality tier) the same way a warehouse versions dimensions: collapse an
append-only change stream into validity intervals, one row per run of
consecutive equal values per key —

    (key, value, valid_from = first ts of the run,
                 valid_to   = next run's start, NULL while current)

Scale shape: two window passes over the SAME (key)-partitioning — the
change-flag lag/row_number and the interval lead shuffle once on the key
and never again (Catalyst reuses the sort order); no self-join, no
collect. Skewed keys are bounded by per-key history length, not corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse ``df`` into SCD2 intervals of ``attr`` per ``key``.

    ``order_cols`` — extra deterministic tie-break columns after ``ts``
    (pass the event id when timestamps can collide). NULL attr values
    compare null-safely: a run of NULLs is one interval, NULL -> value is
    a change. Consecutive duplicates collapse into their first row.
    Output: (key, attr, valid_from, valid_to, is_current).
    """
    order = [F.col(ts)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key).orderBy(*order)
    flagged = df.select(
        key,
        attr,
        ts,
        *(order_cols or []),
        F.row_number().over(w).alias("_rn"),
        F.lag(attr).over(w).alias("_prev"),
    )
    runs = flagged.filter(
        (F.col("_rn") == 1) | ~F.col(attr).eqNullSafe(F.col("_prev"))
    )
    w_runs = Window.partitionBy(key).orderBy(F.col(ts), F.col("_rn"))
    return runs.select(
        key,
        attr,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w_runs).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def snapshot_asof(history: DataFrame, at: Column) -> DataFrame:
    """Time-travel over an SCD2 relation: the rows valid at instant
    ``at`` — ``valid_from <= at < valid_to`` with an open (NULL)
    ``valid_to`` meaning "still current". The inverse of
    :func:`scd2_history`: one row per key that existed at ``at``.

    Pure filter — no shuffle, no window; pushes down to the scan when the
    history is stored partitioned/sorted on ``valid_from``. ``at`` is a
    Column so callers can pass a literal instant or a per-row expression
    (e.g. an event's own timestamp for an as-of enrichment)."""
    return history.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (at < F.col("valid_to")))
    ).drop("is_current")

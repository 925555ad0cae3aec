"""Grouped linear recurrences (EWMA) — the per-key sequential fold no
built-in window expresses.

EWMA is ``e_t = (1 - alpha) * e_{t-1} + alpha * x_t`` with ``e_1 = x_1``
— a linear recurrence, inherently sequential per key. The closed-form
window rewrite (``sum((1-alpha)^(t-j) x_j)``) needs ``(1-alpha)^(-j)``
prefix terms that overflow double for long series, so the honest
distributed shape is a grouped Arrow-batched fold: ``applyInPandas``
over the key — each key's series lands in one task sorted, folds in one
tight loop, and ships one row (or the series) back. Shuffle = one
exchange on the key; per-task memory is bounded by the LONGEST single
key's history, not the corpus (same contract as every grouped-window op
here).

Fold order is deterministic (ts + caller tie-breaks), so results are
bit-reproducible and hash-checkable against DuckDB's ``list_reduce``
fold of the identically-ordered list.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def ewma_last(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    alpha: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Final EWMA state per key: (key, ewma). ``order_cols`` break ts
    ties deterministically (pass the event id)."""
    sort_cols = [ts] + list(order_cols or [])
    key_field = df.schema[key]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        e = None
        for x in pdf[value_col].to_numpy():
            e = float(x) if e is None else (1.0 - alpha) * e + alpha * float(x)
        return pd.DataFrame({key: [pdf[key].iloc[0]], "ewma": [e]})

    schema = f"{key} {key_field.dataType.simpleString()}, ewma double"
    return df.select(key, *sort_cols, value_col).groupBy(key).applyInPandas(
        fold, schema=schema
    )


def ewma_series(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    alpha: float,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row EWMA trajectory: input columns + ``ewma`` (the state AFTER
    absorbing that row), in arbitrary row order — re-sort downstream."""
    sort_cols = [ts] + list(order_cols or [])

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").copy()
        out = []
        e = None
        for x in pdf[value_col].to_numpy():
            e = float(x) if e is None else (1.0 - alpha) * e + alpha * float(x)
            out.append(e)
        pdf["ewma"] = out
        return pdf

    schema = df.select(key, *sort_cols, value_col).schema.add("ewma", "double")
    return df.select(key, *sort_cols, value_col).groupBy(key).applyInPandas(
        fold, schema=schema
    )

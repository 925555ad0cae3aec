"""Temporal column functions.

The reference stores GTFS clock strings as Neo4j ``time()`` values and does
duration arithmetic with ``duration.inSeconds`` (reference
``new_dbSetup.py:61``, ``main.py:17,101,132,140``). Spark has no time-of-day
type, so the engine stores **INT seconds since midnight**. This is strictly
more faithful to GTFS than the reference: GTFS times can exceed 24:00:00
(trips past midnight), which ``time()`` cannot represent but an int can —
documented divergence per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hms_to_seconds(col: Column) -> Column:
    """Parse ``'HH:MM:SS'`` (HH may exceed 23) to int seconds-since-midnight."""
    parts = F.split(col, ":")
    return (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    )


def seconds_to_hms(col: Column) -> Column:
    """Render int seconds-since-midnight back to ``'HH:MM:SS'`` (HH can be >=24)."""
    h = F.floor(col / 3600).cast("int")
    m = F.floor((col % 3600) / 60).cast("int")
    s = (col % 60).cast("int")
    return F.concat_ws(
        ":",
        F.lpad(h.cast("string"), 2, "0"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lpad(s.cast("string"), 2, "0"),
    )

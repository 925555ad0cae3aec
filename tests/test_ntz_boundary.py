"""Timestamp-encoding parity at the events source boundary.

The driver's events.parquet has shipped under three encodings across sandbox
Spark/Arrow upgrades: TIMESTAMP(NANOS) (read as bigint under nanosAsLong),
tz-less timestamp[us] (read as TIMESTAMP_NTZ on Spark 4.x), and tz-ful
timestamp[us, tz=UTC] (read as TIMESTAMP). ``normalize_event_ts`` must fold
all three to plain TimestampType with identical epoch-microsecond values so
every ts-consuming query keeps building and hash-matching DuckDB regardless
of which encoding the next Spark default produces.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

MICROS = [
    1_695_000_000_000_000,
    1_695_000_123_456_789,  # non-zero sub-second micros
    1_700_000_000_999_999,
]


def _write(tmp_path, name, arr_type, values):
    table = pa.table(
        {
            "event_id": pa.array(range(len(values)), pa.int64()),
            "ts": pa.array(values, arr_type),
            "user_id": pa.array([7] * len(values), pa.int64()),
            "event_type": pa.array(["view"] * len(values), pa.string()),
            "value": pa.array([1.0] * len(values), pa.float64()),
            "props": pa.array(["{}"] * len(values), pa.string()),
        }
    )
    path = os.path.join(str(tmp_path), name)
    pq.write_table(table, path)
    return path


@pytest.mark.parametrize(
    "arr_type",
    [
        pa.timestamp("us"),  # Spark 4.x reads as TIMESTAMP_NTZ
        pa.timestamp("us", tz="UTC"),  # reads as TIMESTAMP
        pa.timestamp("ns"),  # reads as bigint under nanosAsLong
    ],
    ids=["ntz-us", "utc-us", "nanos"],
)
def test_normalize_event_ts_all_encodings(spark, tmp_path, arr_type):
    from routing_algorithm_for_graph_dbs_spark.sources.testdata import normalize_event_ts

    values = [m * 1000 for m in MICROS] if arr_type.unit == "ns" else MICROS
    path = _write(tmp_path, "events.parquet", arr_type, values)
    df = normalize_event_ts(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["us"] for r in df.select(F.unix_micros("ts").alias("us")).orderBy("event_id").collect()]
    assert got == MICROS


@pytest.mark.parametrize(
    "arr_type",
    [pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["ntz-us", "utc-us"],
)
def test_ts_queries_build_and_agree_across_encodings(spark, tmp_path, arr_type):
    """Every ts-consuming driver query must build (reach a physical plan and
    return rows) on both tz-less and tz-ful events files with equal results."""
    from routing_algorithm_for_graph_dbs_spark.driver_surface import QUERIES

    sf_dir = str(tmp_path / arr_type.__class__.__name__) + ("_tz" if arr_type.tz else "_ntz")
    os.makedirs(sf_dir, exist_ok=True)
    _write(sf_dir, "events.parquet", arr_type, MICROS)

    for name in ("p5_computed_theta", "asof_last_view", "rng_followup_events"):
        df = QUERIES[name](spark, sf_dir)
        rows = df.collect()  # must not raise DATATYPE_MISMATCH
        assert rows is not None


def test_ts_query_values_identical_between_encodings(spark, tmp_path):
    from routing_algorithm_for_graph_dbs_spark.driver_surface import QUERIES

    dirs = {}
    for tag, t in (("ntz", pa.timestamp("us")), ("tz", pa.timestamp("us", tz="UTC"))):
        d = str(tmp_path / tag)
        os.makedirs(d, exist_ok=True)
        _write(d, "events.parquet", t, MICROS)
        dirs[tag] = d

    for name in ("asof_last_view", "rng_followup_events"):
        a = sorted(map(str, QUERIES[name](spark, dirs["ntz"]).collect()))
        b = sorted(map(str, QUERIES[name](spark, dirs["tz"]).collect()))
        assert a == b, f"{name}: NTZ vs TZ results diverge"

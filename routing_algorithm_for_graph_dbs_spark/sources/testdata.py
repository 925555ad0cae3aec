"""Loader for the driver's synthetic tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events table's ``ts`` to plain TimestampType.

    The driver's parquet has shipped as TIMESTAMP(NANOS) (read as bigint
    under ``spark.sql.legacy.parquet.nanosAsLong``) and as tz-less
    ``timestamp[us]`` (read as TIMESTAMP_NTZ on Spark 4.x, which
    ``unix_micros()``/``window()`` reject). Fold both encodings to
    TimestampType once, at the source boundary; with the session tz pinned
    to UTC both paths are micro-exact and match DuckDB's ``epoch_us``.
    """
    ts_type = dict(df.dtypes).get(col)
    if ts_type == "bigint":
        # integer division: ts/1000 through a double would be off by 1 us
        # on ~a quarter of rows (double ulp at epoch-ns magnitude ~0.25)
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out = {}
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            if t == "events":
                df = normalize_event_ts(df)
            out[t] = df
    return out

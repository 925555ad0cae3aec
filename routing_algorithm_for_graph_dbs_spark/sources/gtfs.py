"""GTFS CSV ingestion (SURVEY.md §2.1 S1-S5).

Parity with the reference ETL:

- ``LOAD CSV WITH HEADERS`` per entity (reference ``new_dbSetup.py:33-63``)
  -> ``spark.read.csv`` with explicit schemas (no inference: inference is a
  full extra data pass and nondeterministic at scale).
- explicit casts (``toInteger``/``toFloat``/``time()``/``date()``,
  ``new_dbSetup.py:42,55,61,89``) -> typed columns; clock strings become INT
  seconds-since-midnight (see functions.temporal).
- ``reshape.py:9-36`` (filter calendar_dates to service_ids present in
  trips.txt + reformat date) -> a left-semi join + ``to_date``.
- uniqueness constraints (``new_dbSetup.py:17-22``) -> ``dropDuplicates`` on
  the key at ingest (batch semantics of MERGE).

At scale: each table is a parquet write; stop_times (the big table — the
reference batches it with apoc.periodic.iterate, ``new_dbSetup.py:59-63``)
is naturally partitioned by Spark tasks; no explicit batching needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from routing_algorithm_for_graph_dbs_spark.functions.temporal import hms_to_seconds

# Raw-file schemas: columns exactly as the reference reads them (FIXTURES.md §A).
GTFS_SCHEMAS: dict[str, T.StructType] = {
    "agency": T.StructType(
        [
            T.StructField("agency_id", T.StringType()),
            T.StructField("agency_name", T.StringType()),
            T.StructField("agency_url", T.StringType()),
            T.StructField("agency_timezone", T.StringType()),
        ]
    ),
    "routes": T.StructType(
        [
            T.StructField("route_id", T.StringType()),
            T.StructField("agency_id", T.StringType()),
            T.StructField("short_name", T.StringType()),
            T.StructField("route_long_name", T.StringType()),
            T.StructField("route_type", T.StringType()),  # cast to int below
        ]
    ),
    "trips": T.StructType(
        [
            T.StructField("route_id", T.StringType()),
            T.StructField("service_id", T.StringType()),
            T.StructField("trip_id", T.StringType()),
            T.StructField("direction_id", T.StringType()),
            T.StructField("shape_id", T.StringType()),
            T.StructField("trip_headsign", T.StringType()),
        ]
    ),
    "stops": T.StructType(
        [
            T.StructField("stop_id", T.StringType()),
            T.StructField("stop_name", T.StringType()),
            T.StructField("stop_lat", T.StringType()),  # toFloat below
            T.StructField("stop_lon", T.StringType()),
        ]
    ),
    "stop_times": T.StructType(
        [
            T.StructField("trip_id", T.StringType()),
            T.StructField("arrival_time", T.StringType()),
            T.StructField("departure_time", T.StringType()),
            T.StructField("stop_id", T.StringType()),
            T.StructField("stop_sequence", T.StringType()),  # toInteger below
        ]
    ),
    "calendar_dates": T.StructType(
        [
            T.StructField("service_id", T.StringType()),
            T.StructField("date", T.StringType()),  # YYYYMMDD
            T.StructField("exception_type", T.StringType()),
        ]
    ),
    # Footway extension (FIXTURES.md §A, Tesina p.3)
    "foot_nodes": T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("latitude", T.StringType()),
            T.StructField("longitude", T.StringType()),
            T.StructField("footway_id", T.StringType()),
        ]
    ),
    "foot_edges": T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("dst", T.StringType()),
            T.StructField("rel_type", T.StringType()),
            T.StructField("length", T.StringType()),
        ]
    ),
    "foot_near_stop": T.StructType(
        [
            T.StructField("footnode_id", T.StringType()),
            T.StructField("stop_id", T.StringType()),
        ]
    ),
}

_FILE_NAMES = {
    "agency": "agency.txt",
    "routes": "routes.txt",
    "trips": "trips.txt",
    "stops": "stops.txt",
    "stop_times": "stop_times.txt",
    "calendar_dates": "calendar_dates.txt",
    "foot_nodes": "foot_nodes.txt",
    "foot_edges": "foot_edges.txt",
    "foot_near_stop": "foot_near_stop.txt",
}


def _read_csv(spark: SparkSession, path: str, name: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .schema(GTFS_SCHEMAS[name])
        .csv(path)
    )


def reshape_calendar_dates(trips: DataFrame, calendar_dates: DataFrame) -> DataFrame:
    """Parity with reference ``reshape.py:9-36``.

    Keep only calendar rows whose service_id appears in trips (left-semi
    join, ``reshape.py:30-36``), reformat YYYYMMDD -> DATE
    (``reshape.py:33-35``). Returns (service_id, day DATE, exception_type).
    """
    service_ids = trips.select("service_id").distinct()
    return (
        calendar_dates.join(F.broadcast(service_ids), "service_id", "left_semi")
        .select(
            "service_id",
            F.to_date("date", "yyyyMMdd").alias("day"),
            "exception_type",
        )
    )


def read_gtfs(spark: SparkSession, gtfs_dir: str) -> dict[str, DataFrame]:
    """ETL entry point (parity: ``python new_dbSetup.py`` + ``reshape.py``).

    Returns the typed entity tables. FK relationships (OPERATES / USES /
    PART_OF_TRIP / LOCATED_AT / SERVICE_TYPE / VALID_IN, reference
    ``new_dbSetup.py:39-91``) need no materialization — they are join keys.
    Derived edge tables (PRECEDES, WALK_TO) are built by
    :mod:`routing_algorithm_for_graph_dbs_spark.operators.derived`.
    """
    raw = {}
    for name, fname in _FILE_NAMES.items():
        p = os.path.join(gtfs_dir, fname)
        if os.path.exists(p):
            raw[name] = _read_csv(spark, p, name)

    required = ("agency", "routes", "trips", "stops", "stop_times")
    missing = [_FILE_NAMES[n] for n in required if n not in raw]
    if missing:
        raise FileNotFoundError(
            f"GTFS feed at {gtfs_dir} is missing required files: {missing}"
        )

    tables: dict[str, DataFrame] = {}
    tables["agency"] = raw["agency"].dropDuplicates(["agency_name"])
    tables["routes"] = (
        raw["routes"]
        .withColumn("route_type", F.col("route_type").cast("int"))
        .dropDuplicates(["route_id"])
    )
    tables["trips"] = raw["trips"].dropDuplicates(["trip_id"])
    tables["stops"] = (
        raw["stops"]
        .withColumn("stop_lat", F.col("stop_lat").cast("double"))
        .withColumn("stop_lon", F.col("stop_lon").cast("double"))
        .dropDuplicates(["stop_id"])
    )
    tables["stop_times"] = (
        raw["stop_times"]
        .withColumn("arrival_s", hms_to_seconds(F.col("arrival_time")))
        .withColumn("departure_s", hms_to_seconds(F.col("departure_time")))
        .withColumn("stop_sequence", F.col("stop_sequence").cast("int"))
        .drop("arrival_time", "departure_time")
        # surrogate key standing in for Neo4j's node id(st) (SURVEY §2.8 F6):
        # (trip_id, stop_sequence) is unique, use a stable natural composite.
        .withColumn(
            "stoptime_id", F.concat_ws("#", F.col("trip_id"), F.col("stop_sequence"))
        )
    )
    if "calendar_dates" in raw:
        tables["calendar"] = reshape_calendar_dates(tables["trips"], raw["calendar_dates"])
    for extra in ("foot_nodes", "foot_edges", "foot_near_stop"):
        if extra in raw:
            df = raw[extra]
            if extra == "foot_nodes":
                df = df.withColumn("latitude", F.col("latitude").cast("double")).withColumn(
                    "longitude", F.col("longitude").cast("double")
                )
            if extra == "foot_edges":
                df = df.withColumn("length", F.col("length").cast("double"))
            tables[extra] = df
    return tables


def write_tables(tables: dict[str, DataFrame], out_dir: str) -> None:
    """Parquet sink per entity table (SURVEY §2.1 S3/S4).

    At 100 TB the big fact table (stop_times) would additionally be bucketed
    by ``trip_id`` (saveAsTable) so PRECEDES/projection joins co-locate; plain
    parquet here because local tests don't have a metastore.
    """
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

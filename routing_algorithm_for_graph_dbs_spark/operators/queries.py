"""Reference App query methods re-expressed as DataFrame programs.

Each function cites the reference method it reproduces (SURVEY.md §2/§3).
All return DataFrames; nothing collects.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.functions.spatial import haversine_meters
from routing_algorithm_for_graph_dbs_spark.operators.calendar import service_day_stoptimes


def find_near_stops(
    tables: dict[str, DataFrame],
    day: str | dt.date,
    lat: float,
    lon: float,
    radius_m: float,
    day_st: DataFrame | None = None,
) -> DataFrame:
    """Distinct names of active stops within ``radius_m`` of a point.

    Parity: reference ``App.find_near_stops`` (``main.py:62-71``) — calendar
    join J1 + ``point.distance(coord, startPoint) < radius`` (P6) +
    ``RETURN distinct s.name`` (P10).

    ``day_st``: pass a cached day relation (e.g. a ProjectedGraph's
    ``stoptimes``) to skip recomputing the calendar join per lookup — the
    interactive-latency path, like the reference querying its indexed DB.
    """
    active = (
        day_st
        if day_st is not None
        else service_day_stoptimes(tables, day, with_route=False)
    )
    dist = haversine_meters(
        F.col("stop_lat"), F.col("stop_lon"), F.lit(lat), F.lit(lon)
    )
    return (
        active.select("stop_name", "stop_lat", "stop_lon")
        .withColumn("distance", dist)
        .filter(F.col("distance") < radius_m)
        .select("stop_name")
        .distinct()
    )


def find_near_stops_batch(
    tables: dict[str, DataFrame],
    day: str | dt.date,
    points: list[tuple[float, float]],
    radius_m: float,
    day_st: DataFrame | None = None,
) -> DataFrame:
    """Every probe point's radius lookup in ONE job.

    The reference answers each lookup with a separate indexed query
    (``main.py:62-71``), so N lookups pay N times the fixed query
    overhead. Batching broadcasts the (tiny) probe list against the cached
    day relation — one scan answers every probe, and the
    BroadcastNestedLoopJoin stays linear in the stop count. Per-probe
    results equal sequential :func:`find_near_stops` exactly (tested).

    Returns (probe_id, stop_name) distinct; probe_id indexes ``points``.
    """
    active = (
        day_st
        if day_st is not None
        else service_day_stoptimes(tables, day, with_route=False)
    )
    spark = active.sparkSession
    # JVM LocalRelation (round 14): the probe table is broadcast into the
    # scan; a Python-RDD-backed one pays a Python-worker task per
    # materialization (functions/localrel.py)
    from routing_algorithm_for_graph_dbs_spark.functions.localrel import (
        local_rows_df,
    )

    probes = local_rows_df(
        spark,
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(points)],
        "probe_id int, p_lat double, p_lon double",
    )
    dist = haversine_meters(
        F.col("stop_lat"), F.col("stop_lon"), F.col("p_lat"), F.col("p_lon")
    )
    return (
        active.select("stop_name", "stop_lat", "stop_lon")
        .crossJoin(F.broadcast(probes))
        .filter(dist < radius_m)
        .select("probe_id", "stop_name")
        .distinct()
    )


def number_of_stops(tables: dict[str, DataFrame], day: str | dt.date) -> DataFrame:
    """Count of distinct stops with service on ``day``.

    Parity: reference ``App.number_of_stops`` (``main.py:186-191``) —
    ``RETURN count(distinct s)`` (A1).
    """
    active = service_day_stoptimes(tables, day, with_route=False)
    return active.select(F.countDistinct("stop_id").alias("n_stops"))


def hours_of_service(tables: dict[str, DataFrame], day: str | dt.date) -> DataFrame:
    """Mean daily service span (hours) across lines.

    Parity: reference ``App.hours_of_service`` (``main.py:193-205``): per
    route, earliest departure (``apoc.agg.minItems``, A3) and latest arrival
    (``maxItems``, A4), span in whole hours (``duration.inSeconds(...).hours``
    truncates), then ``avg`` (A2) over routes.
    """
    active = service_day_stoptimes(tables, day, with_route=True)
    per_route = active.groupBy("route_id").agg(
        F.min("departure_s").alias("first_dep"),
        F.max("arrival_s").alias("last_arr"),
    )
    # cast truncates toward ZERO like Cypher duration.inSeconds().hours
    # (F.floor would round a negative span toward -infinity instead)
    span_h = ((F.col("last_arr") - F.col("first_dep")) / 3600).cast("long")
    return per_route.select(span_h.alias("span_h")).agg(
        F.avg("span_h").alias("avg_hours_of_service")
    )


def earliest_departures_per_line(
    tables: dict[str, DataFrame],
    day: str | dt.date,
    stop_names: list[str],
    after_s: int,
) -> DataFrame:
    """Per line, ALL Stoptimes attaining the earliest feasible departure.

    Parity: the source-candidate stage of ``App.routing`` (``main.py:82-87``):
    J1 + range filter P4 (``departure_time > time(t)``) + list-membership P8
    + ``apoc.agg.minItems(st, st.departure_time)`` grouped by line (A3).
    minItems keeps ties, hence ``rank() == 1`` (not row_number).
    """
    active = service_day_stoptimes(tables, day, with_route=True)
    cand = active.filter(
        F.col("stop_name").isin(stop_names) & (F.col("departure_s") > F.lit(after_s))
    )
    w = Window.partitionBy("route_id").orderBy("departure_s")
    return (
        cand.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def distance_from_a_stop(
    tables: dict[str, DataFrame],
    stop_id: str,
    lat: float,
    lon: float,
) -> DataFrame:
    """Straight-line distance from a point to one stop (meters).

    Parity: reference ``App.distance_from_a_stop`` (``main.py:178-184``) —
    ``point.distance`` between a literal point and the stop's coords.
    (The footway-graph walking version is graph.routing.walking_distance.)
    """
    return (
        tables["stops"]
        .filter(F.col("stop_id") == stop_id)
        .select(
            "stop_id",
            haversine_meters(
                F.col("stop_lat"), F.col("stop_lon"), F.lit(lat), F.lit(lon)
            ).alias("distance"),
        )
    )

"""The "calendar join" (SURVEY.md §2.3 J1) — the workhorse join chain.

Cypher shape (appears in nearly every reference query, e.g. ``main.py:16``):

    (d:Day {day: $date})<-[:VALID_IN]-(:Service)<-[:SERVICE_TYPE]-(t:Trip)
        <-[:PART_OF_TRIP]-(st:Stoptime)-[:LOCATED_AT]->(s:Stop)

i.e. restrict Stoptimes to trips whose service runs on a given day and attach
stop geometry. In Spark this is a chain of FK equi-joins; every dimension
(calendar-day service_ids, trips, stops) is tiny next to stop_times, so all
are broadcast — the fact table never shuffles.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def service_ids_on(calendar: DataFrame, day: str | dt.date) -> DataFrame:
    """Service ids valid on ``day`` (Day<-VALID_IN-Service legs of J1)."""
    return calendar.filter(F.col("day") == F.lit(day)).select("service_id").distinct()


def service_day_stoptimes(
    tables: dict[str, DataFrame],
    day: str | dt.date,
    with_route: bool = True,
) -> DataFrame:
    """Stoptimes active on ``day`` joined to trip, stop (and route) attributes.

    Returns one row per Stoptime with columns:
    stoptime_id, trip_id, stop_sequence, arrival_s, departure_s,
    stop_id, stop_name, stop_lat, stop_lon, service_id [, route_id, short_name].
    """
    svc = service_ids_on(tables["calendar"], day)
    trips = tables["trips"].join(F.broadcast(svc), "service_id")
    if with_route:
        trips = trips.join(
            F.broadcast(tables["routes"].select("route_id", "short_name")), "route_id"
        )
        trip_cols = ["trip_id", "service_id", "route_id", "short_name"]
    else:
        trip_cols = ["trip_id", "service_id"]

    st = tables["stop_times"].join(F.broadcast(trips.select(*trip_cols)), "trip_id")
    return st.join(F.broadcast(tables["stops"]), "stop_id")

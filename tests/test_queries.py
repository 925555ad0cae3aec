"""Reference App query-method parity on the GTFS fixture (SURVEY.md §2.2-2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

DAY = "2024-01-18"


def test_find_near_stops_start(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import find_near_stops

    names = {
        r["stop_name"]
        for r in find_near_stops(gtfs, DAY, 44.6500, 10.9180, 200).collect()
    }
    assert names == {"Autostazione 1", "Autostazione 2"}


def test_find_near_stops_end(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import find_near_stops

    names = {
        r["stop_name"]
        for r in find_near_stops(gtfs, DAY, 44.6313, 10.8733, 200).collect()
    }
    # Tonini 2 is within the radius but has no Stoptimes -> the calendar-join
    # chain excludes it, exactly like the reference's MATCH pattern.
    assert names == {"Tonini 1"}


def test_find_near_stops_respects_day(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import find_near_stops

    # Sunday: only T10s runs (stops E2, D) -> nothing near Autostazione
    names = find_near_stops(gtfs, "2024-01-21", 44.6500, 10.9180, 200)
    assert names.count() == 0


def test_find_near_stops_batch_equals_sequential(gtfs):
    """One-job batched lookups must equal per-point find_near_stops —
    including a probe with no stops in range."""
    from routing_algorithm_for_graph_dbs_spark.operators.queries import (
        find_near_stops,
        find_near_stops_batch,
    )

    points = [(44.6500, 10.9180), (44.6313, 10.8733), (0.0, 0.0)]
    got: dict[int, set] = {}
    for r in find_near_stops_batch(gtfs, DAY, points, 200).collect():
        got.setdefault(r["probe_id"], set()).add(r["stop_name"])
    for i, (la, lo) in enumerate(points):
        seq = {
            r["stop_name"] for r in find_near_stops(gtfs, DAY, la, lo, 200).collect()
        }
        assert got.get(i, set()) == seq, (la, lo)


def test_number_of_stops(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import number_of_stops

    # weekday: T1a/T1b/T1n (A,B,C,E), T10a/T10e (E2,D), T7a (F,A2,G) -> 9 distinct
    assert number_of_stops(gtfs, DAY).collect()[0]["n_stops"] == 9
    # sunday: E2, D
    assert number_of_stops(gtfs, "2024-01-21").collect()[0]["n_stops"] == 2


def test_hours_of_service(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import hours_of_service

    # per line spans on 2024-01-18 (first departure -> last arrival, floor hours):
    # line 1: dep 14:05, last arr 25:00 -> floor(10.916) = 10
    # line 10: dep 14:20, last arr 14:38 -> 0
    # line 7A: dep 14:00, last arr 14:15 -> 0
    avg_h = hours_of_service(gtfs, DAY).collect()[0]["avg_hours_of_service"]
    assert abs(avg_h - 10 / 3) < 1e-9


def test_earliest_departures_per_line_keeps_ties(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import (
        earliest_departures_per_line,
    )

    res = earliest_departures_per_line(
        gtfs, DAY, ["Autostazione 1", "Autostazione 2"], 14 * 3600
    )
    rows = {(r["route_id"], r["trip_id"]) for r in res.collect()}
    # line 1 earliest at A after 14:00 -> T1a (14:05); line 7A -> T7a@A2 (14:05)
    assert rows == {("1", "T1a"), ("7A", "T7a")}


def test_distance_from_a_stop(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import (
        distance_from_a_stop,
    )

    d = distance_from_a_stop(gtfs, "S_A", 44.6500, 10.9180).collect()[0]["distance"]
    assert d < 1.0  # same point

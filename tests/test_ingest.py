"""Ingest + derived-edge tests against the hand-built GTFS fixture
(FIXTURES.md §A)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tables_loaded(gtfs):
    assert set(gtfs) >= {
        "agency",
        "routes",
        "trips",
        "stops",
        "stop_times",
        "calendar",
        "foot_nodes",
        "foot_edges",
        "foot_near_stop",
    }
    assert gtfs["stops"].count() == 10
    assert gtfs["trips"].count() == 7
    assert gtfs["stop_times"].count() == 19


def test_casts(gtfs):
    st = gtfs["stop_times"]
    row = st.filter(
        (F.col("trip_id") == "T1a") & (F.col("stop_sequence") == 1)
    ).collect()[0]
    assert row["arrival_s"] == 14 * 3600
    assert row["departure_s"] == 14 * 3600 + 300
    # GTFS times past midnight survive (reference's time() could not)
    night = st.filter(
        (F.col("trip_id") == "T1n") & (F.col("stop_sequence") == 1)
    ).collect()[0]
    assert night["arrival_s"] == 24 * 3600 + 50 * 60


def test_reshape_semi_join(gtfs):
    # service XX appears in calendar_dates.txt but not in trips -> dropped
    cal = gtfs["calendar"]
    assert cal.filter(F.col("service_id") == "XX").count() == 0
    assert cal.count() == 3
    days = {str(r["day"]) for r in cal.collect()}
    assert days == {"2024-01-18", "2024-01-19", "2024-01-21"}


def test_precedes(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.derived import build_precedes

    prec = build_precedes(gtfs["stop_times"])
    # each trip contributes len(stops)-1 edges: 3+3+1+1+1+1+2 = 12
    assert prec.count() == 12
    row = prec.filter(
        (F.col("trip_id") == "T1a") & (F.col("src_stop_id") == "S_A")
    ).collect()[0]
    assert row["dst_stop_id"] == "S_B"
    # waiting_time = arr(B) - dep(A) = 14:10 - 14:05 = 300
    assert row["waiting_time"] == 300


def test_walk_to(gtfs):
    from routing_algorithm_for_graph_dbs_spark.operators.derived import build_walk_to

    wt = build_walk_to(gtfs["stops"])
    pairs = {(r["src_stop_id"], r["dst_stop_id"]) for r in wt.collect()}
    # exactly the three close pairs, both directions, no self loops
    assert pairs == {
        ("S_A", "S_A2"),
        ("S_A2", "S_A"),
        ("S_E", "S_E2"),
        ("S_E2", "S_E"),
        ("S_D", "S_D2"),
        ("S_D2", "S_D"),
    }
    d = wt.filter(F.col("src_stop_id") == "S_A").collect()[0]["distance"]
    assert 10 < d < 30  # ~19 m


def test_walk_to_matches_brute_force(gtfs, spark):
    """Grid-bucketed join == brute-force O(n^2) filter on the fixture."""
    from routing_algorithm_for_graph_dbs_spark.functions.spatial import haversine_meters
    from routing_algorithm_for_graph_dbs_spark.operators.derived import build_walk_to

    stops = gtfs["stops"].select("stop_id", "stop_lat", "stop_lon")
    a = stops.alias("a")
    b = stops.alias("b")
    brute = (
        a.crossJoin(b)
        .filter(F.col("a.stop_id") != F.col("b.stop_id"))
        .withColumn(
            "distance",
            haversine_meters(
                F.col("a.stop_lat"), F.col("a.stop_lon"), F.col("b.stop_lat"), F.col("b.stop_lon")
            ),
        )
        .filter(F.col("distance") < 300)
        .select(F.col("a.stop_id").alias("s"), F.col("b.stop_id").alias("d"))
    )
    fast = build_walk_to(gtfs["stops"]).select(
        F.col("src_stop_id").alias("s"), F.col("dst_stop_id").alias("d")
    )
    assert {tuple(r) for r in brute.collect()} == {tuple(r) for r in fast.collect()}

"""Graph projection parity (SURVEY.md §2.9 G1/G7) on the GTFS fixture.

Hand-derived expectations for day=2024-01-18, speed=1 m/s:

Vertices = weekday Stoptimes: T1a(4) + T1b(4) + T1n(2) + T10a(2) + T10e(2)
+ T7a(3) = 17.

PRECEDES edges restricted to the day: 3+3+1+1+1+2 = 11.

CHANGE edges (enumerated by the reference's rule — same service, different
trip AND line, target stop walkable from source stop incl. the self loop,
arrival + floor(walk/speed) < departure, earliest per (source, walk edge,
other line)):
  1. T1a@E(seq4)  -> T10a@E2(seq1)   (the itinerary's transfer; 480+27s)
  2. T7a@A2(seq2) -> T1a@A(seq1)     (60+19s)
  3. T1a@A(seq1)  -> T7a@A2(seq2)    (300+19s)
  4. T10a@E2(seq1)-> T1b@E(seq4)     (line 10 -> next line-1 run)
  5. T10e@E2(seq1)-> T1a@E(seq4)     (10 -> 1, feasible: 14:18+28s < 14:23)
T10e@E2 -> nothing else; T1b@E too late for line 10; B/C/F/G stops have no
walk neighbors with other-line service.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DAY = "2024-01-18"


@pytest.fixture(scope="module")
def graph(gtfs):
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph

    g = project_graph(gtfs, DAY, speed=1.0)
    yield g
    g.unpersist()


def test_vertex_count(graph):
    assert graph.vertices.count() == 17


def test_edge_counts(graph):
    by_type = {
        r["type"]: r["count"]
        for r in graph.edges.groupBy("type").count().collect()
    }
    assert by_type == {"PRECEDES": 11, ":CHANGE": 5}


def test_change_edges_exact(graph):
    changes = {
        (r["src"], r["dst"])
        for r in graph.edges.filter(F.col("type") == ":CHANGE").collect()
    }
    assert changes == {
        ("T1a#4", "T10a#1"),
        ("T7a#2", "T1a#1"),
        ("T1a#1", "T7a#2"),
        ("T10a#1", "T1b#4"),
        ("T10e#1", "T1a#4"),
    }


def test_change_edge_weights(graph):
    row = graph.edges.filter(
        (F.col("src") == "T1a#4") & (F.col("dst") == "T10a#1")
    ).collect()[0]
    # wait 14:22->14:30 = 480s, walk E->E2 ~27.3 m floor-> 27s
    assert row["waiting_time"] == 507
    assert row["walking_time"] == 27
    row2 = graph.edges.filter(
        (F.col("src") == "T7a#2") & (F.col("dst") == "T1a#1")
    ).collect()[0]
    # wait 14:04->14:05 = 60s, walk A2->A ~19.4 m -> 19s
    assert row2["waiting_time"] == 79


def test_graph_metrics(graph):
    from routing_algorithm_for_graph_dbs_spark.plans.projection import graph_metrics

    m = graph_metrics(graph)
    assert m["nodeCount"] == 17
    assert m["relationshipCount"] == 16
    assert abs(m["density"] - 16 / (17 * 16)) < 1e-12
    # gds.graph.list parity: a positive in-memory size estimate
    assert isinstance(m["sizeInBytes"], int) and m["sizeInBytes"] > 0


def test_sunday_projection_empty_changes(gtfs):
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph

    g = project_graph(gtfs, "2024-01-21", speed=1.0, name="graph_sunday", cache=False)
    # only T10s runs: 2 vertices, 1 PRECEDES, no feasible change
    assert g.vertices.count() == 2
    by_type = {r["type"]: r["count"] for r in g.edges.groupBy("type").count().collect()}
    assert by_type == {"PRECEDES": 1}


def test_bucketed_change_edges_equal_naive(spark, gtfs):
    """The bucketed as-of CHANGE build must equal the naive (reference-shape)
    build row-for-row on the fixture, across bucket sizes that do and don't
    align with the timetable."""
    from routing_algorithm_for_graph_dbs_spark.operators.calendar import (
        service_day_stoptimes,
    )
    from routing_algorithm_for_graph_dbs_spark.plans.projection import (
        build_change_edges,
        build_change_edges_naive,
        build_walk_to_with_self_loops,
    )

    day_st = service_day_stoptimes(gtfs, "2024-01-18", with_route=True)
    walk = build_walk_to_with_self_loops(gtfs["stops"])
    want = sorted(map(tuple, build_change_edges_naive(day_st, walk, 1.0).collect()))
    assert want, "fixture must produce CHANGE edges"
    for bucket_s in (60, 900, 7200):
        got = sorted(
            map(tuple, build_change_edges(day_st, walk, 1.0, bucket_s=bucket_s).collect())
        )
        assert got == want, f"bucket_s={bucket_s} diverges from naive"


def test_bucketed_change_preserves_departure_ties(spark, gtfs):
    """Two same-line targets departing at the same second must BOTH survive
    (minItems keeps ties) — including when they sit in a later bucket and
    ride in via the suffix row."""
    import pyspark.sql.functions as F

    from routing_algorithm_for_graph_dbs_spark.plans.projection import (
        build_change_edges,
        build_change_edges_naive,
    )

    day_st = spark.createDataFrame(
        [
            # source arrives 10:00:00 at stop A on line L1
            ("src#1", "t_src", "L1", "SV", "A", 36000, 36000, 0, "A", 0.0, 0.0, "1"),
            # two tied targets on line L2 at stop A depart 12:00:00 (far
            # bucket) + a later one that must lose
            ("tgt#1", "t_a", "L2", "SV", "A", 43200, 43200, 0, "A", 0.0, 0.0, "2"),
            ("tgt#2", "t_b", "L2", "SV", "A", 43200, 43200, 0, "A", 0.0, 0.0, "2"),
            ("tgt#3", "t_c", "L2", "SV", "A", 50000, 50000, 0, "A", 0.0, 0.0, "2"),
        ],
        "stoptime_id string, trip_id string, route_id string, service_id string,"
        "stop_id string, arrival_s long, departure_s long, stop_sequence int,"
        "stop_name string, stop_lat double, stop_lon double, short_name string",
    )
    walk = spark.createDataFrame(
        [("A", "A", 0.0)], "src_stop_id string, dst_stop_id string, distance double"
    )
    got = sorted(map(tuple, build_change_edges(day_st, walk, 1.0, bucket_s=900).collect()))
    want = sorted(map(tuple, build_change_edges_naive(day_st, walk, 1.0).collect()))
    assert got == want
    tied = [r for r in got if r[0] == "src#1"]
    assert {r[1] for r in tied} == {"tgt#1", "tgt#2"}, "both tied targets kept"


def test_graph_save_load_roundtrip(spark, gtfs, tmp_path):
    """A saved projection reloads with identical relations and answers the
    anchor routing query identically — the project-once/load-many path."""
    from routing_algorithm_for_graph_dbs_spark.plans.projection import (
        load_graph,
        project_graph,
        save_graph,
    )
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing

    g = project_graph(gtfs, "2024-01-18", speed=1.0, name="rt_save")
    want_edges = sorted(map(tuple, g.edges.collect()))
    want_legs = [tuple(r) for r in routing(g, 14 * 3600, "Autostazione 1", "Tonini 1").collect()]
    save_graph(g, str(tmp_path / "gdir"))
    g.unpersist()

    g2 = load_graph(spark, str(tmp_path / "gdir"))
    assert g2.name == "rt_save" and g2.day == "2024-01-18" and g2.speed == 1.0
    assert sorted(map(tuple, g2.edges.collect())) == want_edges
    got_legs = [tuple(r) for r in routing(g2, 14 * 3600, "Autostazione 1", "Tonini 1").collect()]
    assert got_legs == want_legs
    g2.unpersist()

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


def test_sunday_projection_empty_changes(gtfs):
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph

    g = project_graph(gtfs, "2024-01-21", speed=1.0, name="graph_sunday", cache=False)
    # only T10s runs: 2 vertices, 1 PRECEDES, no feasible change
    assert g.vertices.count() == 2
    by_type = {r["type"]: r["count"] for r in g.edges.groupBy("type").count().collect()}
    assert by_type == {"PRECEDES": 1}

"""End-to-end routing parity on the GTFS fixture (SURVEY.md §3 EP3) —
the fixture's analogue of the notebook's Autostazione -> Tonini itinerary.

Hand-derived expectation (day 2024-01-18, 14:00:00, speed 1 m/s):
winner = board T1a at Autostazione 1 14:05, ride line 1 to Ospedale 1
(arr 14:22), change to line 10 (T10a at Ospedale 2, dep 14:30), arrive
Tonini 1 14:38. 5 legs, 1 change. The alternative seed (T7a@A2 then
change to T1a@A) reaches the same target at the same final_time but with
cost 1966+19 vs 1887 -> loses on the cost tiebreak, exactly like the
reference's ORDER BY final_time, cost LIMIT 1 (main.py:157-159).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DAY = "2024-01-18"
T0 = 14 * 3600


@pytest.fixture(scope="module")
def graph(gtfs):
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph

    g = project_graph(gtfs, DAY, speed=1.0, name="graph_routing_test")
    yield g
    g.unpersist()


def test_point_to_point_routing(gtfs, graph):
    from routing_algorithm_for_graph_dbs_spark.operators.queries import find_near_stops
    from routing_algorithm_for_graph_dbs_spark.plans.routing import (
        count_changes,
        routing_between_two_points_in_space,
    )

    start = (44.6500, 10.9180)
    end = (44.6313, 10.8733)
    start_list = [
        r["stop_name"] for r in find_near_stops(gtfs, DAY, *start, 200).collect()
    ]
    end_list = [
        r["stop_name"] for r in find_near_stops(gtfs, DAY, *end, 200).collect()
    ]
    assert sorted(start_list) == ["Autostazione 1", "Autostazione 2"]
    assert end_list == ["Tonini 1"]

    legs = routing_between_two_points_in_space(
        graph,
        start_lat=start[0],
        start_lon=start[1],
        end_lat=end[0],
        end_lon=end[1],
        start_list=start_list,
        end_list=end_list,
        speed=1.0,
        time_s=T0,
    )
    rows = legs.collect()
    assert [r["trip"] for r in rows] == ["T1a", "T1a", "T1a", "T1a", "T10a"]
    assert [r["next_trip"] for r in rows] == ["T1a", "T1a", "T1a", "T10a", "T10a"]
    assert rows[0]["starting_stop_name"] == "Autostazione 1"
    assert rows[0]["departure"] == 14 * 3600 + 5 * 60
    assert rows[-1]["next_stop"] == "Tonini 1"
    assert rows[-1]["arrival"] == 14 * 3600 + 38 * 60
    assert rows[3]["line"] == "1" and rows[3]["next_line"] == "10"
    assert count_changes(legs) == 1


def test_stop_to_stop_routing(graph):
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing

    legs = routing(
        graph,
        time_s=T0,
        source_stop_name="Autostazione 1",
        target_stop_name="Tonini 1",
    )
    rows = legs.collect()
    assert len(rows) == 5
    assert rows[0]["trip"] == "T1a"
    assert rows[-1]["next_trip"] == "T10a"
    assert rows[-1]["arrival"] == 14 * 3600 + 38 * 60


def test_routing_batch_equals_sequential(graph):
    """One multi-lane kernel run must reproduce each pair's sequential
    routing() legs exactly — including pairs with no feasible itinerary."""
    from routing_algorithm_for_graph_dbs_spark.plans.routing import (
        routing,
        routing_batch,
    )

    pairs = [
        ("Autostazione 1", "Tonini 1"),
        ("Autostazione 2", "Tonini 1"),
        ("Tonini 1", "Autostazione 1"),
    ]
    by_pair: dict[int, list] = {}
    for r in routing_batch(graph, pairs, time_s=T0).collect():
        by_pair.setdefault(r["pair_id"], []).append(tuple(r)[1:])
    for i, (s, t) in enumerate(pairs):
        seq = [
            tuple(r)
            for r in routing(
                graph, time_s=T0, source_stop_name=s, target_stop_name=t
            ).collect()
        ]
        assert by_pair.get(i, []) == seq, (s, t)


def test_routing_batch_iterative_pred_mode(graph):
    """The iterative tier (pred-pointer state + winner-path
    reconstruction) must reproduce the broadcast tier's winner identity
    and produce a valid contiguous leg chain on the hand-verified
    fixture. Full leg equality is also asserted HERE because the fixture
    graph has unique shortest paths — on dense feeds only the winner
    identity is tier-invariant (equal-cost path ties)."""
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing_batch

    pairs = [("Autostazione 1", "Tonini 1")]
    bc = routing_batch(graph, pairs, time_s=T0, strategy="broadcast").collect()
    it = routing_batch(
        graph, pairs, time_s=T0, strategy="iterative", max_iterations=500
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(bc) == key(it)
    assert len(it) > 0

    wb = routing_batch(
        graph, pairs, time_s=T0, strategy="broadcast", winners_only=True
    ).collect()
    wi = routing_batch(
        graph, pairs, time_s=T0, strategy="iterative", winners_only=True,
        max_iterations=500,
    ).collect()
    assert sorted(map(tuple, wb)) == sorted(map(tuple, wi))


def test_sssp_pred_mode_reconstruction(spark):
    """track_paths='pred' carries only predecessor pointers; the backward
    walk rebuilds exactly the path the full-path mode would store."""
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import (
        multi_source_dijkstra,
        reconstruct_paths,
    )

    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 3.0), ("c", "d", 1.0)],
        ["src", "dst", "weight"],
    )
    src = spark.createDataFrame([("L", "a")], ["lane", "node"])
    res = multi_source_dijkstra(e, src, track_paths="pred")
    got = {r["node"]: (r["cost"], r["pred"]) for r in res.collect()}
    assert got == {
        "a": (0.0, None), "b": (1.0, "a"), "c": (2.0, "b"), "d": (3.0, "c"),
    }
    heads = spark.createDataFrame([("L", "d", 7)], ["lane", "node", "k"])
    paths = reconstruct_paths(res, heads, carry_cols=("k",)).collect()
    assert paths[0]["k"] == 7 and paths[0]["path"] == ["a", "b", "c", "d"]


def test_routing_no_feasible_target(graph):
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing

    # max_duration 0 hours -> target window empty -> no legs
    legs = routing(
        graph,
        time_s=T0,
        source_stop_name="Autostazione 1",
        target_stop_name="Tonini 1",
        max_duration_h=0,
    )
    assert legs.count() == 0


def test_itinerary_totals(graph):
    from routing_algorithm_for_graph_dbs_spark.plans.routing import (
        itinerary_totals,
        routing,
    )

    legs = routing(
        graph,
        time_s=T0,
        source_stop_name="Autostazione 1",
        target_stop_name="Tonini 1",
    )
    tot = itinerary_totals(legs, start_walk_m=100.0, end_walk_m=50.0, speed=1.0)
    # dep 14:05, arr 14:38 -> 1980 s transit + 150 s walking
    assert tot["transit_seconds"] == 1980
    assert tot["total_seconds"] == 2130.0


def test_footway_walking_distance(gtfs):
    from routing_algorithm_for_graph_dbs_spark.graph.footway import (
        distance_from_a_stop,
        nearest_footnode,
        walking_distance,
    )

    nf = nearest_footnode(gtfs["foot_nodes"], 44.64990, 10.91780).collect()[0]
    assert nf["footnode_id"] == "FN1"
    assert nf["distance"] < 1.0

    # FN1 -> FN4: 70 + 90 + 55 = 215 m (via the road crossing)
    assert walking_distance(gtfs["foot_edges"], "FN1", "FN4") == 215.0
    # symmetric traversal (APOC untyped direction = both ways)
    assert walking_distance(gtfs["foot_edges"], "FN4", "FN1") == 215.0
    # unreachable from an isolated id
    assert walking_distance(gtfs["foot_edges"], "FN1", "NOPE") == float("inf")

    km = distance_from_a_stop(gtfs, "S_D", 44.64990, 10.91780, stops=gtfs["stops"])
    assert abs(km - 0.215) < 1e-3


def test_plan_trip_end_to_end(gtfs, graph):
    """The notebook's full cells 6-18 flow: the Autostazione -> Tonini
    anchor itinerary with footway walking legs and narrative."""
    from routing_algorithm_for_graph_dbs_spark.plans.routing import plan_trip

    out = plan_trip(
        gtfs,
        graph,
        start_lat=44.6500,
        start_lon=10.9180,
        end_lat=44.6313,
        end_lon=10.8733,
        time_s=T0,
        speed=1.0,
        radius_m=200.0,
        foot_tables=gtfs,
    )
    assert out["changes"] == 1
    assert [r["trip"] for r in out["rows"]] == ["T1a", "T1a", "T1a", "T1a", "T10a"]
    # footway-graph start walk: nearest footnode + walk to S_A's footnode
    assert out["start_walk_m"] != float("inf")
    assert out["totals"]["total_seconds"] > out["totals"]["transit_seconds"]
    assert "board line 1" in out["narrative"]
    assert "change at" in out["narrative"]
    assert "1 change" in out["narrative"]


def test_plan_trip_no_itinerary(gtfs, graph):
    from routing_algorithm_for_graph_dbs_spark.plans.routing import plan_trip

    out = plan_trip(
        gtfs, graph,
        start_lat=44.6500, start_lon=10.9180,
        end_lat=44.6313, end_lon=10.8733,
        time_s=23 * 3600,  # after the last service of the fixture day
        max_duration_h=1,
    )
    assert out["rows"] == [] and out["totals"] is None
    assert "No feasible itinerary" in out["narrative"]


def _cap_boundary_graph(spark):
    """Minimal day graph whose only itinerary's COST exceeds the elapsed
    -time window: CHANGE weight = waiting + walking, so cost = 4120 while
    the target departs at 3590 < H = 3600. The reference caps only the
    target departure window (main.py:129-130), never path cost — a
    ``max_cost = H`` prune (pre-round-7 behavior) drops this winner."""
    from routing_algorithm_for_graph_dbs_spark.plans.projection import (
        ProjectedGraph,
    )

    st = spark.createDataFrame(
        [
            # stoptime_id, trip, route, stop_id, stop_name, arr, dep, lat, lon
            ("S1", "TA", "1", "A", "SrcStop", 60, 60, 44.0, 10.0),
            ("S2", "TA", "1", "B", "MidStop", 3000, 3010, 44.1, 10.1),
            ("S3", "TB", "2", "C", "DstStop", 3580, 3590, 44.2, 10.2),
        ],
        "stoptime_id string, trip_id string, route_id string, stop_id string,"
        " stop_name string, arrival_s long, departure_s long,"
        " stop_lat double, stop_lon double",
    )
    edges = spark.createDataFrame(
        [
            # PRECEDES weight = dst_arrival - src_departure = 2940
            ("S1", "S2", "PRECEDES", 2940, 0),
            # CHANGE weight = (dst_departure - src_arrival) + walk
            #               = (3590 - 3000) + 590 = 1180 (boarding feasible:
            # src_arrival + walk = 3590 <= dst_departure)
            ("S2", "S3", ":CHANGE", 1180, 590),
        ],
        "src string, dst string, type string, waiting_time long,"
        " walking_time long",
    )
    return ProjectedGraph(
        name="cap_boundary",
        day="2024-01-18",
        speed=1.0,
        vertices=st.selectExpr(
            "stoptime_id as id", "0 as stop_sequence",
            "stop_lon as lon", "stop_lat as lat",
        ),
        edges=edges,
        stoptimes=st,
    )


@pytest.mark.parametrize("strategy", ["broadcast", "iterative"])
def test_routing_winner_cost_beyond_duration_window(spark, strategy):
    """ADVICE r6 (medium): a reference-feasible winner whose cost
    (elapsed + walking) exceeds max_duration_h*3600 must still be found —
    the duration cap constrains the target departure window only."""
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing

    g = _cap_boundary_graph(spark)
    legs = routing(
        g,
        time_s=0,
        source_stop_name="SrcStop",
        target_stop_name="DstStop",
        max_duration_h=1,
        strategy=strategy,
    ).collect()
    assert [(r["trip"], r["next_trip"]) for r in legs] == [
        ("TA", "TA"),
        ("TA", "TB"),
    ]
    assert legs[-1]["arrival"] == 3580


@pytest.mark.parametrize("strategy", ["broadcast", "iterative"])
def test_routing_batch_max_cost_optin_semantics(spark, strategy):
    """routing_batch's default is exact (cap-boundary winner found); the
    explicit ``max_cost`` opt-in prunes by PATH COST, so a horizon equal
    to the duration window loses that winner (the documented caveat the
    scale harness certifies against), while a padded horizon keeps it."""
    from routing_algorithm_for_graph_dbs_spark.plans.routing import (
        routing_batch,
    )

    g = _cap_boundary_graph(spark)
    pairs = [("SrcStop", "DstStop")]

    def run(**kw):
        return routing_batch(
            g, pairs, time_s=0, max_duration_h=1, strategy=strategy,
            winners_only=True, **kw,
        ).collect()

    exact = run()
    assert len(exact) == 1 and exact[0]["cost"] == 4120.0
    padded = run(max_cost=2 * 3600.0)
    assert [(r["src"], r["dst"], r["cost"]) for r in padded] == [
        (exact[0]["src"], exact[0]["dst"], exact[0]["cost"])
    ]
    assert run(max_cost=3600.0) == []


@pytest.mark.parametrize("strategy", ["broadcast", "iterative"])
def test_stop_bound_prune_preserves_results(graph, strategy):
    """The admissible earliest-arrival prune (graph/stop_bound.py) must be
    invisible in the OUTPUT: full leg tables with the certificate on and
    off are identical on both tiers (the certificate only removes targets
    it proves can never produce a result row). This is the A/B gate for
    the sound replacement of the round-7-removed cost horizon."""
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing_batch

    pairs = [
        ("Autostazione 1", "Tonini 1"),
        ("Autostazione 2", "Tonini 1"),
        ("Tonini 1", "Autostazione 1"),
    ]
    on = routing_batch(
        graph, pairs, time_s=T0, strategy=strategy, max_iterations=500,
        stop_bound=True,
    ).collect()
    off = routing_batch(
        graph, pairs, time_s=T0, strategy=strategy, max_iterations=500,
        stop_bound=False,
    ).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(on) == key(off)
    assert len(on) > 0


def test_stop_bound_prune_point_to_point(gtfs, graph):
    """Same A/B for the coordinates pipeline (custom rank_col path)."""
    from routing_algorithm_for_graph_dbs_spark.plans.routing import (
        routing_between_two_points_in_space,
    )

    kw = dict(
        start_lat=44.6500, start_lon=10.9180,
        end_lat=44.6313, end_lon=10.8733,
        start_list=["Autostazione 1", "Autostazione 2"],
        end_list=["Tonini 1"],
        speed=1.0, time_s=T0,
    )
    on = routing_between_two_points_in_space(graph, **kw, stop_bound=True).collect()
    off = routing_between_two_points_in_space(graph, **kw, stop_bound=False).collect()
    assert [tuple(r) for r in on] == [tuple(r) for r in off]
    assert len(on) > 0

"""Scale-synthetic GTFS: generator sanity, SSSP tier agreement, and an
end-to-end routing smoke at reduced scale (full reference scale — 252k
stoptimes — runs in bench.py's routing_9od entry)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import (
    od_pairs_9,
    synth_gtfs,
)

DAY = "2024-01-18"


@pytest.fixture(scope="module")
def mini(spark):
    # 6 routes x 8 trips x 12 stops = 576 stoptimes
    return synth_gtfs(spark, n_routes=6, trips_per_route=8, stops_per_trip=12)


def test_generator_shape_and_determinism(spark, mini):
    from pyspark.sql import Window

    from routing_algorithm_for_graph_dbs_spark.functions.spatial import (
        haversine_meters,
    )

    assert mini["stop_times"].count() == 6 * 8 * 12
    # consecutive stops on a trip are lattice neighbors (< 300 m walk radius)
    st = mini["stop_times"].join(mini["stops"], "stop_id")
    w = Window.partitionBy("trip_id").orderBy("stop_sequence")
    hops = (
        st.select("trip_id", "stop_sequence", "stop_lat", "stop_lon")
        .withColumn("nlat", F.lead("stop_lat").over(w))
        .withColumn("nlon", F.lead("stop_lon").over(w))
        .filter(F.col("nlat").isNotNull())
        # lattice wrap-around hops jump across the grid; exclude them
        .withColumn(
            "d", haversine_meters(F.col("stop_lat"), F.col("stop_lon"), F.col("nlat"), F.col("nlon"))
        )
    )
    p95 = hops.agg(F.expr("percentile(d, 0.9)").alias("p")).first()["p"]
    assert p95 < 300, f"90% of consecutive hops should be lattice-adjacent, got {p95}"
    # regenerating yields identical rows (pure column expressions, no RNG)
    again = synth_gtfs(spark, n_routes=6, trips_per_route=8, stops_per_trip=12)
    a = sorted(map(tuple, mini["stop_times"].collect()))
    b = sorted(map(tuple, again["stop_times"].collect()))
    assert a == b


def test_sssp_tiers_agree(spark, mini):
    """Broadcast Dijkstra and the iterative kernel must produce identical
    (lane, node, cost) sets on the projected graph."""
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import (
        multi_source_dijkstra,
        sssp,
    )
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph

    g = project_graph(mini, DAY, speed=1.0, name="tier_test")
    lanes = (
        g.vertices.orderBy("id")
        .limit(3)
        .select(F.col("id").alias("lane"), F.col("id").alias("node"))
    )
    fast = {
        (r["lane"], r["node"]): r["cost"]
        for r in sssp(g.edges, lanes, weight_col="waiting_time", strategy="broadcast")
        .collect()
    }
    slow = {
        (r["lane"], r["node"]): r["cost"]
        for r in multi_source_dijkstra(
            g.edges, lanes, weight_col="waiting_time", track_paths=False
        ).collect()
    }
    assert fast == slow
    g.unpersist()


def test_routing_on_synth_feed(spark, mini):
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing

    g = project_graph(mini, DAY, speed=1.0, name="synth_route_test")
    # R0 horizontal on row 0 (cols 0..11); R3 vertical on col 7 (rows 0..11,
    # v=1 -> col (1*7)%12=7); they cross at cell 7. Ride R0 east from col 3
    # to col 7, change, ride R3 south to row 5.
    src_name = "Stop 3"  # row 0, col 3 (on R0)
    dst_name = f"Stop {5 * 45 + 7}"  # row 5, col 7 (on R3)
    legs = routing(g, time_s=6 * 3600, source_stop_name=src_name, target_stop_name=dst_name)
    rows = legs.collect()
    assert rows, "expected a routable itinerary on the grid"
    assert rows[0]["starting_stop_name"] == src_name
    assert rows[-1]["next_stop"] == dst_name
    g.unpersist()


def test_od_pairs_well_formed():
    pairs = od_pairs_9()
    assert len(pairs) == 9
    assert all(s != t for s, t in pairs)

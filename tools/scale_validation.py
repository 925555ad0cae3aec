"""Scale-validation driver: push the projection + SSSP kernels past the
broadcast regime (VERDICT r1, next-round item 5).

Builds the deterministic synthetic GTFS feed at a multiple of the
reference's city scale (default 4x -> ~1M stoptimes, >5M projected edges,
beyond graph.sssp.BROADCAST_EDGE_LIMIT), then:

1. times the bucketed CHANGE projection at that scale (the candidate
   blow-up the bucketing exists to prevent is quadratic in exactly this
   regime) and confirms the AUTO dispatcher would pick the iterative tier;
2. runs the ITERATIVE Pregel kernel on the >5M-edge graph with uniform
   weights and a fixed superstep budget K. With uniform weights cost ==
   hop count, improvements only ever lower cost, and a node first reached
   in superstep r has final cost r — so after K supersteps every node with
   cost <= K is provably FINAL;
3. runs the BROADCAST CSR kernel on the same graph (the ~300 MB edge
   payload still fits this sandbox) and asserts both tiers agree exactly
   on the cost<=K set — cross-tier agreement at scale, not just on the
   pytest fixtures;
4. times one broadcast-tier routing query at 4x scale for the record
   (iterative-tier ROUTING is deliberately not timed here: ranking needs
   every target's final cost, so the iterative tier must converge over the
   whole day's reachable set — the documented batch-latency regime).

Prints one JSON line; results are recorded in SCALE.md. Run:

    SCALE_MULT=4 python tools/scale_validation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.graph.sssp import BROADCAST_EDGE_LIMIT
from routing_algorithm_for_graph_dbs_spark.session import get_spark

BFS_DEPTH = 12


def main() -> None:
    mult = float(os.environ.get("SCALE_MULT", "4"))
    from pyspark.sql import functions as F

    from routing_algorithm_for_graph_dbs_spark.graph.local_sssp import (
        broadcast_dijkstra,
    )
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import (
        multi_source_dijkstra,
    )
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import (
        od_pairs_9,
        synth_gtfs,
    )

    spark = get_spark(app_name="scale-validation")

    t0 = time.perf_counter()
    tables = synth_gtfs(spark, trips_per_route=int(140 * mult))
    g = project_graph(tables, "2024-01-18", speed=1.0, name="scale_validation")
    n_vertices = g.vertices.count()
    n_edges = g.edges.count()
    t_projection = round(time.perf_counter() - t0, 1)

    assert n_edges > BROADCAST_EDGE_LIMIT, (
        f"{n_edges} edges does not exceed BROADCAST_EDGE_LIMIT "
        f"({BROADCAST_EDGE_LIMIT}); raise SCALE_MULT"
    )

    # --- cross-tier SSSP agreement on the >5M-edge graph ---------------
    seed = g.vertices.select(F.col("id")).orderBy("id").limit(1).first()["id"]
    uni = g.edges.select("src", "dst").withColumn("w", F.lit(1.0))
    lanes = spark.createDataFrame([(seed, seed)], ["lane", "node"])

    t0 = time.perf_counter()
    it_res = multi_source_dijkstra(
        uni, lanes, weight_col="w", max_iterations=BFS_DEPTH, track_paths=False
    )
    it_set = {
        (r["node"], r["cost"])
        for r in it_res.filter(F.col("cost") <= BFS_DEPTH).collect()
    }
    t_iterative = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    bc_res = broadcast_dijkstra(uni, lanes, weight_col="w", track_paths=False)
    bc_set = {
        (r["node"], r["cost"])
        for r in bc_res.filter(F.col("cost") <= BFS_DEPTH).collect()
    }
    t_broadcast_kernel = round(time.perf_counter() - t0, 1)

    assert it_set == bc_set, (
        f"tier divergence on cost<={BFS_DEPTH}: iterative {len(it_set)} rows, "
        f"broadcast {len(bc_set)} rows, "
        f"symmetric diff {len(it_set ^ bc_set)}"
    )

    # --- new iterative kernels on the >5M-edge graph -------------------
    # pagerank: 3 power iterations, distributed tier forced (auto would
    # pick local under 5M but this graph is above it anyway); the point is
    # per-iteration wall time of the one-job superstep at 7M edges.
    from routing_algorithm_for_graph_dbs_spark.graph.kcore import k_core
    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    t0 = time.perf_counter()
    pr = pagerank(
        g.edges.select("src", "dst"), iterations=3, strategy="iterative",
        n_edges=n_edges,
    )
    pr_mass = pr.agg(F.sum("pr")).first()[0]
    t_pagerank3 = round(time.perf_counter() - t0, 1)
    assert abs(pr_mass - 1.0) < 1e-6, f"pagerank mass {pr_mass} != 1"

    t0 = time.perf_counter()
    core = k_core(
        g.edges.select("src", "dst"), k=4, iterations=3, strategy="iterative",
        n_edges=n_edges,
    )
    n_core = core.count()
    t_kcore3 = round(time.perf_counter() - t0, 1)

    # --- broadcast-tier routing latency at 4x scale --------------------
    src, dst = od_pairs_9()[0]
    t0 = time.perf_counter()
    legs = routing(
        g, time_s=14 * 3600, source_stop_name=src, target_stop_name=dst,
        strategy="broadcast",
    )
    n_legs = len(legs.collect())
    t_routing_broadcast = round(time.perf_counter() - t0, 1)

    print(
        json.dumps(
            {
                "metric": "scale_validation",
                "scale_mult": mult,
                "vertices": n_vertices,
                "edges": n_edges,
                "broadcast_edge_limit": BROADCAST_EDGE_LIMIT,
                "auto_tier_at_this_scale": "iterative",
                "t_projection_s": t_projection,
                "bfs_depth": BFS_DEPTH,
                "nodes_within_depth": len(it_set),
                "t_iterative_kernel_s": t_iterative,
                "t_broadcast_kernel_s": t_broadcast_kernel,
                "tiers_agree": True,
                "t_routing_broadcast_s": t_routing_broadcast,
                "routing_legs": n_legs,
                "t_pagerank_3iter_s": t_pagerank3,
                "pagerank_mass_ok": True,
                "t_kcore_3round_s": t_kcore3,
                "kcore_nodes": n_core,
            }
        )
    )


if __name__ == "__main__":
    main()

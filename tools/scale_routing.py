"""Iterative-tier ROUTING at 4x scale with the bounded-horizon kernel
(VERDICT r5, next-round item 5).

Earlier rounds validated the iterative SSSP *kernel* past the broadcast
regime but never timed iterative-tier *routing* end-to-end: ranking needs
every target's final cost, and unbounded convergence over the
time-expanded day graph is hundreds of supersteps. The reference itself
caps itineraries at ``max_duration`` (reference ``main.py:129-130``), so
the SSSP horizon (``max_cost = max_duration``) is semantics-preserving
for ranked results — and it bounds the frontier: no lane expands past the
cap, so supersteps stop growing once the horizon is swept.

This driver builds the 4x feed (>5M projected edges, the regime where
``auto`` picks the iterative tier), runs the SAME 9-OD batch routing on
BOTH tiers, asserts the leg tables are identical, and prints one JSON
line for SCALE.md. Run:

    SCALE_MULT=4 python tools/scale_routing.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.graph.sssp import BROADCAST_EDGE_LIMIT
from routing_algorithm_for_graph_dbs_spark.session import get_spark


def main() -> None:
    mult = float(os.environ.get("SCALE_MULT", "4"))

    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing_batch
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import (
        od_pairs_9,
        synth_gtfs,
    )

    spark = get_spark(app_name="scale-routing")

    t0 = time.perf_counter()
    tables = synth_gtfs(spark, trips_per_route=int(140 * mult))
    g = project_graph(tables, "2024-01-18", speed=1.0, name="scale_routing")
    n_edges = g.edges.count()
    t_projection = round(time.perf_counter() - t0, 1)
    assert n_edges > BROADCAST_EDGE_LIMIT, (
        f"{n_edges} edges does not exceed BROADCAST_EDGE_LIMIT; raise SCALE_MULT"
    )

    def legs_key(rows):
        return sorted(
            (
                r["pair_id"], r["trip"], r["departure"], r["line"],
                r["starting_stop_name"], r["next_stop"], r["arrival"],
            )
            for r in rows
        )

    t0 = time.perf_counter()
    bc = routing_batch(
        g, od_pairs_9(), time_s=14 * 3600, strategy="broadcast"
    ).collect()
    t_broadcast = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    it = routing_batch(
        g, od_pairs_9(), time_s=14 * 3600, strategy="iterative",
        max_iterations=1000,
    ).collect()
    t_iterative = round(time.perf_counter() - t0, 1)

    assert legs_key(bc) == legs_key(it), (
        f"leg divergence: broadcast {len(bc)} rows vs iterative {len(it)} rows"
    )

    print(
        json.dumps(
            {
                "metric": "scale_routing",
                "scale_mult": mult,
                "edges": n_edges,
                "t_projection_s": t_projection,
                "horizon_s": 4 * 3600,
                "t_routing_batch_broadcast_s": t_broadcast,
                "t_routing_batch_iterative_s": t_iterative,
                "legs": len(it),
                "legs_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Iterative-tier ROUTING at 4x scale (VERDICT r5, next-round item 5).

Earlier rounds validated the iterative SSSP *kernel* past the broadcast
regime but never timed iterative-tier *routing* end-to-end: ranking needs
every target's final cost, and unbounded convergence over the
time-expanded day graph is hundreds of supersteps. Round 7 made routing's
DEFAULT exact — per-lane TARGET SETTLEMENT stops the kernel once every
requested target's cost is provably final (cost <= its lane's frontier
minimum); the previous implicit ``max_cost = max_duration`` prune was
unsound (CHANGE weights exceed elapsed time by the walking component, so
it could prune a reference-feasible winner at the boundary — now a
regression test). Exact settlement then stalled on lanes holding an
UNREACHABLE target (proving unreachability by search = exhausting the
component), which round 7 worked around with an OPT-IN padded cost
horizon (``SCALE_HORIZON_H``) certified a posteriori by winner identity.
Round 8 removed the stall soundly: the admissible earliest-arrival
certificate (graph/stop_bound.py) excludes provably-unreachable targets
up front and the kernel retires lanes whose targets settle early, so the
DEFAULT here is now fully exact (``SCALE_HORIZON_H=0``); set a nonzero
horizon only to reproduce the legacy certified-horizon regime.

Comparison contract: the RANKED WINNER identity (pair, src stoptime,
dst stoptime, cost, arrival) is fully deterministic and must be
bit-identical across tiers. The leg PATH between a fixed (src, dst)
stoptime pair is one arbitrary member of its equal-cost tie class —
time-expanded graphs are rife with equal-cost reroutes, and the
reference's GDS Dijkstra is tie-arbitrary too — so per-tier leg tables
are validated STRUCTURALLY (contiguous chain, matching endpoints,
identical winner timestamps) and their equality is reported but not
asserted.

Prints one JSON line for SCALE.md. Run:

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


def _winner_key(legs):
    """Per-pair (first departure, last arrival) — the tie-insensitive
    winner identity recoverable from a leg table."""
    by_pair: dict = {}
    for r in legs:
        p = r["pair_id"]
        cur = by_pair.setdefault(p, {"dep": None, "arr": None, "n": 0})
        if cur["dep"] is None or r["departure"] < cur["dep"]:
            cur["dep"] = r["departure"]
        if cur["arr"] is None or r["arrival"] > cur["arr"]:
            cur["arr"] = r["arrival"]
        cur["n"] += 1
    return {p: (v["dep"], v["arr"]) for p, v in by_pair.items()}


def _chain_ok(legs) -> bool:
    """Each pair's legs form one contiguous stop chain."""
    from collections import defaultdict

    by_pair = defaultdict(list)
    for r in legs:
        by_pair[r["pair_id"]].append(r)
    for rows in by_pair.values():
        rows.sort(key=lambda r: r["departure"])
        for a, b in zip(rows, rows[1:]):
            if a["next_stop"] != b["starting_stop_name"]:
                return False
    return True


def main() -> None:
    mult = float(os.environ.get("SCALE_MULT", "4"))

    import importlib

    # NOT `from ...graph import sssp` — graph/__init__ re-exports the sssp
    # FUNCTION under that name, shadowing the module
    sssp_mod = importlib.import_module(
        "routing_algorithm_for_graph_dbs_spark.graph.sssp"
    )
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing_batch
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import (
        od_pairs_9,
        synth_gtfs,
    )

    spark = get_spark(app_name="scale-routing")

    # Two scaling axes (round 13): SCALE_AXIS=density multiplies
    # trips_per_route — rows AND temporal hop-depth grow together (the
    # r13 25x probe showed supersteps explode with density, because
    # reaching early-arrival target stoptimes takes bounce chains whose
    # depth tracks headway count). SCALE_AXIS=breadth multiplies
    # n_routes at the 4x density — more data over the same grid, the
    # axis a 100 TB deployment actually grows along (more cities /
    # lines / days, not 25x-denser single-corridor schedules).
    axis = os.environ.get("SCALE_AXIS", "density")
    t0 = time.perf_counter()
    if axis == "breadth":
        tables = synth_gtfs(
            spark, trips_per_route=560, n_routes=int(60 * mult)
        )
    else:
        tables = synth_gtfs(spark, trips_per_route=int(140 * mult))
    g = project_graph(tables, "2024-01-18", speed=1.0, name="scale_routing")
    n_edges = g.edges.count()
    t_projection = round(time.perf_counter() - t0, 1)
    assert n_edges > BROADCAST_EDGE_LIMIT, (
        f"{n_edges} edges does not exceed BROADCAST_EDGE_LIMIT; raise SCALE_MULT"
    )

    t0 = time.perf_counter()
    bc = routing_batch(
        g, od_pairs_9(), time_s=14 * 3600, strategy="broadcast"
    ).collect()
    t_broadcast = round(time.perf_counter() - t0, 1)

    ck = int(os.environ.get("SCALE_CHECKPOINT_EVERY", "1"))
    # round 14: partition-local relaxation (the density depth-wall fix)
    # is the iterative tier's DEFAULT; SCALE_LOCAL_RELAX=0 pins the
    # legacy one-hop kernel for A/B on the same probe
    local_relax = os.environ.get("SCALE_LOCAL_RELAX", "1") == "1"
    # Legacy bounded-horizon opt-in (hours; 0 = exact/off — the DEFAULT
    # since the stop-bound certificate landed). A nonzero horizon is NOT
    # provably winner-preserving (walking inflates cost past elapsed
    # time); if set, the winner-identity assert below is its a-posteriori
    # certification against the exact broadcast tier.
    horizon_h = float(os.environ.get("SCALE_HORIZON_H", "0"))
    t0 = time.perf_counter()
    it = routing_batch(
        g, od_pairs_9(), time_s=14 * 3600, strategy="iterative",
        max_iterations=3000, checkpoint_every=ck,
        max_cost=(horizon_h * 3600 if horizon_h > 0 else None),
        local_relax=local_relax,
    ).collect()
    t_iterative = round(time.perf_counter() - t0, 1)
    supersteps = sssp_mod.LAST_ITERATIVE_SUPERSTEPS
    converged = sssp_mod.LAST_ITERATIVE_CONVERGED

    assert converged, f"iterative tier hit max_iterations at {supersteps}"
    wk_bc, wk_it = _winner_key(bc), _winner_key(it)
    assert wk_bc == wk_it, (
        f"winner divergence: {sorted(set(wk_bc.items()) ^ set(wk_it.items()))}"
    )
    assert _chain_ok(bc) and _chain_ok(it), "broken leg chain"

    def legs_key(rows):
        return sorted(
            (
                r["pair_id"], r["trip"], r["departure"], r["line"],
                r["starting_stop_name"], r["next_stop"], r["arrival"],
            )
            for r in rows
        )

    print(
        json.dumps(
            {
                "metric": "scale_routing",
                "scale_mult": mult,
                "scale_axis": axis,
                "edges": n_edges,
                "t_projection_s": t_projection,
                "checkpoint_every": ck,
                "horizon_h": horizon_h,
                "local_relax": local_relax,
                "t_routing_batch_broadcast_s": t_broadcast,
                "t_routing_batch_iterative_s": t_iterative,
                "iterative_supersteps": supersteps,
                "iterative_converged": converged,
                "iterative_lanes_retired": sssp_mod.LAST_ITERATIVE_RETIRED,
                "legs_broadcast": len(bc),
                "legs_iterative": len(it),
                "winners_identical": True,
                "chains_valid": True,
                "legs_identical": legs_key(bc) == legs_key(it),
            }
        )
    )


if __name__ == "__main__":
    main()

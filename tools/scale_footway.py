"""Footway-tier scale validation (VERDICT r7, next-round item 6).

The reference's footway graph is tiny (5,539 FootNodes, prova.py), but the
engine claims generality: ``graph/footway.py walking_distances`` dispatches
through the same two-tier SSSP as transport routing, so past
BROADCAST_EDGE_LIMIT it must flip to the iterative Pregel kernel and agree
with the broadcast tier. This driver synthesizes a >5M-edge footway mesh and
records cross-tier agreement at that scale.

Mesh shape: a city-like hierarchical walk network — a W x W grid of local
footpaths plus express shortcuts at spans 32 and 512 (arterial/crossing
paths). Pure grids are hop-deep (diameter ~2W supersteps — infeasible for
any Pregel kernel, ours or GraphX's); the shortcuts bound the weighted
shortest-path tree depth at a few dozen hops, which is also what real
street networks with transit/arterial shortcuts look like. All edge
lengths are deterministic (xxhash64 of the endpoint ids), so the run is
reproducible bit-for-bit.

Agreement check: full single-source cost maps (no targets, no paths) from
two start lanes, joined distributed — row counts, one-sided rows and max
|cost delta| must all come back clean. Costs are exact-equal across tiers
(each node's cost is the sum over its unique shortest path, added in the
same order by both kernels); the 1e-9 tolerance is paranoia, not slack.

Prints one JSON line; results are recorded in SCALE.md. Run:

    python tools/scale_footway.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.session import get_spark

GRID = 775  # 775x775 nodes -> ~5.5M symmetrized edges (past the 5M limit)


def synth_footway_mesh(spark, grid: int = GRID):
    """(foot_edges DataFrame, n_nodes): (src, dst, length, rel_type) rows
    for a hierarchical grid mesh, generated distributed (no driver list)."""
    from pyspark.sql import functions as F

    ids = spark.range(grid * grid).select(
        F.col("id"),
        (F.col("id") / grid).cast("long").alias("r"),
        F.pmod(F.col("id"), F.lit(grid)).alias("c"),
    )

    def hop(span: int, base_len: int, jitter: int):
        """Right + down edges of the given span; length = base + hash
        jitter in tenths of a meter (deterministic, positive)."""
        right = ids.filter(F.col("c") < grid - span).select(
            F.col("id").alias("s"), (F.col("id") + span).alias("d")
        )
        down = ids.filter(F.col("r") < grid - span).select(
            F.col("id").alias("s"), (F.col("id") + span * grid).alias("d")
        )
        return (
            right.unionByName(down)
            .select(
                F.concat(F.lit("n"), F.col("s")).alias("src"),
                F.concat(F.lit("n"), F.col("d")).alias("dst"),
            )
            .withColumn(
                "length",
                F.lit(float(base_len))
                + F.pmod(F.xxhash64("src", "dst"), F.lit(jitter)).cast("double")
                / 10.0,
            )
            .withColumn("rel_type", F.lit("FOOT_ROUTE"))
        )

    # locals ~U[1.0, 9.9]; span-32 shortcuts ~[40, 48) (cheaper than ~32
    # expected locals, dearer than the all-minimum local path — realistic
    # arterials); span-512 ~[512, 520)
    edges = hop(1, 1, 90).unionByName(hop(32, 40, 80)).unionByName(
        hop(512, 512, 80)
    )
    return edges, grid * grid


def main() -> None:
    from pyspark.sql import functions as F

    import importlib

    # graph/__init__.py re-exports the sssp FUNCTION under the module's
    # name, so plain import forms hand back the function — resolve the
    # module itself for the telemetry globals (same as tools/scale_routing)
    sssp_mod = importlib.import_module(
        "routing_algorithm_for_graph_dbs_spark.graph.sssp"
    )
    from routing_algorithm_for_graph_dbs_spark.graph.footway import (
        foot_edge_union,
        walking_distances,
    )

    spark = get_spark(app_name="scale-footway")
    foot_edges, n_nodes = synth_footway_mesh(spark)
    foot_edges = foot_edges.persist()
    n_sym = foot_edge_union(foot_edges).count()
    assert n_sym > sssp_mod.BROADCAST_EDGE_LIMIT, (
        f"{n_sym} symmetrized edges does not exceed BROADCAST_EDGE_LIMIT"
    )
    starts = ["n0", f"n{(GRID // 2) * GRID + GRID // 2}"]  # corner + center

    t0 = time.perf_counter()
    it_df = walking_distances(
        foot_edges, starts, strategy="iterative", track_paths=False
    ).persist()
    n_it = it_df.count()
    t_iterative = round(time.perf_counter() - t0, 1)
    supersteps = sssp_mod.LAST_ITERATIVE_SUPERSTEPS
    converged = sssp_mod.LAST_ITERATIVE_CONVERGED

    t0 = time.perf_counter()
    bc_df = walking_distances(
        foot_edges, starts, strategy="broadcast", track_paths=False
    ).persist()
    n_bc = bc_df.count()
    t_broadcast = round(time.perf_counter() - t0, 1)

    joined = it_df.alias("a").join(
        bc_df.alias("b"), ["lane", "node"], "full_outer"
    )
    stats = joined.agg(
        F.count("*").alias("n"),
        F.sum(
            (F.col("a.cost").isNull() | F.col("b.cost").isNull()).cast("long")
        ).alias("one_sided"),
        F.max(F.abs(F.col("a.cost") - F.col("b.cost"))).alias("max_delta"),
    ).first()
    tiers_agree = bool(
        converged
        and n_it == n_bc == stats["n"]
        and stats["one_sided"] == 0
        and stats["max_delta"] is not None
        and stats["max_delta"] < 1e-9
    )
    print(
        json.dumps(
            {
                "metric": "scale_footway",
                "grid": GRID,
                "nodes": n_nodes,
                "edges_symmetrized": n_sym,
                "lanes": len(starts),
                "rows_iterative": n_it,
                "rows_broadcast": n_bc,
                "supersteps": supersteps,
                "converged": converged,
                "t_iterative_s": t_iterative,
                "t_broadcast_s": t_broadcast,
                "max_cost_delta": float(stats["max_delta"]),
                "tiers_agree": tiers_agree,
            }
        )
    )


if __name__ == "__main__":
    main()

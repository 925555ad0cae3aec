"""PageRank as a fixed-iteration DataFrame program.

Companion to the SSSP/betweenness kernels (same cached-edge superstep
shape; parity family: ``gds.pageRank.stream`` — the reference's GDS
catalog exposes it alongside betweenness, reference ``main.py:46-60``
shape). Fixed iteration count + damping makes the result a deterministic
function of the graph, so an independent engine reproduces it by
unrolling the same update — the DuckDB oracle builds one CTE per
iteration.

Update rule (the standard power iteration with uniform teleport and
dangling-mass redistribution):

    pr'(v) = (1-d)/N + d * (dangling_mass/N + sum_{u->v} pr(u)/deg(u))

Scale shape: edges are hash-partitioned on ``src`` once and persisted;
each iteration is one join frontier->edges (the full rank vector — power
iteration has no shrinking frontier), a groupBy(dst) partial-agg shuffle,
and ONE scheduler job via the lazy-checkpoint + count pattern under
``superstep_confs`` (AQE off, shuffle partitions pinned to the edge
relation). The dangling mass is the per-iteration count's sibling scalar
— computed in the same materialized pass, not a separate job over the
full graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    pin_if_uncached,
    edge_partition_count,
    superstep_confs,
)


# same dispatch limit as graph/sssp.py: below it, collect the edge list
# once and run the dense power iteration driver-side (the single-JVM
# regime); above it, the distributed superstep kernel takes over.
BROADCAST_EDGE_LIMIT = 5_000_000


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    n_edges: int | None = None,
    strategy: str = "auto",
    seeds: list | None = None,
) -> DataFrame:
    """Return (node, pr) after ``iterations`` power-iteration steps.

    ``edges``: (src, dst) directed; parallel edges count once (the edge
    relation is distinct-ed, matching the unrolled-SQL oracle's set
    semantics). Vertices are the endpoint union; isolated vertices can be
    appended by callers before the call if they must appear.

    ``seeds`` switches to PERSONALIZED PageRank: the teleport
    distribution concentrates on the seed set (p(v) = 1/|seeds| for
    seeds, 0 elsewhere; the rank vector initializes to p) —

        pr'(v) = (1-d) p(v) + d (dangling_mass * p(v) + inflow(v))

    the graph-proximity scorer retrieval pipelines use ("rank relative
    to THESE nodes"). ``seeds=None`` is classic uniform PageRank; the
    uniform case is literally p(v) = 1/N through the same code path.

    Two-tier like ``sssp``: ``local`` collects the (deduped) edge list and
    runs the identical update as numpy vector ops — tiny/medium graphs pay
    one collect instead of ``iterations`` scheduler rounds; ``iterative``
    is the superstep kernel below; ``auto`` picks by edge count.
    """
    if seeds is not None and not seeds:
        raise ValueError("seeds must be None (uniform) or a non-empty list")
    release = lambda: None
    try:
        if strategy == "auto":
            if n_edges is None:
                # pin across the dispatch count + the tier's first
                # materialization; never evict a caller-persisted cache
                # (graph/partitioning.py pin_if_uncached). try/finally: a
                # kernel exception must not leak the persisted DataFrame.
                edges, release = pin_if_uncached(edges)
                n_edges = edges.count()
            strategy = "local" if n_edges <= BROADCAST_EDGE_LIMIT else "iterative"
        if strategy == "local":
            return _local_pagerank(edges, damping, iterations, seeds)
        return _iterative_pagerank(edges, damping, iterations, seeds, n_edges)
    finally:
        release()


def _iterative_pagerank(
    edges: DataFrame,
    damping: float,
    iterations: int,
    seeds: list | None,
    n_edges: int | None,
) -> DataFrame:
    e = edges.select("src", "dst").distinct()
    if n_edges is None:
        n_edges = e.count()
    n_parts = edge_partition_count(e, n_edges)
    e = e.repartition(n_parts, "src").persist()

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = verts.count()
    d = float(damping)

    if seeds is None:
        p_col = F.lit(1.0 / n)
    else:
        p_col = F.when(
            F.col("node").isin(list(seeds)), F.lit(1.0 / len(seeds))
        ).otherwise(F.lit(0.0))

    # (node, pr, p, deg) — deg NULL marks a dangling node (no out-edges);
    # p is the teleport distribution (uniform or seed-concentrated)
    state = (
        verts.join(deg.withColumnRenamed("src", "node"), "node", "left")
        .select("node", p_col.alias("pr"), p_col.alias("p"), "deg")
        .localCheckpoint(eager=True)
    )

    # graphs without dangling nodes (every vertex has an out-edge) skip the
    # per-iteration mass scalar entirely — no extra job in the loop
    has_dangling = state.filter(F.col("deg").isNull()).count() > 0

    with superstep_confs(edges.sparkSession, n_parts):
        for _ in range(iterations):
            dangling = 0.0
            if has_dangling:
                # scalar off the checkpointed state — one small job, only
                # paid when the graph actually has dangling vertices
                dangling = (
                    state.filter(F.col("deg").isNull()).agg(F.sum("pr")).first()[0]
                    or 0.0
                )
            contribs = (
                state.filter(F.col("deg").isNotNull())
                .join(e, state["node"] == e["src"])
                .select(F.col("dst").alias("node"), (F.col("pr") / F.col("deg")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
            base = (F.lit(1.0 - d) + F.lit(d * dangling)) * F.col("p")
            state = (
                state.select("node", "p", "deg")
                .join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        base + F.lit(d) * F.coalesce(F.col("inflow"), F.lit(0.0))
                    ).alias("pr"),
                    "p",
                    "deg",
                )
                .localCheckpoint(eager=False)
            )
            state.count()  # materializes the lazy checkpoint (one job)

    out = state.select("node", "pr")
    e.unpersist()
    return out


def _local_pagerank(
    edges: DataFrame, d: float, iterations: int, seeds: list | None = None
) -> DataFrame:
    """Driver-side dense power iteration — the broadcast-regime tier.

    One Arrow collect of the deduped 2-column edge list, then the IDENTICAL
    update as numpy vector ops (sum order differs from the shuffle
    aggregation only below the 6-decimal rounding the callers apply — the
    same tolerance the DuckDB oracle already relies on). One collect
    replaces ``iterations`` scheduler rounds; the same tiny-side pattern as
    components' union-find and the SSSP CSR tier.
    """
    import numpy as np
    import pandas as pd

    spark = edges.sparkSession
    pdf = edges.select("src", "dst").distinct().toPandas()
    nodes = pd.unique(pd.concat([pdf["src"], pdf["dst"]], ignore_index=True))
    idx = {v: i for i, v in enumerate(nodes)}
    src = pdf["src"].map(idx).to_numpy(np.int64)
    dst = pdf["dst"].map(idx).to_numpy(np.int64)
    n = len(nodes)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = deg == 0.0
    if seeds is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.zeros(n)
        hit = [idx[v] for v in seeds if v in idx]
        p[hit] = 1.0 / len(seeds)
    pr = p.copy()
    for _ in range(iterations):
        mass = float(pr[dangling].sum()) if dangling.any() else 0.0
        inflow = np.zeros(n)
        np.add.at(inflow, dst, pr[src] / deg[src])
        pr = (1.0 - d) * p + d * mass * p + d * inflow
    out = pd.DataFrame({"node": nodes, "pr": pr})
    return spark.createDataFrame(out)

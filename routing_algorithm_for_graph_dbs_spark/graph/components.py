"""Connected components via iterative min-label propagation.

Parity target: the reference's variable-length reachability guard
``OPTIONAL MATCH (start)-[:A|B|C*]->(end) WHERE end IS NOT NULL``
(reference ``prova.py:211-212``, SURVEY.md G5): two nodes are mutually
reachable over the (symmetrized) footway edge set iff they share a
component. Label propagation is the standard Spark formulation — each
superstep a node adopts the minimum label among itself and its neighbors;
converges in O(diameter) supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    edge_partition_count,
    pin_if_uncached,
    superstep_confs,
)


# edge relations at or below this fit comfortably on the driver (~40 MB of
# pairs); union-find there beats O(diameter) distributed supersteps. The
# iterative tier takes over beyond it — same two-tier pattern as sssp().
LOCAL_EDGE_LIMIT = 5_000_000


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 100,
    strategy: str = "auto",
) -> DataFrame:
    """Return (node, component) where component = the minimum node id in the
    node's WEAKLY-connected component.

    ``edges``: (src, dst); always symmetrized internally — min-label
    propagation along one direction only would compute min-ancestor labels,
    which are neither weak nor strong components. (Strongly-connected
    components need a different algorithm entirely; the engine's parity
    target — the reference's reachability guard over symmetrized footways —
    is the weak form.)

    Two tiers (``strategy``: auto | local | iterative): a near-dup pair
    graph or a city footway graph is a few thousand to a few million edges
    — collected once and solved with union-find on the driver in one job,
    instead of O(diameter) supersteps each costing a join + checkpoint.
    ``auto`` picks by edge count; the iterative min-label tier serves
    graphs beyond driver memory. Cross-tier equality is pytest-asserted.
    """
    n_in = None
    release = lambda: None
    if strategy == "auto":
        # the dispatch count and the chosen tier's first materialization
        # would otherwise EACH execute the caller's upstream pipeline —
        # for dd_canonical that is the whole minhash->LSH->verify chain,
        # roughly doubling its cost. Pin across both; release below.
        edges, release = pin_if_uncached(edges)
        n_in = edges.count()
        strategy = "local" if n_in <= LOCAL_EDGE_LIMIT else "iterative"
    if strategy == "local":
        out = _local_components(edges, vertices)
        release()
        return out

    e = edges.select("src", "dst")
    e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # partition estimate from the raw input count (x2 for symmetrization),
    # reusing the dispatch count — an unpersisted upstream pipeline must
    # not execute twice just for partition sizing
    if n_in is None:
        n_in = edges.count()
    n_parts = edge_partition_count(edges, 2 * n_in)
    e = e.distinct().repartition(n_parts, "src").persist()

    # vertex set = edge endpoints UNION the caller's vertices (isolated
    # nodes become their own components). Endpoints are always included:
    # treating a partial ``vertices`` as the complete set would silently
    # drop labels for unlisted endpoints — and diverge from the local tier.
    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if vertices is not None:
        verts = (
            verts.unionByName(
                vertices.select(F.col(vertices.columns[0]).alias("node"))
            ).distinct()
        )

    labels = verts.select("node", F.col("node").alias("component")).localCheckpoint(
        eager=True
    )

    with superstep_confs(edges.sparkSession, n_parts):
        for _ in range(max_iterations):
            neighbor_min = (
                labels.join(e, labels["node"] == e["src"])
                .select(e["dst"].alias("node"), "component")
                .groupBy("node")
                .agg(F.min("component").alias("nbr_component"))
            )
            updated = (
                labels.alias("l")
                .join(neighbor_min.alias("n"), "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("l.component"),
                        F.coalesce(F.col("n.nbr_component"), F.col("l.component")),
                    ).alias("component"),
                    (F.col("n.nbr_component") < F.col("l.component")).alias("_changed"),
                )
            ).localCheckpoint(eager=False)
            # lazy checkpoint + count = one job: the count's full scan
            # materializes the checkpoint as a side effect (an eager checkpoint
            # would spend a second job doing the same scan).
            n_changed = updated.filter(F.col("_changed")).count()
            labels = updated.drop("_changed")
            if n_changed == 0:
                break

    e.unpersist()
    release()
    return labels


def _local_components(edges: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """Driver-side union-find (path compression + union by min label).

    One collect of the 2-column edge list, one parallelize back out —
    the same tiny-side pattern as IVF centroid collection. Labels are the
    component minimum, matching the iterative tier exactly.
    """
    spark = edges.sparkSession
    node_type = edges.schema["src"].dataType
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while x != root:  # path compression
            nxt = parent[x]
            parent[x] = root
            x = nxt
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

    nodes = set()
    for r in edges.select("src", "dst").collect():
        a, b = r["src"], r["dst"]
        nodes.add(a)
        nodes.add(b)
        union(a, b)
    if vertices is not None:
        for r in vertices.select(
            F.col(vertices.columns[0]).alias("node")
        ).distinct().collect():
            nodes.add(r["node"])

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("component", node_type, False),
        ]
    )
    rows = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(rows, schema)

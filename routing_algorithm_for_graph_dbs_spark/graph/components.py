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
)


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 100,
) -> DataFrame:
    """Return (node, component) where component = the minimum node id in the
    node's WEAKLY-connected component.

    ``edges``: (src, dst); always symmetrized internally — min-label
    propagation along one direction only would compute min-ancestor labels,
    which are neither weak nor strong components. (Strongly-connected
    components need a different algorithm entirely; the engine's parity
    target — the reference's reachability guard over symmetrized footways —
    is the weak form.)
    """
    e = edges.select("src", "dst")
    e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # partition estimate from the raw input count (x2 for symmetrization) —
    # cheaper than counting the distinct relation twice, and partition
    # sizing only needs the order of magnitude
    n_parts = edge_partition_count(edges, 2 * edges.count())
    e = e.distinct().repartition(n_parts, "src").persist()

    if vertices is None:
        verts = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        verts = vertices.select(F.col(vertices.columns[0]).alias("node")).distinct()

    labels = verts.select("node", F.col("node").alias("component")).localCheckpoint(
        eager=True
    )

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
        ).localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break

    e.unpersist()
    return labels

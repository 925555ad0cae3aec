"""Community detection by synchronous label propagation (LPA).

Beyond-reference graph surface (gds.labelPropagation shape). Classic
async LPA is nondeterministic (random visit order, random tie-breaks);
this is the SYNCHRONOUS, fully deterministic variant: every round, every
vertex simultaneously adopts the most frequent label among its
neighbors, ties broken by minimum label. A fixed round count makes the
output a pure function of the graph — hash-checkable against a DuckDB
oracle that unrolls the same rounds — at the cost of possible
oscillation on bipartite-ish structures (the standard sync-LPA caveat;
pick ``iterations`` odd/even deliberately when that matters).

Scale shape: one shuffle per round — labels join the cached symmetrized
edge relation on ``dst`` (co-partitioned with it), the (node, label)
counts aggregate with map-side partial aggregation, and the per-node
argmax is a window over the node key (same partitioning as the
aggregation, no extra Exchange). Lineage is truncated per round with a
localCheckpoint, so plan depth stays constant regardless of round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    edge_partition_count,
    superstep_confs,
)


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iterations: int = 3,
) -> DataFrame:
    """Return (node, community) after ``iterations`` synchronous LPA
    rounds over the symmetrized ``edges`` (src, dst).

    Initial label = own id. Update: most frequent neighbor label, ties to
    the minimum. Vertices with no neighbors keep their own label.
    ``vertices`` (optional, first column used) adds isolated nodes.
    """
    e = edges.select("src", "dst")
    e = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    n_parts = edge_partition_count(edges, 2 * edges.count())
    e = e.repartition(n_parts, "dst").persist()

    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if vertices is not None:
        verts = verts.unionByName(
            vertices.select(F.col(vertices.columns[0]).alias("node"))
        ).distinct()
    verts = verts.localCheckpoint(eager=True)

    labels = verts.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label").asc())
    with superstep_confs(edges.sparkSession, n_parts):
        for _ in range(iterations):
            cand = (
                labels.join(e, labels["node"] == e["dst"])
                .select(e["src"].alias("node"), "label")
                .groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            nxt = (
                cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", F.col("label").alias("new_label"))
            )
            labels = (
                verts.join(nxt, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("new_label"), F.col("node")).alias("label"),
                )
                .localCheckpoint(eager=True)
            )

    e.unpersist()
    return labels.select("node", F.col("label").alias("community"))

"""Triangle counting as a two-join DataFrame program.

GDS-catalog companion (``gds.triangleCount.stream`` family — same catalog
the reference drives for betweenness, reference ``main.py:46-60`` shape).
Undirected semantics: edge direction is erased, each triangle {x, y, z}
counts once via the low->high orientation (x < y < z), and a node's count
is the number of triangles it participates in.

Scale shape: the standard distributed formulation — symmetrize + orient
(each undirected edge kept once as src < dst), then two hash equi-joins:
wedges (a->b joined a->c on the shared low node) closed by probing the
edge set for (b, c). Everything shuffles on node keys; no cross product.
High-degree nodes fan wedges quadratically — the known skew point; AQE
skew-split (or degree-ordered orientation, the classic refinement) covers
it. The oracle states the identical three-way join in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Return (node, triangles): per-node triangle participation counts.

    ``edges``: (src, dst) in any orientation/multiplicity; direction and
    duplicates are erased. Nodes in no triangle report 0.
    """
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    o = (
        und.filter(F.col("src") < F.col("dst"))
        .distinct()
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .persist()
    )
    # wedges a<b, a<c with b<c; close with edge (b, c)
    tri = (
        o.alias("e1")
        .join(
            o.select(F.col("a").alias("a2"), F.col("b").alias("c")).alias("e2"),
            F.col("e1.a") == F.col("a2"),
        )
        .filter(F.col("b") < F.col("c"))
        .join(
            o.select(F.col("a").alias("b2"), F.col("b").alias("c2")).alias("e3"),
            (F.col("b") == F.col("b2")) & (F.col("c") == F.col("c2")),
        )
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    verts = (
        o.select(F.col("a").alias("node"))
        .unionByName(o.select(F.col("b").alias("node")))
        .distinct()
    )
    out = verts.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )
    o.unpersist()
    return out


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node:
    ``lcc(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1))`` with the
    undirected distinct-neighbor degree; nodes of degree < 2 report 0.

    Composes :func:`triangle_counts` (two hash equi-joins) with one
    degree aggregation over the same symmetrized edge set — the degree
    join adds no new shuffle key (node-keyed like everything else).
    Rounded to 6 so results hash-match across engines.
    """
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    tri = triangle_counts(edges)
    return tri.join(deg, "node", "left").select(
        "node",
        "triangles",
        F.when(
            F.col("deg") >= 2,
            F.round(
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def node_similarity(edges: DataFrame, min_jaccard: float = 0.0) -> DataFrame:
    """Neighbor-set Jaccard similarity for node pairs sharing at least one
    out-neighbor (the ``gds.nodeSimilarity.stream`` shape). Returns
    ``(a, b, inter, jaccard)`` with ``a < b``, jaccard rounded to 6.

    Scale shape: candidate pairs meet through an equi-join on the SHARED
    neighbor (never all-pairs); intersection sizes come from one
    combiner-friendly groupBy and degrees join back broadcast-ably. A
    high-in-degree neighbor fans pairs quadratically — the known hot spot;
    AQE skew-split covers it (same caveat as triangle wedges).
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    l = e.select(F.col("src").alias("a"), F.col("dst").alias("n"))
    r = e.select(F.col("src").alias("b"), F.col("dst").alias("n"))
    inter = (
        l.join(r, "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("db"))
    out = (
        inter.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            F.round(
                F.col("inter") / (F.col("da") + F.col("db") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out

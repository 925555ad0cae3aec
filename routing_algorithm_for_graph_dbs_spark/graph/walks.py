"""Deterministic random-walk corpus generation (DeepWalk/node2vec input).

Graph-embedding training corpora are built by walking the graph: one
(or more) fixed-length walks per vertex, each walk a "sentence" of node
ids fed to a skip-gram trainer. Classic implementations draw from an
RNG; at pipeline scale that breaks reproducibility and resumability, so
— like every sampler here (``operators/sampling.py``) — the draw is a
HASH: step i of walk w picks out-neighbor

    rank = 1 + uint32(md5(walk_id || '|' || i)) % out_degree(cur)

with neighbors ranked by (dst) order. Same bytes in, same corpus out,
on any engine with md5 (the DuckDB oracle unrolls the identical steps).

Scale shape: neighbors are ranked ONCE (row_number + count over the src
partition — one shuffle), then each step is an equi-join of the walk
frontier against that ranked relation on the current node, with the
rank pinned in the join condition — so each walk matches exactly one
edge row per step, never fanning out by degree. Steps shuffle the
frontier (walk_id, cur, walk-so-far) on ``cur``; walk state is an array
of ``length+1`` ids, bounded. Dead ends truncate the walk (left join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame,
    length: int,
    salt: str = "walk",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Return (walk_id, walk) — one hash-deterministic walk of up to
    ``length`` steps per start vertex (default: every vertex; pass
    ``starts`` (first column) to walk from a subset, e.g. several
    walks per node via a pre-exploded (node x replica) frame whose ids
    encode the replica).
    """
    e = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src")
    nbr = e.select(
        "src",
        "dst",
        F.row_number().over(w.orderBy("dst")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("deg"),
    )

    if starts is None:
        starts = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        starts = starts.select(F.col(starts.columns[0]).alias("node")).distinct()

    walks = starts.select(
        F.col("node").alias("walk_id"),
        F.col("node").alias("cur"),
        F.array(F.col("node")).alias("walk"),
    )
    for i in range(length):
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.col("walk_id").cast("string"),
                            F.lit(f"|{i}"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("deg")
        ) + 1
        walks = (
            walks.join(
                nbr,
                (walks["cur"] == nbr["src"]) & (nbr["rn"] == pick),
                "left",
            )
            .select(
                "walk_id",
                F.col("dst").alias("cur"),
                F.when(F.col("dst").isNull(), F.col("walk"))
                .otherwise(F.concat(F.col("walk"), F.array(F.col("dst"))))
                .alias("walk"),
            )
        )
    return walks.select("walk_id", "walk")

"""Footway (pedestrian) graph operators (SURVEY.md §2.9 G4-G6, §2.3 J7).

Parity targets (reference ``prova.py:175-277``, ``routing.ipynb:203-414``):

- ``get_nearest_footnode_with_distance(lat, lon)`` — top-1 nearest-neighbor
  over FootNodes (``ORDER BY distance LIMIT 1``). NB the reference swaps
  lat/lon inside ``point()`` there (``prova.py:188``) — a bug we do NOT
  reproduce (FIXTURES.md §A).
- ``get_walking_distance(a, b)`` — ``apoc.algo.dijkstra(start, end,
  'SHORTEST_ROUTE_TO|FOOT_ROUTE|CONTAINS>|<CONTAINS|CONTINUE_ON_FOOTWAY|
  CONTINUE_ON_FOOTWAY_BY_CROSSING_ROAD', 'length')``. Untyped directions in
  APOC mean both directions, so the edge set is symmetrized before the SSSP
  kernel runs with ``length`` as weight.
- reachability guard ``OPTIONAL MATCH (start)-[:…*]->(end)`` — subsumed:
  the SSSP result simply has no row for unreachable ends (guard available
  explicitly via graph.components.connected_components).
- ``distance_from_a_stop`` composite — nearest FootNode to the point, then
  walking distance to the stop's FootNode (NEAR link when present,
  ``routing.ipynb:386-414``; else nearest FootNode to the stop coords).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.functions.spatial import haversine_meters
from routing_algorithm_for_graph_dbs_spark.graph.sssp import sssp

FOOT_EDGE_TYPES = (
    "SHORTEST_ROUTE_TO",
    "FOOT_ROUTE",
    "CONTAINS",
    "CONTINUE_ON_FOOTWAY",
    "CONTINUE_ON_FOOTWAY_BY_CROSSING_ROAD",
)


def foot_edge_union(foot_edges: DataFrame) -> DataFrame:
    """Typed edge union, symmetrized (APOC traverses all listed types in both
    directions here). Returns (src, dst, length)."""
    e = foot_edges.filter(F.col("rel_type").isin(list(FOOT_EDGE_TYPES))).select(
        "src", "dst", "length"
    )
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "length")
    ).distinct()


def nearest_footnode(foot_nodes: DataFrame, lat: float, lon: float) -> DataFrame:
    """Top-1 nearest FootNode to a point: (footnode_id, distance)."""
    return (
        foot_nodes.select(
            F.col("id").alias("footnode_id"),
            haversine_meters(
                F.col("latitude"), F.col("longitude"), F.lit(lat), F.lit(lon)
            ).alias("distance"),
        )
        .orderBy("distance", "footnode_id")
        .limit(1)
    )


def walking_distances(
    foot_edges: DataFrame,
    start_ids: list[str],
    targets: list | None = None,
    strategy: str = "auto",
    track_paths: bool = True,
) -> DataFrame:
    """Shortest walking distance from each start FootNode to every reachable
    FootNode: (lane=start_id, node, cost, path).

    ``targets``: optional node list threaded to the SSSP kernel — the
    broadcast tier then stops expanding once every target is settled and
    emits only target rows (same early-termination routing uses,
    plans/routing.py).

    ``strategy``/``track_paths`` thread to the two-tier dispatcher
    (graph/sssp.py): past BROADCAST_EDGE_LIMIT the auto tier flips to the
    iterative Pregel kernel, and full-graph runs should disable path
    materialization (cost-only consumers like tools/scale_footway.py —
    path arrays over every reachable node dominate the output width)."""
    spark = foot_edges.sparkSession
    # JVM LocalRelation when the id type allows it (functions/localrel.py)
    from routing_algorithm_for_graph_dbs_spark.functions.localrel import (
        local_rows_df,
    )

    start_ids = list(start_ids)
    if start_ids and all(isinstance(s, str) for s in start_ids):
        id_ddl = "string"
    elif start_ids and all(
        isinstance(s, int) and not isinstance(s, bool) for s in start_ids
    ):
        id_ddl = "bigint"
    else:
        id_ddl = None
    if id_ddl is None:
        sources = spark.createDataFrame(
            [(s, s) for s in start_ids], ["lane", "node"]
        )
    else:
        sources = local_rows_df(
            spark, [(s, s) for s in start_ids], f"lane {id_ddl}, node {id_ddl}"
        )
    edges = foot_edge_union(foot_edges).withColumnRenamed("length", "weight")
    return sssp(
        edges, sources, weight_col="weight", targets=targets,
        strategy=strategy, track_paths=track_paths,
    )


def walking_distance(
    foot_edges: DataFrame, start_id: str, end_id: str
) -> float:
    """Parity ``get_walking_distance`` — meters, inf if unreachable."""
    res = (
        walking_distances(foot_edges, [start_id], targets=[end_id])
        .filter(F.col("node") == end_id)
        .select("cost")
        .collect()
    )
    return float(res[0]["cost"]) if res else float("inf")


def distance_from_a_stop(
    foot_tables: dict[str, DataFrame],
    stop_id: str,
    lat: float,
    lon: float,
    stops: DataFrame | None = None,
) -> float:
    """Parity ``prova.py:248-270``: euclidean leg to the nearest FootNode plus
    footway-graph walking distance to the stop's FootNode. Returns KILOMETERS
    (the reference divides by 1000), inf if no path."""
    nodes = foot_tables["foot_nodes"]
    start = nearest_footnode(nodes, lat, lon).collect()
    if not start:
        return float("inf")
    start_id, start_dist = start[0]["footnode_id"], start[0]["distance"]

    near = foot_tables.get("foot_near_stop")
    end_id = None
    if near is not None:
        # deterministic pick among multiple NEAR links (bare limit(1) varies
        # with scan order)
        rows = (
            near.filter(F.col("stop_id") == stop_id)
            .orderBy("footnode_id")
            .limit(1)
            .collect()
        )
        if rows:
            end_id = rows[0]["footnode_id"]
    if end_id is None and stops is not None:
        srow = stops.filter(F.col("stop_id") == stop_id).collect()
        if srow:
            nf = nearest_footnode(nodes, srow[0]["stop_lat"], srow[0]["stop_lon"]).collect()
            if nf:
                end_id = nf[0]["footnode_id"]
    if end_id is None:
        return float("inf")

    walk = walking_distance(foot_tables["foot_edges"], start_id, end_id)
    if walk == float("inf"):
        return float("inf")
    return (start_dist + walk) / 1000.0

"""Iterative graph algorithms as DataFrame programs (SURVEY.md §2.9).

The reference delegates these to Neo4j GDS/APOC procedures
(``gds.shortestPath.dijkstra.stream``, ``gds.betweenness.stream``,
``apoc.algo.dijkstra``). Spark has no graph procedures; each algorithm here
is a Pregel-pattern loop: a *state* DataFrame keyed by node (x lane) joined
against a cached *edges* DataFrame per superstep, with ``localCheckpoint``
to cut lineage. Everything stays distributed — the driver only checks the
convergence counter.
"""

from routing_algorithm_for_graph_dbs_spark.graph.sssp import (  # noqa: F401
    multi_source_dijkstra,
    sssp,
)
from routing_algorithm_for_graph_dbs_spark.graph.components import connected_components  # noqa: F401
from routing_algorithm_for_graph_dbs_spark.graph.betweenness import betweenness_centrality  # noqa: F401

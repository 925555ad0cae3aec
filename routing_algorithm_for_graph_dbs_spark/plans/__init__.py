"""End-to-end pipelines (SURVEY.md §3): projection and routing."""

from routing_algorithm_for_graph_dbs_spark.plans.projection import (  # noqa: F401
    ProjectedGraph,
    project_graph,
    graph_metrics,
)

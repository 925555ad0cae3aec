"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship 5-hop join-chain query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 operator inventory
mapped onto the synthetic tables, implemented in
``routing_algorithm_for_graph_dbs_spark.driver_surface`` (each entry cites the
reference operator it reproduces). GTFS-native parity (projection, routing,
footway Dijkstra) is exercised by the pytest suite on the hand-verified
fixture in ``tests/fixtures/gtfs``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from routing_algorithm_for_graph_dbs_spark.driver_surface import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["j1_join_chain"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline surface)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — every ``queries()`` key has one (dd_simhash via the
    md5-based engine-agnostic hash; betweenness via literal expected tables
    derived from two independent oracles, see driver_surface)."""
    return dict(ORACLES)

"""Scalar/column function library (SURVEY.md §2.8).

Everything here is built from ``pyspark.sql.functions`` column expressions so
it stays inside whole-stage codegen — no Python UDFs.
"""

from routing_algorithm_for_graph_dbs_spark.functions.spatial import (  # noqa: F401
    haversine_meters,
    grid_cell,
)
from routing_algorithm_for_graph_dbs_spark.functions.temporal import (  # noqa: F401
    hms_to_seconds,
    seconds_to_hms,
)

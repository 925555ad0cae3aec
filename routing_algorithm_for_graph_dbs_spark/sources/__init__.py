"""Sources & sinks (SURVEY.md §2.1)."""

from routing_algorithm_for_graph_dbs_spark.sources.gtfs import (  # noqa: F401
    GTFS_SCHEMAS,
    read_gtfs,
    reshape_calendar_dates,
    write_tables,
)
from routing_algorithm_for_graph_dbs_spark.sources.testdata import load_tables  # noqa: F401

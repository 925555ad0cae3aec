from routing_algorithm_for_graph_dbs_spark.streaming.pipelines import (  # noqa: F401
    EVENTS_SCHEMA,
    enriched_segment_counts,
    incremental_dedup_sink,
    read_events_stream,
    user_segments,
    run_available_now,
    session_aggregates,
    streaming_dedup,
    running_user_totals,
    tumbling_counts,
)

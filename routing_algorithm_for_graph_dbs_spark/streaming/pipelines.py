"""Structured Streaming pipelines over the events stream.

The reference is entirely batch (SURVEY.md §2.10 — no streaming constructs
anywhere in main.py / new_dbSetup.py / prova.py / routing.ipynb), so none of
this is parity-required; it is the natural streaming extension of the same
query surface: every pipeline here has a batch twin in driver_surface
(st_tumbling_window, st_sessionization) computing identical results, which is
exactly how the tests check them (availableNow replay == batch answer).

Scale/ops notes baked in:
- **watermarks bound state.** Every built-in stateful stage (windows,
  sessions, dedup) declares an event-time watermark; without it state grows
  without bound on a real stream. The watermark also defines late-data
  semantics: events later than the delay are dropped deterministically.
  For ARBITRARY state (``applyInPandasWithState``) the watermark alone does
  not evict — ``running_user_totals`` exposes an explicit event-time TTL
  for that (see its docstring for the tradeoff).
- **file-source streams replay.** ``maxFilesPerTrigger`` turns a parquet
  directory into a rate-limited replay — the standard backfill trick: the
  SAME code runs the historical backfill and the live tail.
- **availableNow for bounded runs.** Tests and backfills use
  ``Trigger.AvailableNow`` so the query drains what exists and stops,
  checkpointing exactly like the continuous run would.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a parquet events directory.

    An explicit schema is mandatory for streaming file sources (no inference
    race at trigger time); ``maxFilesPerTrigger`` bounds per-microbatch input
    for rate-limited replay/backfill.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per (window, type).

    Streaming twin of driver_surface.st_tumbling_window — append-mode
    emittable once the watermark passes window end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type").alias("etype"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "etype",
            "n",
            "sum_val",
        )
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user with an inactivity gap (F.session_window —
    the built-in stateful session operator; state is one open session per
    user, closed and emitted when the watermark passes gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id").alias("uid"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "uid",
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("sess_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keeps the dedup state bounded (keys
    older than the watermark are evicted) — the streaming form of the
    engine's exact-dedup operator."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


_TOTALS_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)
_TOTALS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(
    events: DataFrame,
    watermark: str = "2 hours",
    state_ttl_s: int | None = None,
) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum(value)) via
    ``applyInPandasWithState`` — the arbitrary-state escape hatch for
    operators the built-ins can't express (SURVEY-mandated custom-operator
    tier (b)). Emits the updated running totals each microbatch.

    Unlike the built-in stateful stages, ``withWatermark`` alone does NOT
    bound arbitrary state. ``state_ttl_s`` opts into eviction: a user whose
    last event is older than watermark + ttl has its state removed (an
    event-time timeout), so the state store is bounded by the active-user
    set. The tradeoff is explicit: an evicted user who reappears restarts
    from zero. ``None`` keeps lifetime totals (unbounded user spaces will
    grow state without bound — fine for bounded key domains, wrong for
    e.g. per-session keys)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        mx_ts = None
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].fillna(0.0).sum())
            m = pdf["ts"].max()
            mx_ts = m if mx_ts is None else max(mx_ts, m)
        state.update((n, total))
        if state_ttl_s is not None and mx_ts is not None:
            state.setTimeoutTimestamp(
                int(mx_ts.timestamp() * 1000) + state_ttl_s * 1000
            )
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
        )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if state_ttl_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_TOTALS_OUT,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def run_available_now(
    df: DataFrame, name: str, checkpoint_dir: str, output_mode: str = "append"
) -> None:
    """Drain everything currently available into an in-memory table ``name``
    and stop — bounded streaming execution with real checkpointing (tests,
    backfills). Blocks until the drain completes."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def user_segments(spark: SparkSession, n_users: int = 10_000) -> DataFrame:
    """Deterministic user->segment dimension for enrichment joins. Users
    with ``user_id % 4 == 3`` are deliberately absent so the left join has
    genuine misses (-> 'unknown' downstream)."""
    return (
        spark.range(n_users)
        .select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("seg"), (F.col("id") % 4).cast("string")).alias(
                "segment"
            ),
        )
        .filter(F.col("id") % 4 != 3)
    )


def enriched_segment_counts(
    events: DataFrame,
    dim: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join + windowed per-segment rollup.

    The stream-static join is STATELESS on the stream side — each
    microbatch probes the (broadcast) static dimension, no join state
    accumulates, and the dim is re-resolvable per batch (slowly-changing
    dims pick up updates on file sources). Only the downstream windowed
    aggregation keeps state, bounded by the watermark. This is the standard
    "enrich the firehose, roll up by attribute" topology.
    """
    e = events.withWatermark("ts", watermark)
    j = e.join(F.broadcast(dim), "user_id", "left")
    return (
        j.groupBy(
            F.window("ts", window).alias("w"),
            F.coalesce(F.col("segment"), F.lit("unknown")).alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "segment",
            "n",
            "sum_val",
        )
    )


def incremental_dedup_sink(
    stream: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_id",
):
    """foreachBatch dedup against an UNBOUNDED persistent history.

    ``dropDuplicatesWithinWatermark`` (streaming_dedup) bounds its state by
    the watermark — a replay older than the delay is readmitted. Corpus
    ingestion needs the opposite: never admit a key twice, ever. The
    standard answer is a foreachBatch sink that (1) dedups the microbatch
    internally, (2) left-anti joins the persistent key store, (3) appends
    survivors to both the output and the store. State lives in parquet, so
    it survives restarts with the checkpoint and is shared by any number
    of downstream readers.

    foreachBatch gives exactly-once APPENDS only together with the
    checkpoint: a retried batch re-runs step (2) against a store that may
    already contain its keys, so retried rows anti-join away — idempotent.

    Scale: the anti-join shuffles on the key; the store is append-only
    parquet (compact it offline when file counts grow). Returns the
    StreamingQuery.
    """
    spark = stream.sparkSession

    def _process(batch: DataFrame, batch_id: int) -> None:
        fresh = batch.dropDuplicates([key_col])
        try:
            seen = spark.read.parquet(store_dir).select(key_col)
        except Exception:  # first batch: no store yet
            seen = None
        if seen is not None:
            fresh = fresh.join(seen, key_col, "left_anti")
        # persist: `fresh` drives two writes; recomputing it after the
        # store append would anti-join the batch against its own keys
        # and write an empty output
        fresh = fresh.persist()
        try:
            n = fresh.count()
            if n:
                fresh.write.mode("append").parquet(out_dir)
                fresh.select(key_col).write.mode("append").parquet(store_dir)
        finally:
            fresh.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def view_click_interval_join(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each view matched to the same user's
    clicks within ``horizon`` AFTER the view — the canonical funnel /
    attribution join, and the one streaming operator whose state is
    bounded ONLY by the join's time-range condition plus both watermarks
    (Spark buffers each side until the other side's watermark passes the
    interval, then evicts).

    Both inputs must carry (user_id, ts); pass two filtered readers over
    the same source or two independent sources. Returns one row per
    matching (view, click) pair with the click lag in seconds.

    Scale shape: state is per-user rows inside a sliding ~horizon+delay
    band — independent of total history; the join shuffles both sides on
    user_id once. The batch twin (driver_surface.st_interval_join) is the
    same expression without watermarks.

    ``how="left_outer"`` keeps unmatched views: in streaming they emit
    with NULL click columns once BOTH watermarks pass the view's match
    interval (eviction-time emission — Spark's documented outer-join
    rule; a stream that simply ENDS never advances the watermark, so
    tail views stay unemitted until later data arrives. The availableNow
    test drives this with multi-batch file replay). In batch it is a
    plain left join. Allowed: inner / left_outer — right/full outer
    would need the mirrored state story; rejected.
    """
    if how not in ("inner", "left_outer", "leftouter"):
        raise ValueError(
            f"view_click_interval_join supports inner/left_outer, got {how!r}"
        )
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        (v["user_id"] == c["user_id"])
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        how,
    ).select(
        v["user_id"].alias("user_id"),
        "view_id",
        "click_id",
        (
            F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("view_ts"))
        ).alias("lag_us"),
    )

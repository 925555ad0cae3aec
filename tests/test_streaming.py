"""Structured Streaming pipelines: availableNow replay must equal the batch
answer (the batch twins live in driver_surface and are DuckDB-oracled)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.streaming import (
    read_events_stream,
    run_available_now,
    running_user_totals,
    session_aggregates,
    streaming_dedup,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, testdata_dir, tmp_path_factory):
    """Micro-precision copy of the events table split into several files —
    a realistic multi-file stream source."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    from routing_algorithm_for_graph_dbs_spark.sources.testdata import (
        normalize_event_ts,
    )

    df = normalize_event_ts(spark.read.parquet(f"{testdata_dir}/events.parquet"))
    # range-partition by ts so part-00000..3 are ascending time ranges, then
    # pin ascending mtimes: the file source replays in modification-time
    # order, keeping the watermark monotone across microbatches (out-of-order
    # replay would drop genuinely-late data — correct but untestable)
    df.repartitionByRange(4, "ts").write.mode("overwrite").parquet(out)
    import os
    import time

    t0 = time.time() - 3600
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    for i, f in enumerate(parts):
        os.utime(os.path.join(out, f), times=(t0 + i * 60, t0 + i * 60))
    return out


@pytest.fixture(scope="module")
def events_batch(spark, events_dir):
    return spark.read.parquet(events_dir)


def _drain(spark, stream_df, name, tmp_path, mode="append"):
    run_available_now(stream_df, name, str(tmp_path / f"ckpt_{name}"), mode)
    return spark.table(name)


def _watermark_cutoff(events_batch, delay_hours=2):
    """Append mode only emits state the watermark has passed; with a finite
    replay the final watermark is max(event time) - delay, so results whose
    window/session END is after the cutoff are (correctly) withheld."""
    mx = events_batch.agg(F.max("ts").alias("m")).first()["m"]
    import datetime

    return (mx - datetime.timedelta(hours=delay_hours)).strftime("%Y-%m-%d %H:%M:%S")


def test_tumbling_counts_stream_equals_batch(spark, events_dir, events_batch, tmp_path):
    stream = tumbling_counts(read_events_stream(spark, events_dir))
    got = _drain(spark, stream, "t_tumble", tmp_path)
    cutoff = _watermark_cutoff(events_batch)
    want = tumbling_counts(events_batch).filter(
        F.date_format(
            F.to_timestamp("win_start") + F.expr("INTERVAL 1 HOUR"),
            "yyyy-MM-dd HH:mm:ss",
        )
        <= cutoff
    )
    assert got.count() > 0
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_aggregates_stream_equals_batch(
    spark, events_dir, events_batch, tmp_path
):
    stream = session_aggregates(read_events_stream(spark, events_dir))
    got = _drain(spark, stream, "t_sess", tmp_path)
    cutoff = _watermark_cutoff(events_batch)
    want = session_aggregates(events_batch).filter(F.col("sess_end") <= cutoff)
    assert got.count() > 0
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_drops_replayed_duplicates(spark, events_batch, tmp_path):
    dup_dir = str(tmp_path / "dup_src")
    events_batch.limit(200).write.mode("overwrite").parquet(dup_dir)
    events_batch.limit(200).write.mode("append").parquet(dup_dir)  # replay
    stream = streaming_dedup(read_events_stream(spark, dup_dir))
    got = _drain(spark, stream, "t_dedup", tmp_path)
    assert got.count() == 200
    assert got.select("event_id").distinct().count() == 200


def test_running_user_totals_matches_batch_groupby(
    spark, events_dir, events_batch, tmp_path
):
    stream = running_user_totals(read_events_stream(spark, events_dir))
    got = _drain(spark, stream, "t_totals", tmp_path, mode="update")
    # update-mode memory sink keeps every emission; the LAST per user is the
    # final running total — compare against the batch groupBy.
    final = (
        got.groupBy("user_id")
        .agg(F.max_by("n", "n").alias("n"), F.max_by("total", "n").alias("total"))
    )
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("total"),
    )
    g = {r["user_id"]: (r["n"], r["total"]) for r in final.collect()}
    w = {r["user_id"]: (r["n"], r["total"]) for r in want.collect()}
    assert g == w


def test_multi_file_replay_is_incremental(spark, events_dir, tmp_path):
    """maxFilesPerTrigger=1 forces multiple microbatches; the drained result
    must still equal the all-at-once answer (checkpointed incremental
    aggregation)."""
    stream = tumbling_counts(read_events_stream(spark, events_dir, max_files_per_trigger=1))
    got = _drain(spark, stream, "t_incr", tmp_path)
    batch = spark.read.parquet(events_dir)
    cutoff = _watermark_cutoff(batch)
    want = tumbling_counts(batch).filter(
        F.date_format(
            F.to_timestamp("win_start") + F.expr("INTERVAL 1 HOUR"),
            "yyyy-MM-dd HH:mm:ss",
        )
        <= cutoff
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_running_totals_state_ttl_evicts(spark, tmp_path):
    """With state_ttl_s set, a user idle past watermark+ttl is evicted and
    restarts from zero on reappearance — bounded arbitrary state."""
    import datetime as dt
    import os
    import time as _time

    base = dt.datetime(2024, 1, 1)

    def write(name, rows, mtime):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
        p = str(tmp_path / name)
        df.coalesce(1).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), times=(mtime, mtime))
        return p

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = _time.time() - 3600

    def add(name, rows, i):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"{name}.parquet")
                os.rename(os.path.join(tmp, f), dst)
                os.utime(dst, times=(t0 + i * 60, t0 + i * 60))

    # batch 1: user 1 has 3 events at hour 0
    add("b1", [(i, base, 1, "click", 1.0, "{}") for i in range(3)], 0)
    # batch 2: user 2 far in the future -> watermark jumps past u1's ttl
    add("b2", [(10, base + dt.timedelta(hours=50), 2, "click", 1.0, "{}")], 1)
    # batch 3: u1 idle while the advanced watermark is current -> the
    # event-time timeout fires for u1 in THIS batch (timeouts only fire for
    # groups with no new data) and its state is removed
    add("b3", [(12, base + dt.timedelta(hours=50, minutes=30), 2, "click", 1.0, "{}")], 2)
    # batch 4: user 1 reappears -> restarts at 1
    add("b4", [(11, base + dt.timedelta(hours=51), 1, "click", 1.0, "{}")], 3)

    stream = running_user_totals(
        read_events_stream(spark, src, max_files_per_trigger=1),
        watermark="1 hour",
        state_ttl_s=3600,
    )
    run_available_now(stream, "t_ttl", str(tmp_path / "ck_ttl"), "update")
    got = spark.table("t_ttl").collect()
    u1_counts = sorted(r["n"] for r in got if r["user_id"] == 1)
    assert u1_counts == [1, 3], f"expected reset after eviction, got {u1_counts}"


def test_enriched_segment_counts_stream_equals_batch(
    spark, events_dir, events_batch, tmp_path
):
    """Stream-static enrichment join: availableNow replay == batch answer
    for every window the watermark has emitted, including 'unknown' rows
    from dim misses (user_id % 4 == 3 is absent from the dim)."""
    from routing_algorithm_for_graph_dbs_spark.streaming import (
        enriched_segment_counts,
        user_segments,
    )

    dim = user_segments(spark)
    stream = enriched_segment_counts(
        read_events_stream(spark, events_dir, max_files_per_trigger=1), dim
    )
    got = _drain(spark, stream, "enriched_counts", tmp_path)
    cutoff = _watermark_cutoff(events_batch)
    # append mode emits exactly the windows whose END the watermark passed
    batch = enriched_segment_counts(events_batch, dim).filter(
        F.date_format(
            F.to_timestamp("win_start") + F.expr("INTERVAL 1 HOUR"),
            "yyyy-MM-dd HH:mm:ss",
        )
        <= cutoff
    )
    g = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert g == b and len(b) > 0
    assert any(r[1] == "unknown" for r in b)


def test_incremental_dedup_sink_never_readmits(spark, events_batch, tmp_path):
    """Unbounded-history dedup: replaying the SAME rows in a later batch
    (beyond any watermark horizon) must not re-admit them, and a second
    run over already-seen input appends nothing."""
    import os

    from routing_algorithm_for_graph_dbs_spark.streaming import (
        EVENTS_SCHEMA,
        incremental_dedup_sink,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ck1 = str(tmp_path / "ck1")

    first = events_batch.limit(200).persist()
    first.write.mode("overwrite").parquet(src)
    q = incremental_dedup_sink(
        spark.readStream.schema(EVENTS_SCHEMA).parquet(src), out, store, ck1
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 200

    # second source dir: 100 replayed rows + 50 genuinely new ones
    src2 = str(tmp_path / "src2")
    replay = first.limit(100)
    new = events_batch.orderBy("event_id").limit(500).subtract(first).limit(50)
    replay.unionByName(new).write.mode("overwrite").parquet(src2)
    q2 = incremental_dedup_sink(
        spark.readStream.schema(EVENTS_SCHEMA).parquet(src2), out, store,
        str(tmp_path / "ck2"),
    )
    q2.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 250
    assert got.select("event_id").distinct().count() == 250

    # idempotence: draining the same source again appends nothing
    q3 = incremental_dedup_sink(
        spark.readStream.schema(EVENTS_SCHEMA).parquet(src2), out, store,
        str(tmp_path / "ck3"),
    )
    q3.awaitTermination()
    assert spark.read.parquet(out).count() == 250
    assert os.path.isdir(store)


def test_interval_join_stream_equals_batch(spark, events_dir, events_batch, tmp_path):
    """Stream-stream interval join (inner): every matched pair emits as
    produced (the watermark only bounds state), so an availableNow replay
    must equal the batch twin exactly."""
    from routing_algorithm_for_graph_dbs_spark.streaming.pipelines import (
        view_click_interval_join,
    )

    v = read_events_stream(spark, events_dir).filter(F.col("event_type") == "view")
    c = read_events_stream(spark, events_dir).filter(F.col("event_type") == "click")
    got = _drain(
        spark,
        view_click_interval_join(v, c, horizon="12 hours"),
        "ssjoin",
        tmp_path,
    )
    want = view_click_interval_join(
        events_batch.filter(F.col("event_type") == "view"),
        events_batch.filter(F.col("event_type") == "click"),
        horizon="12 hours",
    )
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    assert len(got_rows) > 0  # the fixture feed must actually exercise it

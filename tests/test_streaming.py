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


def test_interval_join_left_outer_emits_unmatched_on_eviction(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unmatched view emits with NULL
    click columns once both watermarks pass its match interval. Outer
    emission happens in the batch AFTER the watermark advances (Spark
    updates watermarks at batch end), so the replay needs a third file:
    batch1 = data, batch2 = watermark pusher, batch3 = eviction+emit."""
    import datetime as dt
    import os
    import time as _time

    from routing_algorithm_for_graph_dbs_spark.streaming.pipelines import (
        view_click_interval_join,
    )

    base = dt.datetime(2024, 1, 1)
    SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    src = str(tmp_path / "ssrc")
    os.makedirs(src)
    t0 = _time.time() - 3600

    def write(name, rows, i):
        # flat {name}.parquet files in mtime order — the layout the file
        # source replays incrementally (a nested dir per batch is NOT
        # discovered as new files)
        df = spark.createDataFrame(rows, SCHEMA)
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"{name}.parquet")
                os.rename(os.path.join(stage, f), dst)
                os.utime(dst, times=(t0 + i * 60, t0 + i * 60))

    # batch 1: user 1's view never gets a click; user 2's view does (+5 min)
    write("a", [
        (1, base, 1, "view", 0.0, "{}"),
        (2, base, 2, "view", 0.0, "{}"),
        (3, base + dt.timedelta(minutes=5), 2, "click", 0.0, "{}"),
    ], 0)
    # batches 2+3: far-future events for an unrelated user push the
    # watermark past view_ts + horizon + delay, then trigger eviction.
    # BOTH event types are needed: the global watermark is the MIN over
    # the two watermarked inputs (multipleWatermarkPolicy=min), and each
    # side only observes its own post-filter rows — future clicks alone
    # would leave the view-side watermark pinned at 00:00 forever.
    # User 999's own views sit at the watermark frontier, so they stay
    # unemitted in state — only user 1's view is evicted inside the run.
    write("b", [
        (90, base + dt.timedelta(hours=30), 999, "click", 0.0, "{}"),
        (92, base + dt.timedelta(hours=30), 999, "view", 0.0, "{}"),
    ], 1)
    write("c", [
        (91, base + dt.timedelta(hours=31), 999, "click", 0.0, "{}"),
        (93, base + dt.timedelta(hours=31), 999, "view", 0.0, "{}"),
    ], 2)

    v = read_events_stream(spark, src, max_files_per_trigger=1).filter(
        F.col("event_type") == "view"
    )
    c = read_events_stream(spark, src, max_files_per_trigger=1).filter(
        F.col("event_type") == "click"
    )
    out = view_click_interval_join(
        v, c, horizon="10 minutes", watermark="1 hour", how="left_outer"
    )
    run_available_now(out, "ss_left", str(tmp_path / "ck_left"), "append")
    got = {
        r["view_id"]: (r["click_id"], r["lag_us"])
        for r in spark.table("ss_left").collect()
    }
    assert got[2] == (3, 300_000_000)  # matched pair, 5 min lag
    assert got[1] == (None, None)      # unmatched view emitted as outer row
    # the watermark-pusher views match their own-user clicks at lag 0 and
    # emit eagerly; clicks never appear on the left side
    assert got[92] == (90, 0) and got[93] == (91, 0)
    assert set(got) == {1, 2, 92, 93}


def test_interval_join_left_outer_rejects_bad_how(spark):
    from routing_algorithm_for_graph_dbs_spark.streaming.pipelines import (
        view_click_interval_join,
    )

    df = spark.range(1).selectExpr(
        "id AS user_id", "id AS event_id", "current_timestamp() AS ts"
    )
    with pytest.raises(ValueError, match="inner/left_outer"):
        view_click_interval_join(df, df, how="full_outer")

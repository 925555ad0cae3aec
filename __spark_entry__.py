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

# The driver's correctness gate checks the FIRST 50 queries in registration
# order. The window ROTATES each round (round-5 verdict demand). After round
# 7 every registered query except the 4 late-added codec roundtrips has had
# at least one adversarial driver row, so round 8 promotes those 4, re-runs
# every query whose implementation changed since its last driver row, and
# tops up with the OLDEST driver rows (the r5 §2 heads). The remaining 109
# stay covered by tools/check_oracles.py (CORRECTNESS_local_r{N}.json).
_DRIVER_WINDOW = [
    # -- never-driver-checked: the 4 codec roundtrips added late in r7,
    #    plus the two queries NEW this round (real-JPEG and ISO-BMFF
    #    cross-engine checks) — with these in, after r8 every registered
    #    query has had a driver row
    "mm_wav_roundtrip",
    "mm_png_roundtrip",
    "mm_resize_roundtrip",
    "mm_wav_spectral",
    "mm_jpeg_roundtrip",
    "mm_mp4_metadata",
    # -- re-runs: r7-review-touched (single-decode WAV path, JPEG sniff,
    #    exact-mean MAD) + this round's ADVICE fixes (decode-error
    #    fall-through in image/audio features, phash, resize; JPEG bitbuf)
    "ev_mad_outliers",
    "mm_audio_features",
    "mm_image_features",
    "mm_media_stats",
    "mm_phash_neardup",
    "mm_resize_plan",
    # -- re-runs: routing/settlement-touched since their r5 rows (two-tier
    #    SSSP settlement probe, exact-by-default horizon, target dedup)
    "graph_bfs_hops",
    "t1_t2_topk",
    "j5_earliest_transfer",
    # -- top-up: the OLDEST driver rows — r5-window §2 operator heads
    "p1_project_rename",
    "p3_p4_filters",
    "p5_computed_theta",
    "p6_radius_filter",
    "p8_p9_p10_membership",
    "j1_join_chain",
    "j2_fk_dims",
    "w1_lead_consecutive",
    "j4_band_selfjoin",
    "j6_explode_rejoin",
    "j7_nn_top1",
    "j8_semi_join",
    "j9_anti_join",
    "a1_a2_aggregates",
    "a3_argmin_ties",
    "a5_collect_sorted",
    "w3_running_sum",
    "f2_temporal",
    "f3_durations",
    "f7_arrays",
    "f8_strings",
    "graph_components",
    "graph_degree_metrics",
    "graph_betweenness",
    "st_tumbling_window",
    "st_watermark_dedup",
    "st_sessionization",
    "asof_last_view",
    "rng_followup_events",
    "dd_exact_dedup",
    "dd_lsh_candidates",
    # dd_decontaminate / sem_dedup / smp_mixture: also the BENCH_r07
    # floor-watch rows (regressed under suspected contention) — a fresh
    # driver row confirms the results stayed exact while re-timing them
    "dd_decontaminate",
    "sem_dedup",
    "smp_mixture",
    "pack_shards",
]
# ROUND-9 ROTATION NOTE: after this round EVERY registered query has had
# a driver row (the r7 codec roundtrips and the two r8-new queries are in
# this window). Round 9: lead with any query whose implementation changed
# during r8 but whose row predates the change (apx_sketches via the
# rank-window p50 contract; mm_phash_neardup via the lenient fake-text
# decode; the WAV-family rows via the new dialect dispatch), then cycle
# the stalest prior driver rows (the r6 window next).


def _ordered() -> list[str]:
    assert len(_DRIVER_WINDOW) == len(set(_DRIVER_WINDOW)) == 50, len(_DRIVER_WINDOW)
    missing = [k for k in _DRIVER_WINDOW if k not in QUERIES]
    assert not missing, f"window names unknown queries: {missing}"
    return _DRIVER_WINDOW + [k for k in QUERIES if k not in set(_DRIVER_WINDOW)]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["j1_join_chain"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline surface), §2-complete within the first 50."""
    return {k: QUERIES[k] for k in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — every ``queries()`` key has one (dd_simhash via the
    md5-based engine-agnostic hash; betweenness via literal expected tables
    derived from two independent oracles, see driver_surface)."""
    return {k: ORACLES[k] for k in _ordered() if k in ORACLES}

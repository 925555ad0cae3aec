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
# order. The window ROTATES each round (round-5 verdict demand). Round 14:
# lead with the queries NEW this round (mm_jpeg_hierarchical — T.81
# Annex J DHP/EXP/SOF5-7 pyramids; mm_gsm_pcm — ETSI GSM 06.10
# full-rate RPE-LTP, the first compressed-audio SAMPLE decode;
# mm_webm_vp8 — WebM VIDEO frame decode by composition, EBML
# SimpleBlock walk + the RFC 6386 key-frame pipeline), then
# re-run every query whose implementation changed since its last
# driver row (the hierarchical branch extended the shared decode_jpeg
# marker walk and the _decode_scan/_decode_scan_lossless internals
# every JPEG row flows through; the sssp.py superstep loop was
# restructured for the partition-local relaxation mode the graph_*
# BFS/closeness/harmonic rows run through; the GSM branch extended
# decode_wav_samples' fmt dispatch + fact-chunk parse and
# audio_features' is_wav route, which every audio_features row flows
# through), then the r10-stale block in CORRECTNESS_r10 order (33 of
# 43 fit; a12_cube, a13_unpivot, u2_intersect_except,
# w4_rank_distributions, w5_moving_avg, w6_inactivity_gaps,
# w7_rolling_distinct join f10_json_extract, f11_maps,
# ft_minmax_norm in slipping to r15) —
# staleness recomputed from the CORRECTNESS_r*.json artifacts as
# r11-r13 did. The remaining registry stays covered by
# tools/check_oracles.py (CORRECTNESS_local_r{N}.json).
_DRIVER_WINDOW = [
    # -- never-driver-checked: NEW this round — hierarchical JPEG
    #    (T.81 Annex J: SOF3 initial + EXP expansion + SOF7 mod-2^16
    #    differential frames, exact lossless pyramid), GSM 06.10
    #    sample decode, and WebM VP8 key-frame decode (round 14)
    "mm_jpeg_hierarchical",
    "mm_gsm_pcm",
    "mm_webm_vp8",
    # -- re-runs: implementation changed since their r13 driver row.
    #    The Annex J branch extended the shared decode_jpeg frame walk
    #    (DHP/EXP markers, differential-frame dispatch) and threaded
    #    sel==0/differential through _decode_scan_lossless — every row
    #    decoding JPEG flows through it:
    "mm_jpeg_lossless",
    "mm_jpeg_roundtrip",
    "mm_tiff_jpeg",
    "mm_tiff_pixels",
    "mm_phash_neardup",
    "mm_image_features",
    #    the sssp.py superstep loop was restructured this round
    #    (partition-local relaxation mode; hoisted candidate schemas);
    #    these rows run the iterative kernel:
    "graph_bfs_hops",
    "graph_closeness",
    "graph_harmonic",
    #    the GSM 06.10 branch changed decode_wav_samples (fact-chunk
    #    parse now runs for every WAV; 0x31 dispatch) and
    #    audio_features' is_wav route (wav_audio_format provenance
    #    sniff) — every row decoding through audio_features re-runs:
    "mm_audio_features",
    "mm_wav_roundtrip",
    "mm_wav_spectral",
    "mm_g711_roundtrip",
    "mm_flac_pcm",
    # -- the r10-stale block (last driver rows r10), in
    #    CORRECTNESS_r10 order; first 40 of 43 fit this window
    "sem_dedup",
    "f1_casts",
    "u1_union_all",
    "t1_t2_topk",
    "j5_earliest_transfer",
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
    "dd_canonical",
    "dd_keep_best",
    "txt_bpe_learn2",
    "a8_rollup",
    "a9_pivot",
    "a10_histogram",
    "a11_corr_cov",
]
# ROUND-15 ROTATION NOTE: lead with any query whose implementation
# changes during r15 after its driver row, then continue the stale
# cycle with the 10 r10 rows that did not fit this window (a12_cube,
# a13_unpivot, u2_intersect_except, w4_rank_distributions,
# w5_moving_avg, w6_inactivity_gaps, w7_rolling_distinct,
# f10_json_extract, f11_maps, ft_minmax_norm in CORRECTNESS_r10
# order) and the oldest r11 rows (mm_phash_crossformat,
# mm_gif_frames, ... in CORRECTNESS_r11 order). Recompute staleness
# from the CORRECTNESS_r*.json artifacts as r11-r14 did — the note
# can go stale, the artifacts cannot.


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
    training-data-pipeline surface). The first 50 form the rotating
    driver window (new + changed + stalest rows each round); §2
    coverage is carried by prior driver rows and the full-registry
    local mirrors (CORRECTNESS_local_r{N}.json at sf0.01 and sf1.0)."""
    return {k: QUERIES[k] for k in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — every ``queries()`` key has one (dd_simhash via the
    md5-based engine-agnostic hash; betweenness via literal expected tables
    derived from two independent oracles, see driver_surface)."""
    return {k: ORACLES[k] for k in _ordered() if k in ORACLES}

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
# order. The window ROTATES each round (round-5 verdict demand). Round 12
# (VERDICT r11 item 1a): lead with the queries NEW this round
# (mm_tiff_jpeg, mm_bmp_bitfields — the JPEG-in-TIFF and masked-BMP
# widenings), re-run every query whose
# implementation changed since its last driver row, then the 8 media rows
# rewired by the late-r11 input-docs spread whose driver rows are
# r10-or-older, then the registry's genuinely stalest rows in
# last-checked order — recomputed from the CORRECTNESS_r*.json artifacts
# (the whole r7 block, the r8 remainder, and the stalest r9 row).
# The remaining registry stays covered by tools/check_oracles.py
# (CORRECTNESS_local_r{N}.json).
_DRIVER_WINDOW = [
    # -- never-driver-checked: NEW this round — CCITT fax strips (T.4
    #    MH-RLE + G3 + T.6 G4, tables derived from libtiff),
    #    JPEG-in-TIFF strips (compression 7, TechNote 2 JPEGTables),
    #    and 16-bit RGB555 / BI_BITFIELDS masked-BMP decode (round 12)
    "mm_tiff_fax",
    "mm_tiff_jpeg",
    "mm_bmp_bitfields",
    # -- re-runs: implementation changed since their last driver row.
    #    mm_tiff_pixels: TIFF LZW strips (+ predictor 2) moved off the
    #    boundary; the synth now cycles raw/PackBits/LZW/LZW+diff.
    #    mm_audio_features: strict=True now PROPAGATES FLAC frame-decode
    #    errors instead of downgrading to flac-meta (ADVICE r11).
    #    mm_bmp_palette: decode_bmp grew the masked-mode branch and the
    #    image_features strict message changed (ADVICE r11).
    "mm_tiff_pixels",
    "mm_audio_features",
    "mm_bmp_palette",
    #    mm_phash_neardup: round-12 decoder widenings rewrote its image
    #    entries (decode_bmp_pixels masked/core branches, decode_jpeg
    #    SOF9 dispatch) — same precedent as its r11 re-run.
    "mm_phash_neardup",
    # -- the 8 media rows rewired by the late-r11 input-docs spread
    #    whose driver rows are r10-or-older (rotation note carried from
    #    r11; both sf mirrors re-validated them post-change)
    "mm_png_roundtrip",
    "mm_resize_roundtrip",
    "mm_jpeg_roundtrip",
    #    (mm_opus_metadata, the freshest of the rewired 8, ceded its
    #    slot to mm_tiff_fax — r13 candidate)
    "mm_mp3_metadata",
    "mm_mp4_metadata",
    "mm_aac_metadata",
    "mm_flac_metadata",
    # -- the whole r7-stale block (last driver rows r7), in
    #    CORRECTNESS_r07 order
    "er_fuzzy_name_pairs",
    "apx_join_overlap",
    "apx_top_k_types",
    "st_hopping_window",
    "st_interval_join",
    "st_interval_join_left",
    "st_enriched_counts",
    "asof_next_view",
    "dq_snapshot_diff",
    "smp_replicate",
    "pack_shards_grouped",
    "graph_random_walks",
    "idx_postings",
    "hist_snapshot_asof",
    "upd_apply_cdc",
    "hist_scd2",
    "ts_interpolate",
    "ts_ewma",
    "dd_simhash",
    # -- the r8 remainder (last rows r8, not already above), in
    #    CORRECTNESS_r08 order
    "ev_mad_outliers",
    "mm_image_features",
    "mm_media_stats",
    "mm_resize_plan",
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
    "dd_decontaminate",
    "smp_mixture",
    "pack_shards",
]
# ROUND-13 ROTATION NOTE: lead with any query whose implementation
# changes during r12 after its driver row, then continue the stale
# cycle with the r9 rows (apx_sketches, graph_bfs_hops, graph_pagerank,
# graph_ppr, graph_triangles, ... in CORRECTNESS_r09 order — the first
# two ceded their r12 slots to mm_tiff_jpeg / mm_phash_neardup) and the
# r10 block.
# Recompute staleness from the CORRECTNESS_r*.json artifacts as r11/r12
# did — the note can go stale, the artifacts cannot.


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

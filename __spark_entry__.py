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
# order. The window ROTATES each round (round-5 verdict demand). Round 13:
# lead with the queries NEW this round (mm_jpeg_lossless — T.81 Annex H
# SOF3; mm_webp_lossy — the RFC 6386 lossy VP8 key-frame decoder), then
# re-run every query whose implementation changed since its r11/r12
# driver row (the fax searchsorted rewrite, the TIFF strip-table guard,
# and every row flowing through the SOF3-extended decode_jpeg dispatch
# or the two-flavor image_features WebP branch), then the entire
# r9-stale block in CORRECTNESS_r09 order, then the stalest r10 row —
# staleness recomputed from the CORRECTNESS_r*.json artifacts as
# r11/r12 did. The remaining registry stays covered by
# tools/check_oracles.py (CORRECTNESS_local_r{N}.json).
_DRIVER_WINDOW = [
    # -- never-driver-checked: NEW this round — lossless JPEG (T.81
    #    Annex H SOF3, all 7 predictors + restart resets, hand-derived
    #    byte goldens) and lossy VP8 key frames (full RFC 6386
    #    pipeline, sample-exact vs WebPDecodeYUV) (round 13)
    "mm_jpeg_lossless",
    "mm_webp_lossy",
    # -- re-runs: implementation changed since their last driver row.
    #    mm_tiff_fax: the O(width^2) transition rescans became
    #    parity-adjusted searchsorted lookups (ADVICE r12).
    #    mm_tiff_jpeg: per-strip JPEGTables divergence guard
    #    (ADVICE r12).
    "mm_tiff_fax",
    "mm_tiff_jpeg",
    #    the SOF3 branch extended the shared decode_jpeg marker walk
    #    these rows flow through:
    "mm_jpeg_roundtrip",
    "mm_tiff_pixels",
    "mm_phash_neardup",
    #    the image_features WebP branch now dispatches BOTH flavors
    #    (lossless VP8L -> NotImplementedError -> lossy VP8):
    "mm_image_features",
    "mm_webp_pixels",
    # -- the whole r9-stale block (last driver rows r9), in
    #    CORRECTNESS_r09 order
    "apx_sketches",
    "graph_bfs_hops",
    "graph_pagerank",
    "graph_ppr",
    "graph_triangles",
    "graph_kcore",
    "graph_scc",
    "graph_labelprop",
    "graph_closeness",
    "graph_harmonic",
    "graph_node_similarity",
    "graph_lcc",
    "graph_betweenness_directed",
    "smp_stratified",
    "smp_ntile",
    "smp_negatives",
    "smp_cap_per_source",
    "smp_budget_mixture",
    "smp_weighted_k",
    "smp_train_val_test",
    "smp_temperature_mixture",
    "ts_resample_ffill",
    "ev_zscore_outliers",
    "ev_conversion_funnel",
    "ev_cohort_retention",
    "ev_markov_transitions",
    "upd_merge_upsert",
    "dq_constraint_checks",
    "dq_column_profile",
    "dq_dataset_fingerprint",
    "dq_referential_integrity",
    "lay_zorder_key",
    "skw_count_distinct",
    "skw_bloom_join",
    "apx_hll_rollup",
    "apx_theta_setops",
    "idx_conjunctive_search",
    "pipe_corpus_prep",
    "pipe_training_mix",
    "pipe_entity_resolution",
    # -- the stalest r10 row fills the last slot (first in
    #    CORRECTNESS_r10 order; it ceded its r12 slot to mm_tiff_fax)
    "mm_opus_metadata",
]
# ROUND-14 ROTATION NOTE: lead with any query whose implementation
# changes during r13 after its driver row, then continue the stale
# cycle with the r10 block (sem_dedup, f1_casts, u1_union_all,
# t1_t2_topk, ... in CORRECTNESS_r10 order) and the oldest r11 rows.
# Recompute staleness from the CORRECTNESS_r*.json artifacts as
# r11/r12/r13 did — the note can go stale, the artifacts cannot.


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

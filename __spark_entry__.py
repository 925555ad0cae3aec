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
# order. The window ROTATES each round (round-5 verdict demand). Round 10
# (VERDICT r9 item 6): lead with the queries NEW this round, re-run every
# query whose implementation changed since its last driver row, then the
# §2 relational rows the verdict named (f1/u1 last checked r5; the
# p*/j*/a*/f*/t*/w* block last checked r8), then the three r6-window rows
# that ceded their r9 slots, topped up with the stalest r7-window rows.
# The remaining registry stays covered by tools/check_oracles.py
# (CORRECTNESS_local_r{N}.json).
_DRIVER_WINDOW = [
    # -- never-driver-checked: NEW this round — FLAC STREAMINFO,
    #    CRC-verified Ogg/Opus, and EBML/WebM metadata walks
    "mm_flac_metadata",
    "mm_opus_metadata",
    "mm_webm_metadata",
    # -- re-runs: implementation changed since their last driver row.
    #    mm_mp3_metadata / mm_aac_metadata: r10 ID3-tagged-AAC re-sniff,
    #    Xing-placeholder accounting, tag-excluded ADTS bitrate.
    #    mm_audio_features: r10 flac-meta/opus-meta dispatch branches.
    #    sem_dedup / knn_ivf_join: r10 Arrow assignment/probe kernels
    #    (bit-identical by construction AND re-proven by the gate).
    "mm_mp3_metadata",
    "mm_aac_metadata",
    "mm_audio_features",
    "sem_dedup",
    "knn_ivf_join",
    # -- §2 relational block (VERDICT r9 item 6): f1/u1 ceded their r8
    #    slots to the codec rows (last driver rows r5 — the stalest in
    #    the registry); the rest last checked r8
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
    # -- the three r6-window rows that ceded their r9 slots (last rows r6)
    "dd_canonical",
    "dd_keep_best",
    "txt_bpe_learn2",
    # -- stalest r7-window rows not re-checked since, in r7 order
    "a8_rollup",
    "a9_pivot",
    "a10_histogram",
    "a11_corr_cov",
    "a12_cube",
    "a13_unpivot",
    "u2_intersect_except",
    "w4_rank_distributions",
    "w5_moving_avg",
    "w6_inactivity_gaps",
    "w7_rolling_distinct",
    "f10_json_extract",
    "f11_maps",
    "ft_minmax_norm",
]
# ROUND-11 ROTATION NOTE: lead with any query whose implementation
# changes during r10 after its driver row, then continue the r7-window
# stale cycle where r10 left off (ft_percent_rank — it ceded its r10
# slot to mm_webm_metadata — then txt_tfidf_top3 onward, see
# CORRECTNESS_r07.json order), then the remaining r8-window rows
# (streaming/asof/dedup block), then the r9 window.


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

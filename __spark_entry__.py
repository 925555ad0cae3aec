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
# order. The window ROTATES each round (round-5 verdict demand): round 5's
# 50 §2-operator heads are all driver-green in CORRECTNESS_r05.json, so this
# round promotes a DISJOINT set of 50 previously-local-only queries — the
# graph-analytics, sampling, time-series/event, ops/layout/sketch, and
# pipeline families — so they too earn an adversarial driver-run row. The
# remaining 105 stay covered by tools/check_oracles.py (committed as
# CORRECTNESS_local_r{N}.json).
_DRIVER_WINDOW = [
    # round-7 window: the 42 queries that had only local-mirror coverage
    # before this round (every registered query now has had at least one
    # adversarial driver row), + the 2 rows fixed this round (array
    # columns serialized to strings), + 6 riskiest re-runs.
    # -- aggregation / reshape tails
    "a8_rollup",
    "a9_pivot",
    "a10_histogram",
    "a11_corr_cov",
    "a12_cube",
    "a13_unpivot",
    "u2_intersect_except",
    # -- window-function tails
    "w4_rank_distributions",
    "w5_moving_avg",
    "w6_inactivity_gaps",
    "w7_rolling_distinct",
    # -- functions: json / maps / feature transforms
    "f10_json_extract",
    "f11_maps",
    "ft_minmax_norm",
    "ft_percent_rank",
    "ft_winsorize",
    # -- text-analysis tail
    "txt_tfidf_top3",
    "txt_pmi_pairs",
    "txt_top_ngrams",
    "txt_corpus_stats",
    "txt_url_domains",
    "txt_source_kl",
    "txt_unigram_logprob",
    "txt_bigram_logprob",
    "txt_chunks",
    "txt_scrub",
    "txt_sentence_dedup",
    # -- embeddings / similarity tail
    "emb_quantize",
    "emb_random_proj",
    "er_fuzzy_name_pairs",
    "mm_phash_neardup",
    # -- sketches tail
    "apx_join_overlap",
    "apx_top_k_types",
    "apx_mergeable_sketches",
    # -- streaming / temporal tail
    "st_hopping_window",
    "st_interval_join",
    "st_interval_join_left",
    "st_enriched_counts",
    "asof_next_view",
    "dq_snapshot_diff",
    # -- sampling / packing tail
    "smp_replicate",
    "pack_shards_grouped",
    # -- fixed this round (array columns -> comma-joined strings)
    "graph_random_walks",
    "idx_postings",
    # -- riskiest re-runs (subtle cross-engine rounding/ordering contracts)
    "hist_snapshot_asof",
    "upd_apply_cdc",
    "hist_scd2",
    "ts_interpolate",
    "ts_ewma",
    "dd_simhash",
]
# ROUND-8 ROTATION NOTE: after this round, the only queries never
# driver-checked are the four real-codec roundtrips added late in round 7
# (mm_wav_roundtrip, mm_png_roundtrip, mm_resize_roundtrip,
# mm_wav_spectral) — promote them (plus this round's review-touched
# queries: ev_mad_outliers, mm_audio_features, mm_image_features,
# mm_phash_neardup, ts_interpolate) into the next window.


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

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
    # graph analytics (beyond round-5's bfs/components/betweenness/degree)
    "graph_pagerank",
    "graph_ppr",
    "graph_triangles",
    "graph_kcore",
    "graph_scc",
    "graph_labelprop",
    "graph_closeness",
    "graph_harmonic",
    "graph_random_walks",
    "graph_node_similarity",
    "graph_lcc",
    "graph_betweenness_directed",
    # sampling / splitting / mixtures
    "smp_stratified",
    "smp_ntile",
    "smp_negatives",
    "smp_cap_per_source",
    "smp_budget_mixture",
    "smp_weighted_k",
    "smp_train_val_test",
    "smp_temperature_mixture",
    # time-series / event analytics
    "ts_resample_ffill",
    "ts_ewma",
    "ts_interpolate",
    "ev_zscore_outliers",
    "ev_mad_outliers",
    "ev_conversion_funnel",
    "ev_cohort_retention",
    "ev_markov_transitions",
    # mutation / history / data-quality ops
    "upd_merge_upsert",
    "upd_apply_cdc",
    "hist_scd2",
    "hist_snapshot_asof",
    "dq_constraint_checks",
    "dq_column_profile",
    "dq_dataset_fingerprint",
    "dq_referential_integrity",
    # layout / skew / sketches / indexing
    "lay_zorder_key",
    "skw_count_distinct",
    "skw_bloom_join",
    "apx_sketches",
    "apx_hll_rollup",
    "apx_theta_setops",
    "idx_postings",
    "idx_conjunctive_search",
    # end-to-end pipelines + dedup/text tails
    "pipe_corpus_prep",
    "pipe_training_mix",
    "pipe_entity_resolution",
    "dd_canonical",
    "dd_keep_best",
    "txt_bpe_learn2",
]


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

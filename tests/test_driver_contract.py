"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import pytest

# one query per distinct SURVEY §2 operator / family head that MUST stay
# inside the driver's 50-row window (VERDICT r4 gate condition)
REQUIRED_IN_WINDOW = [
    "p5_computed_theta",
    "graph_betweenness",
    "graph_bfs_hops",
    "asof_last_view",
    "rng_followup_events",
    "dd_simhash",
    "dd_decontaminate",
    "sem_dedup",
    "txt_repetition",
    "smp_mixture",
    "pack_shards",
    "st_watermark_dedup",
    "st_sessionization",
    "mm_image_features",
]


@pytest.fixture(scope="module")
def entry_mod():
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return importlib.import_module("__spark_entry__")


def test_every_query_has_matching_oracle(entry_mod):
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q), "oracle keys without a query"
    missing = set(q) - set(o)
    assert not missing, f"queries without an oracle (weaker rows-only check): {missing}"


def test_window_covers_required_operators(entry_mod):
    window = list(entry_mod.queries())[:50]
    missing = [k for k in REQUIRED_IN_WINDOW if k not in window]
    assert not missing, f"§2 operators fell out of the driver window: {missing}"


def test_queries_are_callable_and_keys_stable(entry_mod):
    q = entry_mod.queries()
    assert len(q) >= 108
    assert all(callable(f) for f in q.values())
    # dict ordering is the contract: first 50 must be deterministic
    assert list(q)[:3] == ["p1_project_rename", "p3_p4_filters", "p5_computed_theta"]

"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import pytest

# The window ROTATES each round (VERDICT r5 item 2): round 5's window —
# every distinct §2 operator head — is driver-green in CORRECTNESS_r05,
# so round 6 promotes a DISJOINT set of previously-local-only families.
# This list pins one representative per newly-promoted family; the
# disjointness test below enforces the rotation itself.
REQUIRED_IN_WINDOW = [
    "graph_pagerank",
    "graph_scc",
    "graph_kcore",
    "smp_temperature_mixture",
    "ts_interpolate",
    "ev_cohort_retention",
    "upd_apply_cdc",
    "hist_snapshot_asof",
    "dq_dataset_fingerprint",
    "apx_theta_setops",
    "idx_conjunctive_search",
    "pipe_entity_resolution",
    "dd_canonical",
    "txt_bpe_learn2",
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
    assert list(q)[:3] == ["graph_pagerank", "graph_ppr", "graph_triangles"]


def test_window_rotated_disjoint_from_r05(entry_mod):
    """Round-6 rotation: the driver's 50-row window must not overlap the
    set already driver-hash-checked in CORRECTNESS_r05.json, so every
    registry family eventually earns an adversarial driver row."""
    import json
    import os

    r05 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "CORRECTNESS_r05.json")
    prev = set(json.load(open(r05)))
    window = set(list(entry_mod.queries())[:50])
    assert not (window & prev), f"window overlaps r05: {sorted(window & prev)}"

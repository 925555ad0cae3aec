"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import pytest

# The window ROTATES each round (VERDICT r5 item 2): rounds 5+6 are
# driver-green in CORRECTNESS_r05/r06, so round 7 promotes the 42
# remaining never-driver-checked queries (VERDICT r6 item 2) — after this
# round every registered query has had at least one adversarial driver
# row — plus the two rows fixed this round and six risky re-runs.
# This list pins one representative per newly-promoted family; the
# rotation test below enforces the promotion itself.
REQUIRED_IN_WINDOW = [
    "a8_rollup",
    "a12_cube",
    "w4_rank_distributions",
    "f10_json_extract",
    "ft_winsorize",
    "txt_tfidf_top3",
    "txt_sentence_dedup",
    "emb_quantize",
    "mm_phash_neardup",
    "apx_mergeable_sketches",
    "st_interval_join",
    "asof_next_view",
    "smp_replicate",
    "pack_shards_grouped",
    "u2_intersect_except",
    # fixed this round (array columns -> strings)
    "graph_random_walks",
    "idx_postings",
]

# deliberately re-run despite prior driver coverage: the two array-fix
# rows above plus the subtlest cross-engine rounding/ordering contracts
RERUN_EXCEPTIONS = {
    "graph_random_walks",
    "idx_postings",
    "hist_snapshot_asof",
    "upd_apply_cdc",
    "hist_scd2",
    "ts_interpolate",
    "ts_ewma",
    "dd_simhash",
}


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
    assert list(q)[:3] == ["a8_rollup", "a9_pivot", "a10_histogram"]


def test_window_rotated_covers_never_checked(entry_mod):
    """Round-7 rotation: the window may only repeat r05/r06-checked
    queries from the declared re-run list — everything else must be a
    previously-never-driver-checked query, so after this round every
    registered query has had an adversarial driver row at least once."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev: set[str] = set()
    for r in ("CORRECTNESS_r05.json", "CORRECTNESS_r06.json"):
        prev |= set(json.load(open(os.path.join(here, r))))
    window = set(list(entry_mod.queries())[:50])
    overlap = (window & prev) - RERUN_EXCEPTIONS
    assert not overlap, f"window wastes rows on already-checked: {sorted(overlap)}"

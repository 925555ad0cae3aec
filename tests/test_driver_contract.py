"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import pytest

# Round-10 window (VERDICT r9 item 6 + the builder's rotation note): the
# two queries NEW this round lead (FLAC STREAMINFO; CRC-verified
# Ogg/Opus); then re-runs of every query whose implementation changed
# since its last driver row (the r10 ID3/Xing sniff fixes and the Arrow
# IVF assignment/probe kernels); then the §2 relational block the
# verdict named (f1/u1 stale since r5, the rest since r8); topped to 50
# with the r6 rows that ceded their r9 slots and the stalest r7 rows.
NEVER_CHECKED = [
    "mm_flac_metadata",
    "mm_opus_metadata",
    "mm_webm_metadata",
]

CHANGED_SINCE_LAST_ROW = [
    # r10 ID3-tagged-AAC re-sniff + Xing-placeholder accounting
    "mm_mp3_metadata",
    "mm_aac_metadata",
    # r10 flac-meta/opus-meta dispatch branches
    "mm_audio_features",
    # r10 Arrow assignment/probe kernels
    "sem_dedup",
    "knn_ivf_join",
]

REQUIRED_IN_WINDOW = NEVER_CHECKED + CHANGED_SINCE_LAST_ROW + [
    # representatives of the verdict-named §2 relational block and the
    # stale-row cycle
    "f1_casts",
    "u1_union_all",
    "j1_join_chain",
    "a1_a2_aggregates",
    "dd_canonical",
    "a8_rollup",
    "ft_minmax_norm",
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
    assert not missing, f"required rows fell out of the driver window: {missing}"


def test_queries_are_callable_and_keys_stable(entry_mod):
    q = entry_mod.queries()
    assert len(q) >= 108
    assert all(callable(f) for f in q.values())
    # dict ordering is the contract: first 50 must be deterministic
    assert list(q)[: len(NEVER_CHECKED)] == NEVER_CHECKED


def test_window_rotation_r10(entry_mod):
    """Round-10 rotation: every window row must be (a) a query new this
    round (never driver-checked), (b) a declared changed-since-last-row
    re-run, or (c) STALE — not checked in the r9 window (its last driver
    row is r8 or older). Anything else would waste the gate's 50 slots
    on recently-checked queries."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r9 = set(json.load(open(os.path.join(here, "CORRECTNESS_r09.json"))))
    window = set(list(entry_mod.queries())[:50])
    assert set(NEVER_CHECKED) <= window
    fresh = r9 - set(NEVER_CHECKED) - set(CHANGED_SINCE_LAST_ROW)
    stray = window & fresh
    assert not stray, f"window wastes rows on r9-checked queries: {sorted(stray)}"

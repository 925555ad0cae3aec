"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import pytest

# Round-9 window (VERDICT r8 item 3 + the builder's own rotation note):
# the two queries NEW this round lead (MPEG-audio metadata; G.711 sign
# guard); then re-runs of every query whose implementation changed since
# its last driver row (the r8 dialect-dispatch/phash/p50 changes that
# landed after their r8 rows, plus this round's MP4 stts/stsz extension,
# A-law sign fix, and SSSP lane-retirement filter); topped to 50 with
# the STALEST driver rows — the r6 window members not re-checked since.
NEVER_CHECKED = [
    "mm_mp3_metadata",
    "mm_aac_metadata",
    "mm_g711_roundtrip",
]

CHANGED_SINCE_LAST_ROW = [
    "mm_mp4_metadata",
    "mm_audio_features",
    "mm_wav_roundtrip",
    "mm_wav_spectral",
    "mm_phash_neardup",
    "apx_sketches",
    "graph_bfs_hops",
    # r9 sqrt(n)-sized IVF centroid counts (sf1.0-probe quadratic fix)
    "knn_ivf_join",
    "sem_dedup",
]

REQUIRED_IN_WINDOW = NEVER_CHECKED + CHANGED_SINCE_LAST_ROW + [
    # representatives of the stalest-row (r6-window) cycle
    "graph_pagerank",
    "graph_scc",
    "smp_stratified",
    "dq_constraint_checks",
    "pipe_entity_resolution",
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


def test_window_rotation_r9(entry_mod):
    """Round-9 rotation: every window row must be (a) a query new this
    round (never driver-checked), (b) a declared changed-since-last-row
    re-run, or (c) a stalest-row cycle member — an r6-window row whose
    last driver check was r6 (not re-checked in r7/r8). Anything else
    would waste the gate's 50 slots on recently-checked queries."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r6 = set(
        list(json.load(open(os.path.join(here, "CORRECTNESS_r06.json"))))[:50]
    )
    r7 = set(json.load(open(os.path.join(here, "CORRECTNESS_r07.json"))))
    r8 = set(json.load(open(os.path.join(here, "CORRECTNESS_r08.json"))))
    stale_r6 = (r6 - r7) - r8
    window = set(list(entry_mod.queries())[:50])
    assert set(NEVER_CHECKED) <= window
    allowed = set(NEVER_CHECKED) | set(CHANGED_SINCE_LAST_ROW) | stale_r6
    stray = window - allowed
    assert not stray, f"window wastes rows on recently-checked queries: {sorted(stray)}"

"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import pytest

# Round-8 window (VERDICT r7 item 1): the 4 never-driver-checked codec
# roundtrips lead; then re-runs of every query whose implementation
# changed since its last driver row (r7-review-touched media/outlier
# rows, this round's decode-fall-through/bitbuf/target-dedup fixes, the
# settlement-probe-touched routing rows); topped to 50 with the OLDEST
# driver rows — r5-window §2 operator heads, including the three
# BENCH_r07 floor-watch rows (dd_decontaminate, sem_dedup, smp_mixture).
NEVER_CHECKED = [
    "mm_wav_roundtrip",
    "mm_png_roundtrip",
    "mm_resize_roundtrip",
    "mm_wav_spectral",
    # new in round 8 (real-JPEG roundtrip incl. progressive; ISO-BMFF
    # video metadata) — first driver rows
    "mm_jpeg_roundtrip",
    "mm_mp4_metadata",
]

CHANGED_SINCE_LAST_ROW = [
    "ev_mad_outliers",
    "mm_audio_features",
    "mm_image_features",
    "mm_media_stats",
    "mm_phash_neardup",
    "mm_resize_plan",
    "graph_bfs_hops",
    "t1_t2_topk",
    "j5_earliest_transfer",
]

REQUIRED_IN_WINDOW = NEVER_CHECKED + CHANGED_SINCE_LAST_ROW + [
    # representatives of the oldest-row top-up + the bench floor-watch rows
    "j1_join_chain",
    "graph_betweenness",
    "dd_decontaminate",
    "sem_dedup",
    "smp_mixture",
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


def test_window_rotation_r8(entry_mod):
    """Round-8 rotation: every window row must be (a) one of the 4
    never-driver-checked codec roundtrips, (b) a declared
    changed-since-last-row re-run, or (c) an oldest-driver-row top-up
    drawn from the r5 window — never a recent (r6/r7) row re-run for no
    reason, which would waste the gate's 50 slots."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r5 = set(json.load(open(os.path.join(here, "CORRECTNESS_r05.json"))))
    window = set(list(entry_mod.queries())[:50])
    assert set(NEVER_CHECKED) <= window
    allowed = set(NEVER_CHECKED) | set(CHANGED_SINCE_LAST_ROW) | r5
    stray = window - allowed
    assert not stray, f"window wastes rows on recently-checked queries: {sorted(stray)}"

"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import glob
import json
import os
import re as _re

import pytest

# Round-14 window: the queries NEW this round lead
# (mm_jpeg_hierarchical — T.81 Annex J pyramids; mm_gsm_pcm — ETSI GSM
# 06.10 full-rate sample decode; mm_webm_vp8 — WebM VP8 key-frame
# decode by composition); then re-runs of every query whose
# implementation changed since its last driver row (the Annex J +
# SOF11/13-15 branches extended the shared decode_jpeg walk every JPEG
# row flows through; the sssp.py superstep loop gained the
# partition-local relaxation mode the graph BFS/closeness/harmonic
# rows run through; the GSM branch extended decode_wav_samples and
# audio_features' is_wav route every audio_features row flows
# through); then the r10-stale block in CORRECTNESS_r10 order.
NEVER_CHECKED = [
    "mm_jpeg_hierarchical",
    "mm_gsm_pcm",
    "mm_webm_vp8",
]

CHANGED_SINCE_LAST_ROW = [
    # r14 Annex J/H.1.2 branches extended the decode_jpeg marker walk
    "mm_jpeg_lossless",
    "mm_jpeg_roundtrip",
    "mm_tiff_jpeg",
    "mm_tiff_pixels",
    "mm_phash_neardup",
    "mm_image_features",
    # r14 partition-local relaxation restructured the sssp superstep loop
    "graph_bfs_hops",
    "graph_closeness",
    "graph_harmonic",
    # r14 GSM branch changed decode_wav_samples + audio_features
    "mm_audio_features",
    "mm_wav_roundtrip",
    "mm_wav_spectral",
    "mm_g711_roundtrip",
    "mm_flac_pcm",
]

REQUIRED_IN_WINDOW = NEVER_CHECKED + CHANGED_SINCE_LAST_ROW + [
    # representatives of the artifact-derived r10-stale block
    "sem_dedup",
    "j1_join_chain",
    "dd_canonical",
    "a8_rollup",
]


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_driver_round(exclude_window: set[str] | None = None) -> dict[str, int]:
    """Per-query newest CORRECTNESS_r*.json round. When
    ``exclude_window`` is given, the single NEWEST artifact is ignored
    iff its key set equals that window — i.e., staleness is computed
    against the artifacts that existed when the window was AUTHORED,
    so the driver landing the round's own record (whose rows are, by
    definition, the freshest afterwards) cannot retroactively
    invalidate the rotation (the r11 hand-off failure)."""
    rounds: dict[int, set[str]] = {}
    for p in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        n = int(_re.search(r"r(\d+)", os.path.basename(p)).group(1))
        try:
            rec = json.load(open(p))
        except ValueError:
            continue
        if isinstance(rec, dict):
            rounds[n] = set(rec)
    if exclude_window is not None and rounds:
        newest = max(rounds)
        if rounds[newest] == exclude_window:
            del rounds[newest]
    last: dict[str, int] = {}
    for n, keys in rounds.items():
        for k in keys:
            last[k] = max(last.get(k, 0), n)
    return last


@pytest.fixture(scope="module")
def entry_mod():
    import importlib
    import sys

    sys.path.insert(0, _repo_root())
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


def test_window_rotation_r14(entry_mod):
    """Round-14 rotation: every window row must be (a) a query new this
    round (never driver-checked), (b) a declared changed-since-last-row
    re-run, or (c) STALE — not checked in the r13 window (its last
    driver row is r12 or older). Anything else would waste the gate's
    50 slots on recently-checked queries."""
    here = _repo_root()
    r13 = set(json.load(open(os.path.join(here, "CORRECTNESS_r13.json"))))
    window = set(list(entry_mod.queries())[:50])
    assert set(NEVER_CHECKED) <= window
    fresh = r13 - set(NEVER_CHECKED) - set(CHANGED_SINCE_LAST_ROW)
    stray = window & fresh
    assert not stray, f"window wastes rows on r13-checked queries: {sorted(stray)}"


def test_window_is_stalest_first(entry_mod):
    """Beyond no-waste: the stale section must actually be the STALEST
    rows available — no registered query may have an older
    last-driver-row than the oldest row IN the window. Recomputed from
    the artifacts so it cannot drift from reality the way a
    hand-written note can; the round's own post-snapshot artifact is
    excluded (see _last_driver_round) so the check asserts the window
    was stalest-first against the artifacts that existed when it was
    authored, not against the record the window itself produced."""
    q = list(entry_mod.queries())
    window, rest = set(q[:50]), q[50:]
    last = _last_driver_round(exclude_window=window)
    oldest_out = min(last.get(k, 0) for k in rest)
    oldest_in = min(last.get(k, 0) for k in window)
    assert oldest_in <= oldest_out, (
        "a staler query sits OUTSIDE the window: "
        f"in={oldest_in} out={oldest_out}"
    )


def test_stale_blocks_fully_enrolled(entry_mod):
    """Stronger than min-vs-min: with the round's own artifact
    excluded, EVERY query whose last driver row is r9 or older must be
    inside the r14 window (the r13 window drained the r9 block; any
    r9-or-older leftover must take a slot before newer rows)."""
    q = list(entry_mod.queries())
    window = set(q[:50])
    last = _last_driver_round(exclude_window=window)
    stale = {k for k in q if last.get(k, 0) <= 9 and k in last}
    left_out = stale - window
    assert not left_out, f"r9-or-older rows left outside the window: {sorted(left_out)}"

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

# Round-13 window: the queries NEW this round lead (mm_jpeg_lossless —
# T.81 Annex H SOF3; mm_webp_lossy — the RFC 6386 lossy VP8 key-frame
# decoder); then re-runs of every query whose implementation changed
# since its last driver row (the fax searchsorted rewrite and the TIFF
# strip-table guard under their r12 rows, every row flowing through
# the SOF3-extended decode_jpeg dispatch, and the two rows through the
# two-flavor image_features WebP branch); then the ENTIRE r9-stale
# block in CORRECTNESS_r09 order; then the stalest r10 row
# (mm_opus_metadata, which ceded its r12 slot).
NEVER_CHECKED = [
    "mm_jpeg_lossless",
    "mm_webp_lossy",
]

CHANGED_SINCE_LAST_ROW = [
    # r13 fax transition lookups became parity-adjusted searchsorted
    "mm_tiff_fax",
    # r13 per-strip JPEGTables divergence guard (ADVICE r12)
    "mm_tiff_jpeg",
    # r13 SOF3 branch extended the shared decode_jpeg marker walk
    "mm_jpeg_roundtrip",
    "mm_tiff_pixels",
    "mm_phash_neardup",
    # r13 image_features WebP branch dispatches both flavors
    "mm_image_features",
    "mm_webp_pixels",
]

REQUIRED_IN_WINDOW = NEVER_CHECKED + CHANGED_SINCE_LAST_ROW + [
    # representatives of the artifact-derived r9-stale block
    "apx_sketches",
    "graph_pagerank",
    "smp_stratified",
    "pipe_entity_resolution",
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


def test_window_rotation_r13(entry_mod):
    """Round-13 rotation: every window row must be (a) a query new this
    round (never driver-checked), (b) a declared changed-since-last-row
    re-run, or (c) STALE — not checked in the r12 window (its last
    driver row is r11 or older). Anything else would waste the gate's
    50 slots on recently-checked queries."""
    here = _repo_root()
    r12 = set(json.load(open(os.path.join(here, "CORRECTNESS_r12.json"))))
    window = set(list(entry_mod.queries())[:50])
    assert set(NEVER_CHECKED) <= window
    fresh = r12 - set(NEVER_CHECKED) - set(CHANGED_SINCE_LAST_ROW)
    stray = window & fresh
    assert not stray, f"window wastes rows on r12-checked queries: {sorted(stray)}"


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
    inside the r13 window (the window was sized to drain the r9 block
    completely)."""
    q = list(entry_mod.queries())
    window = set(q[:50])
    last = _last_driver_round(exclude_window=window)
    stale = {k for k in q if last.get(k, 0) <= 9 and k in last}
    left_out = stale - window
    assert not left_out, f"r9-or-older rows left outside the window: {sorted(left_out)}"

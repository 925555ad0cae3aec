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

# Round-12 window (VERDICT r11 item 1a + the r11 rotation note): the
# queries NEW this round lead (mm_tiff_jpeg, mm_bmp_bitfields — the
# JPEG-in-TIFF and masked-BMP widenings); then re-runs of every query whose implementation changed
# since its last driver row (TIFF LZW strips in mm_tiff_pixels' synth
# and decoder, the strict-FLAC propagate in audio_features, the
# decode_bmp masked branch + strict-message change under
# mm_bmp_palette); then the 8 media rows rewired by the late-r11
# input-docs spread with r10-or-older driver rows; then the registry's
# genuinely stalest rows recomputed from the CORRECTNESS_r*.json
# artifacts (all 19 r7 rows, the 17-row r8 remainder, the stalest r9
# row).
NEVER_CHECKED = [
    "mm_tiff_fax",
    "mm_tiff_jpeg",
    "mm_bmp_bitfields",
]

CHANGED_SINCE_LAST_ROW = [
    # r12 TIFF §13 LZW strip decode (+ predictor 2) off the boundary
    "mm_tiff_pixels",
    # r12 strict=True propagates FLAC frame-decode errors (ADVICE r11)
    "mm_audio_features",
    # r12 decode_bmp masked-mode branch + strict message (ADVICE r11)
    "mm_bmp_palette",
    # r12 decoder widenings rewrote phash's image entries (decode_bmp
    # masked/core branches, decode_jpeg SOF9 dispatch)
    "mm_phash_neardup",
]

SPREAD_REWIRED = [
    # late-r11 partitioning-only rewire; driver rows r10-or-older
    # (mm_opus_metadata, the freshest of the rewired 8, ceded its slot
    # to mm_tiff_fax and carries to r13)
    "mm_png_roundtrip",
    "mm_resize_roundtrip",
    "mm_jpeg_roundtrip",
    "mm_mp3_metadata",
    "mm_mp4_metadata",
    "mm_aac_metadata",
    "mm_flac_metadata",
]

REQUIRED_IN_WINDOW = NEVER_CHECKED + CHANGED_SINCE_LAST_ROW + SPREAD_REWIRED + [
    # representatives of the artifact-derived stale blocks
    "er_fuzzy_name_pairs",
    "dd_simhash",
    "graph_betweenness",
    "st_watermark_dedup",
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


def test_window_rotation_r12(entry_mod):
    """Round-12 rotation: every window row must be (a) a query new this
    round (never driver-checked), (b) a declared changed-since-last-row
    re-run, (c) a spread-rewired media row with an r10-or-older driver
    row, or (d) STALE — not checked in the r11 window (its last driver
    row is r10 or older). Anything else would waste the gate's 50
    slots on recently-checked queries."""
    here = _repo_root()
    r11 = set(json.load(open(os.path.join(here, "CORRECTNESS_r11.json"))))
    window = set(list(entry_mod.queries())[:50])
    assert set(NEVER_CHECKED) <= window
    fresh = r11 - set(NEVER_CHECKED) - set(CHANGED_SINCE_LAST_ROW)
    stray = window & fresh
    assert not stray, f"window wastes rows on r11-checked queries: {sorted(stray)}"


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
    excluded, EVERY query whose last driver row is r8 or older must be
    inside the r12 window (the window was sized to drain the r7 and r8
    blocks completely)."""
    q = list(entry_mod.queries())
    window = set(q[:50])
    last = _last_driver_round(exclude_window=window)
    stale = {k for k in q if last.get(k, 0) <= 8 and k in last}
    left_out = stale - window
    assert not left_out, f"r8-or-older rows left outside the window: {sorted(left_out)}"

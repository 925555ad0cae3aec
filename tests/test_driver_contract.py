"""Locks the driver-facing contract in __spark_entry__.py.

The correctness gate hashes the FIRST 50 queries of ``queries()`` — this
suite fails before the driver does if the window regresses: missing §2
operators, oracle/query key drift, or a window entry pointing at a
renamed query.
"""

from __future__ import annotations

import pytest

# Round-11 window (VERDICT r10 item 4 + the builder's rotation note): the
# queries NEW this round lead (GIF block walk, TIFF IFD chains, WebP
# RIFF walk, the GIF/TIFF pixel decodes, the FLAC sample decode); then
# re-runs of every query whose implementation changed since its last
# driver row (the r11 zero-norm kNN filter, the EBML unknown-size
# raise, and the four audio_features rows touched by the FLAC
# real-decode dispatch); then the registry's genuinely stalest rows,
# recomputed from the CORRECTNESS_r*.json artifacts (mm_frame_plan
# last checked r1, the r4/r5 similarity/text blocks, then the r7 cycle
# from ft_percent_rank onward).
NEVER_CHECKED = [
    "mm_flac_pcm",
    "mm_bmp_palette",
    "mm_webp_pixels",
    "mm_phash_crossformat",
    "mm_gif_frames",
    "mm_gif_metadata",
    "mm_tiff_metadata",
    "mm_webp_metadata",
    "mm_gif_pixels",
    "mm_tiff_pixels",
]

CHANGED_SINCE_LAST_ROW = [
    # r11 zero-norm vector filter in both kNN tiers (ADVICE r10)
    "knn_ivf_join",
    # r11 unknown-size non-Segment raise in the EBML walk (ADVICE r10)
    "mm_webm_metadata",
    # r11 FLAC real-sample-decode routing in audio_features' dispatch
    "mm_audio_features",
    "mm_wav_roundtrip",
    "mm_wav_spectral",
    "mm_g711_roundtrip",
    # r11 palette/RLE widening rewrote decode_bmp_pixels (phash's entry)
    "mm_phash_neardup",
]

REQUIRED_IN_WINDOW = NEVER_CHECKED + CHANGED_SINCE_LAST_ROW + [
    # representatives of the artifact-derived stale blocks
    "mm_frame_plan",
    "p6_radius_batch",
    "dd_minhash_sig",
    "sim_cosine_topk",
    "txt_language_id",
    "ft_percent_rank",
    "apx_mergeable_sketches",
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


def test_window_rotation_r11(entry_mod):
    """Round-11 rotation: every window row must be (a) a query new this
    round (never driver-checked), (b) a declared changed-since-last-row
    re-run, or (c) STALE — not checked in the r10 window (its last
    driver row is r9 or older). Anything else would waste the gate's 50
    slots on recently-checked queries."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r10 = set(json.load(open(os.path.join(here, "CORRECTNESS_r10.json"))))
    window = set(list(entry_mod.queries())[:50])
    assert set(NEVER_CHECKED) <= window
    fresh = r10 - set(NEVER_CHECKED) - set(CHANGED_SINCE_LAST_ROW)
    stray = window & fresh
    assert not stray, f"window wastes rows on r10-checked queries: {sorted(stray)}"


def test_window_is_stalest_first(entry_mod):
    """Beyond no-waste: the stale section must actually be the STALEST
    rows available — no registered query may have an older last-driver-
    row than the oldest row IN the window unless it is already slated
    (the rotation-note tail). Recomputed from the artifacts, so this
    cannot drift from reality the way a hand-written note can."""
    import glob
    import json
    import os
    import re as _re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        n = int(_re.search(r"r(\d+)", os.path.basename(p)).group(1))
        try:
            rec = json.load(open(p))
        except ValueError:
            continue
        if isinstance(rec, dict):
            for k in rec:
                last[k] = max(last.get(k, 0), n)
    q = list(entry_mod.queries())
    window, rest = set(q[:50]), q[50:]
    oldest_out = min(last.get(k, 0) for k in rest)
    oldest_in = min(last.get(k, 0) for k in window)
    assert oldest_in <= oldest_out, (
        "a staler query sits OUTSIDE the window: "
        f"in={oldest_in} out={oldest_out}"
    )

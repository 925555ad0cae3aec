"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship 5-hop join-chain query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 operator inventory
mapped onto the synthetic tables, implemented in
``routing_algorithm_for_graph_dbs_spark.driver_surface`` (each entry cites the
reference operator it reproduces). GTFS-native parity (projection, routing,
footway Dijkstra) is exercised by the pytest suite on the hand-verified
fixture in ``tests/fixtures/gtfs``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from routing_algorithm_for_graph_dbs_spark.driver_surface import ORACLES, QUERIES  # noqa: E402

# The driver's correctness gate checks the FIRST 50 queries in registration
# order. The window ROTATES each round (round-5 verdict demand). Round 11
# (VERDICT r10 item 4): lead with the queries NEW this round, re-run every
# query whose implementation changed since its last driver row, then the
# registry's genuinely stalest rows in last-checked order — recomputed
# from the CORRECTNESS_r*.json artifacts themselves this round, which
# surfaced rows even staler than the verdict's r7-cycle note:
# mm_frame_plan (last row r1) and the r4/r5 similarity/text blocks.
# The remaining registry stays covered by tools/check_oracles.py
# (CORRECTNESS_local_r{N}.json).
_DRIVER_WINDOW = [
    # -- never-driver-checked: NEW this round — GIF block walk, TIFF IFD
    #    chains (both byte orders), WebP RIFF/VP8/VP8L/VP8X walk, the
    #    REAL pixel decodes (GIF LZW inflate; TIFF raw/PackBits strips),
    #    and the REAL FLAC sample decode (Rice/fixed/LPC frames,
    #    CRC-8/16 + MD5 verified — RFC 9639)
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
    # -- re-runs: implementation changed since their last driver row.
    #    knn_ivf_join: r11 zero-norm filter in both kNN tiers (ADVICE).
    #    mm_webm_metadata: r11 unknown-size non-Segment raise in the
    #    EBML walk (ADVICE). The four audio_features rows: the r11 FLAC
    #    real-decode routing touched the extractor's shared dispatch.
    #    mm_phash_neardup: the r11 palette/RLE widening rewrote
    #    decode_bmp_pixels, phash's image entry.
    "knn_ivf_join",
    "mm_webm_metadata",
    "mm_audio_features",
    "mm_wav_roundtrip",
    "mm_wav_spectral",
    "mm_g711_roundtrip",
    "mm_phash_neardup",
    # -- stalest rows, last-checked order (artifact-derived):
    #    mm_frame_plan's only driver row is r1
    "mm_frame_plan",
    # -- the r4 block (last rows r4, in their r4 order)
    "p6_radius_batch",
    "f4_haversine",
    "jlo_left_outer",
    "a4_argmax_ties",
    "dd_minhash_sig",
    "emb_norms",
    "dd_jaccard_pairs",
    "txt_winnow",
    # -- the r5 block (last rows r5, in their r5 order)
    "sim_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_pairs",
    "txt_token_counts",
    "txt_language_id",
    "txt_quality",
    "txt_fingerprint",
    "txt_repetition",
    # -- the r7-window stale cycle, continued where r10 left off
    #    (ft_percent_rank ceded its r10 slot to mm_webm_metadata), in
    #    CORRECTNESS_r07.json order
    "ft_percent_rank",
    "ft_winsorize",
    "txt_tfidf_top3",
    "txt_pmi_pairs",
    "txt_top_ngrams",
    "txt_corpus_stats",
    "txt_url_domains",
    "txt_source_kl",
    "txt_unigram_logprob",
    "txt_bigram_logprob",
    "txt_chunks",
    "txt_scrub",
    "txt_sentence_dedup",
    "emb_quantize",
    "emb_random_proj",
    "apx_mergeable_sketches",
]
# ROUND-12 ROTATION NOTE: lead with any query whose implementation
# changes during r11 after its driver row — NOTE the late-r11
# partitioning-only rewire (input-docs spread) touched all 22 media
# queries; the ones with driver rows r10-or-older that are NOT in this
# window (mm_png_roundtrip, mm_resize_roundtrip, mm_jpeg_roundtrip,
# mm_mp3/mp4/aac/flac/opus metadata) are r12 re-run candidates even
# though results are row-identical (both sf mirrors re-validated them
# post-change) — then finish the r7-stale cycle (pack_shards_grouped, graph_random_walks, apx_top_k_types,
# apx_join_overlap, er_fuzzy_name_pairs,
# st_hopping_window, st_interval_join, st_interval_join_left,
# st_enriched_counts, asof_next_view, dq_snapshot_diff, smp_replicate
# — they ceded their r11 slots to the mm_*_pixels / mm_flac_pcm /
# mm_bmp_palette / mm_webp_pixels / audio_features+phash re-run rows
# — then
# idx_postings, hist_snapshot_asof, upd_apply_cdc, hist_scd2,
# ts_interpolate, ts_ewma, dd_simhash), then the r8-window rows not
# re-checked since, then the r9 window (recompute staleness from the
# CORRECTNESS_r*.json artifacts as r11 did — the note can go stale,
# the artifacts cannot).


def _ordered() -> list[str]:
    assert len(_DRIVER_WINDOW) == len(set(_DRIVER_WINDOW)) == 50, len(_DRIVER_WINDOW)
    missing = [k for k in _DRIVER_WINDOW if k not in QUERIES]
    assert not missing, f"window names unknown queries: {missing}"
    return _DRIVER_WINDOW + [k for k in QUERIES if k not in set(_DRIVER_WINDOW)]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["j1_join_chain"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline surface), §2-complete within the first 50."""
    return {k: QUERIES[k] for k in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — every ``queries()`` key has one (dd_simhash via the
    md5-based engine-agnostic hash; betweenness via literal expected tables
    derived from two independent oracles, see driver_surface)."""
    return {k: ORACLES[k] for k in _ordered() if k in ORACLES}

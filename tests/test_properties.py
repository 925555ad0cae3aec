"""Property-based tests (hypothesis): randomized inputs cross-checked
against brute-force Python oracles for the operators whose edge cases are
easiest to get wrong (as-of joins, LSH blocking completeness, winnowing).

Example counts are small — each example is a Spark round-trip — but the
strategies hit the boundaries that matter (exact time ties, empty sides,
same-bucket vs cross-bucket, duplicate keys)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

rows = st.lists(
    st.tuples(
        st.sampled_from(["u", "v"]),
        st.integers(min_value=0, max_value=500),
    ),
    min_size=0,
    max_size=12,
)


@SET
@given(left=rows, right=rows, back=st.booleans())
def test_asof_join_matches_bruteforce(spark, left, right, back):
    from routing_algorithm_for_graph_dbs_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "lid int, k string, t int",
    ).filter(F.col("lid").isNotNull())
    rdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)] or [(None, None, None)],
        "rid int, k string, t int",
    ).filter(F.col("rid").isNotNull())
    # dedupe right per (k, t) like the oracle-checked query does: ties on
    # time are broken to the smallest rid on both sides
    rdf = rdf.groupBy("k", "t").agg(F.min("rid").alias("rid"))
    direction = "backward" if back else "forward"
    got = {
        r["lid"]: (r["t_r"], r["rid_r"])
        for r in asof_join(
            ldf, rdf, "k", "t", "t", direction, bucket_s=100
        ).collect()
    }
    rr = {}
    for i, (k, t) in enumerate(right):
        cur = rr.get((k, t))
        rr[(k, t)] = i if cur is None else min(cur, i)
    want = {}
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, rid)
            for (rk, rt), rid in rr.items()
            if rk == k and (rt <= t if back else rt >= t)
        ]
        if cands:
            want[i] = max(cands)[0:2] if back else min(cands)[0:2]
            rt, rid = want[i]
            want[i] = (rt, rid)
    assert got == want


@SET
@given(
    vals=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=2, max_size=8),
    flips=st.lists(st.integers(min_value=0, max_value=63), min_size=0, max_size=3, unique=True),
)
def test_simhash_blocking_never_misses_close_pairs(spark, vals, flips):
    """Pigeonhole completeness: a pair differing in <= 3 of 64 bits shares a
    16-bit chunk, so simhash_near_pairs must always surface it."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import simhash_near_pairs

    base = vals[0]
    close = base
    for b in flips:
        close ^= 1 << b
    if close >= 2**63:
        close -= 2**64
    sims = spark.createDataFrame(
        [(0, base), (1, close)] + [(i + 2, v) for i, v in enumerate(vals[1:])],
        "doc_id long, simhash long",
    )
    pairs = {
        (r["a"], r["b"]) for r in simhash_near_pairs(sims, max_hamming=3).collect()
    }
    assert (0, 1) in pairs or base == close and True


@SET
@given(
    pre=st.text(alphabet="abcdefgh ", min_size=0, max_size=20),
    mid=st.text(alphabet="abcdefgh", min_size=11, max_size=24),
    post=st.text(alphabet="abcdefgh ", min_size=0, max_size=20),
)
def test_winnowing_guarantee_random_strings(spark, pre, mid, post):
    """Any shared substring of length >= k + w - 1 (= 11) yields a shared
    fingerprint — the winnowing paper's core guarantee, on random text."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, f"{pre} {mid} {post}"), (2, f"zz {mid} qq")], ["doc_id", "text"]
    )
    fps = winnow_fingerprints(df, k=8, w=4).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc.get(1, set()) & by_doc.get(2, set())


pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),   # doc key (may collide)
        st.integers(min_value=0, max_value=300),  # token count (0 allowed)
    ),
    min_size=0,
    max_size=20,
)


@SET
@given(data=pack_rows, budget=st.sampled_from([1, 7, 100]))
def test_pack_two_pass_matches_python_oracle(spark, data, budget):
    """Distributed two-pass packing == a sequential Python prefix sum.
    Keys are deduped first (pack_sequences orders by key; duplicate keys
    would make the order — and any engine's answer — ill-defined)."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        pack_sequences,
    )

    dd = {}
    for k, t in data:
        dd.setdefault(k, t)
    df = spark.createDataFrame(
        list(dd.items()) or [(None, None)], "doc_id int, toks int"
    ).filter(F.col("doc_id").isNotNull())
    got = {r["doc_id"]: r["shard_id"] for r in pack_sequences(
        df, "toks", budget=budget, num_partitions=3).collect()}
    want, acc = {}, 0
    for k in sorted(dd):
        want[k] = acc // budget
        acc += dd[k]
    assert got == want


@SET
@given(
    n=st.integers(min_value=0, max_value=25),
    bins=st.integers(min_value=1, max_value=9),
    dup_every=st.sampled_from([1, 2, 3]),
)
def test_ntile_matches_python_oracle(spark, n, bins, dup_every):
    """Distributed NTILE == the SQL NTILE rule computed in Python, with
    deliberate ties in the first order column (broken by the key)."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import ntile_by

    rows = [(i, i // dup_every) for i in range(n)]
    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id int, v int"
    ).filter(F.col("doc_id").isNotNull())
    got = {r["doc_id"]: r["bin"] for r in ntile_by(
        df, bins, ["v", "doc_id"], num_partitions=3).collect()}
    small, r = n // bins, n % bins
    big = small + 1
    want = {}
    for rn, (k, _) in enumerate(sorted(rows, key=lambda x: (x[1], x[0])), 1):
        if rn <= r * big:
            want[k] = (rn - 1) // big + 1
        else:
            want[k] = r + (rn - r * big - 1) // small + 1
    assert got == want


cdc_stream = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=20),  # seq
        st.sampled_from(["U", "D", "I"]),        # op
        st.integers(min_value=0, max_value=99),  # value
    ),
    min_size=0,
    max_size=16,
)


@SET
@given(changes=cdc_stream)
def test_apply_cdc_matches_python_oracle(spark, changes):
    from routing_algorithm_for_graph_dbs_spark.operators.merge import apply_cdc

    target_rows = [(0, -1), (1, -1), (2, -1)]
    # python oracle mirroring apply_cdc's total order: (seq, is_delete,
    # payload struct) — the struct tail makes equal-(key, seq) upserts
    # deterministic instead of input-order-dependent
    final = {}
    for k, seq, op, v in changes:
        prev = final.get(k)
        rank = (seq, 1 if op == "D" else 0, (seq, op, v))
        if prev is None or rank >= prev[0]:
            final[k] = (rank, op, v)
    state = dict(target_rows)
    for k, (_, op, v) in final.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    target = spark.createDataFrame(target_rows, "k long, v long")
    log = spark.createDataFrame(
        changes or [(None, None, None, None)],
        "k long, seq long, op string, v long",
    ).filter(F.col("k").isNotNull())
    got = {
        r["k"]: r["v"] for r in apply_cdc(target, log, ["k"], "seq").collect()
    }
    assert got == state


cdc_map_stream = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # key
        st.integers(min_value=0, max_value=10),  # seq (small: force ties)
        st.sampled_from(["U", "D", "I"]),        # op
        st.dictionaries(                          # MapType payload
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=9),
            max_size=3,
        ),
    ),
    min_size=0,
    max_size=16,
)


@SET
@given(changes=cdc_map_stream)
def test_apply_cdc_map_payload_matches_python_oracle(spark, changes):
    """MapType payload exercises apply_cdc's to_json orderable-fallback
    tiebreak (operators/merge.py: Spark's window orderBy rejects MapType,
    so the payload tail enters the (seq, is_delete, payload) order as a
    deterministic JSON serialization). The oracle mirrors it with
    json.dumps in the same entry order and no whitespace — equal-(key,
    seq) upserts with different maps must resolve identically on both
    sides, and a latest-D tie must still delete."""
    import json

    from routing_algorithm_for_graph_dbs_spark.operators.merge import apply_cdc

    # fix map entry order at generation time so Spark's to_json (entry
    # order) and the oracle's json.dumps agree byte-for-byte
    changes = [(k, s, op, dict(sorted(v.items()))) for k, s, op, v in changes]

    def jmap(d: dict) -> str:
        return json.dumps(d, separators=(",", ":"))

    final: dict = {}
    for k, seq, op, v in changes:
        # payload struct = non-key change columns in schema order:
        # (seq, op, to_json(v))
        rank = (seq, 1 if op == "D" else 0, (seq, op, jmap(v)))
        prev = final.get(k)
        if prev is None or rank >= prev[0]:
            final[k] = (rank, op, v)
    state: dict = {0: {"z": 0}}
    for k, (_, op, v) in final.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    target = spark.createDataFrame([(0, {"z": 0})], "k long, v map<string,int>")
    log = spark.createDataFrame(
        changes or [(None, None, None, None)],
        "k long, seq long, op string, v map<string,int>",
    ).filter(F.col("k").isNotNull())
    got = {
        r["k"]: dict(r["v"])
        for r in apply_cdc(target, log, ["k"], "seq").collect()
    }
    assert got == state


@SET
@given(
    vals=st.lists(
        st.one_of(st.integers(min_value=-50, max_value=50), st.none()),
        min_size=1,
        max_size=20,
    )
)
def test_percent_rank_scaled_matches_python_oracle(spark, vals):
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        percent_rank_scaled,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    nn = sorted(v for v in vals if v is not None)
    n = len(nn)

    def expect(v):
        if v is None:
            return None
        if n <= 1:
            return 0.0
        return sum(1 for x in nn if x < v) / (n - 1)

    got = {r["id"]: r["pr"] for r in percent_rank_scaled(df, "v").collect()}
    for i, v in enumerate(vals):
        e = expect(v)
        if e is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(e)


@SET
@given(
    keys=st.sets(st.integers(min_value=0, max_value=10_000), max_size=40),
    probes=st.sets(st.integers(min_value=0, max_value=10_000), max_size=40),
)
def test_bloom_never_false_negative(spark, keys, probes):
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        bloom_filter_keys,
        build_key_bloom,
    )

    kdf = spark.createDataFrame(
        [(k,) for k in keys] or [(None,)], "k long"
    ).filter(F.col("k").isNotNull())
    pdf = spark.createDataFrame(
        [(p,) for p in probes] or [(None,)], "k long"
    ).filter(F.col("k").isNotNull())
    bloom = build_key_bloom(kdf, ["k"], m_bits=4096, k=3)
    kept = {r["k"] for r in bloom_filter_keys(pdf, ["k"], bloom).collect()}
    # every probe that IS a key must survive — bloom has no false negatives
    assert keys & probes <= kept


@SET
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # day offset
            st.integers(min_value=-20, max_value=20),  # value
        ),
        min_size=1,
        max_size=10,
    )
)
def test_interpolate_daily_matches_python_oracle(spark, obs):
    import datetime as dt

    from routing_algorithm_for_graph_dbs_spark.operators.asof import (
        interpolate_daily,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, base + dt.timedelta(days=d, hours=1), float(v)) for d, v in obs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["day"]: (r["observed"], r["v_interp"])
        for r in interpolate_daily(df).collect()
    }
    # python oracle: daily means, dense grid, linear interp between
    # observed neighbors
    by_day: dict = {}
    for d, v in obs:
        by_day.setdefault(d, []).append(v)
    means = {d: round(sum(vs) / len(vs), 6) for d, vs in by_day.items()}
    days = sorted(means)
    lo, hi = days[0], days[-1]
    assert len(got) == hi - lo + 1
    for d in range(lo, hi + 1):
        key = (base + dt.timedelta(days=d)).strftime("%Y-%m-%d")
        if d in means:
            assert got[key] == (True, means[d]), (d, got[key])
        else:
            p = max(x for x in days if x < d)
            n = min(x for x in days if x > d)
            want = means[p] + (means[n] - means[p]) * (d - p) / (n - p)
            assert got[key][0] is False
            assert got[key][1] == pytest.approx(round(want, 6), abs=1e-6)


@SET
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # group
            st.integers(min_value=0, max_value=50),   # id (may repeat)
            st.integers(min_value=0, max_value=5),    # quality
        ),
        min_size=1,
        max_size=15,
    )
)
def test_keep_best_matches_python_oracle(spark, rows):
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        keep_best_dedup,
    )

    df = spark.createDataFrame(rows, "grp long, id long, quality long")
    got = {
        r["grp"]: (r["quality"], r["id"], r["dup_count"])
        for r in keep_best_dedup(
            df,
            ["grp"],
            F.struct(F.col("quality"), (-F.col("id")).alias("tb")),
        ).collect()
    }
    want: dict = {}
    counts: dict = {}
    for g, i, q in rows:
        counts[g] = counts.get(g, 0) + 1
        # max by (quality, -id): highest quality, lowest id on ties
        cur = want.get(g)
        if cur is None or (q, -i) > (cur[0], -cur[1]):
            want[g] = (q, i)
    assert got == {g: (q, i, counts[g]) for g, (q, i) in want.items()}


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=8,  # each example runs O(log n) Spark rounds
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
@given(edges=edge_lists)
def test_star_contraction_matches_union_find(spark, edges):
    """Iterative star-contraction components == python union-find on
    random graphs incl. self-loops, duplicates, and isolated vertices —
    the randomized twin of the long-chain O(log n) evidence test."""
    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    # canonical label = component min (find roots merge toward the min)
    want = {n: find(n) for n in nodes}
    # re-canonicalize: union-by-min guarantees root IS the min
    want = {n: find(n) for n in nodes}

    edf = spark.createDataFrame(
        edges or [(None, None)], "src long, dst long"
    ).filter(F.col("src").isNotNull())
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf, strategy="iterative").collect()
    }
    assert got == want


# ---------- real-codec roundtrip properties (r7) ----------

img_arrays = st.tuples(
    st.integers(min_value=1, max_value=9),   # height
    st.integers(min_value=1, max_value=9),   # width
    st.sampled_from([1, 2, 3, 4]),           # channels
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.sampled_from(["none", "cycle"]),      # filter mode
)


@SET
@given(spec=img_arrays)
def test_png_roundtrip_pixel_exact(spec):
    """encode_png -> decode_png_pixels is PIXEL-EXACT for every shape,
    channel count and scanline filter mode — PNG is lossless, so any
    deviation is a codec bug (goldens can't sweep this input space)."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        decode_png_pixels,
        encode_png,
    )

    h, w, c, seed, mode = spec
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    got = decode_png_pixels(encode_png(px, mode))
    assert got.shape == (h, w, c)
    assert np.array_equal(got, px)


wav_specs = st.tuples(
    st.integers(min_value=0, max_value=40),          # frames
    st.integers(min_value=1, max_value=3),           # channels
    st.sampled_from([8, 16]),                        # bits
    st.integers(min_value=0, max_value=2**32 - 1),   # sample seed
)


@SET
@given(spec=wav_specs)
def test_wav_roundtrip_matches_quantization(spec):
    """encode_wav -> decode_wav_samples returns EXACTLY the quantized
    samples (round-to-int at the bit depth, back to [-1, 1]) for every
    frame count, channel count and supported depth — including the
    empty payload."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav_samples,
        encode_wav,
    )

    n, ch, bits, seed = spec
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=(n, ch))
    got, rate = decode_wav_samples(encode_wav(x, 8000, bits=bits))
    assert rate == 8000 and got.shape == (n, ch)
    if bits == 16:
        want = np.clip(np.round(x * 32767.0), -32768, 32767) / 32768.0
    else:
        want = (np.clip(np.round(x * 127.0) + 128, 0, 255) - 128.0) / 128.0
    assert np.array_equal(got, want)


@SET
@given(spec=img_arrays)
def test_phash_deterministic_and_tolerant(spec):
    """phash64 is a pure function of the pixels (same array -> same
    hash, any encode route) and fits signed 64-bit."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.phash import phash64

    h, w, c, seed, _mode = spec
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    a, b = phash64(px), phash64(px.copy())
    assert a == b
    assert -(1 << 63) <= a < (1 << 63)


flac_specs = st.tuples(
    st.integers(min_value=1, max_value=400),        # frames
    st.integers(min_value=1, max_value=3),          # channels
    st.sampled_from([8, 16, 24, 32]),               # bits per sample
    st.sampled_from([16, 192, 4096]),               # block size
    st.sampled_from(["independent", "left_side", "right_side",
                     "mid_side", "auto"]),
    st.sampled_from([None, "verbatim", "lpc"]),
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
)


@SET
@given(spec=flac_specs)
def test_flac_pcm_roundtrip_property(spec):
    """Any signal shape, depth, blocking, stereo mode, and forced
    subframe type must round-trip bit-exactly through the FLAC codec —
    with the stream's own CRC-8/CRC-16/MD5 verification active."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        decode_flac_pcm,
        encode_flac_pcm,
    )

    n, c, bps, bs, mode, force, seed = spec
    if force == "lpc" and (n <= 2 or min(bs, n) <= 2 or n % bs in (1, 2)):
        return  # LPC needs order-2 warmup in every frame
    if force == "lpc" and bps == 32:
        return  # 32-bit residuals can exceed the escape field (raises)
    rng = np.random.RandomState(seed % 2**32)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    kind = seed % 4
    if kind == 0:
        x = rng.randint(lo, hi + 1, (n, c))
    elif kind == 1:
        x = np.clip(rng.randint(-50, 51, (n, c)).cumsum(axis=0), lo, hi)
    elif kind == 2:
        x = np.full((n, c), rng.randint(lo, hi + 1))
    else:  # spiky: drives Rice escape partitions
        x = np.where(rng.randint(0, 30, (n, c)) == 0,
                     rng.randint(lo, hi + 1, (n, c)), 1)
    mode2 = mode if c == 2 else "auto"
    p = encode_flac_pcm(x, bits_per_sample=bps, block_size=bs,
                        stereo_mode=mode2, force_subframe=force)
    got, rate, got_bps = decode_flac_pcm(p)
    assert got_bps == bps and got.shape == (n, c)
    assert (got == x).all()


vp8l_specs = st.tuples(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([3, 4]),
    st.integers(min_value=1, max_value=40),   # distinct-value richness
    st.integers(min_value=0, max_value=2**31 - 1),
)


@SET
@given(spec=vp8l_specs)
def test_vp8l_roundtrip_property(spec):
    """Any channel count, shape, and value richness must round-trip
    bit-exactly through the VP8L literal encoder + full decoder."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.vp8l import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    h, w, nc, nvals, seed = spec
    rng = np.random.RandomState(seed % 2**32)
    img = (rng.randint(0, nvals, (h, w, nc))
           * max(1, 255 // max(1, nvals - 1))).astype(np.uint8)
    got = decode_webp_lossless(encode_webp_lossless(img))
    exp = (img if nc == 4 else
           np.dstack([img, np.full((h, w), 255, np.uint8)]))
    assert (got == exp).all()


bmp_specs = st.tuples(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 4, 8]),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)


@SET
@given(spec=bmp_specs)
def test_bmp_indexed_roundtrip_property(spec):
    """Any palette depth x RLE flag x shape must round-trip through the
    indexed BMP codec (raw MSB/nibble packing, RLE escapes)."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_indexed,
    )

    h, w, bpp, rle, seed = spec
    if rle and bpp == 1:
        rle = False
    rng = np.random.RandomState(seed % 2**32)
    npal = 1 << bpp
    pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
    idx = rng.randint(0, npal, (h, w))
    p = encode_bmp_indexed(idx, pal, bpp=bpp, rle=rle)
    assert (decode_bmp_pixels(p) == pal[idx]).all()

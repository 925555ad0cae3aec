"""Tests for the training-data-pipeline operators (dedup, similarity, text,
multimodal) on the driver's documents/embeddings tables + synthetic rows."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, testdata_dir):
    return spark.read.parquet(f"{testdata_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, testdata_dir):
    return spark.read.parquet(f"{testdata_dir}/embeddings.parquet")


# ---------- text ----------


def test_token_counts(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import token_counts

    df = spark.createDataFrame(
        [(1, "Hello, world! 42 times"), (2, ""), (3, "  a  b  ")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"]) for r in token_counts(df).collect()}
    assert got[1] == (4, 7)  # Hello , world ! 4 2 times -> 7 bpe-ish
    assert got[2] == (0, 0)
    assert got[3] == (2, 2)


def test_language_id(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house"),
            (2, "il gatto e la volpe che non dorme"),
            (3, "der Hund ist nicht mit der Katze"),
            (4, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "it"
    assert got[3] == "de"
    assert got[4] == "und"


def test_quality_scores(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import quality_scores

    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog and runs away."), (2, "!!! ### $$$ %%%")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in quality_scores(df).collect()}
    assert got[1]["quality_score"] > got[2]["quality_score"]
    assert got[2]["punct_ratio"] > 0.5


def test_fingerprint_normalization(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["fp_md5"] for r in fingerprint(df).collect()}
    assert got[1] == got[2] != got[3]


# ---------- dedup ----------


def test_exact_dedup(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "Same Text!"), (2, "same text"), (3, "other")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["dup_count"] for r in exact_dedup(df).collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_lsh_finds_near_dups(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets slowly "
        "behind the green hills and the river flows quietly through the valley"
    )
    near = base.replace("quietly", "loudly")
    far = "completely different content about spark dataframes and shuffles at scale"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sigs = minhash_signatures(df)
    assert sigs.select(F.size("sig")).first()[0] == 32
    cands = lsh_candidate_pairs(sigs)
    pairs = {(r["a"], r["b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    verified = jaccard_verify(cands, df, threshold=0.5)
    vp = {(r["a"], r["b"]): r["jaccard"] for r in verified.collect()}
    assert (1, 2) in vp and vp[(1, 2)] > 0.7
    assert all(p == (1, 2) for p in vp)


def test_minhash_dedup_pipeline(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import minhash_dedup

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
        "xi omicron pi rho sigma tau upsilon phi chi psi omega end of greek"
    )
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("end", "fin")),
            (3, "unrelated text entirely about something else with many words"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(r["doc_id"] for r in minhash_dedup(df, threshold=0.5).collect())
    assert kept == [1, 3]


def test_simhash_near_pairs(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        simhash,
        simhash_near_pairs,
    )

    words = [f"word{i}" for i in range(60)]
    a = " ".join(words)
    b = " ".join(words[:-1] + ["changed"])  # 1 word differs -> small hamming
    c = " ".join(f"other{i}" for i in range(60))
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    sims = simhash(df)
    vals = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    assert vals[1] != vals[3]
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs(sims, max_hamming=8).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_simhash_md5_matches_python_oracle(spark):
    """The md5 hash path (DuckDB-reproducible) must equal a from-scratch
    Python simhash: same tokenization, first-16-hex big-endian token hash,
    per-bit votes, signed 64-bit reassembly."""
    import hashlib
    import re

    from routing_algorithm_for_graph_dbs_spark.operators.dedup import simhash

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "Pack my box, with FIVE dozen liquor jugs!"),
        (3, "a b a b c"),
        (4, "repeated repeated repeated words words"),
    ]

    def py_simhash(text: str) -> int:
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9]+", " ", text.lower())).strip()
        toks = set(norm.split(" "))
        votes = [0] * 64
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        out = sum(1 << b for b in range(64) if votes[b] > 0)
        return out - (1 << 64) if out >= (1 << 63) else out

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in simhash(df, hash_fn="md5").collect()}
    assert got == {k: py_simhash(t) for k, t in docs}


def test_simhash_null_text_keeps_row(spark):
    """NULL text must yield fingerprint 0, not a silently dropped row —
    downstream dedup joins have to see every document."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, "some real text here"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    for fn in ("xxhash64", "md5"):
        rows = {r["doc_id"]: r["simhash"] for r in simhash(df, hash_fn=fn).collect()}
        assert set(rows) == {1, 2, 3}, fn
        assert rows[2] == 0, fn


def test_simhash_hash_paths_same_structure(spark):
    """xxhash64 and md5 paths produce different fingerprints but the same
    near-duplicate structure (hamming ordering) on a near-dup corpus."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        simhash,
        simhash_near_pairs,
    )

    words = [f"word{i}" for i in range(60)]
    docs = [
        (1, " ".join(words)),
        (2, " ".join(words[:-1] + ["changed"])),
        (3, " ".join(f"other{i}" for i in range(60))),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for fn in ("xxhash64", "md5"):
        pairs = {
            (r["a"], r["b"])
            for r in simhash_near_pairs(
                simhash(df, hash_fn=fn), max_hamming=8
            ).collect()
        }
        assert (1, 2) in pairs and (1, 3) not in pairs, fn


# ---------- similarity ----------


def test_cosine_topk_matches_python(emb):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import cosine_topk

    rows = emb.limit(50).collect()
    q = list(rows[0]["embedding"])
    got = cosine_topk(emb, q, k=5).collect()

    # python oracle over the full table
    allrows = emb.collect()

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return d / (na * nb)

    expect = sorted(
        ((round(cos(r["embedding"], q), 6), r["vec_id"]) for r in allrows),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r["cosine_sim"], r["vec_id"]) for r in got] == [
        (pytest.approx(c, abs=2e-6), v) for c, v in expect
    ]
    assert got[0]["vec_id"] == rows[0]["vec_id"]  # self is most similar


def test_knn_join(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import knn_join

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    got = knn_join(df, df, k=1).collect()
    nn = {r["l_id"]: r["r_id"] for r in got}
    assert nn[1] == 2 and nn[2] == 1


def _clustered_vecs(n_clusters=4, per_cluster=25, dim=8):
    """Deterministic clustered corpus; key % n_clusters = cluster, so the
    seeded centroids (smallest keys) cover every cluster."""
    import random

    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    for i in range(n_clusters * per_cluster):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0, 0.05) for x in c]))
    return rows


def test_knn_join_ivf_full_probe_is_exact(spark):
    """nprobe == n_centroids must reproduce the exact broadcast join
    row-for-row (every cell probed -> every pair considered)."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        _knn_join_broadcast,
        knn_join_ivf,
    )

    df = spark.createDataFrame(_clustered_vecs(), ["vec_id", "embedding"])
    want = sorted(
        map(tuple, _knn_join_broadcast(df, df, 3, "embedding", "vec_id", True).collect())
    )
    got = sorted(
        map(tuple, knn_join_ivf(df, df, k=3, n_centroids=8, nprobe=8).collect())
    )
    assert got == want


def test_knn_join_ivf_recall_on_clustered_data(spark):
    """With clustered vectors and nprobe=2, the IVF tier recovers nearly all
    true neighbors (neighbors live in the probed home cell)."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        _knn_join_broadcast,
        knn_join_ivf,
    )

    df = spark.createDataFrame(_clustered_vecs(), ["vec_id", "embedding"])
    truth = {
        (r["l_id"], r["r_id"])
        for r in _knn_join_broadcast(df, df, 3, "embedding", "vec_id", True).collect()
    }
    approx = {
        (r["l_id"], r["r_id"])
        for r in knn_join_ivf(df, df, k=3, n_centroids=8, nprobe=2).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_knn_join_auto_dispatch(spark):
    """auto strategy: small right side -> exact broadcast result."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import knn_join

    df = spark.createDataFrame(_clustered_vecs(per_cluster=5), ["vec_id", "embedding"])
    auto = sorted(map(tuple, knn_join(df, df, k=2).collect()))
    forced = sorted(map(tuple, knn_join(df, df, k=2, strategy="broadcast").collect()))
    assert auto == forced


def test_ivf_assign_arrow_matches_expr(spark, monkeypatch):
    """The Arrow assignment/probe kernels (round 10) must be
    BIT-IDENTICAL to the expression path: the numpy kernel replays the
    fold's left-to-right accumulation and HALF-UP rounding, so the same
    vectors land in the same cells and the same probes fire — on int
    AND string key spaces."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        _ivf_probe_arrow,
        _collect_centroids,
        ivf_assign,
        knn_join_ivf,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_clustered_vecs(), ["vec_id", "embedding"])
    cents = _collect_centroids(df, 20, "embedding", "vec_id")
    expr = ivf_assign(df, cents=cents, method="expr")
    arrow = ivf_assign(df, cents=cents, method="arrow")
    assert expr.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(expr).count() == 0

    # probe kernel: cross-check membership against a driver-side
    # recompute of the same tie rule (rounded sims desc, cid asc)
    probed = _ivf_probe_arrow(df, cents, 3, "embedding", "vec_id")
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        _assign_sims_np,
        py_norm,
    )

    rows = df.collect()
    C = np.array([[float(x) for x in r["cv"]] for r in cents])
    cn = np.array([py_norm(r["cv"]) for r in cents])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    sims = _assign_sims_np(X, C, cn)
    order = np.argsort(-sims, axis=1, kind="stable")[:, :3]
    want = sorted(
        (rows[i]["vec_id"], cents[j]["cid"])
        for i in range(len(rows))
        for j in order[i]
    )
    got = sorted((r["l_id"], r["cell"]) for r in probed.collect())
    assert got == want

    # string key space through the arrow path end-to-end
    sdf = df.select(
        F.concat(F.lit("k"), F.lpad(F.col("vec_id").cast("string"), 4, "0"))
        .alias("vec_id"),
        "embedding",
    )
    scents = _collect_centroids(sdf, 20, "embedding", "vec_id")
    se = ivf_assign(sdf, cents=scents, method="expr")
    sa = ivf_assign(sdf, cents=scents, method="arrow")
    assert se.exceptAll(sa).count() == 0 and sa.exceptAll(se).count() == 0
    # and the full IVF join agrees across the dispatch threshold:
    # cents >= IVF_ASSIGN_ARROW_MIN_CENTROIDS takes the arrow kernels,
    # forcing the threshold sky-high takes the expression path — at
    # nprobe=n_centroids (full probe) both are the exact join, so the
    # result sets must be identical row-for-row
    from routing_algorithm_for_graph_dbs_spark.operators import similarity as sim

    arrow_full = sorted(
        map(tuple, knn_join_ivf(df, df, k=2, cents=cents, nprobe=20).collect())
    )
    assert len(arrow_full) > 0
    monkeypatch.setattr(sim, "IVF_ASSIGN_ARROW_MIN_CENTROIDS", 10**9)
    expr_full = sorted(
        map(tuple, knn_join_ivf(df, df, k=2, cents=cents, nprobe=20).collect())
    )
    assert arrow_full == expr_full


def test_knn_join_ivf_arrow_matches_expr(spark, monkeypatch):
    """The cogrouped pair kernel (round 10) must reproduce the
    expression-path result set row-for-row — including under forced
    hot-cell block splitting (the cogroup analog of AQE skew-split,
    which cannot reach cogroups)."""
    from routing_algorithm_for_graph_dbs_spark.operators import similarity as sim

    df = spark.createDataFrame(_clustered_vecs(), ["vec_id", "embedding"])
    cents = sim._collect_centroids(df, 20, "embedding", "vec_id")
    arrow = sorted(
        map(tuple, sim.knn_join_ivf(df, df, k=3, cents=cents, nprobe=4).collect())
    )
    assert len(arrow) > 0
    monkeypatch.setattr(sim, "IVF_ASSIGN_ARROW_MIN_CENTROIDS", 10**9)
    expr = sorted(
        map(tuple, sim.knn_join_ivf(df, df, k=3, cents=cents, nprobe=4).collect())
    )
    assert arrow == expr
    # force multi-block cells (7-row blocks over ~25-row cells)
    monkeypatch.setattr(sim, "IVF_ASSIGN_ARROW_MIN_CENTROIDS", 16)
    monkeypatch.setattr(sim, "KNN_CELL_BLOCK_ROWS", 7)
    blocked = sorted(
        map(tuple, sim.knn_join_ivf(df, df, k=3, cents=cents, nprobe=4).collect())
    )
    assert blocked == arrow


def test_knn_tiers_drop_zero_norm_identically(spark, monkeypatch):
    """A zero-norm embedding (cosine = 0/0 = NaN) must not break the
    cross-tier bit-identity contract (ADVICE r10): Spark's window ranks
    NaN largest under desc while numpy's argsort drops NaN > -inf, so
    every tier drops zero vectors up front — same results from the
    broadcast, ivf-expr, and ivf-arrow tiers, with the zero vector in
    none of them."""
    from routing_algorithm_for_graph_dbs_spark.operators import similarity as sim

    rows = _clustered_vecs()
    dim = len(rows[0][1])
    zid = 10_000
    rows = rows + [(zid, [0.0] * dim)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = sorted(
        map(
            tuple,
            sim._knn_join_broadcast(df, df, 3, "embedding", "vec_id", True).collect(),
        )
    )
    assert len(exact) > 0
    arrow = sorted(
        map(
            tuple,
            sim.knn_join_ivf(df, df, k=3, n_centroids=20, nprobe=20).collect(),
        )
    )
    monkeypatch.setattr(sim, "IVF_ASSIGN_ARROW_MIN_CENTROIDS", 10**9)
    expr = sorted(
        map(
            tuple,
            sim.knn_join_ivf(df, df, k=3, n_centroids=20, nprobe=20).collect(),
        )
    )
    assert exact == arrow == expr
    assert all(r[0] != zid and r[1] != zid for r in exact)


def test_round_half_up_fuzz_vs_spark(spark):
    """Randomized fuzz of the kernel rounding against the ACTUAL JVM's
    F.round (ADVICE r10): the exact-tie path assumes shortest-repr
    Double.toString (guaranteed JDK 19+, JDK-4511638); this test is the
    guard that the deployed JVM agrees on reachable values — uniform
    randoms across magnitudes plus constructed 7th-decimal midpoints
    (odd multiples of 5e-7, where the vectorized fast path alone
    diverges)."""
    import random

    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        _round_half_up_spark,
    )

    rng = random.Random(0xC0FFEE)
    vals = []
    for _ in range(1500):
        mag = 10.0 ** rng.uniform(-8, 3)
        vals.append(rng.uniform(-1.0, 1.0) * mag)
    # constructed representation-tie candidates: (2k+1) * 5e-7
    for _ in range(1500):
        k = rng.randrange(1, 2_000_000)
        vals.append((2 * k + 1) * 5e-7 * (1 if rng.random() < 0.5 else -1))
    got = list(_round_half_up_spark(np.array(vals)))
    rows = (
        spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()
    )
    want = [r["r"] for r in rows]
    bad = [(v, g, w) for v, g, w in zip(vals, got, want) if g != w]
    assert not bad, bad[:10]


def test_round_half_up_spark_matches_f_round(spark):
    """The kernels' rounding must equal Spark's F.round on DoubleType —
    BigDecimal.valueOf (shortest repr) + HALF_UP — including
    representation-tie values where floor(|x|*1e6+0.5) alone diverges
    (e.g. 0.0001245 whose *1e6 product computes below the midpoint)."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        _round_half_up_spark,
    )

    vals = [
        0.0001245, -0.0001245, 0.0078125, -0.0078125, 1.9999995,
        0.1234565, -0.9999995, 0.5, 0.1234567499999, 2.0 ** -7,
        0.95, 0.9499996, -0.333333, 123.4567895,
    ]
    got = list(_round_half_up_spark(np.array(vals)))
    rows = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.round("x", 6).alias("r")
    ).collect()
    want = [r["r"] for r in rows]
    assert got == want, list(zip(vals, got, want))


def test_embedding_near_dup_pairs(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    pairs = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


# ---------- multimodal ----------


def _media_df(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", b"\x89PNGfakebytes1", "image/png", (640, 480, 3, None, None)),
        (2, "image", b"\x89PNGfakebytes2", "image/png", (800, 600, 3, None, None)),
        (3, "video", b"\x00\x00fakevid", "video/mp4", (1920, 1080, 3, 3500, None)),
        (4, "audio", b"RIFFfake", "audio/wav", (None, None, 1, 2000, 44100)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_deterministic(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import image_features

    media = _media_df(spark)
    a = {r["media_id"]: r.asDict() for r in image_features(media).collect()}
    b = {r["media_id"]: r.asDict() for r in image_features(media).collect()}
    assert a == b
    assert a[1]["n_bytes"] == 14
    assert 64 <= a[1]["width"] < 256
    assert a[1]["decoder"] == "fake"


def test_image_features_strict_raises(spark):
    from py4j.protocol import Py4JJavaError

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import image_features

    media = _media_df(spark)
    with pytest.raises(Exception) as ei:
        image_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real decode" in str(ei.value)


def test_bmp_decode_golden():
    """Real codec on hand-computed bytes: a 2x2 RGB image whose Rec.601
    luma is known exactly, plus a 3-px-wide image exercising the 4-byte
    row padding path (3*3=9 bytes -> 12-byte rows)."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    # white, black / red, blue
    px = np.array(
        [[[255, 255, 255], [0, 0, 0]], [[255, 0, 0], [0, 0, 255]]], np.uint8
    )
    w, h, nc, luma = decode_bmp(encode_bmp(px))
    assert (w, h, nc) == (2, 2, 3)
    # mean luma = (255 + 0 + 0.299*255 + 0.114*255) / 4 / 255
    assert luma == round((1.0 + 0.0 + 0.299 + 0.114) / 4, 6)

    px3 = np.full((2, 3, 3), 128, np.uint8)  # width 3 -> padded rows
    payload = encode_bmp(px3)
    assert len(payload) == 54 + 2 * 12
    assert decode_bmp(payload) == (3, 2, 3, round(128 / 255.0, 6))

    # asymmetric pixel placement proves row order + BGR channel order:
    # only the TOP-LEFT pixel is pure red
    px4 = np.zeros((2, 2, 3), np.uint8)
    px4[0, 0] = (255, 0, 0)
    enc = encode_bmp(px4)
    w, h, nc, luma = decode_bmp(enc)
    assert luma == round(0.299 / 4, 6)
    # bottom-up layout: first stored row is the BOTTOM row (all zeros),
    # and the red pixel's bytes are BGR = 00 00 FF in the second row
    body = enc[54:]
    assert body[:8] == bytes(8)
    assert body[8:11] == b"\x00\x00\xff"


def test_bmp_decode_rejects_non_bmp():
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import decode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"\x89PNG not a bmp at all, just padding to 54+ bytes....")
    # JPEG-passthrough BMP (compression 4): the honest codec boundary
    # (round 12 moved 16-bit / BI_BITFIELDS decode OFF the boundary)
    import struct as _struct

    hdr = _struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + _struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 4, 0, 0, 0, 0, 0
    )
    with _pytest.raises(NotImplementedError):
        decode_bmp(hdr + b"\x00" * 16)
    # unknown info-header size: boundary (BITMAPCOREHEADER itself
    # decodes since round 12)
    hdr = _struct.pack("<2sIHHI", b"BM", 54, 0, 0, 34) + _struct.pack(
        "<IiiHHIIiiII", 20, 2, 2, 1, 24, 0, 0, 0, 0, 0, 0
    )
    with _pytest.raises(NotImplementedError):
        decode_bmp(hdr + b"\x00" * 44)
    # malformed BI_BITFIELDS masks raise loudly rather than mis-decode
    def _bf_hdr(bpp, masks):
        return (
            _struct.pack("<2sIHHI", b"BM", 66, 0, 0, 66)
            + _struct.pack(
                "<IiiHHIIiiII", 40, 2, 2, 1, bpp, 3, 0, 0, 0, 0, 0
            )
            + _struct.pack("<III", *masks)
        )

    for masks, why in [
        ((0, 0x3E0, 0x1F), "zero mask"),
        ((0x7C00, 0x7C00, 0x1F), "overlap"),
        ((0x5400, 0x3E0, 0x1F), "non-contiguous"),
        ((0x1F0000, 0x3E0, 0x1F), "beyond 16 bpp"),
    ]:
        with _pytest.raises(ValueError):
            decode_bmp(_bf_hdr(16, masks) + b"\x00" * 16), why


def test_bmp_core_header_roundtrip():
    """Round 12: the 12-byte OS/2 BITMAPCOREHEADER decodes for real —
    u16 dimensions, bottom-up rows, and 3-byte BGR palette TRIPLES
    (the field-width differences that kept it on the boundary) — for
    24-bit and every palette depth, via the encode_bmp_core twin."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        decode_bmp,
        decode_bmp_pixels,
        encode_bmp_core,
    )

    rng = _np.random.RandomState(21)
    # 24-bit with asymmetric placement (row order + channel order)
    px = _np.zeros((2, 3, 3), _np.uint8)
    px[0, 0] = (255, 0, 0)
    enc = encode_bmp_core(px)
    assert (decode_bmp_pixels(enc) == px).all()
    # first stored row is the BOTTOM row; red pixel stored BGR
    assert enc[14 + 12 : 14 + 12 + 9] == bytes(9)
    w, h, nc, luma = decode_bmp(enc)
    assert (w, h) == (3, 2) and luma == round(0.299 / 6, 6)

    for bpp in (1, 4, 8):
        npal = 1 << bpp
        pal = rng.randint(0, 256, (npal, 3))
        for (hh, ww) in [(5, 7), (3, 1), (9, 13)]:
            idx = rng.randint(0, npal, (hh, ww))
            p = encode_bmp_core(idx, pal, bpp=bpp)
            got = decode_bmp_pixels(p)
            assert (got == _np.asarray(pal, _np.uint8)[idx]).all(), (bpp, hh, ww)
    for (hh, ww) in [(4, 5), (2, 2)]:
        rgb = rng.randint(0, 256, (hh, ww, 3), dtype=_np.uint8)
        assert (decode_bmp_pixels(encode_bmp_core(rgb)) == rgb).all()


def test_bmp_bitfields_roundtrip():
    """Round 12: masked BMP decode is REAL — implicit RGB555, explicit
    RGB565, and 32-bit 10-10-10 layouts round-trip through
    encode_bmp_bitfields with the closed-form (q*255 + top//2)//top
    channel expansion, including odd widths (row padding) and a
    top-down check via the negative-height path."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_bitfields,
    )

    rng = _np.random.RandomState(12)
    layouts = [
        (16, None, (31, 31, 31)),
        (16, (0xF800, 0x07E0, 0x001F), (31, 63, 31)),
        (16, (0x7C00, 0x03E0, 0x001F), (31, 31, 31)),
        (32, (0x3FF00000, 0x000FFC00, 0x000003FF), (1023, 1023, 1023)),
        # alpha-style layout: masks need not cover every bit
        (32, (0x00FF0000, 0x0000FF00, 0x000000FF), (255, 255, 255)),
    ]
    for bpp, masks, tops in layouts:
        for (h, w) in [(5, 7), (16, 32), (3, 1), (9, 13)]:
            raw = _np.stack(
                [rng.randint(0, t + 1, (h, w)) for t in tops], axis=-1
            )
            p = encode_bmp_bitfields(raw, bpp=bpp, masks=masks)
            got = decode_bmp_pixels(p)
            exp = _np.stack(
                [
                    (raw[..., i] * 255 + tops[i] // 2) // tops[i]
                    for i in range(3)
                ],
                axis=-1,
            ).astype(_np.uint8)
            assert got.shape == (h, w, 3), (bpp, masks, h, w)
            assert (got == exp).all(), (bpp, masks, h, w)
    # asymmetric placement proves row order survives the masked path:
    # red-ish only at TOP-LEFT, everything else black
    raw = _np.zeros((2, 2, 3), _np.uint32)
    raw[0, 0, 0] = 31
    p = encode_bmp_bitfields(raw, bpp=16)
    got = decode_bmp_pixels(p)
    assert got[0, 0, 0] == 255 and got.sum() == 255


def test_bmp_palette_rle_roundtrip():
    """Round 11: palette BMP decode is REAL — 1/4/8-bpp raw rows (MSB
    bit order, high-nibble-first, 4-byte row padding, bottom-up) and
    RLE8/RLE4 escape streams round-trip bit-exactly through
    encode_bmp_indexed."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_indexed,
    )

    rng = _np.random.RandomState(11)
    for bpp in (1, 4, 8):
        npal = 1 << bpp
        pal = rng.randint(0, 256, (npal, 3))
        for rle in (False, True):
            if rle and bpp == 1:
                continue
            for (h, w) in [(5, 7), (16, 32), (3, 1), (9, 13)]:
                idx = rng.randint(0, npal, (h, w))
                p = encode_bmp_indexed(idx, pal, bpp=bpp, rle=rle)
                got = decode_bmp_pixels(p)
                exp = _np.asarray(pal, _np.uint8)[idx]
                assert got.shape == (h, w, 3), (bpp, rle, h, w)
                assert (got == exp).all(), (bpp, rle, h, w)


def test_bmp_rle_absolute_delta_and_guards():
    """Hand-built RLE streams exercise the escapes the run-length
    encoder never emits: absolute mode (2-byte-aligned literal runs)
    and delta jumps (skipped pixels stay index 0); malformed streams
    raise instead of wrapping around."""
    import struct as _struct

    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        decode_bmp_pixels,
    )

    def rle8_bmp(data: bytes, w: int, h: int, npal: int = 4) -> bytes:
        quads = bytes(
            v for i in range(npal) for v in (i * 10, i * 10, i * 10, 0)
        )
        off = 54 + len(quads)
        hdr = _struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
        info = _struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 0, 0, npal, 0
        )
        return hdr + info + quads + data

    # 4x2 bottom-up: row0 (bottom) = absolute [1,2,3] + run of 1x0;
    # row1 (top) = delta (2,0) then run 2x3 -> [0,0,3,3]
    data = bytes(
        [0, 3, 1, 2, 3, 0,      # absolute 3 literals + pad byte
         1, 0,                  # run 1 of index 0
         0, 0,                  # end of line
         0, 2, 2, 0,            # delta +2,+0
         2, 3,                  # run 2 of index 3
         0, 1]                  # end of data
    )
    px = decode_bmp_pixels(rle8_bmp(data, 4, 2))
    # palette grays: index i -> i*10
    exp = _np.array(
        [[[0] * 3, [0] * 3, [30] * 3, [30] * 3],      # top row (delta gap)
         [[10] * 3, [20] * 3, [30] * 3, [0] * 3]],    # bottom row
        dtype=_np.uint8,
    )
    assert (px == exp).all()

    with _pytest.raises(ValueError, match="end-of-data"):
        decode_bmp_pixels(rle8_bmp(bytes([2, 1]), 4, 2))
    with _pytest.raises(ValueError, match="overflows"):
        decode_bmp_pixels(rle8_bmp(bytes([5, 1, 0, 1]), 4, 2))
    with _pytest.raises(ValueError, match="delta"):
        decode_bmp_pixels(rle8_bmp(bytes([0, 2, 9, 9, 0, 1]), 4, 2))
    # index outside a truncated palette
    p = rle8_bmp(bytes([1, 3, 0, 1]), 1, 1, npal=2)
    with _pytest.raises(ValueError, match="palette"):
        decode_bmp_pixels(p)


def test_image_features_real_bmp_in_pipeline(spark):
    """End-to-end through the Arrow-batched mapInPandas path: BMP rows are
    really decoded (decoder='bmp', true dimensions), non-BMP rows keep the
    deterministic fake, in the same DataFrame — and strict=True no longer
    raises for the BMP rows alone."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_features,
    )

    bmp = encode_bmp(np.full((4, 7, 3), 200, np.uint8))
    rows = [
        (1, "image", bmp, "image/bmp", (7, 4, 3, None, None)),
        (2, "image", b"\x89PNGfakebytes2", "image/png", (800, 600, 3, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in image_features(media).collect()}
    assert got[1]["decoder"] == "bmp"
    assert (got[1]["width"], got[1]["height"]) == (7, 4)
    assert got[1]["mean_luma"] == round(200 / 255.0, 6)
    assert got[2]["decoder"] == "fake"

    strict_got = image_features(
        media.filter(media.mime == "image/bmp"), strict=True
    ).collect()
    assert len(strict_got) == 1 and strict_got[0]["decoder"] == "bmp"


def test_frame_sample_plan(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        frame_sample_plan,
    )

    media = _media_df(spark)
    got = frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in got] == [
        (3, 0),
        (3, 1000),
        (3, 2000),
        (3, 3000),
    ]


def test_media_stats_prunes_payload(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import media_stats

    media = _media_df(spark)
    stats = media_stats(media)
    assert "payload" not in str(stats.schema)
    got = {r["kind"]: r["n"] for r in stats.collect()}
    assert got == {"image": 2, "video": 1, "audio": 1}


# ---------- winnowing / IVF / media builder (added with driver queries) ----------


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: docs sharing a substring of length >= k+w-1
    (= 11 chars here) share at least one fingerprint; tiny docs yield none."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import winnow_fingerprints

    shared = "identical middle segment here"
    df = spark.createDataFrame(
        [
            (1, f"left prefix {shared} right suffix"),
            (2, f"completely other opening {shared} and closing words"),
            (3, "tiny"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=8, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    # short docs still emit >= 1 fingerprint (winnowing's per-doc guarantee),
    # so short exact duplicates remain detectable
    assert len(by_doc[3]) == 1


def test_ivf_topk_contains_query_and_respects_probe(emb):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    approx = ivf_topk(emb, list(q), k=10, n_centroids=8, nprobe=2).collect()
    assert approx[0]["vec_id"] == 0 and approx[0]["cosine_sim"] == 1.0
    probed = {r["centroid_id"] for r in approx}
    assert len(probed) <= 2, "results must come from <= nprobe buckets"
    # recall vs exact baseline is > 0 and every approx hit is a real vector
    exact = {r["vec_id"] for r in cosine_topk(emb, list(q), k=10).collect()}
    assert {r["vec_id"] for r in approx} & exact


def test_media_from_documents_schema_and_kinds(docs):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        media_from_documents,
    )

    media = media_from_documents(docs)
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.filter(F.col("kind") == "image").first()
    assert row["meta"]["width"] is not None and row["meta"]["duration_ms"] is None
    assert isinstance(row["payload"], bytearray | bytes)


# ---------- as-of / range joins ----------


def test_asof_join_backward_and_forward(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "u", 5), (4, "v", 100)],
        ["lid", "k", "t"],
    )
    right = spark.createDataFrame(
        [(10, "u", 50), (11, "u", 100), (12, "u", 240), (13, "w", 1)],
        ["rid", "k", "t"],
    )
    back = {
        r["lid"]: r["rid_r"]
        for r in asof_join(left, right, "k", "t", "t", "backward", bucket_s=60).collect()
    }
    # lid1 t=100 -> rid11 (exact tie <=); lid2 t=250 -> rid12; lid3 t=5 -> none; lid4 other key -> none
    assert back == {1: 11, 2: 12}
    fwd = {
        r["lid"]: r["rid_r"]
        for r in asof_join(left, right, "k", "t", "t", "forward", bucket_s=60).collect()
    }
    # lid1 t=100 -> rid11 (>=); lid2 t=250 -> none; lid3 t=5 -> rid10
    assert fwd == {1: 11, 3: 10}


def test_asof_join_duplicate_left_rows_both_match(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u", 100), ("u", 100)], ["k", "t"])
    right = spark.createDataFrame([(7, "u", 90)], ["rid", "k", "t"])
    got = asof_join(left, right, "k", "t", "t", "backward", bucket_s=50).collect()
    assert len(got) == 2 and all(r["rid_r"] == 7 for r in got)


def test_range_join_bounds_inclusive(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.asof import range_join

    left = spark.createDataFrame([(1, "u", 100)], ["lid", "k", "t"])
    right = spark.createDataFrame(
        [(10, "u", 100), (11, "u", 110), (12, "u", 150), (13, "u", 151), (14, "v", 120)],
        ["rid", "k", "t"],
    )
    got = sorted(
        r["rid_r"]
        for r in range_join(left, right, "k", "t", "t", lo=1, hi=50, bucket_s=30).collect()
    )
    assert got == [11, 12]  # 100 excluded (lo=1), 151 excluded (hi=50), other key excluded


def test_audio_features_strict_raises(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        media_from_documents,
    )

    docs = spark.createDataFrame([(1, "x", 1)], ["doc_id", "text", "n_chars"])
    media = media_from_documents(docs)
    with pytest.raises(Exception, match="NotImplementedError|librosa"):
        audio_features(media, strict=True).collect()


def test_resize_plan_aspect_and_clamp(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import resize_plan

    media = spark.createDataFrame(
        [
            (1, "image", {"width": 512, "height": 256}),
            (2, "image", {"width": 100, "height": 50}),
            (3, "video", {"width": 999, "height": 999}),
        ],
        "media_id long, kind string, meta map<string,int>",
    ).select(
        "media_id",
        "kind",
        F.struct(
            F.col("meta")["width"].alias("width"), F.col("meta")["height"].alias("height")
        ).alias("meta"),
    )
    got = {r["media_id"]: (r["target_w"], r["target_h"]) for r in resize_plan(media).collect()}
    assert got[1] == (256, 128)      # downscaled, aspect preserved
    assert got[2] == (100, 50)       # under max_dim: untouched
    assert 3 not in got              # non-image filtered out


def test_kmeans_refined_ivf_recall_not_worse(emb):
    """Two Lloyd iterations must not hurt (and typically improve) IVF recall
    vs the seeded centroids, measured against the exact top-k baseline over
    several query vectors."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_refine_centroids,
    )

    refined = kmeans_refine_centroids(emb, n_centroids=8, iterations=2)
    assert len(refined) == 8 and len(refined[0]["cv"]) == 64

    def recall(cents):
        hits = total = 0
        for qid in (0, 17, 101):
            q = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
            exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
            approx = {
                r["vec_id"]
                for r in ivf_topk(emb, q, k=10, n_centroids=8, nprobe=2, cents=cents).collect()
            }
            hits += len(exact & approx)
            total += len(exact)
        return hits / total

    assert recall(refined) >= recall(None) - 1e-9


def test_dedup_canonical_transitive_clusters(spark):
    """dd_canonical semantics: chained near-dups A~B, B~C land in ONE
    cluster under the min doc_id even when A~C itself never passes the
    Jaccard threshold (the greedy minhash_dedup drop can't see that)."""
    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
        "xi omicron pi rho sigma tau upsilon phi chi psi omega one two three"
    )
    # chain: each step rewrites 3 more words, so ends are farther apart
    mid = base.replace("one two three", "uno dos tres")
    far = mid.replace("alpha beta gamma", "aleph bet gimel")
    df = spark.createDataFrame(
        [(1, base), (2, mid), (3, far), (9, "totally unrelated words here "
                                            "about completely other topics")],
        ["doc_id", "text"],
    )
    # explicit candidates (not LSH) so the test pins verification +
    # closure semantics, not banding recall
    cands = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["a", "b"])
    pairs = jaccard_verify(cands, df, threshold=0.7)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got and (2, 3) in got and (1, 3) not in got

    comp = connected_components(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    canon = (
        df.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("canon_id"),
        )
    )
    out = {r["doc_id"]: r["canon_id"] for r in canon.collect()}
    assert out == {1: 1, 2: 1, 3: 1, 9: 9}


def test_quantize_int8_roundtrip_error_and_range(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        quantize_int8,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = quantize_int8(emb).select("vec_id", "embedding", "q8", "q_scale")
    rows = out.collect()
    assert rows
    for r in rows[:50]:
        assert all(-127 <= q <= 127 for q in r["q8"])
        # dequantized values stay within half-a-step of the original
        step = r["q_scale"]
        for x, q in zip(r["embedding"], r["q8"]):
            assert abs(q * step - x) <= step / 2 + 1e-12


def test_quantize_int8_zero_vector(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (r["q8"], r["q_scale"]) for r in quantize_int8(
        df).collect()}
    assert got[1] == ([0, 0, 0], 0.0)
    assert got[2][0] == [64, -127, 32]  # scale 2/127; 1.0 -> 63.5 -> floor(64)


def test_random_projection_preserves_relative_distances(spark):
    """JL sanity: on a clustered dataset, projected within-cluster distances
    stay below projected cross-cluster distances (not a tight bound — a
    smoke check that the projection is a linear map, not noise)."""
    import random

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        random_projection,
    )

    rng = random.Random(7)
    centers = [[10.0 * (1 if i == j else 0) for j in range(16)] for i in range(3)]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(5):
            rows.append((vid, ci, [x + rng.gauss(0, 0.5) for x in c]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, cl int, embedding array<float>")
    proj = {r["vec_id"]: (r["cl"], r["proj"]) for r in random_projection(
        df, out_dim=6).collect()}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    within, across = [], []
    ids = sorted(proj)
    for i in ids:
        for j in ids:
            if i < j:
                (ca, pa), (cb, pb) = proj[i], proj[j]
                (within if ca == cb else across).append(d2(pa, pb))
    assert max(within) < min(across)


def test_scrub_text_masks_and_counts(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import scrub_text

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io or visit https://x.io/p?u=q@r.st ok"),
            (2, "no contacts here"),
            (3, "http://plain.example/path and bob@site.org"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in scrub_text(df).collect()}
    # URL swallows the query-string address; only the bare email is masked
    assert (got[1]["n_urls"], got[1]["n_emails"]) == (1, 1)
    assert got[1]["scrubbed"] == "mail <EMAIL> or visit <URL> ok"
    assert (got[2]["n_urls"], got[2]["n_emails"]) == (0, 0)
    assert got[2]["scrubbed"] == "no contacts here"
    assert got[3]["scrubbed"] == "<URL> and <EMAIL>"


def test_scrub_text_vertical_tab_parity_chars(spark):
    """The URL pattern must use an explicit whitespace class: Java's \\s
    includes \\x0B, RE2's does not — with [^\\s] the two engines would stop
    a URL at different characters. Both must stop at \\x0B."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import scrub_text

    df = spark.createDataFrame(
        [(1, "go https://x.io/a\x0bmore end")], ["doc_id", "text"]
    )
    got = scrub_text(df).first()
    assert got["scrubbed"] == "go <URL>\x0bmore end"
    assert got["n_urls"] == 1


# ---------- round 3: repetition, decontamination, semdedup ----------


def test_repetition_scores_lines_and_paragraphs(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        repetition_scores,
    )

    df = spark.createDataFrame(
        [
            # lines "dup" (3), "dup" (3), "abcd" (4), "ef" (2) = 12 chars:
            # dup_line_frac = 1/4, dup_line_char_frac = 3/12
            (1, "dup\ndup\nabcd\n\nef"),
            (2, "a\nb\nc"),          # no repetition
            (3, ""),                  # no parts at all -> 0.0 everywhere
            (4, "para\n\npara\n\nx"),  # paragraphs: para, para, x
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()
    }
    assert got[1]["dup_line_frac"] == round(1 / 4, 6)
    assert got[1]["dup_line_char_frac"] == round(3 / 12, 6)
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["dup_line_char_frac"] == 0.0
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["dup_para_frac"] == 0.0
    # doc 4 paragraphs: "para", "para", "x" -> 1/3 dup, 4/9 chars
    assert got[4]["dup_para_frac"] == round(1 / 3, 6)
    assert got[4]["dup_para_char_frac"] == round(4 / 9, 6)
    # doc 4 lines (\n splits single newlines too): para, para, x
    assert got[4]["dup_line_frac"] == round(1 / 3, 6)


def test_repetition_scores_word_parts(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        repetition_scores,
    )

    df = spark.createDataFrame(
        [(1, "spark spark flink beam"), (2, "one two three")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_scores(df, parts={"word": r"\s+"}).collect()
    }
    # 4 words, 1 repeated occurrence; chars 5+5+5+4=19, dup chars 5
    assert got[1]["dup_word_frac"] == 0.25
    assert got[1]["dup_word_char_frac"] == round(5 / 19, 6)
    assert got[2]["dup_word_frac"] == 0.0


def test_repetition_scores_no_shuffle_plan(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        repetition_scores,
    )

    df = spark.createDataFrame([(1, "a\nb")], ["doc_id", "text"])
    plan = repetition_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan-speed: pure array expressions


def test_top_ngram_fraction(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        top_ngram_fraction,
    )

    df = spark.createDataFrame(
        [
            # bigrams: "ab cd","cd ab","ab cd" -> top "ab cd" 2/3
            (1, "ab cd ab cd"),
            (2, "one"),      # no bigrams
            (3, ""),          # empty
            (4, "x y"),       # single bigram -> 1.0
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in top_ngram_fraction(df).collect()}
    assert got[1]["n_grams"] == 3
    assert got[1]["top_ngram_frac"] == round(2 / 3, 6)
    assert got[2] == {"doc_id": 2, "n_grams": 0, "top_ngram_frac": 0.0}
    assert got[3]["n_grams"] == 0
    assert got[4]["top_ngram_frac"] == 1.0


def test_decontaminate_flags_and_self_exclusion(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.decontam import (
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "totally unrelated text about spark pipelines here"),
            (3, "quick brown fox appears in this training document"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox story"), (1, "the quick brown fox jumps")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in decontaminate(docs, bench, n=3).collect()}
    # doc 1 shares 3-grams with bench 100 ("quick brown fox") and with
    # bench 1 — but bench 1 IS doc 1, so only bench 100 counts
    assert 1 in got and got[1]["n_bench_docs"] == 1
    assert got[1]["n_shared_grams"] == 1  # "quick brown fox"
    # doc 3 contains "quick brown fox" -> contaminated via both bench docs
    assert got[3]["n_bench_docs"] == 2
    # doc 2 shares nothing -> absent (clean)
    assert 2 not in got


def test_decontaminate_broadcasts_benchmark(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.decontam import (
        decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4"), (2, "w5 w6 w7")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "w1 w2 w3")], ["doc_id", "text"])
    plan = (
        decontaminate(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles to join


def test_semdedup_drops_higher_key_near_dups(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid/cluster A
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid/cluster B
        (10, [0.99, 0.1, 0.0, 0.0]),  # near 0 -> cluster A, near-dup of 0
        (11, [0.98, 0.12, 0.0, 0.0]), # near-dup of 0 and 10 -> dropped
        (20, [0.1, 0.99, 0.0, 0.0]),  # cluster B, near-dup of 1
        (30, [0.0, 0.0, 1.0, 0.0]),   # orthogonal: same cluster as its
                                      # best centroid but below threshold
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: r.asDict()
        for r in semdedup(emb, threshold=0.9, n_centroids=2).collect()
    }
    assert len(got) == len(rows)  # every input vector gets a verdict
    assert got[0]["kept"] and got[1]["kept"]  # lowest keys survive
    assert not got[10]["kept"]  # cos(0,10) > 0.9
    assert not got[11]["kept"]
    assert not got[20]["kept"]
    assert got[30]["kept"]  # no near-dup above threshold


def test_semdedup_keeps_one_representative_per_neighborhood(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        cosine,
        semdedup,
    )

    # three copies of the same direction: only the min key survives
    emb = spark.createDataFrame(
        [(5, [1.0, 0.0]), (7, [1.0, 0.001]), (9, [0.999, 0.0])],
        ["vec_id", "embedding"],
    )
    got = semdedup(emb, threshold=0.99, n_centroids=1).collect()
    kept = sorted(r["vec_id"] for r in got if r["kept"])
    assert kept == [5]


def test_semdedup_hot_cell_split_warns_and_is_exact(spark):
    """Deliberately skewed corpus — every vector lands in one IVF cell,
    blowing the (tiny, forced) pair budget: the guardrail must WARN, split
    the cell into blocks, and still produce the bit-identical kept set of
    the unsplit join (the blocked all-pairs meets every (k, k2) exactly
    once)."""
    import warnings

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import semdedup

    import math
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        # 20 near-dup triples (same direction + tiny jitter) so the kept
        # set is non-trivial, all in ONE cluster (n_centroids=1)
        base = [math.cos(i // 3), math.sin(i // 3)]
        rows.append((i, [base[0] + rng.uniform(-1e-4, 1e-4), base[1]]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # budget 100 pairs -> max_side 10 -> s = ceil(60/10) = 6 blocks
        split = semdedup(emb, threshold=0.999, n_centroids=1, pair_budget=100)
        split_kept = sorted(r["vec_id"] for r in split.collect() if r["kept"])
        assert any("pair budget" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plain = semdedup(emb, threshold=0.999, n_centroids=1)
        plain_kept = sorted(r["vec_id"] for r in plain.collect() if r["kept"])
        assert not any("pair budget" in str(x.message) for x in w)

    assert split_kept == plain_kept
    assert 0 < len(split_kept) < 60  # non-trivial: some dropped, some kept


def test_semdedup_pair_methods_identical(spark):
    """The round-14 Arrow pair kernel must reproduce the Catalyst join
    formulation's verdicts BIT-IDENTICALLY — including near the rounded
    cosine boundary and under hot-cell block splitting (the kernel replays
    the fold's IEEE accumulation order and Spark's HALF-UP rounding)."""
    import math
    import random
    import warnings

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import semdedup

    rng = random.Random(23)
    rows = []
    for i in range(120):
        # clusters of jittered directions, jitter spanning the 0.999
        # threshold so some pairs land right at the rounding boundary
        base = [math.cos(i // 4), math.sin(i // 4), 0.1 * (i % 4)]
        rows.append(
            (i, [x + rng.uniform(-2e-3, 2e-3) for x in base])
        )
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def verdicts(pair_method, **kw):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = semdedup(
                emb, threshold=0.999, n_centroids=4,
                pair_method=pair_method, **kw,
            )
            return sorted(map(tuple, out.collect()))

    assert verdicts("arrow") == verdicts("join")
    # and under forced hot-cell splitting
    assert verdicts("arrow", pair_budget=200) == verdicts("join", pair_budget=200)
    # string key space exercises the lexicographic comparison path
    semb = spark.createDataFrame(
        [(f"id{i:03d}", v) for i, v in rows], ["vec_id", "embedding"]
    )

    def sverd(pm):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return sorted(
                map(tuple, semdedup(semb, 0.999, 4, pair_method=pm).collect())
            )

    assert sverd("arrow") == sverd("join")


def test_sentence_dedup_stats(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        sentence_dedup_stats,
    )

    boiler = "All rights reserved by the publisher"  # 36 chars, shared
    rows = [
        (1, f"Unique opening sentence number one here. {boiler}."),
        (2, f"A different unique second sentence text. {boiler}."),
        (3, "Totally unrelated third document sentence."),
        (4, "short. tiny."),  # every sentence under min_len -> no output row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in sentence_dedup_stats(df).collect()}

    assert set(got) == {1, 2, 3}  # doc 4 has no qualifying sentences
    for d in (1, 2):
        assert got[d]["n_sentences"] == 2
        assert got[d]["n_dup_sentences"] == 1
        assert got[d]["dup_sentence_frac"] == 0.5
        # char fraction weighs the boilerplate's length, not just its count
        assert 0 < got[d]["dup_char_frac"] < 1
    assert got[3]["n_dup_sentences"] == 0
    assert got[3]["dup_sentence_frac"] == 0.0


def test_sentence_dedup_case_insensitive(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        sentence_dedup_stats,
    )

    df = spark.createDataFrame(
        [(1, "The Same Boilerplate Sentence Here."),
         (2, "the same boilerplate sentence here.")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in sentence_dedup_stats(df).collect()}
    assert got[1]["n_dup_sentences"] == 1 and got[2]["n_dup_sentences"] == 1


def test_chunk_documents_boundaries(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import chunk_documents

    rows = [
        (1, "a" * 10),        # <= chunk_size -> exactly one chunk
        (2, "b" * 100),       # exact multiple coverage
        (3, ""),              # empty text -> one empty chunk
        (4, "c" * 101),       # one char past a boundary -> extra chunk
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=100, overlap=20)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    for d in got:
        got[d].sort(key=lambda r: r["chunk_id"])

    assert [r["chunk_len"] for r in got[1]] == [10]
    assert [r["chunk_len"] for r in got[2]] == [100]
    assert [r["chunk_len"] for r in got[3]] == [0]
    # stride 80: chunk 0 covers [0,100), chunk 1 covers [80,101) -> len 21
    assert [(r["chunk_start"], r["chunk_len"]) for r in got[4]] == [(0, 100), (80, 21)]
    # overlap reconstruction: dropping the first `overlap` chars of every
    # non-first chunk and concatenating yields the original text
    full = got[4][0]["chunk_text"] + "".join(r["chunk_text"][20:] for r in got[4][1:])
    assert full == "c" * 101


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=64, overlap=64)


def test_sample_negatives_deterministic_and_valid(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        sample_negatives,
    )

    df = spark.createDataFrame([(i * 7,) for i in range(50)], ["vec_id"])
    a = sorted(map(tuple, sample_negatives(df, k=3).collect()))
    b = sorted(map(tuple, sample_negatives(df, k=3).collect()))
    assert a == b  # same draw every run
    keys = {i * 7 for i in range(50)}
    for anchor, rank, neg in a:
        assert neg in keys and neg != anchor and 0 <= rank < 3
    # every anchor yields k or k-1 rows (k-1 only on a self-collision)
    from collections import Counter

    per_anchor = Counter(r[0] for r in a)
    assert set(per_anchor) == keys
    assert all(c in (2, 3) for c in per_anchor.values())
    # different salt -> different draw
    c = sorted(map(tuple, sample_negatives(df, k=3, salt="other").collect()))
    assert c != a


def test_resample_daily_gapfill_and_ffill(spark):
    from datetime import datetime

    from routing_algorithm_for_graph_dbs_spark.operators.asof import resample_daily

    rows = [
        (1, datetime(2024, 1, 1, 10), 5.0),
        (1, datetime(2024, 1, 1, 11), 2.5),
        (1, datetime(2024, 1, 4, 9), 1.0),   # 2-day gap before this
        (2, datetime(2024, 3, 7, 0), 4.0),   # single-day user: 1-row grid
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r["user_id"], r["day"]): (r["n"], r["ffill_sum"])
        for r in resample_daily(df).collect()
    }
    assert got[(1, "2024-01-01")] == (2, 7.5)
    assert got[(1, "2024-01-02")] == (0, 7.5)  # gap day: count 0, sum carried
    assert got[(1, "2024-01-03")] == (0, 7.5)
    assert got[(1, "2024-01-04")] == (1, 1.0)
    assert got[(2, "2024-03-07")] == (1, 4.0)
    assert len(got) == 5  # dense grid: 4 days for user 1, 1 for user 2


def test_cap_per_group_deterministic(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        cap_per_group,
    )

    rows = [(i, f"g{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted(map(tuple, cap_per_group(df, "source", 4).collect()))
    b = sorted(map(tuple, cap_per_group(df, "source", 4).collect()))
    assert a == b  # same survivors every run
    from collections import Counter

    per = Counter(g for _, g in a)
    assert per == {"g0": 4, "g1": 4, "g2": 4}
    # a group under the cap keeps everything
    small = cap_per_group(df.filter(F.col("doc_id") < 3), "source", 4).count()
    assert small == 3
    # different salt -> different survivors
    c = sorted(map(tuple, cap_per_group(df, "source", 4, salt="x").collect()))
    assert c != a


def test_budget_mixture_sample(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        budget_mixture_sample,
    )

    # two groups: "big" (10k chars) must thin toward 1k; "small" (500)
    # is under its share and passes through whole
    rows = [(i, "big", 100) for i in range(100)] + [
        (1000 + i, "small", 100) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = budget_mixture_sample(df, budget=2000.0)  # 1000 per group
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in budget_mixture_sample(df, budget=2000.0).collect())
    assert a == b  # deterministic
    kept_small = [d for d in a if d >= 1000]
    assert len(kept_small) == 5  # under-budget group keeps everything
    kept_big = [d for d in a if d < 1000]
    # rate 0.1 over 100 uniform hash draws: loose but safe bounds
    assert 2 <= len(kept_big) <= 25


def test_weighted_sample_k_bias_and_determinism(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        weighted_sample_k,
    )

    # ids 0..199: first 100 weight 1, last 100 weight 50 — heavy rows must
    # dominate the drawn set
    rows = [(i, 1.0 if i < 100 else 50.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(r["doc_id"] for r in weighted_sample_k(df, 50, "w").collect())
    again = sorted(r["doc_id"] for r in weighted_sample_k(df, 50, "w").collect())
    assert got == again  # deterministic
    heavy = sum(1 for d in got if d >= 100)
    assert heavy >= 40  # 50x weight should dominate the sample
    assert len(got) == 50


def test_train_val_test_split_stable_and_partitioned(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        train_val_test_split,
    )

    df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    a = {r["doc_id"]: r["split"] for r in train_val_test_split(df).collect()}
    # subset invariance: a doc keeps its side even when the corpus changes
    sub = df.filter(F.col("doc_id") % 3 == 0)
    b = {r["doc_id"]: r["split"] for r in train_val_test_split(sub).collect()}
    assert all(a[k] == v for k, v in b.items())
    from collections import Counter

    frac = Counter(a.values())
    assert 0.74 <= frac["train"] / 1000 <= 0.86
    assert 0.05 <= frac["val"] / 1000 <= 0.15
    assert 0.05 <= frac["test"] / 1000 <= 0.15


class TestMergeInto:
    def _frames(self, spark):
        target = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
            "k long, v double, extra string",
        )
        # k=2,3 matched; k=9 insert; no 'extra' column in source
        source = spark.createDataFrame(
            [(2, 99.0), (3, 88.0), (9, 77.0)], "k long, v double"
        )
        return target, source

    def test_upsert(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.merge import merge_into

        target, source = self._frames(spark)
        got = {
            r["k"]: (r["v"], r["extra"])
            for r in merge_into(target, source, ["k"]).collect()
        }
        assert got == {
            1: (10.0, "a"),      # untouched
            2: (99.0, "b"),      # updated v, kept target-only col
            3: (88.0, "c"),
            9: (77.0, None),     # inserted; target-only col NULL
        }

    def test_update_only(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.merge import merge_into

        target, source = self._frames(spark)
        got = merge_into(target, source, ["k"], insert_unmatched=False)
        assert {r["k"] for r in got.collect()} == {1, 2, 3}

    def test_delete_matched_predicate(self, spark):
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.merge import merge_into

        target, source = self._frames(spark)
        got = merge_into(
            target, source, ["k"], delete_matched=F.col("s.v") > 90.0
        )
        keys = {r["k"]: r["v"] for r in got.collect()}
        # k=2 (source v=99) deleted; k=3 still updated; insert still lands
        assert 2 not in keys and keys[3] == 88.0 and keys[9] == 77.0

    def test_delete_all_matched(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.merge import merge_into

        target, source = self._frames(spark)
        got = merge_into(target, source, ["k"], delete_matched=True)
        assert {r["k"] for r in got.collect()} == {1, 9}

    def test_bad_update_cols_raise(self, spark):
        import pytest

        from routing_algorithm_for_graph_dbs_spark.operators.merge import merge_into

        target, source = self._frames(spark)
        with pytest.raises(ValueError, match="absent from source"):
            merge_into(target, source, ["k"], update_cols=["extra"])


class TestScd2History:
    def test_runs_collapse_and_intervals_chain(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.history import (
            scd2_history,
        )

        rows = [
            # user 1: a,a -> b -> a  (dup collapses; value may recur)
            (1, "a", 10, 1), (1, "a", 20, 2), (1, "b", 30, 3), (1, "a", 40, 4),
            # user 2: single value stays current
            (2, "x", 15, 5),
        ]
        df = spark.createDataFrame(rows, "k long, v string, t long, id long")
        got = sorted(
            (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_history(df, "k", "v", "t", ["id"]).collect()
        )
        assert got == [
            (1, "a", 10, 30, False),
            (1, "a", 40, None, True),
            (1, "b", 30, 40, False),
            (2, "x", 15, None, True),
        ]

    def test_null_runs_and_tiebreak(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.history import (
            scd2_history,
        )

        rows = [
            # NULL,NULL collapse into one run; NULL -> a is a change;
            # equal ts 30 ordered by the id tie-break (id=3 before id=4)
            (1, None, 10, 1), (1, None, 20, 2), (1, "a", 30, 3), (1, "b", 30, 4),
        ]
        df = spark.createDataFrame(rows, "k long, v string, t long, id long")
        got = [
            (r["v"], r["valid_from"], r["is_current"])
            for r in scd2_history(df, "k", "v", "t", ["id"]).collect()
        ]
        assert (None, 10, False) in got
        vals = {r[0] for r in got}
        assert vals == {None, "a", "b"} and len(got) == 3


class TestEwma:
    def test_last_matches_hand_fold(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.timeseries import (
            ewma_last,
        )

        df = spark.createDataFrame(
            [(1, 10, 1.0, 1), (1, 20, 2.0, 2), (1, 30, 4.0, 3), (2, 5, 7.0, 4)],
            "k long, t long, v double, id long",
        )
        got = {
            r["k"]: r["ewma"]
            for r in ewma_last(df, "k", "t", "v", alpha=0.3, order_cols=["id"]).collect()
        }
        # k=1: e=1.0 -> .7*1+.3*2=1.3 -> .7*1.3+.3*4=2.11
        assert abs(got[1] - 2.11) < 1e-12
        assert got[2] == 7.0  # single point: seed value

    def test_series_prefix_of_last(self, spark):
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.timeseries import (
            ewma_last,
            ewma_series,
        )

        rows = [(1, t, float((t * 7) % 5 + 1), t) for t in range(1, 30)]
        df = spark.createDataFrame(rows, "k long, t long, v double, id long")
        series = ewma_series(df, "k", "t", "v", alpha=0.25, order_cols=["id"])
        last_from_series = (
            series.orderBy(F.col("t").desc()).limit(1).collect()[0]["ewma"]
        )
        last = ewma_last(df, "k", "t", "v", alpha=0.25, order_cols=["id"]).collect()[
            0
        ]["ewma"]
        assert last_from_series == last
        assert series.count() == len(rows)

    def test_tie_break_order_matters(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.timeseries import (
            ewma_last,
        )

        # two rows share t=10; the id tie-break fixes which folds first
        df = spark.createDataFrame(
            [(1, 10, 0.0, 2), (1, 10, 8.0, 1)], "k long, t long, v double, id long"
        )
        got = ewma_last(df, "k", "t", "v", alpha=0.5, order_cols=["id"]).collect()
        # order: v=8 (id=1) seeds, then v=0 -> 0.5*8 + 0.5*0 = 4
        assert got[0]["ewma"] == 4.0


class TestSnapshotDiff:
    def test_ops_and_roundtrip(self, spark):
        """diff(old, new) applied back onto old via merge_into (delete on
        op='D') must reproduce new exactly — the changelog contract."""
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.merge import (
            merge_into,
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)], "k long, v double"
        )
        new = spark.createDataFrame(
            [(1, 10.0), (2, 99.0), (4, 40.0), (5, 50.0)], "k long, v double"
        )
        log = snapshot_diff(old, new, ["k"])
        got = {r["k"]: (r["op"], r["v"]) for r in log.collect()}
        # 1 unchanged -> absent; 2 updated; 3 deleted (old value); 4 NULL->40
        # updated null-safely; 5 inserted
        assert got == {
            2: ("U", 99.0),
            3: ("D", 30.0),
            4: ("U", 40.0),
            5: ("I", 50.0),
        }
        applied = merge_into(
            old,
            log,
            ["k"],
            update_cols=["v"],
            delete_matched=F.col("s.op") == "D",
        ).select("k", "v")
        assert sorted(map(tuple, applied.collect())) == sorted(
            map(tuple, new.collect())
        )


def test_url_domains_occurrences(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.text import url_domains

    df = spark.createDataFrame(
        [
            (1, "go to https://A.com/x then http://b.org/y and https://a.com/z"),
            (2, "no urls here"),
        ],
        "doc_id long, text string",
    )
    got = sorted((r["doc_id"], r["domain"]) for r in url_domains(df).collect())
    # lowercased; duplicates preserved (occurrence grain); url-less doc absent
    assert got == [(1, "a.com"), (1, "a.com"), (1, "b.org")]


class TestDatasetFingerprint:
    def test_order_and_partition_invariant(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.audit import (
            dataset_fingerprint,
        )

        rows = [(i, f"v{i % 7}") for i in range(100)]
        a = spark.createDataFrame(rows, "k long, v string")
        b = spark.createDataFrame(list(reversed(rows)), "k long, v string").repartition(7)
        fa = dataset_fingerprint(a).collect()[0]
        fb = dataset_fingerprint(b).collect()[0]
        assert (fa["n_rows"], fa["xor_fp"]) == (fb["n_rows"], fb["xor_fp"])

    def test_detects_single_row_change(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.audit import (
            dataset_fingerprint,
        )

        rows = [(i, "x") for i in range(50)]
        a = spark.createDataFrame(rows, "k long, v string")
        b = spark.createDataFrame(rows[:-1] + [(49, "y")], "k long, v string")
        fa = dataset_fingerprint(a).collect()[0]
        fb = dataset_fingerprint(b).collect()[0]
        assert fa["n_rows"] == fb["n_rows"] and fa["xor_fp"] != fb["xor_fp"]

    def test_count_catches_even_duplication(self, spark):
        """xor alone cancels duplicated pairs — the row count must catch
        a corpus accidentally unioned with itself."""
        from routing_algorithm_for_graph_dbs_spark.operators.audit import (
            dataset_fingerprint,
        )

        a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
        doubled = a.unionAll(a)
        fa = dataset_fingerprint(a).collect()[0]
        fd = dataset_fingerprint(doubled).collect()[0]
        assert fd["xor_fp"] == 0  # every row hash appears twice -> cancels
        assert fd["n_rows"] == 2 * fa["n_rows"]  # ...but the count catches it

    def test_null_vs_empty_string_differ(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.audit import (
            dataset_fingerprint,
        )

        a = spark.createDataFrame([(1, None)], "k long, v string")
        b = spark.createDataFrame([(1, "")], "k long, v string")
        assert (
            dataset_fingerprint(a).collect()[0]["xor_fp"]
            != dataset_fingerprint(b).collect()[0]["xor_fp"]
        )


class TestApplyCdc:
    def _frames(self, spark):
        target = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        # k=1: updated then deleted; k=2: deleted then re-upserted;
        # k=4: fresh insert; k=5: delete of a key the target never had
        changes = spark.createDataFrame(
            [
                (1, 1, "U", "x"),
                (1, 2, "D", None),
                (2, 1, "D", None),
                (2, 2, "U", "y"),
                (4, 1, "I", "z"),
                (5, 1, "D", None),
            ],
            "k long, seq long, op string, v string",
        )
        return target, changes

    def test_latest_op_wins(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.merge import apply_cdc

        target, changes = self._frames(spark)
        got = {
            r["k"]: r["v"]
            for r in apply_cdc(target, changes, ["k"], "seq").collect()
        }
        assert got == {2: "y", 3: "c", 4: "z"}

    def test_seq_tie_prefers_delete(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.merge import apply_cdc

        target = spark.createDataFrame([(1, "a")], "k long, v string")
        changes = spark.createDataFrame(
            [(1, 7, "U", "x"), (1, 7, "D", None)],
            "k long, seq long, op string, v string",
        )
        assert apply_cdc(target, changes, ["k"], "seq").count() == 0

    def test_equals_sequential_merge_replay(self, spark):
        # folding the stream op-by-op through merge_into must agree with
        # the one-shot latest-op application
        from routing_algorithm_for_graph_dbs_spark.operators.merge import (
            apply_cdc,
            merge_into,
        )

        target, changes = self._frames(spark)
        state = target
        for r in sorted(changes.collect(), key=lambda r: (r["seq"], r["k"])):
            one = spark.createDataFrame([(r["k"], r["v"])], "k long, v string")
            if r["op"] == "D":
                state = state.join(one.select("k"), "k", "left_anti")
            else:
                state = merge_into(state, one, ["k"])
        got = sorted(map(tuple, apply_cdc(target, changes, ["k"], "seq").collect()))
        ref = sorted(map(tuple, state.collect()))
        assert got == ref


class TestSnapshotAsof:
    def test_reconstructs_state_at_instant(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.history import (
            scd2_history,
            snapshot_asof,
        )
        from pyspark.sql import functions as F

        stream = spark.createDataFrame(
            [
                (1, "a", 10), (1, "b", 20), (1, "c", 30),
                (2, "x", 15),
                (3, "q", 40),  # not yet born at t=25
            ],
            "k long, attr string, t long",
        )
        hist = scd2_history(stream, "k", "attr", "t")
        snap = snapshot_asof(hist, F.lit(25))
        got = {r["k"]: r["attr"] for r in snap.collect()}
        assert got == {1: "b", 2: "x"}
        # boundary semantics: inclusive start, exclusive end
        at_20 = {r["k"]: r["attr"] for r in snapshot_asof(hist, F.lit(20)).collect()}
        assert at_20[1] == "b"

    def test_current_rows_stay_visible_forever(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.history import (
            scd2_history,
            snapshot_asof,
        )
        from pyspark.sql import functions as F

        stream = spark.createDataFrame([(1, "a", 10)], "k long, attr string, t long")
        hist = scd2_history(stream, "k", "attr", "t")
        assert snapshot_asof(hist, F.lit(10**9)).count() == 1
        assert snapshot_asof(hist, F.lit(9)).count() == 0


class TestPercentRankScaled:
    def test_matches_window_percent_rank(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
            percent_rank_scaled,
        )

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate([5, 3, 3, 8, 1, 8, 8, 2])],
            "id long, v long",
        )
        mine = {
            r["id"]: r["pr"]
            for r in percent_rank_scaled(df, "v").collect()
        }
        ref = {
            r["id"]: r["pr"]
            for r in df.withColumn(
                "pr", F.percent_rank().over(Window.orderBy("v"))
            ).collect()
        }
        assert mine == pytest.approx(ref)

    def test_single_row_and_nulls(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
            percent_rank_scaled,
        )

        one = spark.createDataFrame([(1, 42)], "id long, v long")
        assert percent_rank_scaled(one, "v").collect()[0]["pr"] == 0.0
        withnull = spark.createDataFrame(
            [(1, 10), (2, None), (3, 20)], "id long, v long"
        )
        got = {r["id"]: r["pr"] for r in percent_rank_scaled(withnull, "v").collect()}
        # NULL rows neither rank nor shift others' ranks
        assert got[2] is None and got[1] == 0.0 and got[3] == 1.0

    def test_no_global_window_over_raw_rows(self, spark):
        # the single-partition Window must only ever see the distinct-value
        # relation: the plan's window operator sits above an Aggregate,
        # and the raw scan side joins via broadcast
        from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
            percent_rank_scaled,
        )

        df = spark.range(0, 1000).selectExpr("id", "id % 7 AS v")
        plan = (
            percent_rank_scaled(df, "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        wpos = plan.find("Window")
        apos = plan.find("HashAggregate")
        assert wpos != -1 and apos != -1 and wpos < apos


class TestKeepBestDedup:
    def test_keeps_max_score_row(self, spark):
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
            keep_best_dedup,
        )

        df = spark.createDataFrame(
            [
                ("g1", 1, 100), ("g1", 2, 300), ("g1", 3, 200),
                ("g2", 4, 50),
            ],
            "grp string, id long, quality long",
        )
        got = {
            r["grp"]: (r["id"], r["dup_count"])
            for r in keep_best_dedup(
                df, ["grp"], F.struct(F.col("quality"), (-F.col("id")).alias("tb"))
            ).collect()
        }
        assert got == {"g1": (2, 3), "g2": (4, 1)}

    def test_tie_breaks_to_lowest_key(self, spark):
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
            keep_best_dedup,
        )

        df = spark.createDataFrame(
            [("g", 7, 10), ("g", 3, 10), ("g", 5, 10)],
            "grp string, id long, quality long",
        )
        row = keep_best_dedup(
            df, ["grp"], F.struct(F.col("quality"), (-F.col("id")).alias("tb"))
        ).collect()[0]
        assert row["id"] == 3 and row["dup_count"] == 3

    def test_single_aggregation_no_window(self, spark):
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
            keep_best_dedup,
        )

        df = spark.range(0, 100).selectExpr(
            "CAST(id % 10 AS STRING) AS grp", "id", "id % 7 AS quality"
        )
        plan = (
            keep_best_dedup(
                df, ["grp"], F.struct(F.col("quality"), (-F.col("id")).alias("tb"))
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        # partial (combiner) aggregation present before the shuffle
        assert "partial_max_by" in plan
        assert plan.find("partial_max_by") > plan.find("Exchange")


class TestInterpolateDaily:
    def test_linear_gap_fill(self, spark):
        from datetime import datetime

        from routing_algorithm_for_graph_dbs_spark.operators.asof import (
            interpolate_daily,
        )

        ev = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 5), 10.0),
                (1, datetime(2024, 1, 1, 7), 30.0),  # day mean 20
                (1, datetime(2024, 1, 4, 0), 50.0),
                (2, datetime(2024, 3, 1, 0), 7.0),
            ],
            "user_id long, ts timestamp, value double",
        )
        got = {
            (r["user_id"], r["day"]): (r["observed"], r["v_interp"])
            for r in interpolate_daily(ev).collect()
        }
        assert got[(1, "2024-01-01")] == (True, 20.0)
        assert got[(1, "2024-01-02")] == (False, 30.0)
        assert got[(1, "2024-01-03")] == (False, 40.0)
        assert got[(1, "2024-01-04")] == (True, 50.0)
        assert got[(2, "2024-03-01")] == (True, 7.0)
        assert len(got) == 5  # no extrapolation rows outside each span

    def test_one_sort_two_windows(self, spark):
        from datetime import datetime

        from routing_algorithm_for_graph_dbs_spark.operators.asof import (
            interpolate_daily,
        )

        ev = spark.createDataFrame(
            [(1, datetime(2024, 1, 1), 1.0), (1, datetime(2024, 1, 9), 2.0)],
            "user_id long, ts timestamp, value double",
        )
        plan = (
            interpolate_daily(ev)._jdf.queryExecution().executedPlan().toString()
        )
        # the window passes stack over ONE shared (k, day) sort: no Sort
        # operator may appear between the Window operators
        lines = plan.splitlines()
        widx = [i for i, ln in enumerate(lines) if "- Window [" in ln]
        assert len(widx) >= 2
        between = lines[widx[0] : widx[-1]]
        assert not any("- Sort [" in ln for ln in between), plan
        assert "CartesianProduct" not in plan


class TestPhashNearDup:
    def test_identical_payloads_pair_at_zero(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            phash_near_dup_pairs,
        )
        from pyspark.sql import functions as F

        media = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the quick brown fox"),
             (3, "completely different payload words entirely")],
            "media_id long, text string",
        ).select("media_id", F.encode("text", "UTF-8").alias("payload"))
        pairs = {(r["a"], r["b"]): r["hamming"]
                 for r in phash_near_dup_pairs(media).collect()}
        assert pairs.get((1, 2)) == 0
        assert not any(3 in p for p in pairs)

    def test_strict_raises_at_codec_boundary(self, spark):
        """strict=True is the remaining boundary for payloads no real
        codec covers (r7: BMP/JPEG/PNG now hash for real) — a text
        payload under strict must still raise at execution."""
        from pyspark.sql import functions as F

        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            phash_near_dup_pairs,
        )

        media = spark.createDataFrame(
            [(1, "not an image")], "media_id long, text string"
        ).select("media_id", F.encode("text", "UTF-8").alias("payload"))
        with pytest.raises(Exception, match="NotImplementedError|decoder"):
            phash_near_dup_pairs(media, strict=True).collect()

    def test_real_phash_over_decoded_pixels(self, spark):
        """Payloads with real image signatures hash through the DCT
        pHash: a one-pixel perturbation of a structured image lands
        within hamming<=3 of the original; a different structure does
        not pair with it; and real-vs-text rows coexist in one call."""
        import numpy as np

        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            encode_bmp,
            phash_near_dup_pairs,
        )
        from routing_algorithm_for_graph_dbs_spark.operators.png import (
            encode_png,
        )
        from pyspark.sql import functions as F

        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        tweaked = base.copy()
        tweaked[7, 9] ^= 0x30  # one-pixel perturbation
        other = np.rot90(base).copy()  # same palette, different structure
        rows = [
            (1, bytearray(encode_png(base, "cycle"))),
            (2, bytearray(encode_bmp(tweaked))),  # cross-CODEC near-dup
            (3, bytearray(encode_png(other))),
            (4, bytearray(b"just text, takes the simhash stand-in path")),
        ]
        media = spark.createDataFrame(
            rows, "media_id long, payload binary"
        )
        pairs = {
            (r["a"], r["b"]): r["hamming"]
            for r in phash_near_dup_pairs(media, max_hamming=3).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] <= 3
        assert not any(3 in p or 4 in p for p in pairs)


def test_snapshot_diff_applies_via_cdc(spark):
    # contract linking the diff and CDC halves: applying snapshot_diff's
    # changelog to the old snapshot through apply_cdc reproduces the new
    # snapshot exactly (diff emits one op per key, so any constant seq works)
    from pyspark.sql import functions as F

    from routing_algorithm_for_graph_dbs_spark.operators.merge import (
        apply_cdc,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 21.0), (4, "d", 40.0)],
        "k long, v string, x double",
    )
    log = snapshot_diff(old, new, ["k"]).withColumn("seq", F.lit(1))
    got = sorted(map(tuple, apply_cdc(old, log, ["k"], "seq").collect()))
    assert got == sorted(map(tuple, new.collect()))


def _py_bpe(texts, n_merges, min_pair_count=2):
    # reference word-level BPE: distinct words weighted by count, greedy
    # argmax (count desc, pair asc), left-to-right non-overlapping merge
    import re
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip().split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_pair_count:
            break
        merges.append((a, b, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


class TestBpe:
    TEXTS = [
        "low lower lowest low low",
        "new newer newest new news",
        "the lowest newest low",
    ]

    def test_learn_matches_python_reference(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.bpe import learn_bpe

        df = spark.createDataFrame([(t,) for t in self.TEXTS], "text string")
        got = learn_bpe(df, n_merges=6)
        want, _ = _py_bpe(self.TEXTS, 6)
        assert got == want

    def test_apply_matches_python_reference(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.bpe import (
            apply_bpe,
            learn_bpe,
        )

        df = spark.createDataFrame([(t,) for t in self.TEXTS], "text string")
        merges = learn_bpe(df, n_merges=6)
        _, words = _py_bpe(self.TEXTS, 6)
        toks = {
            r["text"]: r["bpe_tokens"]
            for r in apply_bpe(df, merges).collect()
        }
        import re

        for t in self.TEXTS:
            expect = []
            for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split():
                expect.extend(words[w])
            assert toks[t] == expect, t

    def test_early_stop_when_below_min_count(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.bpe import learn_bpe

        df = spark.createDataFrame([("ab cd ef",)], "text string")
        # every pair occurs once -> below min_pair_count=2 -> no merges
        assert learn_bpe(df, n_merges=5) == []

    def test_merge_is_left_to_right_nonoverlapping(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.bpe import apply_bpe

        df = spark.createDataFrame([("aaa aaaa",)], "text string")
        out = apply_bpe(df, [("a", "a", 0)]).collect()[0]["bpe_tokens"]
        # 'aaa' -> [aa, a]; 'aaaa' -> [aa, aa]
        assert out == ["aa", "a", "aa", "aa"]


class TestTemperatureMixture:
    def _docs(self, spark):
        # one huge source, one tiny
        rows = [(i, "big", 100) for i in range(900)] + [
            (1000 + i, "small", 100) for i in range(100)
        ]
        return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    def test_alpha_lifts_small_sources(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        docs = self._docs(spark)
        budget = 50_000.0  # half the 100k-char corpus

        def share(alpha):
            kept = temperature_mixture_sample(docs, budget, alpha=alpha)
            per = {r["source"]: r["n"] for r in kept.groupBy("source")
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
            return per.get("small", 0) / max(per.get("big", 1), 1)

        # alpha=1 ~ proportional (small/big ~ 1/9); alpha->0 ~ equal
        # budget halves -> small passes whole, big thins -> ratio rises
        assert share(0.0) > share(1.0)

    def test_alpha_one_is_proportional_passthrough(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        docs = self._docs(spark)
        # budget == corpus size and alpha=1 -> every rate is 1, all rows kept
        kept = temperature_mixture_sample(docs, 100_000.0, alpha=1.0)
        assert kept.count() == docs.count()

    def test_deterministic_and_salt_sensitive(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        docs = self._docs(spark)
        a = {r["doc_id"] for r in temperature_mixture_sample(docs, 30_000.0).collect()}
        b = {r["doc_id"] for r in temperature_mixture_sample(docs, 30_000.0).collect()}
        c = {r["doc_id"] for r in temperature_mixture_sample(docs, 30_000.0, salt="other").collect()}
        assert a == b
        assert a != c
        with pytest.raises(ValueError, match="alpha"):
            temperature_mixture_sample(docs, 1.0, alpha=-0.1)


def test_jpeg_decode_golden():
    """Real baseline-JPEG codec (operators/jpeg.py): flat-gray image
    round-trips EXACTLY (DC-only blocks suffer no quantization loss);
    gradient and noise images round-trip within quantization tolerance;
    the 3-component 4:2:0 interleaved-MCU layout (what real-world color
    JPEGs use) decodes through the same path."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_ycbcr420,
    )

    flat = np.full((16, 16), 128, np.uint8)
    assert decode_jpeg(encode_jpeg_gray(flat, 90)) == (
        16, 16, 1, round(128 / 255.0, 6),
    )

    # non-multiple-of-8 dims exercise MCU padding + crop
    grad = np.linspace(0, 255, 37 * 29).reshape(37, 29).astype(np.uint8)
    w, h, nc, luma = decode_jpeg(encode_jpeg_gray(grad, 95))
    assert (w, h, nc) == (29, 37, 1)
    assert abs(luma - grad.mean() / 255.0) < 0.005

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    w, h, nc, luma = decode_jpeg(encode_jpeg_gray(noise, 95))
    assert (w, h, nc) == (40, 24, 1)
    assert abs(luma - noise.mean() / 255.0) < 0.02

    lum = rng.integers(0, 256, (30, 50), dtype=np.uint8)
    w, h, nc, luma = decode_jpeg(encode_jpeg_ycbcr420(lum, 90))
    assert (w, h, nc) == (50, 30, 3)
    assert abs(luma - lum.mean() / 255.0) < 0.02


def test_jpeg_decode_rejects_unsupported():
    """The honest codec boundary after round 14 (every SOF decodes):
    non-JPEG bytes -> ValueError; scanless SOF11 -> ValueError (illegal
    stream); a differential SOF13 OUTSIDE a DHP stream -> ValueError
    (illegal placement, not a missing codec)."""
    import struct as _struct

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import decode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"BMnot a jpeg")
    sof = _struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xcb" + sof + b"\xff\xd9")  # no SOS
    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xcd" + sof + b"\xff\xd9")  # no DHP


def test_arithmetic_progressive_jpeg_golden():
    """SOF10 arithmetic progressive (round 12): a libjpeg-minted 16x8
    gradient at quality 90 (the full jpeg_simple_progression scan
    script — interleaved-ish DC first, DC refinements, AC bands, AC
    refinements — through the QM-coder) must decode to the exact plane
    the crosscheck harness recorded. Keeps the SOF10 path pinned in
    the always-on suite without the gcc/libjpeg toolchain."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg_gray,
    )

    golden = bytes.fromhex(
        "ffd8ffe000104a46494600010100000100010000ffdb00430003020203020203"
        "03030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d0e12100d"
        "0e110e0b0b1016101113141515150c0f171816141812141514ffca000b080008"
        "001001011100ffcc00040010ffda0008010100000001fef0a7ffcc00041005ff"
        "da000801010001050216705385f859a3dcffcc00041005ffda0008010100063f"
        "021da70fd599cc8eef19609c11dab3089b2edd781090dba0ffcc00041005ffda"
        "0008010100013f21d61c8f2de8ac8918f5ccb8ffda0008010100000010c0ffcc"
        "00041005ffda0008010100013f104bca3eff0007dc5d096ef9bcffd9"
    )
    plane = decode_jpeg_luma(golden)
    assert plane.shape == (8, 16)
    # the source gradient: px[y, x] = (y + x) * 16 % 256 at quality 90
    # — the decoded plane must equal OUR decode of OUR OWN baseline
    # encoding only in the entropy-lossless sense, so pin the libjpeg
    # coefficients via exact spot values + checksum instead
    assert int(plane.sum()) == 15355
    assert plane[0, :4].tolist() == [0, 15, 32, 48]
    # and the same pixels through our own Huffman baseline must land
    # within quantization distance (sanity that the plane is the right
    # image, not just a stable wrong answer)
    px = (_np.add.outer(_np.arange(8), _np.arange(16)) * 16 % 256).astype(
        _np.uint8
    )
    ours = decode_jpeg_luma(encode_jpeg_gray(px, 90))
    assert int(_np.abs(ours.astype(int) - plane.astype(int)).max()) <= 24


def test_arithmetic_jpeg_matches_huffman_exactly():
    """SOF9 sequential arithmetic decode (round 12, T.81 Annex D
    QM-coder + Annex F conditioning): the arithmetic and Huffman
    encoders share the exact same quantization stage, so the decoded
    planes must match BIT-FOR-BIT — any error in the probability state
    machine, conditioning contexts, byte stuffing, carry resolution, or
    flush shows up as a coefficient mismatch. Restart intervals reset
    the coder + statistics and are exercised explicitly. (The same
    streams are pinned byte-exactly against libjpeg in
    tests/test_codec_crosscheck.py when the toolchain is present.)"""
    import numpy as np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_luma,
        encode_jpeg_gray,
        encode_jpeg_gray_arith,
    )

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        encode_jpeg_gray_arith_progressive,
    )

    rng = np.random.default_rng(12)
    for shape in [(8, 8), (16, 24), (23, 37), (64, 64), (1, 1)]:
        for q in (50, 90, 95):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            base = decode_jpeg_luma(encode_jpeg_gray(img, q))
            arith = decode_jpeg_luma(encode_jpeg_gray_arith(img, q))
            assert np.array_equal(base, arith), (shape, q)
            # SOF10: the full progressive scan script through the coder
            prog = decode_jpeg_luma(encode_jpeg_gray_arith_progressive(img, q))
            assert np.array_equal(base, prog), ("sof10", shape, q)
    # restart intervals: coder + stats + DC predictors reset per RSTn
    img = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    base = decode_jpeg_luma(encode_jpeg_gray(img, 90))
    for ri in (1, 2, 5):
        got = decode_jpeg_luma(
            encode_jpeg_gray_arith(img, 90, restart_interval=ri))
        assert np.array_equal(base, got), ri
    # flat image: the mm_jpeg_roundtrip closed form holds for SOF9 too
    flat = np.full((9, 13), 112, np.uint8)
    w, h, nc, luma = decode_jpeg(encode_jpeg_gray_arith(flat, 90))
    exp = 128.0 + round(8.0 * (112 - 128) / 3.0) * 3.0 / 8.0
    assert (w, h, nc) == (13, 9, 1) and luma == round(exp / 255.0, 6)
    # a truncated arithmetic stream must not crash (zero-byte feed is
    # the spec behavior after a marker); garbage decisions still bound
    p = bytearray(encode_jpeg_gray_arith(img, 90))
    try:
        decode_jpeg(bytes(p[: len(p) // 2]) + b"\xff\xd9")
    except (ValueError, NotImplementedError):
        pass  # structural raise is fine; an unbounded loop/crash is not


def test_progressive_jpeg_matches_baseline_exactly():
    """SOF2 progressive decode (spectral selection + successive
    approximation, T.81 Annex G): the progressive and baseline encoders
    share the exact same quantization stage, so a correct multi-scan
    decode must reproduce the single-scan baseline decode BIT-FOR-BIT —
    any error in the DC/AC first or refinement procedures shows up as a
    coefficient mismatch."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_luma,
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(11)
    for shape in [(8, 8), (16, 24), (23, 37), (64, 64)]:
        for q in (50, 90, 95):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            base = decode_jpeg_luma(encode_jpeg_gray(img, q))
            prog = decode_jpeg_luma(encode_jpeg_gray_progressive(img, q))
            assert np.array_equal(base, prog), (shape, q)
    # dims + mean-luma contract of decode_jpeg on a progressive payload
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    w, h, nc, luma = decode_jpeg(encode_jpeg_gray_progressive(img, 95))
    assert (w, h, nc) == (40, 24, 1)
    assert abs(luma - img.mean() / 255.0) < 0.02


def test_progressive_jpeg_interleaved_dc_and_chroma_skip():
    """3-component progressive: interleaved DC first/refinement scans
    (all components share the MCU bit stream) and single-component chroma
    AC scans, which the decoder skips without entropy-decoding. The Y
    plane must equal the GRAYSCALE progressive decode bit-for-bit (both
    encoders quantize through the same vectorized path); the sequential
    ycbcr encoder is allowed one grey level of slack — its per-block
    matmul can round a coefficient across the .5 boundary differently
    from the vectorized einsum."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_luma,
        encode_jpeg_gray_progressive,
        encode_jpeg_ycbcr420,
        encode_jpeg_ycbcr420_progressive,
    )

    rng = np.random.default_rng(13)
    for shape in [(16, 16), (30, 50), (23, 37)]:
        for q in (75, 90):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            prog_y = decode_jpeg_luma(encode_jpeg_ycbcr420_progressive(img, q))
            prog_g = decode_jpeg_luma(encode_jpeg_gray_progressive(img, q))
            assert np.array_equal(prog_y, prog_g), (shape, q)
            base_y = decode_jpeg_luma(encode_jpeg_ycbcr420(img, q))
            diff = np.abs(base_y.astype(int) - prog_y.astype(int)).max()
            assert diff <= 1, (shape, q, diff)
    w, h, nc, _ = decode_jpeg(encode_jpeg_ycbcr420_progressive(
        rng.integers(0, 256, (30, 50), dtype=np.uint8), 90))
    assert (w, h, nc) == (50, 30, 3)


def test_jpeg_12bit_decode_golden():
    """12-bit JPEG (round 8): level shift and sample range follow the
    frame precision, the plane rescales to the uniform [0, 255] contract.
    Flat images have a closed-form decode (the only nonzero coefficient
    is the quantized DC); at the same quality the 16x-finer quantization
    reconstructs a noise image far closer to the original than the 8-bit
    encode does."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_luma,
        encode_jpeg_gray,
        encode_jpeg_gray12,
    )

    for v, qual in [(1000, 90), (3000, 90), (2048, 75), (100, 50)]:
        img = np.full((16, 24), v, np.uint16)
        w, h, nc, luma = decode_jpeg(encode_jpeg_gray12(img, qual))
        scale = 5000 // qual if qual < 50 else 200 - 2 * qual
        q0 = max(1, min(255, (16 * scale + 50) // 100))
        px = (
            np.clip(round(8 * (v - 2048) / q0) * q0 / 8 + 2048, 0, 4095)
            * 255 / 4095
        )
        assert (w, h, nc) == (24, 16, 1)
        assert luma == round(px / 255, 6), (v, qual)

    rng = np.random.default_rng(7)
    img8 = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    d8 = decode_jpeg_luma(encode_jpeg_gray(img8, 90)).astype(float)
    d12 = decode_jpeg_luma(
        encode_jpeg_gray12(img8.astype(np.uint16) * 16 + 8, 90)
    ).astype(float)
    assert np.abs(d12 - img8).mean() < np.abs(d8 - img8).mean() / 4


def test_progressive_jpeg_hand_constructed_stream():
    """Decoder-only golden: a spec-exact progressive stream whose entropy
    bytes were computed BY HAND from T.81 (identity quant table, one 8x8
    block, three scans: DC first, AC first at Al=1, AC refinement to
    Al=0). Catches encoder/decoder bugs that would cancel in roundtrips.

    Hand derivation: DC=6 -> DC size 3 ('100' in the Annex K DC table) +
    bits '110', padded -> 0x9B. AC first (Al=1): zz[1]=3 -> size 1 at
    run 0 (symbol 0x01, flat 8-bit code = its index 1) + sign bit 1;
    zz[4]=-2 -> run 2 size 1 (symbol 0x21, index 23) + bit 0; EOB
    (symbol 0x00, index 0) -> bytes 0x01 0x8B 0x80 0x3F. Refinement
    (Ah=1, Al=0): EOB0 then correction bits 1 (3 is odd), 0 (-2 even)
    -> 0x00 0xBF. Expected coefficients: nat[0]=6, nat[1]=3, nat[9]=-2
    (zigzag index 4 is natural position 9)."""
    import struct as _struct

    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        PROG_AC_BITS,
        PROG_AC_VALS,
        decode_jpeg_luma,
    )

    def sos(ss, se, ahal, body):
        return (
            b"\xff\xda"
            + _struct.pack(">H", 8)
            + bytes([1, 1, 0x00, ss, se, ahal])
            + body
        )

    stream = (
        b"\xff\xd8"
        + b"\xff\xdb" + _struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
        + b"\xff\xc2" + _struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
        + b"\xff\xc4" + _struct.pack(">H", 3 + 16 + len(DC_LUMA_VALS))
        + bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS)
        + b"\xff\xc4" + _struct.pack(">H", 3 + 16 + len(PROG_AC_VALS))
        + bytes([0x10] + PROG_AC_BITS + PROG_AC_VALS)
        + sos(0, 0, 0x00, bytes([0x9B]))
        + sos(1, 63, 0x01, bytes([0x01, 0x8B, 0x80, 0x3F]))
        + sos(1, 63, 0x10, bytes([0x00, 0xBF]))
        + b"\xff\xd9"
    )
    got = decode_jpeg_luma(stream)
    # independent IDCT of the expected coefficients (orthonormal DCT-II)
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    t = np.cos((2 * n + 1) * k * np.pi / 16)
    t[0] *= np.sqrt(1 / 8)
    t[1:] *= np.sqrt(2 / 8)
    coeffs = np.zeros((8, 8))
    coeffs[0, 0] = 6.0
    coeffs[0, 1] = 3.0
    coeffs[1, 1] = -2.0  # natural position 9
    want = np.clip(np.rint(t.T @ coeffs @ t + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_image_features_real_jpeg_in_pipeline(spark):
    """image/jpeg rows get the REAL decoder inside the Arrow-batched
    mapInPandas path (decoder='jpeg', true dims + luma); BMP and fake
    rows coexist in the same DataFrame; strict=True accepts jpeg."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        encode_jpeg_gray,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_features,
    )

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        encode_jpeg_gray_progressive,
    )

    jpg = encode_jpeg_gray(np.full((12, 20), 64, np.uint8), 90)
    bmp = encode_bmp(np.full((4, 7, 3), 200, np.uint8))
    prog = encode_jpeg_gray_progressive(np.full((12, 20), 64, np.uint8), 90)
    rows = [
        (1, "image", jpg, "image/jpeg", (20, 12, 1, None, None)),
        (2, "image", bmp, "image/bmp", (7, 4, 3, None, None)),
        (3, "image", b"\x89PNGfakebytes", "image/png", (800, 600, 3, None, None)),
        (4, "image", prog, "image/jpeg", (20, 12, 1, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in image_features(media).collect()}
    assert got[1]["decoder"] == "jpeg"
    assert (got[1]["width"], got[1]["height"]) == (20, 12)
    # flat-64 quantizes DC to the nearest multiple of q0=3 (-513 vs -512):
    # within one grey level, unlike flat-128 whose DC is exactly 0
    assert abs(got[1]["mean_luma"] - 64 / 255.0) < 1 / 255.0
    assert got[2]["decoder"] == "bmp"
    assert got[3]["decoder"] == "fake"
    # the progressive (SOF2) row decodes REAL since round 8 — identical
    # features to its baseline twin (same quantized coefficients)
    assert got[4]["decoder"] == "jpeg"
    assert (got[4]["width"], got[4]["height"]) == (20, 12)
    assert got[4]["mean_luma"] == got[1]["mean_luma"]

    strict_got = image_features(
        media.filter(media.mime != "image/png"), strict=True
    ).collect()
    assert {r["decoder"] for r in strict_got} == {"jpeg", "bmp"}


def test_png_decode_golden_all_filters():
    """Real PNG codec: golden pixels through every scanline filter type.
    ``encode_png(filter_mode='cycle')`` emits filters 0-4 by row, so a
    7-row image forces the decoder to invert None/Sub/Up/Average/Paeth
    against ground-truth pixels (zlib is stdlib — the DEFLATE stream is
    real, not a fixture)."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        decode_png,
        encode_png,
    )

    # white, black / red, blue — same hand-computed luma as the BMP twin
    px = np.array(
        [[[255, 255, 255], [0, 0, 0]], [[255, 0, 0], [0, 0, 255]]], np.uint8
    )
    assert decode_png(encode_png(px)) == (
        2, 2, 3, round((1.0 + 0.0 + 0.299 + 0.114) / 4, 6)
    )

    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, size=(7, 13, 3), dtype=np.uint8)
    r, g, b = (big[..., i].astype(np.float64) for i in range(3))
    want = round(float((0.299 * r + 0.587 * g + 0.114 * b).mean() / 255.0), 6)
    assert decode_png(encode_png(big, "cycle")) == (13, 7, 3, want)
    # filter choice must not change decoded values
    assert decode_png(encode_png(big, "none")) == (13, 7, 3, want)


def test_png_decode_color_types():
    """Gray, gray+alpha, RGBA and palette color types; alpha is ignored
    by the luma contract and palette indices expand through PLTE."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        PNG_SIGNATURE,
        _chunk,
        decode_png,
        encode_png,
    )

    gray = np.array([[0, 128], [255, 17]], np.uint8)
    assert decode_png(encode_png(gray)) == (
        2, 2, 1, round((0 + 128 + 255 + 17) / 4 / 255.0, 6)
    )

    ga = np.dstack([gray, np.full((2, 2), 7, np.uint8)])  # alpha ignored
    assert decode_png(encode_png(ga, "cycle"))[2:] == (
        2, round((0 + 128 + 255 + 17) / 4 / 255.0, 6)
    )

    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[..., 0] = 255  # pure red, alpha 0
    assert decode_png(encode_png(rgba, "cycle")) == (2, 2, 4, 0.299)

    # palette PNG built chunk-by-chunk: 2 entries (red, white), 1 row
    ihdr = _struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 255, 255, 255])
    idat = _zlib.compress(b"\x00" + bytes([0, 1]))  # filter 0, indices 0,1
    payload = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (2, 1, 3, round((0.299 + 1.0) / 2, 6))


def test_png_decode_rejects():
    """Boundary closed in round 8 (every legal depth/color/interlace
    decodes): only malformed payloads raise — bad signature, invalid
    interlace method, illegal depth/color combination, invalid depth,
    CRC corruption, truncation."""
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        PNG_SIGNATURE,
        _chunk,
        decode_png,
        encode_png,
    )

    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"BM not a png")

    ok = encode_png(np.zeros((2, 2, 3), np.uint8))

    def rebuild(bit_depth=8, interlace=0):
        ihdr = _struct.pack(">IIBBBBB", 2, 2, bit_depth, 2, 0, 0, interlace)
        return PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + ok[8 + 25 :]

    with _pytest.raises(ValueError, match="interlace method"):
        decode_png(rebuild(interlace=2))
    with _pytest.raises(ValueError, match="not a legal combination"):
        decode_png(rebuild(bit_depth=4))  # depth 4 with RGB color type
    with _pytest.raises(ValueError, match="bit depth"):
        decode_png(rebuild(bit_depth=3))

    corrupted = bytearray(ok)
    corrupted[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    with _pytest.raises(ValueError):
        decode_png(ok[:30])


def test_png_adam7_decode_golden():
    """Adam7-interlaced PNG (round 8): seven independently-filtered
    passes reassemble to the exact source pixels across color types,
    odd dimensions (empty passes contribute zero bytes), the 16-bit
    combination, and every scanline filter type."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.default_rng(33)
    for shape in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 13, 3), (16, 16, 4),
                  (5, 2, 2), (3, 9)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = decode_png_pixels(encode_png(img, "cycle", interlace=True))
        want = img if img.ndim == 3 else img[..., None]
        assert np.array_equal(got, want), shape
    img16 = rng.integers(0, 256, (11, 7, 3), dtype=np.uint16) * 257
    got = decode_png_pixels(
        encode_png(img16, "cycle", bit_depth=16, interlace=True)
    )
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))


def test_png_low_bit_depth_decode_golden():
    """1/2/4-bit PNG (round 8, closing the PNG boundary): hand-built
    spec-exact streams — MSB-first sample packing with row padding, gray
    scaled by the exact 255/(2^d - 1) factor, palette indices expanded —
    decode to hand-computed pixels."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        PNG_SIGNATURE,
        _chunk,
        decode_png,
        decode_png_pixels,
    )

    def build(w, h, depth, color_type, rows_vals, palette=None):
        ihdr = _struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
        body = bytearray()
        for row in rows_vals:
            bits = []
            for v in row:
                bits.extend(int(b) for b in format(v, f"0{depth}b"))
            nbytes = (w * depth + 7) // 8
            padded = np.zeros(nbytes * 8, dtype=np.uint8)
            padded[: len(bits)] = bits
            body.append(0)  # filter None
            body.extend(np.packbits(padded).tobytes())
        out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
        if palette is not None:
            out += _chunk(b"PLTE", bytes(palette))
        return out + _chunk(b"IDAT", _zlib.compress(bytes(body))) + _chunk(
            b"IEND", b""
        )

    # 1-bit gray, width 5 (3 pad bits per row must be ignored)
    p1 = build(5, 2, 1, 0, [[1, 0, 1, 1, 0], [0, 1, 0, 0, 1]])
    px = decode_png_pixels(p1)
    assert px.shape == (2, 5, 1)
    assert list(px[0, :, 0]) == [255, 0, 255, 255, 0]
    assert list(px[1, :, 0]) == [0, 255, 0, 0, 255]

    # 2-bit gray: 0..3 scale to 0/85/170/255 exactly
    p2 = build(4, 1, 2, 0, [[0, 1, 2, 3]])
    assert list(decode_png_pixels(p2)[0, :, 0]) == [0, 85, 170, 255]
    assert decode_png(p2) == (4, 1, 1, 0.5)

    # 4-bit palette: indices expand through PLTE
    pal = [255, 0, 0, 0, 255, 0, 0, 0, 255]
    p4 = build(3, 2, 4, 3, [[0, 1, 2], [2, 1, 0]], palette=pal)
    px = decode_png_pixels(p4)
    assert px.shape == (2, 3, 3)
    assert list(px[0, 0]) == [255, 0, 0] and list(px[1, 0]) == [0, 0, 255]


def test_png_16bit_decode_golden():
    """16-bit PNG (round 8): filtering is byte-oriented per the spec, so
    the shared unfilter core must reconstruct big-endian sample pairs
    through every filter type; decoded pixels keep the high byte (the
    standard 16->8 downconversion). Values k*257 scale exactly to k, so
    the roundtrip is value-exact, and a full-scale (65535) gray decodes
    to mean_luma 1.0."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        decode_png,
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.default_rng(21)
    for shape in [(7, 5), (7, 5, 3), (9, 4, 4), (6, 6, 2)]:
        k = rng.integers(0, 256, shape, dtype=np.uint16)
        got = decode_png_pixels(encode_png(k * 257, "cycle", bit_depth=16))
        want = k.astype(np.uint8)
        if want.ndim == 2:
            want = want[..., None]
        assert np.array_equal(got, want), shape
    w, h, nc, luma = decode_png(
        encode_png(np.full((4, 6), 65535, np.uint16), "cycle", bit_depth=16)
    )
    assert (w, h, nc, luma) == (6, 4, 1, 1.0)


def test_wav_decode_golden():
    """Real PCM codec: an alternating +/-0.5 square wave has RMS exactly
    0.5 and n-1 sign flips; stereo with mirrored channels mixes to
    silence (0 crossings); 8-bit unsigned round-trips the same values."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav,
        encode_wav,
        is_wav,
    )

    sq = np.tile([0.5, -0.5], 8)  # 16 frames
    payload = encode_wav(sq, 8000)
    assert is_wav(payload)
    nc, rate, nf, dur, rms, zc = decode_wav(payload)
    assert (nc, rate, nf, dur) == (1, 8000, 16, 2)
    assert rms == 0.5 and zc == 15

    stereo = np.stack([sq, -sq], axis=1)  # mono mix == 0
    nc, rate, nf, dur, rms, zc = decode_wav(encode_wav(stereo, 16000))
    assert (nc, nf, zc) == (2, 16, 0) and rms == 0.5

    nc, rate, nf, dur, rms, zc = decode_wav(encode_wav(sq, 8000, bits=8))
    assert (nc, nf) == (1, 16) and rms == 0.5 and zc == 15


def test_wav_decode_24bit_extensible_and_padding():
    """Hand-built 24-bit samples (incl. a negative), a WAVE_FORMAT_
    EXTENSIBLE fmt wrapping PCM, and an odd-length chunk whose pad byte
    the parser must skip."""
    import struct as _struct

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        _PCM_SUBFORMAT,
        decode_wav,
    )

    def le24(v):
        return (v & 0xFFFFFF).to_bytes(3, "little")

    data = le24(1 << 22) + le24(-(1 << 22))  # +0.5, -0.5
    fmt16 = _struct.pack("<HHIIHH", 0xFFFE, 1, 48000, 48000 * 3, 3, 24)
    fmt = fmt16 + _struct.pack("<HHI", 22, 24, 4) + _PCM_SUBFORMAT
    body = (
        b"WAVE"
        + b"LIST" + _struct.pack("<I", 3) + b"odd\x00"  # padded odd chunk
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + _struct.pack("<I", len(body)) + body
    nc, rate, nf, dur, rms, zc = decode_wav(payload)
    assert (nc, rate, nf) == (1, 48000, 2)
    assert rms == 0.5 and zc == 1


def test_wav_decode_rejects():
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav,
        encode_wav,
    )

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")

    ok = bytearray(encode_wav(np.zeros(4), 8000))
    ok[20:22] = _struct.pack("<H", 0x55)  # MPEG Layer 3 in WAV
    with _pytest.raises(NotImplementedError, match="compressed"):
        decode_wav(bytes(ok))

    ok = bytearray(encode_wav(np.zeros(4), 8000))
    ok[20:22] = _struct.pack("<H", 3)  # float format with integer depth
    with _pytest.raises(NotImplementedError, match="float WAV bit depth"):
        decode_wav(bytes(ok))

    ok = bytearray(encode_wav(np.zeros(4), 8000))
    ok[34:36] = _struct.pack("<H", 12)  # 12-bit samples
    with _pytest.raises(NotImplementedError, match="bit depth"):
        decode_wav(bytes(ok))


def test_wav_float_pcm_decodes_exactly():
    """IEEE-float WAV (format 3, round 8): a 32-bit float encode/decode
    roundtrip is LOSSLESS for float32 inputs (no quantization), the
    closed-form RMS/zero-crossing contract holds, and the extensible
    (0xFFFE) header wrapping the float subformat GUID decodes the same."""
    import struct as _struct

    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        _FLOAT_SUBFORMAT,
        decode_wav,
        decode_wav_samples,
        encode_wav,
    )

    x = np.array([0.5, -0.5, 0.25, -0.25, 1.0, -1.0, 0.125, -0.125])
    payload = encode_wav(x, 16000, bits=32)
    xs, sr = decode_wav_samples(payload)
    assert sr == 16000
    assert np.array_equal(xs[:, 0], x)  # every value is a dyadic float32
    nch, rate, n, dur, rms, zc = decode_wav(payload)
    assert (nch, rate, n) == (1, 16000, 8)
    assert rms == round(float(np.sqrt(np.mean(x * x))), 6)
    assert zc == 7  # strict alternation

    # 64-bit float data decodes too (hand-build: format 3, bits 64)
    data = x.astype("<f8").tobytes()
    fmt = _struct.pack("<HHIIHH", 3, 1, 8000, 64000, 8, 64)
    body = (
        b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    f64 = b"RIFF" + _struct.pack("<I", len(body)) + body
    xs64, sr64 = decode_wav_samples(f64)
    assert sr64 == 8000 and np.array_equal(xs64[:, 0], x)

    # WAVE_FORMAT_EXTENSIBLE wrapping the IEEE-float subformat GUID
    ext_fmt = (
        _struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 64000, 4, 32)
        + _struct.pack("<HHI", 22, 32, 0)
        + _FLOAT_SUBFORMAT
    )
    data32 = x.astype("<f4").tobytes()
    body = (
        b"WAVE" + b"fmt " + _struct.pack("<I", len(ext_fmt)) + ext_fmt
        + b"data" + _struct.pack("<I", len(data32)) + data32
    )
    ext = b"RIFF" + _struct.pack("<I", len(body)) + body
    xse, sre = decode_wav_samples(ext)
    assert sre == 16000 and np.array_equal(xse[:, 0], x)


def test_wav_ima_adpcm_decode_golden():
    """IMA/DVI ADPCM (format 0x11, round 8): a hand-computed block
    (predictor 0, index 0, nibbles 2, 15, then six zeros) must decode to
    the exact step-table walk [0, 3, -8, -6, -5, -4, -3, -2, -1]; the
    encoder (which advances its state with the decoder's own step
    function) roundtrips a sine at >25 dB SNR mono and stereo, and block
    headers carry the first sample exactly."""
    import struct as _struct

    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav_samples,
        encode_wav_ima_adpcm,
    )

    fmt = _struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 8, 4, 2, 9)
    data = b"\x00\x00\x00\x00" + bytes([0xF2, 0, 0, 0])
    body = (
        b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + _struct.pack("<I", len(body)) + body
    x, sr = decode_wav_samples(wav)
    assert sr == 8000
    assert [int(round(v * 32768)) for v in x[:, 0]] == [
        0, 3, -8, -6, -5, -4, -3, -2, -1
    ]

    t = np.arange(4000)
    sig = 0.6 * np.sin(2 * np.pi * 440 * t / 8000)
    dec, _ = decode_wav_samples(encode_wav_ima_adpcm(sig, 8000))
    d = dec[: len(sig), 0]
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((sig - d) ** 2))
    assert snr > 25, snr
    assert d[0] == np.round(sig[0] * 32767) / 32768.0  # header is exact

    st = np.stack([sig, -sig], axis=1)
    dec2, _ = decode_wav_samples(encode_wav_ima_adpcm(st, 8000))
    snr2 = 10 * np.log10(
        np.mean(st**2) / np.mean((st - dec2[: len(st)]) ** 2)
    )
    assert snr2 > 25, snr2


def test_wav_ms_adpcm_decode_golden():
    """MS ADPCM (format 2, round 8): per-block coefficient prediction +
    4-bit residuals with the published adaptation table. The two seed
    samples per block are exact; a sine roundtrips at >20 dB SNR mono
    and stereo; an out-of-range predictor index raises."""
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav_samples,
        encode_wav_ms_adpcm,
    )

    t = np.arange(4000)
    sig = 0.6 * np.sin(2 * np.pi * 440 * t / 8000)
    dec, sr = decode_wav_samples(encode_wav_ms_adpcm(sig, 8000))
    assert sr == 8000
    d = dec[: len(sig), 0]
    snr = 10 * np.log10(np.mean(sig**2) / np.mean((sig - d) ** 2))
    assert snr > 20, snr
    assert d[0] == np.round(sig[0] * 32767) / 32768.0
    assert d[1] == np.round(sig[1] * 32767) / 32768.0

    st = np.stack([sig, -sig], axis=1)
    dec2, _ = decode_wav_samples(encode_wav_ms_adpcm(st, 8000))
    snr2 = 10 * np.log10(
        np.mean(st**2) / np.mean((st - dec2[: len(st)]) ** 2)
    )
    assert snr2 > 20, snr2

    bad = bytearray(encode_wav_ms_adpcm(sig[:500], 8000))
    # first data byte after the 44-byte-ish header region: corrupt the
    # block's predictor index (first byte of the data chunk)
    di = bad.find(b"data") + 8
    bad[di] = 9  # only 0..6 are defined
    with _pytest.raises(ValueError, match="predictor index"):
        decode_wav_samples(bytes(bad))


def test_wav_g711_decode_golden():
    """G.711 (formats 7/6, round 8): the published reference expansions —
    mu-law 0xFF/0x7F are plus/minus zero, 0x80 is the +32124 full scale,
    0xEF expands to +132; A-law 0x55/0xD5 are the -8/+8 minimum (after
    ^0x55 the sign bit SET means positive — audioop convention),
    0x2A/0xAA the -32256/+32256 full scale."""
    import struct as _struct

    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav_samples,
    )

    def g711_wav(fmt_code: int, data: bytes) -> bytes:
        fmt = _struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    x, sr = decode_wav_samples(g711_wav(7, bytes([0xFF, 0x7F, 0x80, 0x00, 0xEF])))
    assert sr == 8000
    assert [int(v * 32768) for v in x[:, 0]] == [0, 0, 32124, -32124, 132]
    y, _ = decode_wav_samples(g711_wav(6, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    assert [int(v * 32768) for v in y[:, 0]] == [-8, 8, -32256, 32256]


def test_audio_features_g711_real_in_pipeline(spark):
    """A mu-law payload takes the REAL decode path in the pipeline: an
    alternating full-scale/-full-scale pattern has closed-form RMS
    (32124/32768) and n-1 sign flips."""
    import struct as _struct

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )

    data = bytes([0x80, 0x00] * 400)  # +32124, -32124 alternating
    fmt = _struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + _struct.pack("<I", len(body)) + body
    media = spark.createDataFrame(
        [(1, "audio", payload, "audio/wav", (None, None, 1, None, 8000))],
        MEDIA_SCHEMA,
    )
    got = audio_features(media).collect()[0]
    assert got["decoder"] == "wav"
    assert got["duration_ms"] == 100
    assert got["zero_crossings"] == 799
    assert got["rms"] == round(32124 / 32768.0, 6)


def test_audio_features_ima_adpcm_real_in_pipeline(spark):
    """An IMA-ADPCM payload takes the REAL decode path in the pipeline
    (decoder='wav'), while the MS-ADPCM (format 2) fixture keeps falling
    to the fake — the remaining ADPCM dialect boundary."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        encode_wav_ima_adpcm,
    )

    sig = 0.5 * np.sin(2 * np.pi * 200 * np.arange(808) / 8000)
    payload = encode_wav_ima_adpcm(sig, 8000, block_frames=505)
    media = spark.createDataFrame(
        [(1, "audio", payload, "audio/wav", (None, None, 1, None, 8000))],
        MEDIA_SCHEMA,
    )
    got = audio_features(media).collect()[0]
    assert got["decoder"] == "wav"
    # two 505-frame blocks; the tail block edge-pads to a full block
    assert got["duration_ms"] == int(round(1010 * 1000.0 / 8000))


def test_mp4_metadata_parser_golden():
    """ISO-BMFF parser goldens: builder roundtrip (timescale 1000 makes
    duration exact), a hand-built version-1 stream (64-bit mvhd/tkhd
    times, 90 kHz timescale), audio tracks without dimensions, and the
    malformed-framing rejects."""
    import struct as _struct

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.mp4 import (
        _box,
        build_mp4,
        is_mp4,
        parse_mp4_metadata,
    )

    b = build_mp4(12345, 1920, 1080, n_audio_tracks=1)
    assert is_mp4(b)
    assert parse_mp4_metadata(b) == ("isom", 12345, 1920, 1080, 2, 0, 0.0)
    assert parse_mp4_metadata(build_mp4(500, 640, 360)) == (
        "isom", 500, 640, 360, 1, 0, 0.0,
    )
    # round 9: sample tables — frame count from stts (validated against
    # stsz), fps from mdhd timescale over stts ticks
    assert parse_mp4_metadata(
        build_mp4(10000, 640, 360, n_frames=240, fps=24.0)
    ) == ("isom", 10000, 640, 360, 1, 240, 24.0)
    assert parse_mp4_metadata(
        build_mp4(8008, 1280, 720, n_frames=240, fps=29.97)
    )[5:] == (240, 29.97)
    corrupt = bytearray(build_mp4(1000, 64, 64, n_frames=10, fps=25.0))
    i = corrupt.find(b"stsz")
    corrupt[i + 12 : i + 16] = _struct.pack(">I", 11)
    with _pytest.raises(ValueError, match="stsz"):
        parse_mp4_metadata(bytes(corrupt))

    ident = _struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )
    mvhd1 = _box(
        b"mvhd",
        _struct.pack(">Bxxx", 1)
        + _struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7)
        + _struct.pack(">IHHQ", 0x10000, 0x100, 0, 0)
        + ident + b"\x00" * 24 + _struct.pack(">I", 2),
    )
    tkhd1 = _box(
        b"tkhd",
        _struct.pack(">Bxxx", 1)
        + _struct.pack(">QQIxxxxQ", 0, 0, 1, 7 * 90000)
        + b"\x00" * 8 + _struct.pack(">HHHH", 0, 0, 0, 0)
        + ident + _struct.pack(">II", 320 << 16, 240 << 16),
    )
    p = (
        _box(b"ftyp", b"mp42" + _struct.pack(">I", 0))
        + _box(b"moov", mvhd1 + _box(b"trak", tkhd1))
    )
    assert parse_mp4_metadata(p) == ("mp42", 7000, 320, 240, 1, 0, 0.0)

    with _pytest.raises(ValueError, match="ftyp"):
        parse_mp4_metadata(b"\x00\x00\x00\x08free")
    with _pytest.raises(ValueError):
        parse_mp4_metadata(build_mp4(1, 2, 2)[:40])  # truncated box


def test_mp3_metadata_golden():
    """MPEG audio header walk (round 9): the canonical FF FB 90 00
    header (MPEG-1 Layer III, 128 kbps, 44.1 kHz, stereo, no CRC) and
    the public length formula floor(144*128000/44100) = 417; duration,
    version/layer/rate variants, Xing VBR declaration, ID3v2/ID3v1 tag
    skips, and loud failures on truncation, mid-stream parameter
    changes, and trailing garbage."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import (
        build_mp3,
        is_mp3,
        parse_mp3_metadata,
    )

    p = build_mp3(38)
    assert is_mp3(p)
    assert p[:4] == bytes([0xFF, 0xFB, 0x90, 0x00])
    assert len(p) == 38 * 417
    # 38 frames * 1152 samples / 44100 Hz = 992.65... ms
    assert parse_mp3_metadata(p) == ("1", 3, 44100, 128, 38, 993, False, "stereo")

    # Xing-tagged VBR: declared frame count wins, placeholder frame
    # excluded from the byte-average bitrate; ID3 tags are skipped
    v = build_mp3(100, xing=True, id3v2_bytes=64, id3v1=True)
    ver, layer, rate, kbps, nf, dur, vbr, mode = parse_mp3_metadata(v)
    assert (nf, dur, vbr) == (100, 2612, True)
    assert kbps == 128  # zero-padded CBR frames average back to nominal

    # Xing tag whose flags word omits the frames field (r10 ADVICE): the
    # placeholder frame must STILL be excluded from the audio frame count
    # and the byte-average bitrate (xoff = 4 header + 32 side-info bytes)
    x = bytearray(build_mp3(10, xing=True))
    x[40:44] = b"\x00\x00\x00\x00"
    assert parse_mp3_metadata(bytes(x)) == (
        "1", 3, 44100, 128, 10, 261, True, "stereo"
    )
    # Info tag (CBR convention): placeholder excluded, not VBR
    x[36:40] = b"Info"
    x[40:44] = b"\x00\x00\x00\x01"
    x[44:48] = (10).to_bytes(4, "big")
    assert parse_mp3_metadata(bytes(x)) == (
        "1", 3, 44100, 128, 10, 261, False, "stereo"
    )

    # An ID3v2 tag alone is no longer an MP3 sniff hit — the sniff
    # commits on the post-tag frame sync (so tagged AAC routes to ADTS)
    id3_only = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 8]) + b"\x00" * 8
    assert not is_mp3(id3_only)

    # MPEG-2 Layer III: 576 samples/frame, low-rate bitrate table
    assert parse_mp3_metadata(
        build_mp3(20, bitrate_kbps=64, sample_rate=22050, mode="mono", version="2")
    ) == ("2", 3, 22050, 64, 20, 522, False, "mono")
    # Layer I: 384 samples/frame, slot size 4
    assert parse_mp3_metadata(
        build_mp3(10, bitrate_kbps=448, sample_rate=32000, layer=1)
    ) == ("1", 1, 32000, 448, 10, 120, False, "stereo")

    with _pytest.raises(ValueError, match="truncated"):
        parse_mp3_metadata(p[:100])
    with _pytest.raises(ValueError, match="sync"):
        parse_mp3_metadata(p + b"garbage!")
    mixed = build_mp3(3) + build_mp3(3, sample_rate=48000)
    with _pytest.raises(ValueError, match="mid-stream"):
        parse_mp3_metadata(mixed)
    assert not is_mp3(b"RIFF....WAVE")


def test_adts_metadata_golden():
    """ADTS AAC header walk (round 9): explicit 13-bit frame lengths,
    1024 samples per raw block, profile/rate/channel bits; disjoint
    sniff from MPEG audio (layer bits 00 = reserved MPEG layer); loud
    failures on truncation and trailing bytes."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import (
        build_adts,
        build_mp3,
        is_adts,
        is_mp3,
        parse_adts_metadata,
    )

    p = build_adts(43, frame_bytes=300, sample_rate=22050, n_channels=1)
    assert is_adts(p) and not is_mp3(p)
    assert len(p) == 43 * 300
    # 43 * 1024 * 1000 / 22050 = 1996.9... ms; 43*300*8/1997 = 51.7 kbps
    assert parse_adts_metadata(p) == ("LC", 22050, 1, 43, 1997, 52)
    assert parse_adts_metadata(
        build_adts(5, profile="Main", sample_rate=96000, n_channels=6)
    ) == ("Main", 96000, 6, 5, 53, 193)

    assert not is_adts(build_mp3(3)) and is_mp3(build_mp3(3))

    # ID3-tagged ADTS-AAC (common in the wild, r10 ADVICE): sniffs as
    # ADTS (not MPEG), parses identically, bitrate excludes tag bytes
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 64]) + b"\x00" * 64
    tagged = id3 + p
    assert is_adts(tagged) and not is_mp3(tagged)
    assert parse_adts_metadata(tagged) == ("LC", 22050, 1, 43, 1997, 52)

    with _pytest.raises(ValueError, match="truncated"):
        parse_adts_metadata(p[:-10])
    with _pytest.raises(ValueError, match="trailing"):
        parse_adts_metadata(p + b"xx")
    mixed = build_adts(2) + build_adts(2, sample_rate=32000)
    with _pytest.raises(ValueError, match="mid-stream"):
        parse_adts_metadata(mixed)


def test_flac_metadata_golden():
    """FLAC metadata-block walk (round 10): packed STREAMINFO bit fields
    (20-bit rate, 3-bit channels-1, 5-bit bps-1, 36-bit total samples),
    chain walk over PADDING, exact duration, frame-sync verification,
    and loud failures on truncation / bad first block / reserved types."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        build_flac,
        is_flac,
        parse_flac_metadata,
    )

    p = build_flac(96000, sample_rate=48000, padding_bytes=10, frame_bytes=64)
    assert is_flac(p) and p[:4] == b"fLaC"
    assert len(p) == 42 + 14 + 64
    # 96000 samples / 48000 Hz = exactly 2000 ms; 2 blocks walked
    assert parse_flac_metadata(p) == (48000, 2, 16, 96000, 2000, 2, 64)

    # no padding -> single block; odd rate/channels/bit-depth packing
    q = build_flac(44100, sample_rate=44100, n_channels=6,
                   bits_per_sample=24, frame_bytes=2)
    assert parse_flac_metadata(q) == (44100, 6, 24, 44100, 1000, 1, 2)
    # zero samples: metadata-only container, no frame region required
    assert parse_flac_metadata(build_flac(0, frame_bytes=0))[3] == 0

    with _pytest.raises(ValueError, match="fLaC"):
        parse_flac_metadata(b"RIFF....WAVE")
    with _pytest.raises(ValueError, match="runs past"):
        parse_flac_metadata(p[:20])
    bad = bytearray(p)
    bad[4] = 0x83  # first block not STREAMINFO
    with _pytest.raises(ValueError, match="STREAMINFO"):
        parse_flac_metadata(bytes(bad))
    nosync = bytearray(build_flac(96, frame_bytes=4))
    nosync[-4] = 0x00  # clobber the frame sync byte
    with _pytest.raises(ValueError, match="sync"):
        parse_flac_metadata(bytes(nosync))


def test_opus_metadata_golden():
    """Ogg/Opus page walk (round 10): RFC 3533 page framing with REAL
    CRC-32 verification (poly 0x04c11db7, unreflected), OpusHead fields,
    granule-derived duration, and loud failures on truncation, CRC
    corruption, sequence gaps, and post-EOS pages."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import is_mp3
    from routing_algorithm_for_graph_dbs_spark.operators.opus import (
        build_opus,
        is_ogg_opus,
        ogg_crc,
        parse_opus_metadata,
    )

    # the Ogg CRC is NOT the zlib CRC: known vector for the zero page
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7

    p = build_opus(5, packet_bytes=50, pre_skip=312, n_channels=2)
    assert is_ogg_opus(p) and not is_mp3(p)
    assert len(p) == 47 + 44 + 5 * 78
    # 5 pages * 960 ticks / 48 = 100 ms; 7 pages total
    assert parse_opus_metadata(p) == (2, 312, 48000, 7, 100)
    assert parse_opus_metadata(
        build_opus(1, packet_bytes=1, pre_skip=0,
                   input_sample_rate=16000, n_channels=1)
    ) == (1, 0, 16000, 3, 20)

    with _pytest.raises(ValueError, match="truncated"):
        parse_opus_metadata(p[:-1])
    flip = bytearray(p)
    flip[100] ^= 1
    with _pytest.raises(ValueError, match="CRC"):
        parse_opus_metadata(bytes(flip))
    with _pytest.raises(ValueError, match="EOS"):
        # drop the last page entirely: clean page boundary, no EOS
        parse_opus_metadata(p[: 47 + 44 + 4 * 78])
    two = build_opus(2)
    with _pytest.raises(ValueError, match="after the EOS"):
        parse_opus_metadata(two + two[91:169])  # re-append an audio page


def test_flac_pcm_golden_frame():
    """Hand-assembled spec golden (RFC 9639), independent of the
    encoder: mono, 8-bit, 16 constant samples of 42, blocksize 16.
    Header bits: sync 11111111 111110, reserved 0, blocking 0 ->
    FF F8; bs code 0110 (uncommon 8-bit) + rate code 0000 -> 60;
    assignment 0000 + bps code 001 (8-bit) + reserved 0 -> 02; frame
    number 0 -> 00; blocksize-1 -> 0F. CRC-8(FF F8 60 02 00 0F) = 11
    (recomputed below bit-by-bit, NOT with the module's table).
    Subframe: pad 0 + type 000000 + wasted 0 -> 00; value 42 -> 2A.
    CRC-16 over the 9 body bytes = 7B B5."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        decode_flac_pcm,
        encode_flac_pcm,
    )

    def crc_naive(data, poly, width):  # independent bit-by-bit CRC
        crc, top, mask = 0, 1 << (width - 1), (1 << width) - 1
        for b in data:
            crc ^= b << (width - 8)
            for _ in range(8):
                crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
                crc &= mask
        return crc

    header = bytes([0xFF, 0xF8, 0x60, 0x02, 0x00, 0x0F])
    assert crc_naive(header, 0x07, 8) == 0x11
    body = header + bytes([0x11, 0x00, 0x2A])
    assert crc_naive(body, 0x8005, 16) == 0x7BB5
    golden = body + b"\x7b\xb5"

    p = encode_flac_pcm(
        _np.full((16, 1), 42), sample_rate=48000, bits_per_sample=8,
        block_size=16,
    )
    assert p[42:] == golden  # encoder reproduces the hand build exactly
    got, rate, bps = decode_flac_pcm(p)
    assert rate == 48000 and bps == 8
    assert got.shape == (16, 1) and (got == 42).all()


def test_flac_pcm_roundtrip_matrix():
    """Bit-exact encode->decode across every subframe type, stereo
    decorrelation mode, bit depth, Rice-escape path, multi-frame
    streams with 2-byte UTF-8 frame numbers, and the empty stream."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        decode_flac_pcm,
        encode_flac_pcm,
        parse_flac_metadata,
    )

    rng = _np.random.RandomState(7)
    cases = [
        (_np.arange(100)[:, None] - 50, {}),
        (_np.full((64, 1), 123), {}),
        (_np.stack([_np.arange(200)] * 2, 1), {"stereo_mode": "left_side"}),
        (rng.randint(-2000, 2000, (300, 2)), {"stereo_mode": "right_side"}),
        (rng.randint(-2000, 2000, (300, 2)), {"stereo_mode": "mid_side"}),
        (rng.randint(-30000, 30000, (500, 3)), {"block_size": 192}),
        (rng.randint(-128, 127, (50, 1)),
         {"bits_per_sample": 8, "force_subframe": "verbatim"}),
        (rng.randint(-100, 100, 400).cumsum()[:, None],
         {"force_subframe": "lpc", "block_size": 256}),
        (rng.randint(-2**23, 2**23 - 1, (100, 2)), {"bits_per_sample": 24}),
        # spiky signal drives at least one partition to the escape path
        (_np.where(_np.arange(300) % 37 == 0, 30000, 1)[:, None],
         {"block_size": 64}),
        # 200 frames of 16 -> frame numbers need the 2-byte UTF-8 form
        ((rng.randint(-5, 5, 16 * 200).cumsum() % 1000)[:, None],
         {"block_size": 16}),
        (_np.zeros((0, 2), dtype=int), {}),
    ]
    for arr, kw in cases:
        arr = _np.asarray(arr, dtype=_np.int64)
        p = encode_flac_pcm(arr, **kw)
        got, rate, bps = decode_flac_pcm(p)
        assert got.shape == arr.shape and (got == arr).all(), kw
        # the container is also a valid metadata-walk subject
        meta = parse_flac_metadata(p)
        assert meta[3] == arr.shape[0]


def test_flac_pcm_32bit_roundtrip():
    """Round-11 self-review regression: full-range 32-bit samples
    difference past the 5-bit escape field's reach — the encoder must
    fall back to verbatim subframes, not truncate the width."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        decode_flac_pcm,
        encode_flac_pcm,
    )

    rng = _np.random.RandomState(3)
    x = rng.randint(-2**31, 2**31 - 1, (64, 2)).astype(_np.int64)
    p = encode_flac_pcm(x, bits_per_sample=32)
    got, _, bps = decode_flac_pcm(p)
    assert bps == 32 and (got == x).all()
    # mid/side with a 33-bit side channel round-trips too
    p2 = encode_flac_pcm(x, bits_per_sample=32, stereo_mode="mid_side")
    assert (decode_flac_pcm(p2)[0] == x).all()
    # the forced-LPC path cannot fall back: it must raise loudly
    with _pytest.raises(ValueError, match="verbatim"):
        encode_flac_pcm(x, bits_per_sample=32, force_subframe="lpc")


def test_bmp_v4_v5_headers_decode():
    """Round-11 self-review regression: V4/V5 (108/124-byte) info
    headers share BITMAPINFOHEADER's first-40-byte layout and must keep
    decoding (they did before the palette widening). The 12-byte core
    header decodes too since round 12 — asserted here on the same
    pixels through its own field widths."""
    import struct as _struct

    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        decode_bmp_pixels,
    )

    rng = _np.random.RandomState(4)
    px = rng.randint(0, 256, (3, 2, 3)).astype(_np.uint8)
    for info_size in (40, 108, 124):
        h, w = px.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        body = _np.zeros((h, row_bytes), dtype=_np.uint8)
        body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
        data = body.tobytes()
        off = 14 + info_size
        hdr = _struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
        info = _struct.pack(
            "<IiiHHIIiiII", info_size, w, h, 1, 24, 0, len(data),
            0, 0, 0, 0,
        ) + b"\x00" * (info_size - 40)
        assert (decode_bmp_pixels(hdr + info + data) == px).all(), info_size
    # the 12-byte core header decodes the same pixels (round 12)
    h, w = px.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = _np.zeros((h, row_bytes), dtype=_np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    hdr = _struct.pack("<2sIHHI", b"BM", 26 + len(data), 0, 0, 26)
    core = hdr + _struct.pack("<IHHHH", 12, w, h, 1, 24) + data
    assert (decode_bmp_pixels(core) == px).all()
    # an unknown header size is the remaining raise
    hdr = _struct.pack("<2sIHHI", b"BM", 34, 0, 0, 34)
    with _pytest.raises(NotImplementedError, match="unknown"):
        decode_bmp_pixels(
            hdr
            + _struct.pack("<IiiHHIIiiII", 20, 2, 2, 1, 24, 0, 0, 0, 0, 0, 0)
            + b"\x00" * 44
        )


def test_flac_pcm_verification_is_loud():
    """Every integrity layer raises on tampering: header CRC-8, frame
    CRC-16, and — with the CRC repaired — the STREAMINFO MD5."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators import flac as _fl

    x = _np.arange(-100, 100, dtype=_np.int64)[:, None] * 3
    p = bytearray(_fl.encode_flac_pcm(x))
    audio_at = 42  # fLaC + 4-byte block header + 34-byte STREAMINFO

    bad = bytearray(p)
    bad[audio_at + 4] ^= 0x01  # inside the frame header (coded number)
    with _pytest.raises(ValueError, match="CRC-8"):
        _fl.decode_flac_pcm(bytes(bad))

    bad = bytearray(p)
    bad[-3] ^= 0x01  # inside the residual, before the CRC-16 footer
    with _pytest.raises(ValueError, match="CRC-16"):
        _fl.decode_flac_pcm(bytes(bad))

    # flip a sample bit AND repair the frame CRC-16: only the MD5 can
    # catch it now (single-frame stream: frame spans audio_at..-2)
    bad = bytearray(p)
    bad[-10] ^= 0x40
    fixed = _fl._crc16(bytes(bad[audio_at:-2]))
    bad[-2:] = fixed.to_bytes(2, "big")
    with _pytest.raises(ValueError, match="MD5"):
        _fl.decode_flac_pcm(bytes(bad))

    with _pytest.raises(ValueError, match="trailing bytes"):
        _fl.decode_flac_pcm(bytes(p) + b"\x00")


def test_flac_pcm_wasted_bits_decode():
    """The decoder handles the wasted-bits subframe flag (encoder never
    emits it, real encoders do): hand-build a constant subframe with 1
    wasted bit — stored value 21 at bps-1, reconstructed 42."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators import flac as _fl

    w = _fl._BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)            # reserved + fixed blocking
    w.write(6, 4)            # uncommon 8-bit blocksize
    w.write(0, 4)            # rate from STREAMINFO
    w.write(0, 4)            # mono
    w.write(_fl._BPS_CODES[8], 3)
    w.write(0, 1)
    w.write(0, 8)            # frame number 0
    w.write(15, 8)           # blocksize 16
    header = w.getvalue()
    w.write(_fl._crc8(header), 8)
    w.write(0, 1)            # subframe pad
    w.write(0, 6)            # constant
    w.write(1, 1)            # wasted-bits flag
    w.write(1, 1)            # unary 0 -> wasted = 1
    w.write_signed(21, 7)    # bps 8 - 1 wasted
    w.align()
    body = w.getvalue()
    frame = body + _fl._crc16(body).to_bytes(2, "big")

    packed = (48000 << 44) | (0 << 41) | (7 << 36) | 16
    streaminfo = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
        + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + b"\x00" * 6 + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    got, rate, bps = _fl.decode_flac_pcm(streaminfo + frame)
    assert (got == 42).all() and got.shape == (16, 1)

    # wasted >= bps must raise, not decode nonsense
    with _pytest.raises(ValueError, match="wasted"):
        # pad 0, type 0, wasted flag 1, unary 7 zeros... -> wasted 8 = bps
        _fl._decode_subframe(_fl._MsbBitReader(
            bytes([0b00000001, 0b00000001, 0x00, 0x00]), 0), 4, 8)


def test_flac_real_decode_in_audio_features(spark):
    """audio_features routes decodable FLAC to the REAL sample decoder
    (decoder='flac', full WAV-grade stats); metadata-valid streams
    whose frames do not decode fall back to the STREAMINFO walk
    (decoder='flac-meta') NON-STRICT only — under strict=True the
    codec error propagates like every other strict path (round-12
    ADVICE fix)."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        build_flac,
        encode_flac_pcm,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
    )

    sig = _np.full(200, 1024, dtype=_np.int64)
    sig[1::2] = -1024
    real = encode_flac_pcm(
        _np.stack([sig, sig], 1), sample_rate=16000, block_size=192,
        stereo_mode="mid_side",
    )
    undecodable = build_flac(96000, sample_rate=32000)  # zeroed frames
    media = spark.createDataFrame(
        [(1, "audio", real, "audio/flac"),
         (2, "audio", undecodable, "audio/flac")],
        "media_id long, kind string, payload binary, mime string",
    )
    got = {r["media_id"]: r.asDict()
           for r in audio_features(media).collect()}
    assert got[1]["decoder"] == "flac"
    assert got[1]["rms"] == round(1024 / 32768, 6)
    assert got[1]["zero_crossings"] == 199
    assert got[1]["duration_ms"] == round(200 * 1000 / 16000)
    assert got[1]["sample_rate"] == 16000
    assert got[2]["decoder"] == "flac-meta"
    assert got[2]["duration_ms"] == 3000 and got[2]["rms"] is None
    # strict: the decodable stream still yields full stats...
    strict_ok = audio_features(
        media.filter("media_id = 1"), strict=True
    ).collect()[0].asDict()
    assert strict_ok["decoder"] == "flac"
    # ...but the frame-decode failure PROPAGATES instead of downgrading
    with _pytest.raises(Exception, match="FLAC"):
        audio_features(media.filter("media_id = 2"), strict=True).collect()


def test_id3_tagged_flac_routes_to_flac(spark):
    """A leading ID3v2 tag must not hide a FLAC stream (round 11 —
    same treatment the r10 fix gave ID3-tagged ADTS-AAC): both
    audio_features (real sample decode) and flac_metadata (STREAMINFO
    walk) skip the tag before sniffing."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.flac import (
        encode_flac_pcm,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        flac_metadata,
    )

    sig = _np.full(64, 512, dtype=_np.int64)
    sig[1::2] = -512
    flac_bytes = encode_flac_pcm(sig[:, None], sample_rate=8000)
    sz = 32
    id3 = (b"ID3\x03\x00\x00"
           + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F])
           + bytes(sz))
    tagged = id3 + flac_bytes
    media = spark.createDataFrame(
        [(1, "audio", tagged, "audio/flac")],
        "media_id long, kind string, payload binary, mime string",
    )
    af = audio_features(media, strict=True).collect()[0].asDict()
    assert af["decoder"] == "flac" and af["duration_ms"] == 8
    assert af["rms"] == round(512 / 32768, 6)
    fm = flac_metadata(media, strict=True).collect()[0].asDict()
    assert fm["parser"] == "flac" and fm["total_samples"] == 64


def test_flac_opus_in_audio_features(spark):
    """FLAC and Ogg/Opus payloads in the audio pipeline get real
    duration/rate (decoder='flac-meta'/'opus-meta'); the strict
    metadata extractors reject foreign payloads."""
    from routing_algorithm_for_graph_dbs_spark.operators.flac import build_flac
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        flac_metadata,
        opus_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.opus import build_opus

    rows = [
        (1, "audio", build_flac(96000, sample_rate=32000), "audio/flac",
         (None, None, 2, None, 32000)),
        (2, "audio", build_opus(25, input_sample_rate=24000), "audio/ogg",
         (None, None, 2, None, 24000)),
        (3, "audio", b"not audio", "audio/flac",
         (None, None, None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in audio_features(media).collect()}
    assert got[1]["decoder"] == "flac-meta"
    assert (got[1]["duration_ms"], got[1]["sample_rate"]) == (3000, 32000)
    assert got[2]["decoder"] == "opus-meta"
    assert (got[2]["duration_ms"], got[2]["sample_rate"]) == (500, 24000)
    assert got[3]["decoder"] == "fake"
    fm = {r["media_id"]: r.asDict() for r in flac_metadata(media).collect()}
    assert fm[1]["parser"] == "flac" and fm[1]["total_samples"] == 96000
    assert fm[2]["parser"] == "fake" and fm[3]["parser"] == "fake"
    om = {r["media_id"]: r.asDict() for r in opus_metadata(media).collect()}
    assert om[2]["parser"] == "opus" and om[2]["n_pages"] == 27
    assert om[1]["parser"] == "fake"


def test_webm_metadata_golden():
    """EBML/Matroska walk (round 10): RFC 8794 VINT framing (IDs keep
    the marker, sizes strip it, non-minimal 8-byte sizes accepted),
    TimecodeScale x f32 Duration -> exact ms, track registry ids,
    cluster hop-by-size; loud failures on truncation, missing header
    fields, and bad magic."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.ebml import (
        build_webm,
        is_webm,
        parse_webm_metadata,
    )

    p = build_webm(30000, n_clusters=2, cluster_pad=1000)
    assert is_webm(p)
    assert len(p) == 106 + 4 + 2 * (1000 + 24)
    assert parse_webm_metadata(p) == (
        "webm", 30000, 1, 1, 1280, 720, 48000, 2, 2
    )
    assert parse_webm_metadata(
        build_webm(12345, width=1920, height=1080, sample_rate=44100,
                   n_channels=1, doctype="matroska")
    ) == ("matroska", 12345, 1, 1, 1920, 1080, 44100, 1, 1)

    with _pytest.raises(ValueError, match="magic"):
        parse_webm_metadata(b"RIFF....WAVE")
    with _pytest.raises(ValueError, match="runs past"):
        parse_webm_metadata(p[:-3])
    with _pytest.raises(ValueError, match="truncated"):
        parse_webm_metadata(p[:40])
    # a clean EBML header alone (32 + len('webm') = 36 bytes), no Segment
    with _pytest.raises(ValueError, match="Segment"):
        parse_webm_metadata(p[:36])


def test_webm_first_track_contract():
    """Dimensions/audio fields come from the FIRST track of each type
    ONLY — a first video track missing PixelWidth must not be mixed
    with a later track's values (r10 review finding)."""
    import struct as _struct

    from routing_algorithm_for_graph_dbs_spark.operators import ebml as E

    info = E._el(
        E._INFO,
        E._el(E._TIMECODESCALE, (1_000_000).to_bytes(4, "big"), 3)
        + E._el(E._DURATION, _struct.pack(">f", 1000.0), 2),
        4,
    )
    v1 = E._el(
        E._TRACKENTRY,
        E._el(E._TRACKTYPE, b"\x01", 1)
        + E._el(E._VIDEO, E._el(E._PIXELH, (480).to_bytes(2, "big"), 1), 1),
        1,
    )
    v2 = E._el(
        E._TRACKENTRY,
        E._el(E._TRACKTYPE, b"\x01", 1)
        + E._el(
            E._VIDEO,
            E._el(E._PIXELW, (1920).to_bytes(2, "big"), 1)
            + E._el(E._PIXELH, (1080).to_bytes(2, "big"), 1),
            1,
        ),
        1,
    )
    seg_body = info + E._el(E._TRACKS, v1 + v2, 4)
    payload = (
        E.build_webm(1)[:36]  # the 36-byte EBML header (doctype 'webm')
        + E._SEGMENT.to_bytes(4, "big")
        + E._vint_size8(len(seg_body))
        + seg_body
    )
    dt, dur, nv, na, w, h, rate, ch, nclu = E.parse_webm_metadata(payload)
    assert (dt, dur, nv, na, nclu) == ("webm", 1000, 2, 0, 0)
    # first video track governs: width missing there stays missing
    assert (w, h) == (None, 480)


def test_webm_metadata_extractor(spark):
    """webm_metadata routes EBML payloads to the real walk
    (parser='webm') and non-EBML to the fake path; strict raises."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.ebml import build_webm
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        webm_metadata,
    )

    media = spark.createDataFrame(
        [(1, build_webm(5000, n_clusters=3)), (2, b"not a container")],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r.asDict() for r in webm_metadata(media).collect()}
    assert got[1]["parser"] == "webm"
    assert (got[1]["duration_ms"], got[1]["n_clusters"]) == (5000, 3)
    assert got[2]["parser"] == "fake"
    with _pytest.raises(Exception):
        webm_metadata(media, strict=True).collect()


def test_webm_unknown_size_cluster_raises():
    """An unknown-size element that is NOT the Segment (e.g. the
    unknown-size Clusters standard in live-streamed Matroska) must raise
    rather than silently extend to the parent's end — extending would
    swallow every following Cluster and report n_clusters=1 (ADVICE r10).
    RFC 8794 §6.2 sibling-termination is declared out of scope."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators import ebml as E

    good = E.build_webm(4000, n_clusters=2, cluster_pad=8)
    # Segment with unknown size (legal) whose body holds an
    # unknown-size Cluster followed by a sibling Cluster
    cluster_body = b"\xa3\x82" + b"\x00\x00"  # SimpleBlock-ish filler
    seg_body = (
        E._CLUSTER.to_bytes(4, "big") + b"\xff" + cluster_body
        + E._CLUSTER.to_bytes(4, "big") + E._vint_size8(len(cluster_body))
        + cluster_body
    )
    payload = (
        good[:36]
        + E._SEGMENT.to_bytes(4, "big")
        + b"\xff"  # unknown-size Segment: allowed, extends to EOF
        + seg_body
    )
    with _pytest.raises(ValueError, match="unknown-size EBML element"):
        E.parse_webm_metadata(payload)
    # the sized equivalent of the same layout parses fine (the raise is
    # specific to the unknown-size non-Segment element, not the layout)
    import struct as _struct

    info = E._el(E._INFO, E._el(E._DURATION, _struct.pack(">f", 1000.0), 2), 4)
    one_cluster = (
        E._CLUSTER.to_bytes(4, "big")
        + E._vint_size8(len(cluster_body))
        + cluster_body
    )
    sized = (
        good[:36]
        + E._SEGMENT.to_bytes(4, "big")
        + E._vint_size8(len(info) + 2 * len(one_cluster))
        + info
        + one_cluster * 2
    )
    assert E.parse_webm_metadata(sized)[8] == 2  # n_clusters


def test_aac_metadata_in_audio_features(spark):
    """An ADTS payload in the audio pipeline gets real duration/rate
    (decoder='aac-meta'); aac_metadata's fake path handles non-ADTS."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import build_adts
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        aac_metadata,
        audio_features,
    )

    payload = build_adts(43, sample_rate=22050, n_channels=1)
    rows = [
        (1, "audio", payload, "audio/aac", (None, None, 1, None, 22050)),
        (2, "audio", b"not audio", "audio/aac", (None, None, None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in audio_features(media).collect()}
    assert got[1]["decoder"] == "aac-meta"
    assert (got[1]["duration_ms"], got[1]["sample_rate"]) == (1997, 22050)
    meta = {r["media_id"]: r.asDict() for r in aac_metadata(media).collect()}
    assert meta[1]["parser"] == "aac" and meta[1]["n_frames"] == 43
    assert meta[2]["parser"] == "fake"


def test_mp3_metadata_in_audio_features(spark):
    """An MPEG payload in the audio pipeline takes the metadata walk:
    real duration/sample-rate, null sample stats, decoder='mp3-meta' —
    while sample decode stays the strict-mode boundary for genuinely
    undecodable (non-MPEG, non-WAV) payloads."""
    from routing_algorithm_for_graph_dbs_spark.operators.mp3 import build_mp3
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )

    payload = build_mp3(38)  # 993 ms at 44.1 kHz
    media = spark.createDataFrame(
        [(1, "audio", payload, "audio/mpeg", (None, None, None, None, None))],
        MEDIA_SCHEMA,
    )
    got = audio_features(media, strict=True).collect()[0]
    assert got["decoder"] == "mp3-meta"
    assert (got["duration_ms"], got["sample_rate"]) == (993, 44100)
    assert got["rms"] is None and got["zero_crossings"] is None
    assert got["mean_amplitude"] is None


def test_video_metadata_real_and_fake_in_pipeline(spark):
    """video/mp4 rows with real ISO-BMFF bytes parse for REAL inside the
    Arrow-batched path (parser='mp4', exact duration/dims/tracks); text
    payloads labeled video/mp4 keep the deterministic fake; strict=True
    raises on them."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.mp4 import build_mp4
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_metadata,
    )

    real = build_mp4(2500, 1280, 720, n_audio_tracks=1)
    rows = [
        (1, "video", real, "video/mp4", (None, None, None, 2500, None)),
        (2, "video", b"not a video at all", "video/mp4",
         (None, None, None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in video_metadata(media).collect()}
    assert got[1]["parser"] == "mp4"
    assert (got[1]["duration_ms"], got[1]["width"], got[1]["height"],
            got[1]["n_tracks"]) == (2500, 1280, 720, 2)
    assert got[2]["parser"] == "fake"

    with _pytest.raises(Exception) as ei:
        video_metadata(
            media.filter(media.media_id == 2), strict=True
        ).collect()
    assert "NotImplementedError" in str(ei.value) or "ISO-BMFF" in str(
        ei.value
    )


def test_audio_features_float_wav_real_in_pipeline(spark):
    """A float-PCM WAV payload now takes the REAL decode path inside the
    Arrow-batched pipeline (decoder='wav', exact duration/rate), not the
    fake — the round-8 boundary shrink."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.wav import encode_wav

    x = np.tile([0.5, -0.5], 400)  # 800 frames at 8 kHz -> 100 ms
    payload = encode_wav(x, 8000, bits=32)
    media = spark.createDataFrame(
        [(1, "audio", payload, "audio/wav", (None, None, 1, None, 8000))],
        MEDIA_SCHEMA,
    )
    got = audio_features(media).collect()[0]
    assert got["decoder"] == "wav"
    assert got["duration_ms"] == 100
    assert got["rms"] == 0.5
    assert got["zero_crossings"] == 799


def test_image_features_real_png_in_pipeline(spark):
    """image/png rows with REAL PNG bytes decode for real (decoder='png',
    true dimensions) while text payloads mislabeled image/png keep the
    deterministic fake — the signature sniff is what separates them."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.png import encode_png

    png = encode_png(np.full((5, 9, 3), 200, np.uint8), "cycle")
    rows = [
        (1, "image", png, "image/png", (9, 5, 3, None, None)),
        (2, "image", b"\x89PNGfakebytes", "image/png", (800, 600, 3, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in image_features(media).collect()}
    assert got[1]["decoder"] == "png"
    assert (got[1]["width"], got[1]["height"]) == (9, 5)
    assert got[1]["mean_luma"] == round(200 / 255.0, 6)
    assert got[2]["decoder"] == "fake"
    # strict still raises for the mislabeled row, not the real PNG
    strict_got = image_features(
        media.filter(media.media_id == 1), strict=True
    ).collect()
    assert strict_got[0]["decoder"] == "png"


def test_audio_features_real_wav_in_pipeline(spark):
    """RIFF-sniffed dispatch inside the Arrow-batched audio extractor:
    real WAV rows get true RMS/zero-crossings/duration/rate, text rows
    keep the digest fake with null duration/rate."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.wav import encode_wav

    wav = encode_wav(np.tile([0.5, -0.5], 8), 8000)
    rows = [
        (1, "audio", wav, "audio/wav", (None, None, 1, 2, 8000)),
        (2, "audio", b"not really audio", "audio/wav", (None, None, 1, 9, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in audio_features(media).collect()}
    assert got[1]["decoder"] == "wav"
    assert got[1]["rms"] == 0.5 and got[1]["zero_crossings"] == 15
    assert got[1]["duration_ms"] == 2 and got[1]["sample_rate"] == 8000
    assert got[2]["decoder"] == "fake"
    assert got[2]["duration_ms"] is None and got[2]["sample_rate"] is None
    # strict raises only when a non-WAV payload is present
    strict_ok = audio_features(
        media.filter(media.media_id == 1), strict=True
    ).collect()
    assert strict_ok[0]["decoder"] == "wav"


def test_resize_images_real_resample(spark):
    """REAL resize execution: a 64x32 gradient BMP downsamples to 32x16
    PNG whose decoded pixels are the bilinear resample (constant regions
    stay exact); undecodable rows are skipped non-strict and raise
    strict."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        encode_bmp,
        resize_images,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.png import (
        decode_png_pixels,
    )

    const = np.full((64, 32, 3), 77, np.uint8)
    grad = np.zeros((64, 32, 3), np.uint8)
    grad[:, :, 0] = np.arange(64, dtype=np.uint8)[:, None] * 4
    rows = [
        (1, bytearray(encode_bmp(const))),
        (2, bytearray(encode_bmp(grad))),
        (3, bytearray(b"not an image")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r.asDict()
        for r in resize_images(media, max_dim=32).collect()
    }
    assert set(got) == {1, 2}  # undecodable row skipped
    assert (got[1]["width"], got[1]["height"]) == (16, 32)
    px1 = decode_png_pixels(bytes(got[1]["payload"]))
    assert px1.shape == (32, 16, 3) and int(px1.min()) == int(px1.max()) == 77
    px2 = decode_png_pixels(bytes(got[2]["payload"]))
    # vertical gradient halves: rows average adjacent source rows
    assert px2.shape == (32, 16, 3)
    assert abs(int(px2[0, 0, 0]) - 2) <= 2 and abs(int(px2[31, 0, 0]) - 250) <= 4
    assert int(px2[:, :, 1].max()) == 0  # untouched channels stay zero

    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|libvips"):
        resize_images(
            media.filter(media.media_id == 3), strict=True
        ).collect()


def test_wav_spectral_centroid_golden():
    """Single-bin tones have closed-form centroids: the alternating
    (period-2) square is all-Nyquist (rate/2); the (a,a,-a,-a) period-4
    tone is one bin at rate/4; a silent signal reports 0; a 3:1 mix of
    the two bins lands at the magnitude-weighted mean."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.wav import (
        decode_wav_samples,
        encode_wav,
        spectral_centroid,
    )

    nyq = np.tile([0.5, -0.5], 8)
    assert abs(spectral_centroid(nyq, 1000) - 500.0) < 1e-9
    p4 = np.tile([0.4, 0.4, -0.4, -0.4], 4)
    assert abs(spectral_centroid(p4, 1000) - 250.0) < 1e-9
    assert spectral_centroid(np.zeros(8), 1000) == 0.0
    # through the real codec roundtrip the centroid survives quantization
    x, rate = decode_wav_samples(encode_wav(p4, 1000))
    assert abs(spectral_centroid(x, rate) - 250.0) < 1e-6
    # two-bin mix: centroid = (250*m4 + 500*m2) / (m4 + m2)
    mix = p4 + np.tile([0.1, -0.1], 8)
    c = spectral_centroid(mix, 1000)
    m4 = np.abs(np.fft.rfft(p4)).sum()
    m2 = np.abs(np.fft.rfft(np.tile([0.1, -0.1], 8))).sum()
    assert abs(c - (250.0 * m4 + 500.0 * m2) / (m4 + m2)) < 1e-9


def test_interpolate_daily_null_values_not_diluting(spark):
    """Review r7: the exact-DECIMAL daily mean must divide by the
    NON-NULL count (F.avg semantics) — a NULL event value must not drag
    the day's mean toward zero."""
    from routing_algorithm_for_graph_dbs_spark.operators.asof import (
        interpolate_daily,
    )

    ev = spark.createDataFrame(
        [
            ("k", "2024-01-01 01:00:00", 10.0),
            ("k", "2024-01-01 02:00:00", None),
            ("k", "2024-01-03 01:00:00", 20.0),
        ],
        "user_id string, ts string, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    got = {
        r["day"]: (r["observed"], r["v_interp"])
        for r in interpolate_daily(ev, "user_id", "ts", "value").collect()
    }
    assert got["2024-01-01"] == (True, 10.0)  # not 5.0
    assert got["2024-01-02"] == (False, 15.0)
    assert got["2024-01-03"] == (True, 20.0)


def test_multimodal_extractors_never_shuffle_payload(spark, tmp_path):
    """100 TB property pin: the binary payload column must never cross an
    Exchange — every multimodal derivation (feature extract, synth
    builders, real resize) is map-side over the scan. A payload shuffle
    at scale moves terabytes for no reason."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        image_features,
        media_from_documents,
        resize_images,
        synth_jpeg_media,
        synth_mp4_media,
        synth_png_media,
        synth_wav_media,
        video_metadata,
    )

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"text payload number {i}", 20 + i) for i in range(30)],
        "doc_id long, text string, n_chars int",
    ).write.parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    media = media_from_documents(docs)

    plans = {
        "image_features": image_features(media),
        "audio_features": audio_features(media),
        "synth_wav": synth_wav_media(docs),
        "synth_png": synth_png_media(docs),
        "synth_jpeg": synth_jpeg_media(docs),
        "synth_mp4": synth_mp4_media(docs),
        "resize_images": resize_images(synth_png_media(docs)),
        "jpeg_decode": image_features(synth_jpeg_media(docs), strict=True),
        "video_metadata": video_metadata(synth_mp4_media(docs), strict=True),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"
        df.collect()  # and the map-side plan actually executes


# ---------- ADVICE r7: sniff-pass-but-undecodable payloads ----------


def _undecodable_media(spark):
    """Payloads that PASS the cheap signature sniffs but are NOT decodable
    by the real codecs (the ADVICE r7 hole): a JPEG SOI followed by
    garbage, a PNG signature over a CRC-corrupt body, and an MPEG-in-WAV
    payload (RIFF/WAVE magic, fmt audio_format=0x55 — every PCM/ADPCM/
    G.711 dialect decodes for real since round 8, so a genuinely
    compressed codec is the undecodable-audio stand-in now)."""
    import struct as _struct

    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.png import PNG_SIGNATURE

    bad_jpeg = b"\xff\xd8" + b"\x00" * 64
    bad_png = bytes(PNG_SIGNATURE) + b"\x00" * 32
    fmt = _struct.pack("<HHIIHH", 0x55, 1, 8000, 4000, 1, 0)
    data = b"\x00" * 16
    body = (
        b"WAVE"
        + b"fmt "
        + _struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
    )
    mp3_wav = b"RIFF" + _struct.pack("<I", len(body)) + body
    rows = [
        (1, "image", bad_jpeg, "image/jpeg", (None, None, None, None, None)),
        (2, "image", bad_png, "image/png", (None, None, None, None, None)),
        (3, "audio", mp3_wav, "audio/wav", (None, None, 1, None, 8000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


class TestSniffPassUndecodableFallsToFake:
    """Module contract: 'a mislabeled payload must fall to the fake/strict
    path, not crash the stage' — now including payloads that pass the
    signature sniff but fail the real decode (ADVICE r7 medium)."""

    def test_image_features_fall_to_fake(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            image_features,
        )

        got = {
            r["media_id"]: r["decoder"]
            for r in image_features(_undecodable_media(spark)).collect()
        }
        assert got[1] == "fake" and got[2] == "fake"

    def test_image_features_strict_still_raises(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            image_features,
        )

        # image rows only: the fixture's ADPCM WAV row would also raise
        # under strict (NotImplementedError), and whichever failing task
        # loses the race would make the message assertion flaky
        media = _undecodable_media(spark).filter("mime like 'image/%'")
        with pytest.raises(Exception) as ei:
            image_features(media, strict=True).collect()
        assert "ValueError" in str(ei.value) or "marker" in str(ei.value)

    def test_audio_features_compressed_falls_to_fake(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            audio_features,
        )

        got = {
            r["media_id"]: r.asDict()
            for r in audio_features(_undecodable_media(spark)).collect()
        }
        assert got[3]["decoder"] == "fake"
        assert got[3]["duration_ms"] is None  # fake path, not half-decoded

    def test_audio_features_strict_still_raises(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            audio_features,
        )

        with pytest.raises(Exception) as ei:
            audio_features(_undecodable_media(spark), strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or "compressed" in str(
            ei.value
        )

    def test_phash_neardup_skips_undecodable(self, spark):
        """The two image payloads pass the JVM-side signature filter into
        the real-hash branch; with the decode failing they must hash to
        null and drop out of pairing — not raise."""
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            phash_near_dup_pairs,
        )

        media = _undecodable_media(spark).select("media_id", "payload")
        pairs = phash_near_dup_pairs(media).collect()
        ids = {x for r in pairs for x in (r["a"], r["b"])}
        assert 1 not in ids and 2 not in ids

    def test_resize_images_skips_undecodable(self, spark):
        from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
            resize_images,
        )

        media = _undecodable_media(spark).select("media_id", "payload")
        assert resize_images(media).collect() == []
        with pytest.raises(Exception):
            resize_images(media, strict=True).collect()

    def test_sniff_decode_contract_direct(self):
        """Unit-level: sniff-pass/decode-fail -> None (non-strict) and the
        codec's own error (strict)."""
        from routing_algorithm_for_graph_dbs_spark.operators.phash import (
            payload_phash,
            sniff_decode,
        )
        from routing_algorithm_for_graph_dbs_spark.operators.png import (
            PNG_SIGNATURE,
        )

        bad = [b"\xff\xd8" + b"\x00" * 64, bytes(PNG_SIGNATURE) + b"\x00" * 32]
        for b in bad:
            assert sniff_decode(b) is None
            assert payload_phash(b) is None
            with pytest.raises((ValueError, NotImplementedError)):
                sniff_decode(b, strict=True)


def test_jpeg_bitreader_bitbuf_bounded():
    """ADVICE r7 low: the entropy bit buffer must stay <= 32 live bits —
    consumed bytes left in the Python int made entropy decode O(n^2) on
    DRI-less streams (every read_bit shifting an ever-larger integer)."""
    import numpy as np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        _BitReader,
        decode_jpeg,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    br = _BitReader(bytes(rng.integers(0, 255, size=20000, dtype=np.uint8)), 0)
    for _ in range(120000):
        br.read_bit()
        assert br.bitbuf.bit_length() <= 32
    # and the decoder still roundtrips a real stream after the masking
    px = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    w, h, _nc, _luma = decode_jpeg(encode_jpeg_gray(px, quality=90))
    assert (w, h) == (64, 64)


def test_gif_metadata_golden():
    """GIF block walk (round 11): Logical Screen Descriptor packed bits,
    Global Color Table sizing, per-frame Graphic Control Extension delay
    summation, sub-block hopping, and loud failures on truncation /
    unknown introducers / missing trailer."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif,
        is_gif,
        parse_gif_metadata,
    )

    p = build_gif(320, 200, n_frames=3, delay_cs=7, gct_bits=4,
                  bg_index=2, frame_pad=20)
    assert is_gif(p) and p[:6] == b"GIF89a"
    assert len(p) == 13 + 3 * 16 + 3 * (8 + 13 + 20) + 1
    assert parse_gif_metadata(p) == ("89a", 320, 200, 16, 2, 3, 210)

    # 87a still: no GCE, duration 0, no palette
    q = build_gif(64, 48, version="87a")
    assert parse_gif_metadata(q) == ("87a", 64, 48, 0, 0, 1, 0)
    assert len(q) == 13 + 13 + 16 + 1

    # hand-built byte stream: 2x1 canvas, 4-color GCT, one 1-byte frame
    hand = (
        b"GIF89a"
        + b"\x02\x00\x01\x00"      # width 2, height 1 (LE)
        + b"\xf1\x03\x00"          # GCT flag, 8-bit res, size bits 1 -> 4
        + b"\x00\x00\x00\xff\xff\xff\x80\x80\x80\x01\x02\x03"  # 4 RGB
        + b"\x2c\x00\x00\x00\x00\x02\x00\x01\x00\x00"  # image descriptor
        + b"\x02\x01\xaa\x00"      # LZW min 2, one 1-byte sub-block
        + b"\x3b"
    )
    assert parse_gif_metadata(hand) == ("89a", 2, 1, 4, 3, 1, 0)

    with _pytest.raises(ValueError, match="GIF8"):
        parse_gif_metadata(b"PNG not a gif")
    with _pytest.raises(ValueError, match="version"):
        parse_gif_metadata(b"GIF88a" + p[6:])
    with _pytest.raises(ValueError, match="truncated"):
        parse_gif_metadata(p[:-1])  # trailer gone
    with _pytest.raises(ValueError, match="introducer"):
        # 0x99 where a block introducer must be (right after the LSD)
        parse_gif_metadata(q[:13] + b"\x99" + q[14:])
    with _pytest.raises(ValueError, match="sub-block"):
        parse_gif_metadata(p[: len(p) - 10])  # cut inside frame data


def test_tiff_metadata_golden():
    """TIFF IFD-chain walk (round 11): both byte orders, left-justified
    inline SHORT values, spec defaults for missing tags, multi-page
    chains, and loud failures on bad magic / zero entries / cycles."""
    import struct as _struct

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff,
        is_tiff,
        parse_tiff_metadata,
    )

    for bo, fmt in (("II", "<"), ("MM", ">")):
        p = build_tiff(800, 600, bits_per_sample=16, compression=5,
                       photometric=2, n_ifds=3, strip_pad=40, byte_order=bo)
        assert is_tiff(p)
        assert len(p) == 8 + 3 * (40 + 114)
        assert parse_tiff_metadata(p) == (bo, 800, 600, 16, 5, 2, 1, 3)

    # hand-built minimal big-endian file: one IFD, width/length only ->
    # spec defaults (bps 1, compression 1, photometric 0, spp 1)
    hand = (
        b"MM\x00\x2a" + _struct.pack(">I", 8)
        + _struct.pack(">H", 2)
        + _struct.pack(">HHI", 256, 3, 1) + _struct.pack(">H", 5) + b"\x00\x00"
        + _struct.pack(">HHI", 257, 4, 1) + _struct.pack(">I", 7)
        + _struct.pack(">I", 0)
    )
    assert parse_tiff_metadata(hand) == ("MM", 5, 7, 1, 1, 0, 1, 1)

    with _pytest.raises(ValueError, match="magic"):
        parse_tiff_metadata(b"II\x2b\x00" + hand[4:])
    with _pytest.raises(ValueError, match="no IFD"):
        parse_tiff_metadata(hand[:4] + _struct.pack(">I", 0) + hand[8:])
    with _pytest.raises(ValueError, match="zero entries"):
        parse_tiff_metadata(hand[:8] + _struct.pack(">H", 0) + hand[10:])
    p = build_tiff(10, 20, strip_pad=8)
    with _pytest.raises(ValueError, match="runs? past"):
        parse_tiff_metadata(p[:40])
    cyc = bytearray(p)
    _struct.pack_into("<I", cyc, len(p) - 4, 8 + 8)  # last next -> first
    with _pytest.raises(ValueError, match="cyclic"):
        parse_tiff_metadata(bytes(cyc))
    # width present but stored indirect (count 2) -> unreadable -> raises
    ind = bytearray(hand)
    _struct.pack_into(">I", ind, 14, 2)  # ImageWidth count = 2
    with _pytest.raises(ValueError, match="lacks"):
        parse_tiff_metadata(bytes(ind))


def test_webp_metadata_golden():
    """WebP RIFF chunk walk (round 11): the VP8 key-frame 14-bit
    dimension fields behind the 9D012A start code, VP8L packed bits,
    VP8X canvas + ANIM/ANMF frame counting with 24-bit durations, RIFF
    even-padding, and loud failures on truncation / bad signatures."""
    import struct as _struct

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.webp import (
        build_webp,
        is_webp,
        parse_webp_metadata,
    )

    p = build_webp(640, 480, "lossy", pixel_pad=32)
    assert is_webp(p) and len(p) == 30 + 32
    assert parse_webp_metadata(p) == ("lossy", 640, 480, False, 1, 0, 1)

    q = build_webp(100, 50, "lossless", alpha=True, pixel_pad=20)
    assert len(q) == 26 + 20
    assert parse_webp_metadata(q) == ("lossless", 100, 50, True, 1, 0, 1)

    r = build_webp(1280, 720, "extended", alpha=True, n_frames=4,
                   frame_duration_ms=33, pixel_pad=10)
    assert len(r) == 44 + 4 * (42 + 10)
    assert parse_webp_metadata(r) == ("extended", 1280, 720, True, 4, 132, 6)

    # hand-built lossless: 3x2, no alpha; width-1=2, height-1=1 packed
    bits = 2 | (1 << 14)
    body = b"\x2f" + _struct.pack("<I", bits) + b"\xab"  # 6-byte chunk
    chunk = b"VP8L" + _struct.pack("<I", len(body)) + body
    hand = b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert parse_webp_metadata(hand) == ("lossless", 3, 2, False, 1, 0, 1)

    with _pytest.raises(ValueError, match="RIFF/WEBP"):
        parse_webp_metadata(b"RIFF\x04\x00\x00\x00WAVE")
    with _pytest.raises(ValueError, match="runs past"):
        parse_webp_metadata(p[:20])
    with _pytest.raises(ValueError, match="start code"):
        bad = bytearray(p)
        bad[23] = 0x99
        parse_webp_metadata(bytes(bad))
    with _pytest.raises(ValueError, match="signature byte"):
        bad = bytearray(q)
        bad[20] = 0x30
        parse_webp_metadata(bytes(bad))
    with _pytest.raises(ValueError, match="no VP8"):
        # ICCP-only file: walk succeeds but nothing pixel-bearing
        icc = b"ICCP" + _struct.pack("<I", 2) + b"ab"
        parse_webp_metadata(
            b"RIFF" + _struct.pack("<I", 4 + len(icc)) + b"WEBP" + icc
        )


def test_gif_tiff_webp_extractors(spark):
    """The three round-11 extractors route real containers to their
    parsers and non-containers to the fake path; strict raises."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.gif import build_gif
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        gif_metadata,
        tiff_metadata,
        webp_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import build_tiff
    from routing_algorithm_for_graph_dbs_spark.operators.webp import build_webp

    for builder, extractor, parser, checks in [
        (
            lambda: build_gif(320, 200, n_frames=2, delay_cs=5),
            gif_metadata,
            "gif",
            {"n_frames": 2, "duration_ms": 100, "width": 320},
        ),
        (
            lambda: build_tiff(64, 32, n_ifds=2, byte_order="MM"),
            tiff_metadata,
            "tiff",
            {"n_ifds": 2, "byte_order": "MM", "width": 64},
        ),
        (
            lambda: build_webp(33, 44, "extended", n_frames=3,
                               frame_duration_ms=25),
            webp_metadata,
            "webp",
            {"n_frames": 3, "duration_ms": 75, "flavor": "extended"},
        ),
    ]:
        media = spark.createDataFrame(
            [(1, builder()), (2, b"not a container")],
            "media_id long, payload binary",
        )
        got = {r["media_id"]: r.asDict() for r in extractor(media).collect()}
        assert got[1]["parser"] == parser, parser
        for k, v in checks.items():
            assert got[1][k] == v, (parser, k, got[1][k])
        assert got[2]["parser"] == "fake", parser
        with _pytest.raises(Exception):
            extractor(media, strict=True).collect()


def test_gif_lzw_golden():
    """GIF LZW codec (round 11 — REAL pixel decode, off the boundary):
    variable-width LSB-first codes, CLEAR/END semantics, KwKwK, width
    sync, the 4096-entry reset, and loud failures on truncation /
    out-of-table codes. Hand-verified golden: pixels [1,1,1] at minimum
    code size 2 encode to exactly 8C 0B (CLEAR=100b, literal 1, table
    code 6 for '11', END=101b, packed LSB-first)."""
    import random

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_pixels,
        decode_gif_pixels,
        lzw_decode,
        lzw_encode,
    )

    assert lzw_encode(2, bytes([1, 1, 1])) == bytes([0x8C, 0x0B])
    assert lzw_decode(2, bytes([0x8C, 0x0B]), 3) == bytes([1, 1, 1])

    rng = random.Random(7)
    for mcs, n in [(2, 4), (4, 16), (8, 256)]:
        for ln in (1, 100, 5000):
            px = bytes(rng.randrange(n) for _ in range(ln))
            assert lzw_decode(mcs, lzw_encode(mcs, px), ln) == px, (mcs, ln)
    # table overflow: >4096 entries forces a mid-stream CLEAR reset
    big = bytes(rng.randrange(256) for _ in range(60000))
    assert lzw_decode(8, lzw_encode(8, big), len(big)) == big

    with _pytest.raises(ValueError, match="truncated"):
        lzw_decode(2, b"", 3)
    with _pytest.raises(ValueError, match="beyond table"):
        lzw_decode(2, bytes([0xFF, 0xFF]), 100)
    with _pytest.raises(ValueError, match="ended at"):
        # valid stream but fewer pixels than promised
        lzw_decode(2, lzw_encode(2, bytes([1, 2])), 10)

    # container roundtrip with a closed-form mean: (x+y)%4 over a 4-gray
    # ramp (0, 85, 170, 255) and dims a multiple of 4 -> exactly 127.5
    px = bytes((x + y) % 4 for y in range(8) for x in range(8))
    assert decode_gif_pixels(build_gif_pixels(8, 8, px, gct_bits=2)) == (
        8, 8, 127.5,
    )
    # truncated stream: decode must fail loudly, not return short pixels
    # (note: a single FLIPPED byte may legally decode to different
    # pixels — LZW has no checksum — so truncation is the loud case)
    p = build_gif_pixels(8, 8, px, gct_bits=2)
    with _pytest.raises(ValueError):
        decode_gif_pixels(p[:-6])


def test_tiff_packbits_golden():
    """TIFF PackBits + raw strip decode (round 11): the spec §9 control
    semantics (literal 0..127, repeat 129..255, 128 no-op), both byte
    orders, and the LZW-strip boundary raise."""
    import random

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff,
        build_tiff_gray,
        decode_tiff_gray,
        packbits_decode,
        packbits_encode,
        parse_tiff_metadata,
    )

    # spec-shaped golden: 3 literals then a 5-run
    d = bytes([1, 2, 3]) + bytes([9]) * 5
    assert packbits_encode(d) == bytes([0x02, 1, 2, 3, 0xFC, 9])
    assert packbits_decode(bytes([0x02, 1, 2, 3, 0xFC, 9]), 8) == d
    # 128 is a no-op control byte
    assert packbits_decode(bytes([128, 0x00, 7]), 1) == bytes([7])

    rng = random.Random(11)
    for ln in (1, 128, 129, 1000, 50000):
        for mk in (
            lambda: bytes(rng.randrange(256) for _ in range(ln)),
            lambda: bytes((i // 200) % 256 for i in range(ln)),
            lambda: bytes([7]) * ln,
        ):
            d = mk()
            assert packbits_decode(packbits_encode(d), ln) == d

    for bo in ("II", "MM"):
        for comp in (1, 32773):
            px = bytes((x + y) % 256 for y in range(32) for x in range(16))
            p = build_tiff_gray(16, 32, px, compression=comp, byte_order=bo)
            assert decode_tiff_gray(p) == (16, 32, sum(px) / len(px))
            # the metadata walk reads the same container consistently
            md = parse_tiff_metadata(p)
            assert md[:3] == (bo, 16, 32) and md[4] == comp

    # CCITT G4 fax (compression 4) is the remaining codec boundary
    # (round 12 moved LZW, Deflate, AND JPEG strips off it)
    with _pytest.raises(ValueError, match="boundary"):
        decode_tiff_gray(build_tiff(8, 8, compression=4, strip_pad=64))
    with _pytest.raises(ValueError, match="truncated"):
        packbits_decode(bytes([5, 1, 2]), 6)
    with _pytest.raises(ValueError, match="expected"):
        packbits_decode(packbits_encode(bytes([1, 2])), 5)


def test_tiff_lzw_golden():
    """TIFF §13 LZW (round 12): hand-computed golden stream, the
    early-change width boundaries, table reset past 4094 entries,
    predictor-2 differencing, and the truncation raises."""
    import random

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_gray,
        decode_tiff_gray,
        horizontal_diff,
        horizontal_undiff,
        parse_tiff_metadata,
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    # hand-packed golden: Clear(256), 'A'(0x41), EOI(257) at 9 bits each,
    # MSB-first -> 100000000 001000001 100000001 + 5 pad zeros
    assert tiff_lzw_encode(b"A") == bytes([0x80, 0x10, 0x60, 0x20])
    assert tiff_lzw_decode(bytes([0x80, 0x10, 0x60, 0x20]), 1) == b"A"

    rng = random.Random(12)
    # 253/254-entry streams straddle the 9->10 bit early change; 8000+
    # random bytes push through every width and the 4094 reset
    for ln in (1, 253, 254, 255, 511, 1000, 8000, 20000):
        for mk in (
            lambda: bytes(rng.randrange(256) for _ in range(ln)),
            lambda: bytes((i * 7) % 251 for i in range(ln)),
            lambda: bytes([9]) * ln,
        ):
            d = mk()
            assert tiff_lzw_decode(tiff_lzw_encode(d), ln) == d

    # predictor 2 is an exact per-row involution
    px = bytes((x * y) % 256 for y in range(16) for x in range(24))
    assert horizontal_undiff(horizontal_diff(px, 24), 24) == px

    for bo in ("II", "MM"):
        for predictor in (1, 2):
            p = build_tiff_gray(
                24, 16, px, compression=5, byte_order=bo, predictor=predictor
            )
            assert decode_tiff_gray(p) == (24, 16, sum(px) / len(px))
            md = parse_tiff_metadata(p)
            assert md[:3] == (bo, 24, 16) and md[4] == 5

    with _pytest.raises(ValueError, match="truncated"):
        tiff_lzw_decode(bytes([0x80]), 4)
    with _pytest.raises(ValueError, match="ended"):
        tiff_lzw_decode(tiff_lzw_encode(b"xy"), 9)
    with _pytest.raises(ValueError, match="beyond table"):
        # Clear then code 300 (not yet assigned)
        s = (256 << 9) | 300  # 18 bits
        tiff_lzw_decode(bytes([(s >> 10) & 0xFF, (s >> 2) & 0xFF, (s & 3) << 6]), 2)


def test_codec_corruption_robustness():
    """Round-12 fuzz pin: truncations, byte smashes, and bit flips over
    every new decode path must raise the documented decode-error types
    (ValueError/NotImplementedError/IndexError/struct.error — what
    DECODE_ERRORS catches) — never KeyError/StopIteration/
    OverflowError/ZeroDivisionError, and never a hang or giant
    allocation (the 100MP raster caps). An 18k-case sweep found and
    fixed five such escapes (missing quant/Huffman-table ids, unknown
    SOS component, zero sampling factors, unbounded DC magnitude
    category, gigapixel IFD/SOF claims); this seeded subset keeps them
    fixed."""
    import struct as _struct

    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_gray_arith,
        encode_jpeg_gray_arith_progressive,
        encode_jpeg_gray_progressive,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_fax,
        build_tiff_gray,
        decode_tiff_gray,
    )

    rng = _np.random.RandomState(7)
    img = (rng.rand(12, 40) < 0.4).astype(_np.uint8)
    px8 = rng.randint(0, 256, (16, 24)).astype(_np.uint8)
    bases = [
        (build_tiff_fax(img, compression=2), decode_tiff_gray),
        (build_tiff_fax(img, compression=3), decode_tiff_gray),
        (build_tiff_fax(img, compression=4), decode_tiff_gray),
        (build_tiff_gray(24, 16, px8.tobytes(), compression=5),
         decode_tiff_gray),
        (build_tiff_gray(24, 16, px8.tobytes(), compression=7),
         decode_tiff_gray),
        (encode_jpeg_gray_arith(px8, 90), decode_jpeg),
        (encode_jpeg_gray_arith_progressive(px8, 90), decode_jpeg),
        (encode_jpeg_gray(px8, 90), decode_jpeg),
        (encode_jpeg_gray_progressive(px8, 90), decode_jpeg),
    ]
    for base, dec in bases:
        for trial in range(250):
            b = bytearray(base)
            mode = trial % 3
            if mode == 0 and len(b) > 4:
                b = bytearray(b[: rng.randint(4, len(b))])
            elif mode == 1:
                for _ in range(rng.randint(1, 6)):
                    b[rng.randint(len(b))] = rng.randint(256)
            else:
                i = rng.randint(len(b))
                b[i] ^= 1 << rng.randint(8)
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError, IndexError,
                    _struct.error):
                pass  # the documented decode-error contract


def test_tiff_jpeg_strips():
    """Round 12: JPEG-in-TIFF (compression 7, TIFF TechNote 2) decodes
    for REAL through operators/jpeg.py — full interchange streams per
    strip AND abbreviated strips with the shared tables in a JPEGTables
    tag, single- and multi-strip. Flat-gray payloads make the lossy
    roundtrip closed-form: every decoded sample is the uint8 rounding
    of 128 + round(8(g-128)/3)*3/8 (DC-only blocks, Annex K luma q0=3
    at quality 90)."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg_gray,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_gray,
        decode_tiff_gray,
        join_jpeg_tables,
        parse_tiff_metadata,
        split_jpeg_tables,
    )

    # split/join is lossless on the decoder's view of the stream
    arr = _np.arange(64, dtype=_np.uint8).reshape(8, 8)
    full = encode_jpeg_gray(arr)
    t, s = split_jpeg_tables(full)
    assert t[:2] == b"\xff\xd8" and t[-2:] == b"\xff\xd9"
    assert (decode_jpeg_luma(join_jpeg_tables(t, s))
            == decode_jpeg_luma(full)).all()

    for k in (0, 3, 7, 13):
        g = 16 + 16 * k
        m = round(8.0 * (g - 128) / 3.0)
        exp = float(_np.clip(_np.rint(128.0 + m * 3.0 / 8.0), 0, 255))
        for bo in ("II", "MM"):
            for jt in (False, True):
                for rps in (None, 8, 5):
                    w, h = 11, 15
                    px = bytes([g]) * (w * h)
                    p = build_tiff_gray(
                        w, h, px, compression=7, byte_order=bo,
                        rows_per_strip=rps, jpeg_tables=jt,
                    )
                    assert decode_tiff_gray(p) == (w, h, exp), (g, bo, jt, rps)
                    assert parse_tiff_metadata(p)[4] == 7

    # guards: tables tag without JPEG strips; truncated tables framing
    with _pytest.raises(ValueError, match="SOI"):
        join_jpeg_tables(b"\xff\xd8\xff", s)
    with _pytest.raises(ValueError, match="SOS"):
        split_jpeg_tables(b"\xff\xd8\xff\xdb\x00\x02")


def test_tiff_ccitt_fax():
    """Round 12: CCITT bilevel fax decode is REAL — T.4 Modified
    Huffman (compression 2, byte-aligned rows) and T.6 Group 4 (MMR:
    pass/vertical/horizontal modes against the reference line). The
    run tables were derived empirically from libtiff streams; the
    published spot values pin them here, and roundtrips cover run
    lengths through the shared extended make-ups (>2560 px rows)."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.fax import (
        _T4_BLACK_MAKEUP,
        _T4_BLACK_TERM,
        _T4_WHITE_MAKEUP,
        _T4_WHITE_TERM,
        decode_g4,
        decode_mh,
        encode_g4,
        encode_mh,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_fax,
        decode_tiff_gray,
        parse_tiff_metadata,
    )

    # published T.4 table spot values (Table 2/3): any derivation slip
    # would break these
    assert _T4_WHITE_TERM[0] == "00110101"
    assert _T4_WHITE_TERM[1] == "000111"
    assert _T4_BLACK_TERM[0] == "0000110111"
    assert _T4_BLACK_TERM[1] == "010"
    assert _T4_WHITE_MAKEUP[64] == "11011"
    assert _T4_BLACK_MAKEUP[64] == "0000001111"
    # extended make-ups are color-shared
    assert _T4_WHITE_MAKEUP[2560] == _T4_BLACK_MAKEUP[2560]

    rng = _np.random.RandomState(24)
    shapes = [(1, 1), (3, 7), (12, 64), (5, 2700), (20, 133)]
    for (h, w) in shapes:
        for img in (
            (rng.rand(h, w) < 0.3).astype(_np.uint8),
            _np.ones((h, w), _np.uint8),
            _np.zeros((h, w), _np.uint8),
        ):
            assert (decode_mh(encode_mh(img), w, h) == img).all(), (h, w)
            assert (decode_g4(encode_g4(img), w, h) == img).all(), (h, w)

    # G3 with EOLs: self roundtrip + the fill/tag-bit tolerant EOL walk
    from routing_algorithm_for_graph_dbs_spark.operators.fax import (
        decode_g3,
        encode_g3,
    )

    for (h, w) in shapes[:3]:
        img = (rng.rand(h, w) < 0.3).astype(_np.uint8)
        assert (decode_g3(encode_g3(img), w, h) == img).all(), (h, w)
    with _pytest.raises(ValueError, match="EOL"):
        decode_g3(b"\xff\xff", 8, 1)

    # container path: closed-form mean, all three compressions, layouts
    img = (rng.rand(12, 40) < 0.4).astype(_np.uint8)
    exp = 255.0 * (12 * 40 - int(img.sum())) / (12 * 40)
    for comp in (2, 3, 4):
        for rps in (None, 4):
            p = build_tiff_fax(img, compression=comp, rows_per_strip=rps)
            assert decode_tiff_gray(p) == (40, 12, exp), (comp, rps)
            md = parse_tiff_metadata(p)
            assert md[3] == 1 and md[4] == comp

    # loud failures: truncation, garbage codes, run overflow
    with _pytest.raises(ValueError, match="truncated"):
        decode_mh(b"", 8, 1)
    with _pytest.raises(ValueError, match="run code|truncated"):
        decode_mh(b"\x00\x00", 8, 1)  # 16 zero bits match no code
    good = encode_mh(_np.ones((1, 32), _np.uint8))
    with _pytest.raises(ValueError, match="overflow|truncated|run code"):
        decode_mh(good, 16, 1)  # narrower row than the stream encodes


def test_tiff_deflate_and_multistrip():
    """Round 12: Deflate strips (compression 8, stdlib zlib) and the
    multi-strip layout (out-of-line StripOffsets/ByteCounts LONG
    arrays, per-strip codec restart, short last strip) round-trip for
    every codec x predictor x rows_per_strip combination, both byte
    orders; malformed zlib streams and strip-count mismatches raise."""
    import random
    import struct as _struct

    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_gray,
        decode_tiff_gray,
        parse_tiff_metadata,
    )

    rng = random.Random(13)
    w, h = 13, 16
    for bo in ("II", "MM"):
        for comp, pred in [(1, 1), (32773, 1), (5, 1), (5, 2), (8, 1), (8, 2)]:
            for rps in (None, 1, 3, 7, 16):
                px = bytes(rng.randrange(256) for _ in range(w * h))
                p = build_tiff_gray(
                    w, h, px, compression=comp, byte_order=bo,
                    predictor=pred, rows_per_strip=rps,
                )
                assert decode_tiff_gray(p) == (w, h, sum(px) / len(px)), (
                    bo, comp, pred, rps)
                md = parse_tiff_metadata(p)
                assert md[:3] == (bo, w, h) and md[4] == comp

    # corrupt zlib stream raises loudly
    px = bytes(range(64)) * 2
    p = bytearray(build_tiff_gray(8, 16, px, compression=8))
    off = 8  # first strip starts right after the header
    p[off:off + 2] = b"\x00\x00"  # clobber the zlib header
    with _pytest.raises(ValueError, match="Deflate"):
        decode_tiff_gray(bytes(p))
    # strip count must cover height at rows_per_strip
    p = bytearray(build_tiff_gray(8, 16, px, compression=1, rows_per_strip=4))
    # rewrite RowsPerStrip (tag 278) to 8: 4 strips no longer match
    fmt = "<"
    (ifd,) = _struct.unpack_from(fmt + "I", p, 4)
    (n,) = _struct.unpack_from(fmt + "H", p, ifd)
    for i in range(n):
        pos = ifd + 2 + 12 * i
        tag, = _struct.unpack_from(fmt + "H", p, pos)
        if tag == 278:
            _struct.pack_into(fmt + "I", p, pos + 8, 8)
    with _pytest.raises(ValueError, match="strip count"):
        decode_tiff_gray(bytes(p))


def test_sniff_decode_covers_gif_and_webp():
    """Round 11: the pHash/resize sniff path decodes GIF (LZW, incl.
    interlaced row reordering) and lossless WebP (VP8L) for real; lossy
    VP8 falls to None (fake path) non-strict and raises strict."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_pixels,
        decode_gif_rgb,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.phash import (
        payload_phash,
        sniff_decode,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.vp8l import (
        encode_webp_lossless,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.webp import build_webp

    rng = _np.random.RandomState(2)
    img = rng.randint(0, 256, (16, 16, 3), dtype=_np.uint8)
    wp = encode_webp_lossless(img)
    px = sniff_decode(wp, strict=True)
    assert px.shape == (16, 16, 4) and (px[..., :3] == img).all()
    assert payload_phash(wp, strict=True) is not None

    idx = bytes(rng.randint(0, 256, 13 * 9).astype(_np.uint8))
    gif = build_gif_pixels(13, 9, idx, gct_bits=8)
    px = sniff_decode(gif, strict=True)
    assert px.shape == (9, 13, 3)
    # palette here is the gray ramp r=g=b=i, so pixels ARE the indices
    assert bytes(px[..., 0].reshape(-1)) == idx

    lossy = build_webp(16, 16, flavor="lossy")
    assert sniff_decode(lossy) is None
    with _pytest.raises(NotImplementedError):
        sniff_decode(lossy, strict=True)


def test_gif_interlaced_rows_reorder():
    """decode_gif_rgb undoes the four-pass interlace: hand-build an
    interlaced frame by storing rows in pass order and flipping the
    descriptor's interlace bit; the decoded array must come back in
    display order."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_pixels,
        decode_gif_rgb,
    )

    h, w = 11, 5
    display = _np.arange(h * w, dtype=_np.uint8).reshape(h, w) % 251
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    stream_rows = display[order]  # pass-ordered storage
    payload = bytearray(
        build_gif_pixels(w, h, bytes(stream_rows.reshape(-1)), gct_bits=8)
    )
    # image descriptor: 13 (header+LSD) + 768 (GCT) + 1 (',') + 8 bytes
    # in; its packed byte is the 9th of the descriptor
    at = 13 + 3 * 256 + 1 + 8
    assert payload[at] == 0  # no local table, not interlaced yet
    payload[at] = 0x40       # set the interlace flag
    got = decode_gif_rgb(bytes(payload))
    assert (got[..., 0] == display).all()


def test_gif_animation_composition():
    """Hand-computed composition semantics on a 4x2 canvas: sub-
    rectangle placement, transparency holes, and all three disposal
    behaviors (keep / restore-to-background / restore-to-previous)."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_animation,
        decode_gif_frames,
    )

    f0 = {"indices": bytes([10] * 8), "delay_cs": 5, "disposal": 1}
    f1 = {"left": 2, "top": 0, "fw": 2, "fh": 2, "indices": bytes([20] * 4),
          "delay_cs": 3, "disposal": 2}
    f2 = {"indices": bytes([30, 7, 30, 7, 7, 30, 7, 30]), "transparent": 7,
          "disposal": 0}
    p = build_gif_animation(4, 2, [f0, f1, f2], bg_index=5)
    frames, delays = decode_gif_frames(p)
    g = [f[..., 0] for f in frames]  # identity gray ramp at 8 bits
    assert delays == [50, 30, 0]
    assert (g[0] == 10).all()
    assert (g[1] == _np.array([[10, 10, 20, 20]] * 2)).all()
    # disposal 2 restored f1's rect to bg=5 before the transparent
    # checkerboard of f2 (7 is the hole)
    assert (g[2] == _np.array([[30, 10, 30, 5], [10, 30, 5, 30]])).all()

    # disposal 3: f1's rect restored to the PRE-f1 canvas (all 10s)
    p3 = build_gif_animation(4, 2, [f0, dict(f1, disposal=3), f2],
                             bg_index=5)
    frames3, _ = decode_gif_frames(p3)
    assert (frames3[2][..., 0]
            == _np.array([[30, 10, 30, 10], [10, 30, 10, 30]])).all()

    # max_frames stops early
    assert len(decode_gif_frames(p, max_frames=2)[0]) == 2

    # interlaced frame inside an animation comes back in display order
    h, w = 9, 3
    disp = (_np.arange(h * w, dtype=_np.uint8).reshape(h, w) * 7) % 251
    pa = build_gif_animation(
        w, h, [{"indices": bytes(disp.reshape(-1)), "interlace": True}]
    )
    fr, _ = decode_gif_frames(pa)
    assert (fr[0][..., 0] == disp).all()

    # structural guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="outside the canvas"):
        build_gif_animation(4, 2, [dict(f1, left=3)])
    with _pytest.raises(ValueError, match="no image frame"):
        decode_gif_frames(b"GIF89a" + bytes([4, 0, 2, 0, 0, 0, 0, 0x3B]))


def test_gif_disposal2_transparency_flatten():
    """Round-12 ADVICE pin: a disposal-2 frame whose GCE carries an
    ACTIVE transparency index still restores its region to the opaque
    background palette color. RGBA renderers restore to alpha=0 there;
    flattened over the background color (PIL RGB-mode rendering) that
    is pixel-identical to what this RGB decoder emits — the documented
    convention, asserted here so any future semantic change must
    revisit the decode_gif_frames docstring and the mm_gif_frames
    oracle together."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_animation,
        decode_gif_frames,
    )

    # frame 0 paints the canvas 10; frame 1 is disposal-2 WITH
    # transparency (index 7 holes) over the left half; frame 2 is a
    # transparent no-op frame that exposes the cleared region
    f0 = {"indices": bytes([10] * 8), "disposal": 1}
    f1 = {"left": 0, "top": 0, "fw": 2, "fh": 2,
          "indices": bytes([20, 7, 7, 20]), "transparent": 7,
          "disposal": 2}
    f2 = {"indices": bytes([7] * 8), "transparent": 7, "disposal": 0}
    p = build_gif_animation(4, 2, [f0, f1, f2], bg_index=5)
    frames, _ = decode_gif_frames(p)
    g = [f[..., 0] for f in frames]
    # frame 1 display: holes show the prior canvas (10), not bg
    assert (g[1] == _np.array([[20, 10, 10, 10], [10, 20, 10, 10]])).all()
    # frame 2: f1's whole rect (holes included) was restored to the
    # OPAQUE background 5 — the flatten convention under test
    assert (g[2] == _np.array([[5, 5, 10, 10], [5, 5, 10, 10]])).all()

    # and when the background index is ITSELF the transparent index,
    # the region still flattens to that palette color
    p2 = build_gif_animation(4, 2, [f0, dict(f1, transparent=5,
                                             indices=bytes([20, 5, 5, 20])),
                                    f2], bg_index=5)
    frames2, _ = decode_gif_frames(p2)
    assert (frames2[2][..., 0]
            == _np.array([[5, 5, 10, 10], [5, 5, 10, 10]])).all()


def test_gif_frame_samples_extractor(spark):
    """Spark-level: strict frame extraction over synth animations plus
    the fake path for non-GIF payloads."""
    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_animation,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        gif_frame_samples,
    )

    anim = build_gif_animation(
        4, 2, [{"indices": bytes([10] * 8), "delay_cs": 2}], bg_index=0
    )
    media = spark.createDataFrame(
        [(1, anim, "image/gif"), (2, b"not a gif", "image/gif")],
        "media_id long, payload binary, mime string",
    )
    got = gif_frame_samples(media).collect()
    by = {}
    for r in got:
        by.setdefault(r["media_id"], []).append(r.asDict())
    assert len(by[1]) == 1 and by[1][0]["parser"] == "gif"
    assert by[1][0]["delay_ms"] == 20
    assert by[1][0]["mean_luma"] == round(
        (0.299 * 10 + 0.587 * 10 + 0.114 * 10) / 255, 6
    )
    assert len(by[2]) == 3 and all(r["parser"] == "fake" for r in by[2])
    import pytest as _pytest

    with _pytest.raises(Exception):
        gif_frame_samples(media, strict=True).collect()


def test_gif_tiff_pixel_extractors(spark):
    """The round-11 pixel extractors decode real payloads (strict) and
    route junk to the fake path; the closed-form mean holds end-to-end."""
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.gif import (
        build_gif_pixels,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        gif_pixel_features,
        tiff_pixel_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.tiff import (
        build_tiff_gray,
    )

    px = bytes(v for y in range(16) for v in [(16 * (y % 16)) % 256] * 8)
    for builder, extractor, parser in [
        (lambda: build_gif_pixels(8, 16, px, gct_bits=8), gif_pixel_features, "gif"),
        (
            lambda: build_tiff_gray(8, 16, px, compression=32773),
            tiff_pixel_features,
            "tiff",
        ),
    ]:
        media = spark.createDataFrame(
            [(1, builder()), (2, b"junk payload")],
            "media_id long, payload binary",
        )
        got = {r["media_id"]: r.asDict() for r in extractor(media).collect()}
        assert got[1]["parser"] == parser
        assert (got[1]["width"], got[1]["height"]) == (8, 16)
        assert got[1]["mean_luma"] == 120.0  # b=0 -> 0+120 closed form
        assert got[2]["parser"] == "fake"
        with _pytest.raises(Exception):
            extractor(media, strict=True).collect()


def test_vp8_corrupt_payloads_raise_decode_errors():
    """Lossy-WebP hardening: random byte corruption and truncation of a
    valid key frame must land in DECODE_ERRORS (image_features'
    strict=False fake-fallback contract), never an unexpected
    exception; dimensions stay behind the 100MP allocation cap."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.phash import (
        DECODE_ERRORS,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.vp8 import (
        build_webp_lossy_flat,
        decode_vp8_keyframe,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.webp import (
        decode_webp_lossy,
    )

    good = build_webp_lossy_flat(100, 32, 32)
    rng = _np.random.default_rng(1313)
    for _ in range(60):
        b = bytearray(good)
        for _k in range(int(rng.integers(1, 6))):
            b[int(rng.integers(12, len(b)))] = int(rng.integers(0, 256))
        try:
            decode_webp_lossy(bytes(b))
        except DECODE_ERRORS:
            pass
    for cut in range(0, len(good), 11):
        try:
            decode_webp_lossy(good[:cut])
        except DECODE_ERRORS:
            pass
    # the 100MP cap: a crafted header claiming a huge frame must raise
    # before any macroblock work
    big = bytearray(build_webp_lossy_flat(100, 16, 16))
    off = big.index(b"\x9d\x01\x2a") + 3
    big[off:off + 4] = (0x3FFF).to_bytes(2, "little") * 2
    with _pytest.raises(ValueError, match="100MP"):
        decode_vp8_keyframe(bytes(big[big.index(b"VP8 ") + 8:]))


def test_webm_vp8_keyframe_extraction_and_decode():
    """Round 14: VP8 key frames embedded as SimpleBlocks round-trip the
    container byte-exact and decode through the RFC 6386 pipeline; the
    legacy (frameless) layout extracts empty; lacing and truncated
    blocks raise."""
    import numpy as _np
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.operators.ebml import (
        build_webm,
        extract_vp8_keyframes,
        parse_webm_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.vp8 import (
        decode_vp8_keyframe,
        encode_vp8_gray_flat,
    )

    grays = (40, 120, 200)  # 120 rides the small-level token branches
    frames = [encode_vp8_gray_flat(g, 16, 12) for g in grays]
    webm = build_webm(99, width=16, height=12, vp8_frames=frames,
                      n_clusters=2)
    # metadata walk still parses the same container
    assert parse_webm_metadata(webm)[:6] == ("webm", 99, 1, 1, 16, 12)
    out = extract_vp8_keyframes(webm)
    assert [t for t, _ in out] == [0, 33, 66]
    for (_t, fr), g in zip(out, grays):
        y, u, v = decode_vp8_keyframe(bytes(fr))
        assert y.shape == (12, 16) and bool(_np.all(y == g))
        assert bool(_np.all(u == 128)) and bool(_np.all(v == 128))
    assert len(extract_vp8_keyframes(webm, limit=2)) == 2
    # legacy container: video track has no CodecID -> no VP8 frames
    assert extract_vp8_keyframes(build_webm(99)) == []
    # a laced SimpleBlock raises rather than mis-slicing frames
    laced = bytearray(webm)
    i = laced.index(b"\xa3\x01\x00\x00\x00\x00\x00")  # id + 8B size vint
    laced[i + 1 + 8 + 1 + 2] |= 0x06  # flags byte: lacing bits
    with _pytest.raises(ValueError, match="laced"):
        extract_vp8_keyframes(bytes(laced))


def test_vp8_flat_all_grays_roundtrip():
    """Round 14 regression: every gray 0..255 encodes/decodes exactly —
    the old flat encoder hardcoded the cat6 token path and corrupted
    |g-128| <= 8 (small Y2 DC levels ride DCT_4/cat1/cat2)."""
    import numpy as _np

    from routing_algorithm_for_graph_dbs_spark.operators.vp8 import (
        decode_vp8_keyframe,
        encode_vp8_gray_flat,
    )

    for g in range(256):
        y, _u, _v = decode_vp8_keyframe(encode_vp8_gray_flat(g, 16, 8))
        assert y.shape == (8, 16) and bool(_np.all(y == g)), g

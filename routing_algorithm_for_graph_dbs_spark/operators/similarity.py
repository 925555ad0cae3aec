"""Similarity search over embedding columns (beyond-reference surface).

Two tiers, per the 100 TB design brief:

- **brute-force cosine top-k** — exact baseline; dot products via
  ``zip_with``/``aggregate`` column expressions (JVM-side, no Python).
  Linear scan, embarrassingly parallel, no shuffle until the final top-k.
- **LSH-bucketed ANN** — random-hyperplane signatures; candidates meet in
  an equi-join on the signature prefix, so the scan touches only
  bucket-mates. Recall < 1 by construction; multi-probe via several
  independent tables.

Embeddings are ``array<float>``; all arithmetic casts to double first so
results are bit-stable across engines (DuckDB oracle uses the same order
of operations via list_* functions, with rounding applied on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def py_norm(vec) -> float:
    """Driver-side L2 norm with the SAME left-to-right accumulation order as
    the ``norm`` column expression's fold — bit-identical IEEE doubles, so a
    literal centroid norm can substitute for the JVM-computed one without
    perturbing rounded cosines."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _drop_zero_norm(df: DataFrame, vec_col: str) -> DataFrame:
    """Rows whose vector has a positive L2 norm. Cosine similarity is
    undefined for the zero vector (0/0 = NaN), and NaN ORDERS differently
    between the expression tier (Spark ranks NaN largest under ``desc``)
    and the numpy kernels (NaN > -inf is False), so the kNN tiers drop
    zero-norm rows up front — cheaper than replaying Spark's NaN-is-largest
    rule through every argsort/argmax, and the honest semantics: a zero
    embedding has no defined cosine neighbors."""
    return df.filter(norm(F.col(vec_col)) > 0)


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Plan shape: map-side similarity + global TakeOrderedAndProject — the
    scan parallelizes fully and only k rows per partition reach the driver
    stage. Ties broken by key for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q)
    return (
        embeddings.select(
            F.col(key_col), F.round(sim, 6).alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.col(key_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random Gaussian hyperplanes (shared between the
    Spark LSH operator and the DuckDB oracle builder so both engines bucket
    identically)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-blocked.

    Random-hyperplane LSH: sign pattern of ``n_planes`` fixed pseudo-random
    hyperplanes forms the bucket key; high-cosine pairs agree on most signs,
    so they collide with high probability. The verify step computes exact
    cosine only within buckets. (Recall is probabilistic; raise n_planes /
    add probes for tighter guarantees — standard ANN tradeoff.)
    """
    try:
        dim = dim_of(embeddings, vec_col)
    except ValueError:  # empty input -> empty pair set, not a crash
        return embeddings.sparkSession.createDataFrame(
            [], f"a {embeddings.schema[key_col].dataType.simpleString()}, "
                f"b {embeddings.schema[key_col].dataType.simpleString()}, "
                "cosine_sim double",
        )
    planes = hyperplanes(dim, n_planes, seed)

    sig = F.concat(
        *[
            F.when(dot(F.col(vec_col), F.array(*[F.lit(w) for w in p])) >= 0, "1").otherwise("0")
            for p in planes
        ]
    )
    with_sig = embeddings.select(
        F.col(key_col).alias("k"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nv"),  # once per vector, not per pair
        sig.alias("bucket"),
    )
    left = with_sig.select(
        "bucket", F.col("k").alias("a"), F.col("v").alias("va"), F.col("nv").alias("na")
    )
    right = with_sig.select(
        "bucket", F.col("k").alias("b"), F.col("v").alias("vb"), F.col("nv").alias("nb")
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("a", "b", "cosine_sim")
    )


def _collect_centroids(
    embeddings: DataFrame, n_centroids: int, vec_col: str, key_col: str
) -> list:
    """The ``n_centroids`` smallest-key vectors, collected once (works for
    any key space — sparse, offset, or string-ordered)."""
    cents = (
        embeddings.select(F.col(key_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .limit(n_centroids)
        .collect()
    )
    if not cents:
        raise ValueError("ivf: embeddings input is empty, no centroids to seed")
    return cents


# below this many centroids the interpreted column-expression assignment
# is cheaper than an Arrow stage's serialization round-trip; at/above it
# the vectorized kernel wins (the expr path is O(K·D) interpreted ops per
# row — with sqrt(n)-scaled centroid counts that became the dominant cost
# of sem_dedup/knn_ivf_join at gate scale, VERDICT r9 #1)
IVF_ASSIGN_ARROW_MIN_CENTROIDS = 16


def _round_half_up_spark(x):
    """Round to 6 decimals EXACTLY as Spark's ``F.round`` on DoubleType:
    the JVM converts via ``BigDecimal.valueOf`` (= the double's SHORTEST
    decimal representation) and applies ``setScale(6, HALF_UP)``. The
    vectorized ``floor(|x|*1e6 + 0.5)`` fast path agrees except when the
    double sits within float error of a 7th-decimal midpoint (e.g.
    0.0001245, whose product with 1e6 computes to 124.4999...); those
    rare elements are re-rounded exactly through Python's ``repr`` (also
    shortest-repr) + ``decimal`` with HALF_UP — so the kernel matches
    the expression path on ties too, not just on margin-safe data.
    Vectorized cost: two elementwise ops; the exact path touches ~0
    elements per batch in practice.

    JVM caveat: "shortest repr" assumes ``Double.toString`` returns the
    shortest round-trip decimal, guaranteed only since JDK 19
    (JDK-4511638); older JVMs may emit extra digits on some values, and a
    value whose shortest repr lands exactly on a 7th-decimal midpoint
    could then round differently from ``F.round``. This deployment runs
    Java 17 and the randomized midpoint fuzz in
    tests/test_dataops.py::test_round_half_up_fuzz_vs_spark compares the
    kernel against the ACTUAL JVM's ``F.round`` — a JVM whose
    ``Double.toString`` diverges on reachable values fails that test
    instead of silently breaking tier bit-identity."""
    import numpy as np

    y = np.abs(x) * 1e6
    out = np.floor(y + 0.5)
    frac = y - np.floor(y)
    near = (np.abs(frac - 0.5) < 1e-6) & np.isfinite(x)
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        flat, oflat = x.ravel(), out.ravel()
        for i in np.nonzero(near.ravel())[0]:
            d = Decimal(repr(abs(float(flat[i])))).quantize(q, ROUND_HALF_UP)
            oflat[i] = float(d * 1_000_000)
        out = oflat.reshape(x.shape)
    return np.sign(x) * out / 1e6


def _assign_sims_np(X, C, cn):
    """Rounded cosines of every row of ``X`` (B×D) against every centroid
    row of ``C`` (K×D), BIT-IDENTICAL to the JVM fold the expression path
    evaluates: the dot products and the row norms accumulate left-to-right
    over the dimension (one vectorized multiply-add per dimension — same
    IEEE-754 operation sequence per (row, centroid) as ``aggregate``'s
    fold, unlike np.dot's pairwise/BLAS summation), and the rounding
    replays Spark's HALF-UP-on-shortest-repr semantics including
    representation ties (:func:`_round_half_up_spark`)."""
    import numpy as np

    B, D = X.shape
    acc = np.zeros((B, C.shape[0]))
    nv = np.zeros(B)
    for d in range(D):
        xd = X[:, d]
        acc += xd[:, None] * C[None, :, d]
        nv += xd * xd
    return _round_half_up_spark(acc / (np.sqrt(nv)[:, None] * cn[None, :]))


def _ivf_assign_arrow(
    embeddings: DataFrame, cents: list, vec_col: str, key_col: str
) -> DataFrame:
    """Arrow-batched assignment kernel: one (batch × centroids) rounded-
    cosine matrix per Arrow batch, first-max argmax (ties to the lowest
    centroid id — ``cents`` is id-ordered, np.argmax takes the first).
    Same map-side scale shape as the expression path (no shuffle; the
    batch bounds memory), ~K× faster per row because the per-dimension
    work is one vectorized numpy op instead of K interpreted Catalyst
    fold steps."""
    import numpy as np
    from pyspark.sql import types as T

    C = np.array([[float(x) for x in r["cv"]] for r in cents])
    cn = np.array([py_norm(r["cv"]) for r in cents])
    cids = [r["cid"] for r in cents]
    # a FRESH StructType — StructType.add mutates in place, and df.schema
    # is cached on the DataFrame, so extending it directly would corrupt
    # the input frame's visible schema
    out_schema = T.StructType(
        list(embeddings.schema.fields)
        + [T.StructField("centroid_id", embeddings.schema[key_col].dataType, False)]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                pdf = pdf.copy()
                pdf["centroid_id"] = []
                yield pdf
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            idx = np.argmax(_assign_sims_np(X, C, cn), axis=1)
            pdf = pdf.copy()
            pdf["centroid_id"] = [cids[i] for i in idx]
            yield pdf

    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # the kernel is CPU-bound per row while parquet splits are sized by
    # BYTES — a toy-scale table arrives as ONE split and the kernel runs
    # on one core; spread_for_compute is a no-op at real scale
    return spread_for_compute(embeddings).mapInPandas(assign, schema=out_schema)


def _ivf_probe_arrow(
    left: DataFrame, cents: list, nprobe: int, vec_col: str, key_col: str
) -> DataFrame:
    """Arrow-batched probe kernel for the IVF join's LEFT side: the
    ``nprobe`` nearest cells per vector, one output row per probe —
    the vectorized twin of the struct-sort expression path in
    :func:`knn_join_ivf` (bit-identical: same fold-order sims via
    :func:`_assign_sims_np`; stable argsort over the cid-ordered
    centroid columns == struct(-sim, cid) ascending sort). The staged
    ``ln`` norm replays the fold too, so downstream pair cosines are
    unchanged."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = np.array([[float(x) for x in r["cv"]] for r in cents])
    cn = np.array([py_norm(r["cv"]) for r in cents])
    cids = [r["cid"] for r in cents]
    key_t = left.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("l_id", key_t, False),
            T.StructField("lv", left.schema[vec_col].dataType, False),
            T.StructField("ln", T.DoubleType(), False),
            T.StructField("cell", key_t, False),
        ]
    )
    npro = min(nprobe, len(cents))

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"l_id": [], "lv": [], "ln": [], "cell": []}
                )
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            B, D = X.shape
            nv = np.zeros(B)
            for d in range(D):
                nv += X[:, d] * X[:, d]
            ln = np.sqrt(nv)
            sims = _assign_sims_np(X, C, cn)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :npro]
            rep = np.repeat(np.arange(B), npro)
            yield pd.DataFrame(
                {
                    "l_id": pdf[key_col].to_numpy()[rep],
                    "lv": [pdf[vec_col].iat[i] for i in rep],
                    "ln": ln[rep],
                    "cell": [cids[j] for j in order.ravel()],
                }
            )

    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    return spread_for_compute(left).mapInPandas(probe, schema=out_schema)


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    cents: list | None = None,
    method: str = "auto",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid.

    Centroids here are the ``n_centroids`` smallest-key vectors — a
    deterministic seeding that makes the index reproducible across engines
    (production would run a few k-means iterations over the same machinery;
    the assignment/search shape below is identical either way).

    Scale shape: centroids are collected once (tiny) and inlined, so
    assignment is map-side over the scan — no shuffle. Ties (equal rounded
    cosine) go to the lowest centroid id. Two physical strategies, both
    producing BIT-IDENTICAL assignments (asserted across methods in
    tests/test_dataops.py): ``expr`` stages the vector's norm once and
    evaluates K literal-array dot products per row as column expressions
    (cheapest for small K — no Arrow round-trip); ``arrow`` runs a
    vectorized numpy kernel per Arrow batch that replays the fold's exact
    left-to-right accumulation order and HALF-UP rounding (the K
    interpreted fold evaluations were the dominant sem_dedup cost once
    centroid counts scale as sqrt(n) — VERDICT r9 #1). ``auto`` picks by
    ``IVF_ASSIGN_ARROW_MIN_CENTROIDS``.
    """
    if method not in ("auto", "arrow", "expr"):
        raise ValueError(f"ivf_assign: unknown method {method!r}")
    if cents is None:
        cents = _collect_centroids(embeddings, n_centroids, vec_col, key_col)
    if method == "auto":
        method = (
            "arrow" if len(cents) >= IVF_ASSIGN_ARROW_MIN_CENTROIDS else "expr"
        )
    if method == "arrow":
        return _ivf_assign_arrow(embeddings, cents, vec_col, key_col)
    staged = embeddings.withColumn("_nv", norm(F.col(vec_col)))
    sims = [
        F.round(
            dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in r["cv"]]))
            / (F.col("_nv") * F.lit(py_norm(r["cv"]))),
            6,
        )
        for r in cents
    ]
    staged = staged.withColumn("_sims", F.array(*sims))
    # first index of the max rounded cosine -> that index's centroid id.
    # centroid_id keeps the key column's native type (int or string key
    # spaces both work; _collect_centroids orders either)
    idx = F.array_position(F.col("_sims"), F.array_max(F.col("_sims")))
    cid_arr = F.array(*[F.lit(r["cid"]) for r in cents])
    return staged.withColumn(
        "centroid_id", F.element_at(cid_arr, idx.cast("int"))
    ).drop("_nv", "_sims")


def kmeans_refine_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> list:
    """Lloyd iterations over the seeded centroids, as DataFrame programs.

    Each iteration: map-side nearest-centroid assignment (literal-array
    cosine, no shuffle) then one explode/groupBy to average member vectors
    per (cluster, dimension) — the standard distributed k-means step. The
    refined centroids are returned as plain rows for ``ivf_assign``/
    ``ivf_topk`` (pass via ``cents=``); refinement trades determinism-
    across-engines (the oracle-checked queries keep seeded centroids) for
    recall. Empty clusters keep their previous centroid.
    """
    cents = _collect_centroids(embeddings, n_centroids, vec_col, key_col)
    for _ in range(iterations):
        assigned = ivf_assign(embeddings, n_centroids, vec_col, key_col, cents=cents)
        means = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda x: x.getField("m")).alias("cv"),
            )
            .collect()
        )
        from pyspark.sql import Row

        new = {r["centroid_id"]: list(r["cv"]) for r in means}
        cents = [
            Row(cid=c["cid"], cv=new.get(c["cid"], list(c["cv"])))
            for c in cents
        ]
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    cents: list | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` centroid buckets nearest
    the query, brute-force cosine within them.

    At 100 TB the win is partition pruning: persist the corpus partitioned
    by ``centroid_id`` and the probed buckets are the only files read
    (1/n_centroids * nprobe of the data). Recall < 1 by construction —
    the exact baseline is ``cosine_topk``; ``cents`` accepts refined
    centroids from :func:`kmeans_refine_centroids` for better recall.
    """
    if cents is None:
        cents = _collect_centroids(embeddings, n_centroids, vec_col, key_col)
    assigned = ivf_assign(embeddings, n_centroids, vec_col, key_col, cents=cents)

    def py_cos(a: list[float], b: list[float]) -> float:
        import math

        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(d / (na * nb), 6)

    ranked = sorted(cents, key=lambda r: (-py_cos(query_vec, list(r["cv"])), r["cid"]))
    probe = [r["cid"] for r in ranked[:nprobe]]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # query norm is a literal; row norm computed once inside the select
    return (
        assigned.filter(F.col("centroid_id").isin(probe))
        .select(
            F.col(key_col),
            F.col("centroid_id"),
            F.round(
                dot(F.col(vec_col), q)
                / (norm(F.col(vec_col)) * F.lit(py_norm(query_vec))),
                6,
            ).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col(key_col))
        .limit(k)
    )


# right sides up to this many rows broadcast (exact tier); larger go IVF
KNN_BROADCAST_ROW_LIMIT = 100_000


def _knn_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    k: int,
    vec_col: str,
    key_col: str,
    exclude_same_key: bool,
) -> DataFrame:
    """Exact kNN join: block-nested-loop via broadcast of the right side;
    the per-left top-k is a window rank (no global sort). Zero-norm
    vectors are dropped from both sides (see :func:`_drop_zero_norm` —
    keeps the broadcast and IVF tiers bit-identical on degenerate
    input)."""
    from pyspark.sql import Window

    left = _drop_zero_norm(left, vec_col)
    right = _drop_zero_norm(right, vec_col)
    l = left.select(
        F.col(key_col).alias("l_id"),
        F.col(vec_col).alias("lv"),
        norm(F.col(vec_col)).alias("ln"),
    )
    r = right.select(
        F.col(key_col).alias("r_id"),
        F.col(vec_col).alias("rv"),
        norm(F.col(vec_col)).alias("rn_"),
    )
    # norms ride the join sides (once per vector); per-pair work is the dot
    sim = dot(F.col("lv"), F.col("rv")) / (F.col("ln") * F.col("rn_"))
    w = Window.partitionBy("l_id").orderBy(F.desc("cosine_sim"), F.col("r_id"))
    joined = l.crossJoin(F.broadcast(r))
    if exclude_same_key:
        joined = joined.filter(F.col("l_id") != F.col("r_id"))
    return (
        joined.withColumn("cosine_sim", F.round(sim, 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("l_id", "r_id", "cosine_sim", "rn")
    )


# right-side rows per cogroup block in knn_join_ivf's vectorized pair
# stage: a hot cell is hash-split into ceil(m / this) blocks so no single
# Python worker materializes more than ~block x dim doubles of the right
# side (the cogroup analog of semdedup's pair budget — cogroups cannot be
# AQE-skew-split, so the operator must bound them itself)
KNN_CELL_BLOCK_ROWS = 8192


def _knn_pair_topk_cells(
    l_cells: DataFrame,
    r_cells: DataFrame,
    k: int,
    key_col: str,
    exclude_same_key: bool,
    key_type,
) -> DataFrame:
    """Per-(cell, block) top-k candidates via a cogrouped numpy kernel —
    the vectorized twin of ``join + per-pair fold`` in
    :func:`knn_join_ivf`. Inputs carry a ``blk`` column (constant 0 when
    the cell is small enough to be one block).

    Bit-exactness: each pair's dot accumulates left-to-right over the
    dimension (one vectorized multiply-add per dimension — the fold's
    exact IEEE-754 sequence) and rounds HALF-UP with exact decimal
    handling of representation ties (:func:`_round_half_up_spark`), so
    the rounded cosines equal the expression path's. Rights are ordered
    by key inside the kernel, so a stable argsort on descending cosine
    breaks ties to the lowest ``r_id`` — the global window's exact total
    order, which makes the per-block cut lossless for the global top-k
    (top-k of a union is contained in the union of per-block top-ks
    under one total order). The left block is additionally chunked so
    the pair matrix stays ~32 MB regardless of block size."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("l_id", key_type, False),
            T.StructField("r_id", key_type, False),
            T.StructField("cosine_sim", T.DoubleType(), False),
        ]
    )
    empty = {"l_id": [], "r_id": [], "cosine_sim": []}

    def topk(left_pdf, right_pdf):
        if len(left_pdf) == 0 or len(right_pdf) == 0:
            return pd.DataFrame(empty)
        X = np.array([np.asarray(v, np.float64) for v in left_pdf["lv"]])
        Y = np.array([np.asarray(v, np.float64) for v in right_pdf["rv"]])
        ln = left_pdf["ln"].to_numpy(np.float64)
        rn = right_pdf["rn_"].to_numpy(np.float64)
        lid = left_pdf["l_id"].to_numpy()
        rid = right_pdf["r_id"].to_numpy()
        r_order = np.argsort(rid, kind="stable")
        Y, rn, rid = Y[r_order], rn[r_order], rid[r_order]
        m, D = X.shape
        n = Y.shape[0]
        kk = min(k, n)
        outs = []
        chunk = max(1, 4_000_000 // max(n, 1))
        for s in range(0, m, chunk):
            Xc, lnc, lidc = X[s : s + chunk], ln[s : s + chunk], lid[s : s + chunk]
            acc = np.zeros((Xc.shape[0], n))
            for d in range(D):
                acc += Xc[:, d][:, None] * Y[None, :, d]
            cos = _round_half_up_spark(acc / (lnc[:, None] * rn[None, :]))
            if exclude_same_key:
                cos[lidc[:, None] == rid[None, :]] = -np.inf
            idx = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            sims = np.take_along_axis(cos, idx, axis=1).ravel()
            keep = sims > -np.inf
            outs.append(
                pd.DataFrame(
                    {
                        "l_id": np.repeat(lidc, kk)[keep],
                        "r_id": rid[idx.ravel()][keep],
                        "cosine_sim": sims[keep],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return (
        l_cells.groupBy("cell", "blk")
        .cogroup(r_cells.groupBy("cell", "blk"))
        .applyInPandas(topk, schema=out_schema)
    )


def knn_join_ivf(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    exclude_same_key: bool = True,
    n_centroids: int = 8,
    nprobe: int = 2,
    cents: list | None = None,
) -> DataFrame:
    """IVF-partitioned kNN join — the tier that survives a large right side.

    Both sides are assigned to IVF cells: every right vector to its nearest
    centroid, every left vector to its ``nprobe`` nearest cells (one
    exploded row per probe). Candidates meet per cell id and a per-left
    window keeps the top-k. Nothing broadcasts except the centroid arrays
    and the tiny per-cell block-count map; the only shuffles hash-partition
    each side on (cell, block). Below ``IVF_ASSIGN_ARROW_MIN_CENTROIDS``
    centroids the pair stage is a plain equi-join of column expressions
    (AQE skew-split applies); at or above it, a cogrouped numpy kernel
    evaluates each (cell, block)'s pair matrix — cogroups cannot be
    AQE-split, so hot cells are hash-split into ``KNN_CELL_BLOCK_ROWS``
    blocks by the operator itself, bounding any single Python worker's
    residency. Both tiers produce identical results (pytest-asserted).
    Approximate by construction: a true neighbor assigned to an
    unprobed cell is missed. Recall rises with ``nprobe``, and
    ``nprobe == n_centroids`` degenerates to the exact join (asserted in
    tests/test_dataops.py).

    Probe order ties break to the lowest centroid id — the same rule as
    ``ivf_assign``/``ivf_topk``, so the DuckDB oracle reproduces cell
    membership exactly.
    """
    from pyspark.sql import Window

    # cosine is undefined for the zero vector; both tiers drop such rows
    # BEFORE centroid seeding so a zero vector can neither become a
    # centroid (cn=0 -> every assignment NaN) nor a candidate
    left = _drop_zero_norm(left, vec_col)
    right = _drop_zero_norm(right, vec_col)
    if cents is None:
        cents = _collect_centroids(right, n_centroids, vec_col, key_col)
    use_arrow = len(cents) >= IVF_ASSIGN_ARROW_MIN_CENTROIDS
    r_cells = ivf_assign(right, n_centroids, vec_col, key_col, cents=cents).select(
        F.col("centroid_id").alias("cell"),
        F.col(key_col).alias("r_id"),
        F.col(vec_col).alias("rv"),
        norm(F.col(vec_col)).alias("rn_"),
    )
    if use_arrow:
        l_cells = _ivf_probe_arrow(left, cents, nprobe, vec_col, key_col)
    else:
        # struct(-sim, cid) sorted ascending == similarity desc, ties to
        # low cid; the left vector's norm is staged once and each centroid
        # norm is a driver-side literal (same cost shape as ivf_assign)
        probes = F.array(
            *[
                F.struct(
                    (
                        -F.round(
                            dot(
                                F.col(vec_col),
                                F.array(*[F.lit(float(x)) for x in r["cv"]]),
                            )
                            / (F.col("_ln") * F.lit(py_norm(r["cv"]))),
                            6,
                        )
                    ).alias("ns"),
                    F.lit(r["cid"]).alias("cid"),
                )
                for r in cents
            ]
        )
        probe_cells = F.transform(
            F.slice(F.array_sort(probes), 1, nprobe), lambda x: x.getField("cid")
        )
        l_cells = (
            left.withColumn("_ln", norm(F.col(vec_col)))
            .select(
                F.col(key_col).alias("l_id"),
                F.col(vec_col).alias("lv"),
                F.col("_ln").alias("ln"),
                F.explode(probe_cells).alias("cell"),
            )
        )
    w = Window.partitionBy("l_id").orderBy(F.desc("cosine_sim"), F.col("r_id"))
    if use_arrow:
        # vectorized pair stage (round 10): the per-pair interpreted fold
        # was the sf1.0 bottleneck — pairs grow ~n^1.5 under sqrt(n) cells
        # and AQE coalesces the cell join's small SHUFFLE BYTES into a
        # handful of partitions, blind to the O(pairs * dim) CPU behind
        # them (measured: 202 s at sf1.0, alpha=1.96 — SCALE.md r10). A
        # cogroup per (cell, block) computes its (left x right) rounded-
        # cosine matrix in numpy with the fold's exact accumulation order
        # and keeps the per-group top-k; a row can only beat the global
        # top-k if it survives its own group's top-k under the SAME total
        # order, so the cheap cross-group window below is exact.
        #
        # Hot-cell guardrail: cogroups cannot be AQE-skew-split, so a
        # cell whose right side exceeds KNN_CELL_BLOCK_ROWS is hash-split
        # into blocks (the cogroup analog of semdedup's pair budget);
        # the right side is checkpointed so the assignment kernel feeds
        # both the sizing count and the pair stage without recomputing.
        r_cells = r_cells.localCheckpoint(eager=True)
        cell_s = (
            r_cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("m"))
            .select(
                "cell",
                F.greatest(
                    F.lit(1),
                    F.ceil(F.col("m") / F.lit(KNN_CELL_BLOCK_ROWS)),
                ).cast("int").alias("s"),
            )
        )
        r_blk = (
            r_cells.join(F.broadcast(cell_s), "cell")
            .withColumn(
                "blk", F.pmod(F.xxhash64(F.col("r_id")), F.col("s")).cast("int")
            )
            .drop("s")
        )
        l_blk = l_cells.join(F.broadcast(cell_s), "cell").select(
            "l_id",
            "lv",
            "ln",
            "cell",
            F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("blk"),
        )
        candidates = _knn_pair_topk_cells(
            l_blk, r_blk, k, key_col=key_col,
            exclude_same_key=exclude_same_key,
            key_type=right.schema[key_col].dataType,
        )
        return (
            candidates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("l_id", "r_id", "cosine_sim", "rn")
        )
    joined = l_cells.join(r_cells, "cell")
    if exclude_same_key:
        joined = joined.filter(F.col("l_id") != F.col("r_id"))
    return (
        joined.withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("lv"), F.col("rv")) / (F.col("ln") * F.col("rn_")), 6
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("l_id", "r_id", "cosine_sim", "rn")
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    exclude_same_key: bool = True,
    strategy: str = "auto",
    n_centroids: int = 8,
    nprobe: int = 2,
    cents: list | None = None,
) -> DataFrame:
    """For every left vector, its k nearest right vectors by cosine.

    Two-tier dispatcher (same pattern as graph.sssp.sssp): right sides up
    to KNN_BROADCAST_ROW_LIMIT rows broadcast and get the exact
    block-nested-loop join; larger right sides switch to the
    IVF-partitioned tier (:func:`knn_join_ivf` — cell equi-join, no
    broadcast, approximate with recall controlled by ``nprobe``).

    ``exclude_same_key`` (default True) drops pairs whose keys coincide —
    correct for the self-join use (a vector is trivially its own nearest
    neighbor). Pass False when left and right are DIFFERENT tables whose key
    spaces merely overlap, or coinciding keys silently lose candidates.

    Zero-norm vectors are dropped from both sides by every tier (cosine is
    undefined for the zero vector; see :func:`_drop_zero_norm`), so the
    tiers agree bit-for-bit even on degenerate input.

    ``auto`` counts the right side (one job; cheap when it is cached) and
    WARNS when it flips to the approximate tier — exactness loss should
    never be silent. Pass ``strategy='ivf'`` (tuning n_centroids/nprobe to
    the corpus) or ``'broadcast'`` explicitly to skip both the count and
    the warning.
    """
    if strategy == "auto":
        if right.count() <= KNN_BROADCAST_ROW_LIMIT:
            strategy = "broadcast"
        else:
            import warnings

            warnings.warn(
                f"knn_join: right side exceeds {KNN_BROADCAST_ROW_LIMIT} rows;"
                " switching to the approximate IVF tier"
                f" (n_centroids={n_centroids}, nprobe={nprobe})."
                " Recall < 1 — pass strategy='ivf' with tuned parameters,"
                " or strategy='broadcast' to force the exact join.",
                stacklevel=2,
            )
            strategy = "ivf"
    if strategy == "broadcast":
        return _knn_join_broadcast(left, right, k, vec_col, key_col, exclude_same_key)
    return knn_join_ivf(
        left,
        right,
        k=k,
        vec_col=vec_col,
        key_col=key_col,
        exclude_same_key=exclude_same_key,
        n_centroids=n_centroids,
        nprobe=nprobe,
        cents=cents,
    )


# per-reducer budget of within-cell cosine evaluations for semdedup's
# quadratic stage: ~2.5e7 pairs ~= a few seconds of interpreted array
# arithmetic per task. Cells whose size m satisfies m^2 > budget are
# split into ceil(m / sqrt(budget)) blocks per side so every reducer
# handles at most ~budget pairs (exact semantics preserved — see
# semdedup docstring).
SEMDEDUP_PAIR_BUDGET = 25_000_000

# pair volume (Σ cell m²) at which semdedup's quadratic stage switches
# from the pure-JVM join to the vectorized Arrow kernel: below it the
# extra Python stage costs more than the interpreted fold it replaces
# (measured a wash at ~9e4 pairs, arrow 25%+ faster at ~2.8e6 and the
# gap is the quadratic term itself — see semdedup docstring)
SEMDEDUP_ARROW_MIN_PAIRS = 500_000


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    cents: list | None = None,
    pair_budget: int = SEMDEDUP_PAIR_BUDGET,
    pair_method: str = "auto",
) -> DataFrame:
    """Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then within each cluster drop
    every vector that has a lower-keyed near-duplicate (cosine >=
    ``threshold``). One representative (the cluster-wise minimal key of
    each near-dup neighborhood) survives.

    Keep rule, precisely: a vector is DROPPED iff some same-cluster vector
    with a smaller key is within ``threshold`` cosine, where the cosine is
    **rounded to 6 decimals before the comparison** (so 0.9499996 rounds to
    0.95 and is dropped at threshold 0.95) — deliberate, so an independent
    engine rounding identically reproduces the exact kept set at the float
    boundary. This is the greedy
    keep-first sweep of SemDeDup made order-deterministic by keying on
    ``key_col`` — no iteration, no transitive closure, and expressible as
    one self-join, so an independent engine reproduces the exact kept set.

    Scale shape: the all-pairs comparison never happens — candidates meet
    in an equi-join on ``centroid_id`` (the clusters bound the quadratic
    term), and the join shuffles each side once on a small int key.
    Per-reducer cost is ENFORCED, not just documented: a cell of size m
    costs m² cosine evaluations on whatever reducer owns it, so after
    assignment one groupBy on ``centroid_id`` sizes every cell, and any
    cell with m² > ``pair_budget`` is split into s = ceil(m/sqrt(budget))
    blocks per side — the join key becomes (cell, block_i, block_j), each
    of the s² reducers evaluates at most ~budget pairs, and every (k, k2)
    pair still meets exactly once (left iterates the partner's block
    index, right iterates its own), so the kept set is bit-identical to
    the unsplit join (pytest-asserted on a deliberately skewed corpus).
    A warning still fires so hotspot absorption is never silent — proper
    sizing (``n_centroids ~ N / C`` with C in the low thousands, SemDeDup
    practice) remains strictly cheaper than splitting. The default
    ``n_centroids=8`` is a small-corpus setting only. Returns
    ``(key, centroid_id, kept)`` for every input vector; filter ``kept``
    to materialize the deduped corpus.

    ``pair_method``: ``"arrow"`` (round 14) evaluates each
    (cell, block, block) pair matrix in a vectorized numpy kernel that
    replays the JVM fold's exact IEEE accumulation order and Spark's
    HALF-UP rounding (bit-identical kept set, pytest-asserted across
    methods); ``"join"`` is the pure-Catalyst formulation — the
    interpreted per-pair ``aggregate`` fold is its dominant cost at real
    cell sizes (guide §4.2). ``"auto"`` (default) picks by the measured
    pair volume (Σ cell²), from the same per-cell stats the hot-cell
    guard already collects: below ``SEMDEDUP_ARROW_MIN_PAIRS`` the pure-
    JVM join avoids an extra Python stage (measured a wash at 90k pairs);
    above it the vectorized kernel wins and keeps winning with scale
    (measured 2.9 s -> 2.3 s at 2.8M pairs, and the gap is the quadratic
    term).
    """
    if pair_method not in ("auto", "arrow", "join"):
        raise ValueError(f"semdedup: unknown pair_method {pair_method!r}")
    # the assignment argmin (n_centroids interpreted dot products per
    # vector) feeds BOTH self-join sides and the kept-flag join-back —
    # checkpoint it so it computes once, not three times per action.
    # LAZY: the hot-cell stats collect below scans every partition and
    # materializes the checkpoint as a side effect — eager was a second,
    # redundant job (round 14; same one-job fusion the SSSP loop uses)
    assigned = ivf_assign(
        embeddings, n_centroids, vec_col, key_col, cents=cents
    ).localCheckpoint(eager=False)
    # hot-cell guardrail: blocks-per-side for each cell, 1 unless the
    # cell's pair count exceeds the budget. Tiny relation (one row per
    # centroid) — broadcast onto both join sides.
    max_side = max(1, int(pair_budget**0.5))
    cell_s = (
        assigned.groupBy(F.col("centroid_id").alias("c"))
        .agg(F.count(F.lit(1)).alias("m"))
        .select(
            "c",
            F.greatest(F.lit(1), F.ceil(F.col("m") / F.lit(max_side)))
            .cast("int")
            .alias("s"),
            "m",
        )
    )
    # one row per centroid (bounded by n_centroids): feeds the hot-cell
    # warning AND the auto pair-method sizing without a second job
    cell_rows = cell_s.collect()
    hot_rows = sorted(
        (r for r in cell_rows if r["s"] > 1), key=lambda r: -r["m"]
    )
    if pair_method == "auto":
        total_pairs = sum(r["m"] * r["m"] for r in cell_rows)
        pair_method = (
            "arrow" if total_pairs >= SEMDEDUP_ARROW_MIN_PAIRS else "join"
        )
    if hot_rows:
        import warnings

        n_hot, worst = len(hot_rows), hot_rows[0]
        warnings.warn(
            f"semdedup: {n_hot} cell(s) exceed the {pair_budget:.0g}"
            f" pair budget (largest: {worst['m']} vectors in cell"
            f" {worst['c']} -> {worst['s']} blocks/side). Splitting keeps"
            " the result exact and every reducer under budget, but costs"
            f" {worst['s']}x replication of hot-cell rows — resize"
            " n_centroids toward N/C with C in the low thousands"
            " (arXiv:2303.09540) to avoid the blowup.",
            stacklevel=2,
        )
    # each side carries its norm INTO the join (computed once per vector),
    # so the quadratic within-cluster stage pays one dot product per pair
    # instead of a dot plus two norm recomputations — the higher-order-fn
    # arithmetic is interpreted, so tripling per-pair array work is ~3x wall
    # time on the hot stage.
    slim = assigned.join(
        F.broadcast(cell_s.drop("m")), assigned["centroid_id"] == cell_s["c"]
    ).select(
        F.col(key_col).alias("k"),
        F.col("centroid_id").alias("c"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nv"),
        F.pmod(F.xxhash64(F.col(key_col)), F.col("s")).cast("int").alias("b"),
        F.col("s"),
    )
    # the dropped-candidate side iterates the PARTNER's block index, the
    # smaller-key side iterates its OWN position among left blocks; pair
    # (k, k2) therefore meets exactly once, on reducer (c, b_k, b_k2)
    if pair_method == "join":
        left = slim.select(
            "k", "c", "v", "nv", F.col("b").alias("bi"),
            F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("bj"),
        )
        right = slim.select(
            F.col("k").alias("k2"),
            F.col("c").alias("c2"),
            F.col("v").alias("v2"),
            F.col("nv").alias("nv2"),
            F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("bi2"),
            F.col("b").alias("bj2"),
        )
        dropped = (
            left.join(
                right,
                (F.col("c") == F.col("c2"))
                & (F.col("bi") == F.col("bi2"))
                & (F.col("bj") == F.col("bj2"))
                & (F.col("k2") < F.col("k")),
            )
            .filter(
                F.round(
                    dot(F.col("v"), F.col("v2")) / (F.col("nv") * F.col("nv2")), 6
                )
                >= threshold
            )
            .select(F.col("k").alias(key_col))
            .distinct()
        )
    else:
        # "arrow" (round 14, guide §4.2): same reducer keys — the two
        # explode-sides union into ONE relation with a side marker and the
        # within-cell pair matrix is evaluated by a vectorized numpy
        # kernel per (cell, block, block) group. BIT-IDENTICAL to the
        # join: the dot replays ``dot``'s left-to-right fold (one
        # multiply-add per dimension, same IEEE sequence — the
        # _assign_sims_np precedent), norms arrive precomputed from the
        # SAME staged ``nv`` column, rounding is _round_half_up_spark,
        # and key order uses the same lexicographic/int comparison
        # (UTF-8 byte order == code-point order). The interpreted
        # Catalyst fold was the dominant cost of the quadratic stage
        # (~D fold steps per pair, interpreted); the kernel is one
        # vectorized op per dimension per (cell, block) PAIR MATRIX.
        both = slim.select(
            F.lit(0).alias("side"), "k", "c", "v", "nv",
            F.col("b").alias("bi"),
            F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("bj"),
        ).unionByName(
            slim.select(
                F.lit(1).alias("side"), "k", "c", "v", "nv",
                F.explode(F.sequence(F.lit(0), F.col("s") - 1)).alias("bi"),
                F.col("b").alias("bj"),
            )
        )
        key_ddl = assigned.schema[key_col].dataType.simpleString()

        def pair_kernel(pdf):
            import numpy as np
            import pandas as pd

            L = pdf[pdf["side"] == 0]
            R = pdf[pdf["side"] == 1]
            empty = pd.DataFrame({"k": L["k"].iloc[:0]})
            if L.empty or R.empty:
                return empty
            X = np.array([np.asarray(v, dtype=np.float64) for v in L["v"]])
            Y = np.array([np.asarray(v, dtype=np.float64) for v in R["v"]])
            acc = np.zeros((len(L), len(R)))
            for d in range(X.shape[1]):
                acc += X[:, d][:, None] * Y[:, d][None, :]
            nvL = L["nv"].to_numpy(dtype=np.float64)
            nvR = R["nv"].to_numpy(dtype=np.float64)
            sims = _round_half_up_spark(acc / (nvL[:, None] * nvR[None, :]))
            kL = L["k"].to_numpy()
            kR = R["k"].to_numpy()
            hit = (sims >= threshold) & (kR[None, :] < kL[:, None])
            return pd.DataFrame({"k": L["k"][hit.any(axis=1)]})

        dropped = (
            both.groupBy("c", "bi", "bj")
            .applyInPandas(pair_kernel, schema=f"k {key_ddl}")
            .distinct()
        )
    dropped = dropped.withColumnRenamed("k", key_col).withColumn(
        "_dropped", F.lit(True)
    )
    return (
        assigned.join(dropped, key_col, "left")
        .select(
            key_col,
            "centroid_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
    )


def quantize_int8(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q8",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|x|)/127,
    q_i = floor(x_i/scale + 0.5) clamped to [-127, 127] — the standard
    storage/bandwidth reduction before ANN serving (4x smaller than
    float32). Adds ``q8`` (array<int>) and ``q_scale`` (double).

    floor(x + 0.5) instead of round(): Spark and DuckDB disagree on
    negative-half rounding, floor is identical everywhere. Zero vectors get
    scale 0 and all-zero codes (guarded division). Pure column expressions —
    no shuffle, codegen-friendly.
    """
    v = F.col(vec_col)
    absmax = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = absmax / F.lit(127.0)
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
                ),
            ),
        )
    )
    return embeddings.withColumn(out_col, q).withColumn("q_scale", scale)


def random_projection(
    embeddings: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    seed: int = 42,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each vector
    onto ``out_dim`` deterministic Gaussian directions (the same
    ``hyperplanes`` generator the LSH operator and its oracle share), scaled
    by 1/sqrt(out_dim) so expected pairwise distances are preserved.

    The projection matrix rides into the plan as literals (a few KB) — no
    join, no shuffle, whole-stage codegen over the scan.
    """
    import math

    planes = hyperplanes(dim_of(embeddings, vec_col), out_dim, seed)
    inv = 1.0 / math.sqrt(out_dim)
    v = F.col(vec_col)
    comps = [
        (dot(v, F.array(*[F.lit(float(x)) for x in p])) * F.lit(inv))
        for p in planes
    ]
    return embeddings.withColumn(out_col, F.array(*comps))


def dim_of(embeddings: DataFrame, vec_col: str = "embedding") -> int:
    """Vector width from the first row (embeddings are fixed-width by
    contract; a driver-side one-row peek, same tiny-action pattern as
    _collect_centroids)."""
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError("cannot infer vector dim from an empty DataFrame")
    return int(row["d"])

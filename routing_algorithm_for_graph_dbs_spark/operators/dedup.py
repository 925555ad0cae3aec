"""Deduplication operators for training-data pipelines (beyond-reference
surface, BASELINE.json north star).

Five families, each designed scale-first:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle on the
  16-byte digest, never on the document text.
- **MinHash + LSH**: shingle -> per-seed min-hash signature -> band buckets
  -> candidate pairs meet in an equi-join on (band, band_hash). Only
  bucket-mates are compared; the cross product never materializes. Hashes
  are md5 (stable across engines, so DuckDB can oracle the signatures).
- **SimHash**: 64-bit rotation-invariant fingerprint; near-dups differ in
  few bits. Pure column expressions (bit_count + xor compare).
- **n-gram Jaccard**: exact verify step for LSH candidates.
- **embedding cosine**: see operators.similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "), r"\s+", " ")
    )


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep one row (min key) per distinct normalized text.

    Scale shape: shuffle on md5 digest only; ``min_by`` keeps the smallest
    key deterministically (batch MERGE semantics, SURVEY §2.1 S4).
    """
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.withColumn("fp", fp)
        .groupBy("fp")
        .agg(
            F.min(key_col).alias(key_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("fp")
    )


def keep_best_dedup(
    df: DataFrame,
    group_cols: list[str],
    score: Column,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the max-``score`` row per duplicate group — the "keep best
    duplicate" policy real pipelines use instead of keep-min-id (retain
    the longest / highest-quality copy, drop the rest).

    Scale shape: ONE combiner-friendly aggregation (``max_by`` of the
    kept-column struct) — the shuffle carries one candidate row per
    (partition, group), not the group's rows, so a million-way duplicate
    cluster costs what a 2-way one does. No window, no second pass.

    ``score`` must induce a TOTAL order within each group or the kept row
    is nondeterministic — compose a struct ending in a unique key
    (negate it for ascending tie-break under max), e.g.
    ``F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("tb"))``.
    ``keep_cols`` default: every non-group column. Output adds
    ``dup_count`` (group size).
    """
    keep_cols = keep_cols or [c for c in df.columns if c not in group_cols]
    payload = F.struct(*[F.col(c) for c in keep_cols])
    agg = df.groupBy(*group_cols).agg(
        F.max_by(payload, score).alias("_best"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return agg.select(
        *group_cols,
        *[F.col(f"_best.{c}").alias(c) for c in keep_cols],
        "dup_count",
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles of the normalized text (distinct).

    Built from n shifted slices zipped together — O(tokens) per document
    (the index-by-index ``slice`` formulation is O(tokens²) and ~10x slower
    on real corpora). Documents shorter than n tokens yield their whole
    text as the single shingle.
    """
    toks = F.split(normalize_text(text), " ")
    k = F.size(toks) - (n - 1)
    shifted = [F.slice(toks, i + 1, k) for i in range(n)]
    zipped = F.arrays_zip(*shifted)
    grams = F.transform(
        zipped,
        lambda x: F.concat_ws(" ", *[x.getField(str(i)) for i in range(n)]),
    )
    return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.array_distinct(grams)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document MinHash signature: for seed i, min(hash(i || shingle)).

    Shape chosen for scale: explode shingles to long format, then one
    vectorized groupBy with ``num_hashes`` min-aggregates — whole-stage
    codegen the entire way, no nested array materialization (the
    higher-order-function formulation is ~20x slower per row). One shuffle
    on the document key.

    ``hash_fn='xxhash64'`` (default) is the fast path; ``'md5'`` produces
    engine-agnostic string hashes DuckDB can reproduce bit-for-bit (used by
    the oracle-checked driver query). Returns (key, sig array of length
    num_hashes — bigint for xxhash64, string for md5).
    """
    sh = df.select(
        F.col(key_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    if hash_fn == "md5":
        hcol = lambda i: F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))  # noqa: E731
    else:
        hcol = lambda i: F.xxhash64(F.lit(i), F.col("shingle"))  # noqa: E731
    per = sh.groupBy(key_col).agg(
        *[F.min(hcol(i)).alias(f"h{i}") for i in range(num_hashes)]
    )
    return per.select(
        F.col(key_col), F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    key_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: documents sharing >=1 LSH band bucket.

    Explode each signature into ``bands`` (band_id, md5(band slice)) rows;
    pairs meet in the groupBy on the bucket — an equi-join shape that scales
    (no cross product). Returns distinct (a, b) with a < b.
    """
    banded = signatures.select(
        F.col(key_col).alias("k"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.select("band", "bucket", F.col("k").alias("a"))
    right = banded.select("band", "bucket", F.col("k").alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keeps pairs >= threshold.

    Returns (a, b, jaccard). The shingle arrays are joined in (small,
    per-candidate) — the expensive set intersection only runs on LSH
    survivors.
    """
    sh = df.select(
        F.col(key_col).alias("k"),
        F.array_distinct(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    a = sh.select(F.col("k").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("k").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.join(a, "a")
        .join(b, "b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: signature -> LSH buckets -> Jaccard verify ->
    keep the min key of each duplicate cluster (union-find-free greedy:
    a row is dropped if it pairs with any smaller key — correct for
    transitive clusters because every member pairs with the cluster min or
    chains to it; for strict transitive closure run
    graph.components.connected_components on the pair list)."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands});"
            " trailing hashes would be computed but never bucketed"
        )
    sigs = minhash_signatures(df, text_col, key_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, key_col, bands, num_hashes // bands)
    dups = jaccard_verify(cands, df, text_col, key_col, shingle_n, threshold)
    losers = dups.select(F.col("b").alias(key_col)).distinct()
    return df.join(losers, key_col, "left_anti")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over distinct word tokens: for each bit position b,
    vote = sum over tokens of (bit b of hash(token) ? +1 : -1); simhash
    bit b = sign(vote).

    Shape chosen for scale: explode tokens to long format, hash each token
    ONCE to a 64-bit value, then one groupBy with 64 conditional-sum bit
    votes — the same single-shuffle, whole-stage-codegen shape as
    :func:`minhash_signatures`. (An earlier formulation nested 64
    ``aggregate`` higher-order calls in one projection; correct, but the
    generated code grew ~64x and risked codegen fallback on wide plans.)

    ``hash_fn='xxhash64'`` (default) is the fast path. ``'md5'`` derives the
    64-bit token hash from the first 16 hex chars of md5 (big-endian), which
    DuckDB reproduces bit-for-bit — used by the oracle-checked driver query.

    Output: one (key, simhash bigint) row per DISTINCT key — the same
    grouped contract as :func:`minhash_signatures`; rows sharing a key get
    their token votes merged. NULL text contributes no votes and yields
    fingerprint 0, not a dropped row — dedup pipelines must still see the
    doc. ``explode_outer`` keeps those rows in the single pass (a plain
    explode drops them, and a repair join-back would both double-scan the
    input and zero out NULL-KEY groups the equi-join can't match).
    """
    toks = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    tok_df = df.select(F.col(key_col), F.explode_outer(toks).alias("tok"))
    if hash_fn == "md5":
        hx = F.md5(F.col("tok"))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
        h64 = F.shiftleft(hi, 32).bitwiseOR(lo)
    else:
        h64 = F.when(F.col("tok").isNotNull(), F.xxhash64(F.col("tok")))
    hdf = tok_df.select(F.col(key_col), h64.alias("h"))
    # three-way vote: +1 / -1 per real token bit, 0 for the NULL-token row
    # (a NULL hash must not push every bit toward -1)
    votes = hdf.groupBy(key_col).agg(
        *[
            F.sum(
                F.when(F.col("h").isNull(), 0)
                .when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        c = (1 << b) if b < 63 else -(1 << 63)
        sim = sim + F.when(F.col(f"v{b}") > 0, F.lit(c)).otherwise(F.lit(0).cast("long"))
    return votes.select(F.col(key_col), sim.alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, key_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Pairs with Hamming distance <= max_hamming, blocked by 16-bit chunks.

    Pigeonhole: if two 64-bit hashes differ in <=3 bits, at least one of the
    four 16-bit chunks is identical — candidates meet in an equi-join on
    (chunk_id, chunk_value), never a cross product.
    """
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("chunk"),
            )
            for i in range(4)
        ]
    )
    blocked = sims.select(
        F.col(key_col).alias("k"), F.col("simhash"), F.explode(chunks).alias("c")
    ).select("k", "simhash", F.col("c.chunk_id"), F.col("c.chunk"))
    left = blocked.select("chunk_id", "chunk", F.col("k").alias("a"), F.col("simhash").alias("sim_a"))
    right = blocked.select("chunk_id", "chunk", F.col("k").alias("b"), F.col("simhash").alias("sim_b"))
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        left.join(right, ["chunk_id", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

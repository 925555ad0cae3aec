"""Skew-resistant shapes for hot-key joins and aggregations.

At 100 TB the failure mode isn't total data size — it's the ONE reducer
that receives a hot key. AQE's skew-join split handles the plain join
case at runtime; these operators cover the shapes AQE doesn't rewrite:

- ``skew_count_distinct``: exact COUNT(DISTINCT v) GROUP BY k. The naive
  plan shuffles every row of a hot key to one reducer before deduping;
  the two-stage shape dedups on (k, v) first — the shuffle key includes
  the value, so a hot key's rows spread across the whole cluster — then
  counts per key over the already-tiny distinct set.
- ``salted_join``: equi-join where the left side has hot keys and the
  right side is too large to broadcast. Each right row is replicated
  ``salt_n`` times; each left row picks one replica via a uniform salt.
  The hot key's rows land on ``salt_n`` reducers instead of one, at the
  cost of a bounded ``salt_n``x blowup of the right side.
- ``bloom_prefilter_join``: selective equi-join where the key side is too
  large to broadcast AS ROWS but its Bloom bitset is tiny. A fact row
  whose key cannot match still pays the full shuffle in a plain
  sort-merge join; filtering the fact side against the key set's Bloom
  filter BEFORE the Exchange drops those rows at the scan, shrinking the
  shuffle by the join's selectivity. False positives only cost wasted
  shuffle rows — the exact join that follows removes them, so the result
  is identical to the plain join (equality-tested, including a
  deliberately undersized-filter case).

Results are identical to the naive shapes (equality-tested); only the
physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key distinct count that survives hot keys (two-stage:
    distinct on (key, value), then count per key)."""
    return (
        df.select(*key_cols, value_col)
        .distinct()
        .groupBy(*key_cols)
        # count(col), not count(*): SQL COUNT(DISTINCT v) skips NULLs, so a
        # key with values {1, 2, NULL} must report 2 (and all-NULL keys 0)
        .agg(F.count(F.col(value_col)).cast("long").alias(out_col))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-tolerant equi-join: replicate ``right`` ``salt_n`` times and
    spread each left key's rows uniformly over the replicas.

    The salt is a deterministic hash of the full left row: a
    position-derived salt (partition id / monotonic id) would be recomputed
    differently on task retry AFTER reducers already fetched some shuffle
    blocks, silently dropping or duplicating rows (the classic
    nondeterministic-shuffle-key hazard; see operators/asof.py for the same
    rule). Fully-identical duplicate left rows share a salt — replicate-
    with-distinct-keys upstream if such rows are themselves the hot spot.
    Supported ``how``: inner / left joins (semantics preserved by
    replication + salt match); right and full-outer would double-count
    unmatched right replicas — rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: an"
            " unmatched right row appears once per replica under right/full"
            " semantics"
        )
    if salt_n < 1:
        raise ValueError(f"salt_n must be >= 1, got {salt_n}")
    lt = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_n))
        .cast("int"),
    )
    rt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return lt.join(rt, on + ["_salt"], how).drop("_salt")


def _bloom_positions(on: list[str], i: int, m_bits: int):
    """Bit position of hash ``i`` for the key tuple — shared verbatim by
    build and probe so membership is exact for every inserted key."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in on], F.lit(i)),
        F.lit(m_bits).cast("bigint"),
    )


def build_key_bloom(
    keys: DataFrame, on: list[str], m_bits: int = 1 << 18, k: int = 5
) -> dict:
    """Distributed Bloom-filter build over ``keys``' join-key tuples.
    Returns ``{"bits": [m_bits/64 longs], "k": k}`` — the hash count
    travels WITH the bitset, because a probe run with a different ``k``
    than the build silently produces false negatives (a hypothesis test
    caught exactly that footgun in an earlier draft of this API).

    Each key sets ``k`` bits (``xxhash64(key..., i) mod m_bits``); the
    bitset is aggregated as 64-bit blocks (explode k positions ->
    ``bit_or`` per block — map-side partial agg, one tiny shuffle of at
    most ``m_bits/64`` rows) and collected dense. Driver/executor cost is
    ``m_bits/8`` bytes (2^18 bits = 32 KiB); even a 2^24-bit filter for a
    ~1.7M-key dim at 1% FP is 2 MiB — broadcastable where the dim's ROWS
    are not. For a key side so large that even its bitset won't fit,
    fall back to AQE's runtime bloom
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) or a plain
    sort-merge join.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = F.explode(
        F.array(*[_bloom_positions(on, i, m_bits) for i in range(k)])
    ).alias("p")
    blocks = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("p"), 6).cast("int").alias("b"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                F.pmod(F.col("p"), F.lit(64)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("b")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in blocks:
        dense[r["b"]] = r["bits"]
    return {"bits": dense, "k": k}


def bloom_filter_keys(
    df: DataFrame, on: list[str], bloom: dict
) -> DataFrame:
    """Keep only rows whose key tuple MAY be in the set ``bloom`` was
    built from (no false negatives; false-positive rows pass through).
    ``bloom`` is :func:`build_key_bloom`'s return value — bitset and hash
    count together, so build and probe can never disagree on ``k``.
    The predicate is pure column arithmetic over an array *literal*, so it
    runs inside the scan's WholeStageCodegen — before any Exchange."""
    bits = bloom["bits"]
    m_bits = 64 * len(bits)
    arr = F.lit(bits)
    cond = F.lit(True)
    for i in range(bloom["k"]):
        p = _bloom_positions(on, i, m_bits)
        block = F.element_at(arr, F.shiftright(p, 6).cast("int") + F.lit(1))
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("bigint"),
            F.pmod(p, F.lit(64)).cast("int"),
        )
        cond = cond & (block.bitwiseAND(mask) != F.lit(0))
    return df.filter(cond)


def bloom_prefilter_join(
    big: DataFrame,
    keys: DataFrame,
    on: list[str],
    how: str = "inner",
    m_bits: int = 1 << 18,
    k: int = 5,
) -> DataFrame:
    """Equi-join with the big side Bloom-filtered before its shuffle.

    Build the key side's bitset (one small job), filter ``big`` at the
    scan, then run the exact join — semantically identical to
    ``big.join(keys, on, how)`` for the supported join types. Supported
    ``how``: ``inner`` and ``left_semi`` — under outer semantics the
    filter would silently drop unmatched preserved rows, so anything else
    is rejected.

    Build once, filter many: for a dim reused across queries, call
    :func:`build_key_bloom` once and :func:`bloom_filter_keys` per scan.
    """
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/left_semi joins, got"
            f" {how!r}: the prefilter drops rows outer semantics must keep"
        )
    bloom = build_key_bloom(keys, on, m_bits=m_bits, k=k)
    return bloom_filter_keys(big, on, bloom).join(keys, on, how)


def estimate_key_overlap(
    left: DataFrame, right: DataFrame, on: list[str]
) -> DataFrame:
    """Pre-flight DISTINCT-KEY overlap of an equi-join from theta
    sketches — decide a join strategy (broadcast? bloom-prefilter? skip
    entirely?) without shuffling either side.

    Returns one row: ``(inter_est, union_est, left_only_est,
    right_only_est)`` — estimated counts of distinct key tuples on both
    sides / either side / exactly one side. Each side is one scan + one
    mergeable sketch aggregate (sketches persist and re-answer later
    questions for free). Multi-column keys hash to one 64-bit lane first,
    so the estimate inherits xxhash64's collision odds (negligible at
    sketchable cardinalities).

    This estimates KEY overlap, not join OUTPUT size — output size needs
    per-key multiplicities (sum of cA(k)*cB(k)), which sketches of
    distinct values cannot carry. Below the sketch's nominal-entries
    threshold (lgK=12 -> 4096) the sketch is in exact mode and the
    numbers are exact, a property the tests pin.
    """
    h = F.xxhash64(*[F.col(c) for c in on])
    ls = left.select(h.alias("h")).agg(F.theta_sketch_agg("h").alias("ska"))
    rs = right.select(h.alias("h")).agg(F.theta_sketch_agg("h").alias("skb"))
    return ls.crossJoin(rs).select(
        F.theta_sketch_estimate(F.theta_intersection("ska", "skb")).alias(
            "inter_est"
        ),
        F.theta_sketch_estimate(F.theta_union("ska", "skb")).alias("union_est"),
        F.theta_sketch_estimate(F.theta_difference("ska", "skb")).alias(
            "left_only_est"
        ),
        F.theta_sketch_estimate(F.theta_difference("skb", "ska")).alias(
            "right_only_est"
        ),
    )


def spread_for_compute(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow DataFrame up to the cluster's
    parallelism — ONLY if its plan currently has fewer partitions.

    Spark sizes scan splits by BYTES (``files.maxPartitionBytes``), which
    is right for I/O-bound plans and wrong for CPU-bound per-row work: a
    1 MB parquet of 5k documents arrives as ONE split, so a regex-heavy
    projection (repetition filters, language ID, fingerprinting) runs
    serially on one core while 31 idle (measured 3x wall on the
    repetition profile). At real scale the scan already has >= cluster
    parallelism splits and this is a no-op — the partition-count check
    makes the shuffle strictly conditional, so the helper is safe to
    leave in 100 TB paths.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

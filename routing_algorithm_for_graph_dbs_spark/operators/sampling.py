"""Deterministic sampling and sequence-packing operators for training-data
pipelines.

Beyond-reference surface (BASELINE.json north star): a 100 TB corpus is
never trained on verbatim — it is reweighted (mixture sampling), balanced
(stratified sampling), and packed into fixed-token-budget shards. All three
operators here are *deterministic*: the sampling decision for a row is a
pure function of its key, so a re-run over re-partitioned data (or another
engine entirely — the DuckDB oracles reproduce every decision bit-for-bit)
selects the same rows. ``rand()`` would make every retry of a failed 100 TB
stage sample a different subset.

Scale notes:
- ``hash_uniform`` / ``mixture_sample`` are pure column expressions — no
  shuffle, whole-stage codegen, stream through a parquet scan.
- ``stratified_sample`` shuffles once on the stratum key (the rank window);
  skew lives in the stratum with the most rows.
- ``pack_sequences`` is the classic two-pass distributed prefix sum: range
  partition, per-partition cumulative sums in parallel, an exclusive
  prefix over the #partitions-row totals relation, offsets broadcast
  -joined back — nothing routes through the driver. The single-ordering
  global window alternative (``pack_sequences_naive``) funnels the corpus
  through ONE task; the two-pass shape keeps every pass parallel and is
  equality-tested against the naive one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^32 as a float: the first 8 md5 hex chars are a uniform uint32
_U32 = 4294967296.0


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1) from a row key.

    First 8 hex chars of ``md5(salt || key)`` read as a big-endian uint32,
    divided by 2^32. A uint32 is exact in a double, so any engine with md5
    reproduces the value bit-for-bit (DuckDB:
    ``('0x' || substr(md5(..), 1, 8))::BIGINT / 4294967296.0``).
    """
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_U32)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-group downsampling: keep a row iff its uniform
    draw is below its group's rate (groups absent from ``rates`` are
    dropped). The standard mixture-reweighting step of a training-data
    pipeline ("90% of English, 20% of each low-resource language, ...").

    Pure column expression — no shuffle; the filter is pushed into the scan.
    Rates must be in [0, 1]; upsampling (rate > 1) needs row replication,
    which is a different operator.
    """
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for group {g!r} must be in [0, 1], got {r}")
    mapping = F.create_map(
        *[x for g in sorted(rates) for x in (F.lit(g), F.lit(float(rates[g])))]
    )
    rate = F.coalesce(mapping[F.col(group_col)], F.lit(0.0))
    return df.filter(hash_uniform(F.col(key_col), salt) < rate)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by deterministic hash order — a reproducible balanced
    subsample (eval-set carving, per-language caps).

    One shuffle (rank window on the stratum key). ``key_col`` breaks
    hash-collision ties so the selection is total-ordered and engine-exact.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), key_col
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def pack_sequences_naive(
    df: DataFrame,
    token_col: str,
    key_col: str = "doc_id",
    budget: int = 2048,
) -> DataFrame:
    """Reference implementation of sequence packing: one global window.

    Funnels everything through a single task — correct, and the shape the
    SQL oracle uses, but not the scale path. Use ``pack_sequences``.
    """
    w = (
        Window.orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.coalesce(F.col(token_col), F.lit(0))).over(w), F.lit(0))
    return df.withColumn(
        "shard_id", F.floor(before / F.lit(float(budget))).cast("long")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    key_col: str = "doc_id",
    budget: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document a ``shard_id`` so that consecutive documents
    (in ``key_col`` order) fill ~``budget`` tokens per shard — the sequence
    -packing step that turns a filtered corpus into fixed-size training
    shards. A document whose prefix sum crosses the boundary starts in the
    shard its *preceding* total falls in (greedy fill, doc granularity).

    Distributed prefix sum, two passes, every pass parallel:

    1. range-partition by ``key_col`` (partition order == key order; which
       boundaries the range sampler picks is irrelevant — the global prefix
       sum is invariant to the split points);
    2. per-partition cumulative sums via a window keyed on the partition id;
    3. exclusive-prefix the per-partition totals (a #partitions-row
       relation, windowed in one trivial task) and broadcast-join the
       offsets back — no driver collect anywhere.

    Equality with the single-window formulation is tested
    (tests/test_sampling.py).
    """
    toks = F.coalesce(F.col(token_col), F.lit(0))
    local, _offsets, join_back = _global_cumsum(df, [key_col], toks, num_partitions)
    before = F.col("_off") + F.col("_cum_in") - toks
    return (
        join_back(local)
        .withColumn(
            "shard_id", F.floor(before / F.lit(float(budget))).cast("long")
        )
        .drop("_pid", "_cum_in", "_off")
    )


def _global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    val: Column,
    num_partitions: int | None = None,
    group_cols: list[str] | None = None,
):
    """Distributed cumulative sum of ``val`` in ``order_cols`` order —
    global, or independently per group when ``group_cols`` is given.

    Returns ``(local, offsets, join_back)``: ``local`` carries ``_pid``
    (range-partition id) and ``_cum_in`` (cumulative sum WITHIN the
    partition[, group], inclusive); ``offsets`` holds each (group,)
    partition's exclusive prefix over the totals; ``join_back(local)``
    broadcast-joins the offsets on (NULL-safely) the group columns and
    ``_pid``, adding ``_off`` — reconstruct the inclusive cumsum as
    ``_off + _cum_in``. Nothing routes through the driver. Which split
    points the range sampler picks is irrelevant — the reconstructed
    prefix sum is invariant to them.
    """
    spark = df.sparkSession
    gcols = list(group_cols or [])
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(
            n_part, *[F.col(c) for c in (*gcols, *order_cols)]
        )
        .withColumn("_pid", F.spark_partition_id())
    )
    # ROWS frame, not the default RANGE frame: with ties in order_cols a
    # RANGE frame gives every peer the peer-inclusive sum (all tied rows
    # would share one cumsum — ntile_by would dump them into one bucket)
    w = (
        Window.partitionBy("_pid", *gcols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize ONCE before the two consuming jobs: the totals pass and
    # the caller's final action must see the SAME range split points —
    # re-running the range sampler over nondeterministically-ordered
    # shuffle output could shift a boundary row's _pid between jobs,
    # misaligning the offset map
    local = ranged.withColumn("_cum_in", F.sum(val).over(w)).localCheckpoint(
        eager=True
    )
    totals = local.groupBy(*gcols, "_pid").agg(F.max("_cum_in").alias("_tot"))
    # the totals relation is ~(#groups + #partitions) rows — the window
    # over it is trivial by construction
    wo = (
        Window.partitionBy(*gcols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *gcols,
        "_pid",
        F.coalesce(F.sum("_tot").over(wo), F.lit(0)).alias("_off"),
    )
    # NULL-safe equality on the group columns: a NULL group is a real
    # group (matching SQL PARTITION BY), and a null-unsafe join would
    # silently drop its rows
    renamed = offsets.select(
        *[F.col(c).alias(f"_g{i}") for i, c in enumerate(gcols)],
        F.col("_pid").alias("_opid"),
        "_off",
    )

    def join_back(left: DataFrame) -> DataFrame:
        cond = left["_pid"] == renamed["_opid"]
        for i, c in enumerate(gcols):
            cond = cond & left[c].eqNullSafe(renamed[f"_g{i}"])
        return left.join(F.broadcast(renamed), cond).drop(
            "_opid", *[f"_g{i}" for i in range(len(gcols))]
        )

    return local, offsets, join_back


def weighted_replicate(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "rep",
) -> DataFrame:
    """Deterministic weighted replication — the upsampling counterpart to
    ``mixture_sample``: a row with group rate r emits floor(r) copies plus
    one more iff its uniform draw < frac(r), so expected copies == r with
    zero variance across reruns. Adds ``copy_id`` (1..n). Groups absent
    from ``rates`` emit nothing; rates may exceed 1 (that is the point) but
    must be >= 0.

    Row explosion happens via ``explode(sequence(...))`` — JVM-side, no
    shuffle; output size is rate-bounded, never quadratic.
    """
    for g, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for group {g!r} must be >= 0, got {r}")
    mapping = F.create_map(
        *[x for g in sorted(rates) for x in (F.lit(g), F.lit(float(rates[g])))]
    )
    rate = F.coalesce(mapping[F.col(group_col)], F.lit(0.0))
    base = F.floor(rate).cast("int")
    frac = rate - base
    n = base + (hash_uniform(F.col(key_col), salt) < frac).cast("int")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def ntile_by(
    df: DataFrame,
    n_bins: int,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(n) without a single-partition global window: curriculum /
    difficulty binning over a corpus-wide ordering (e.g. token length).

    Global row numbers come from the same two-pass distributed prefix sum
    as ``pack_sequences`` (val = 1); the bucket is then SQL NTILE's exact
    rule — total % n leading buckets get one extra row — evaluated from
    literals, so results are bit-identical to ``NTILE(n) OVER (ORDER BY
    ...)`` (equality tested, including remainder cases where the naive
    ``floor((rn-1)*n/total)`` shortcut disagrees).

    ``order_cols`` should end in a unique tiebreaker (a key column): with
    ties, bucket ASSIGNMENT among the tied rows is arbitrary — exactly as
    in SQL NTILE — and not stable across engines.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    local, _offsets, join_back = _global_cumsum(
        df, order_cols, F.lit(1), num_partitions
    )
    total = local.count()  # the checkpointed relation: a cheap exact count
    if total == 0:
        return df.withColumn("bin", F.lit(0).cast("long"))
    local = join_back(local)
    rn = F.col("_off") + F.col("_cum_in")
    small = total // n_bins
    r = total % n_bins
    big = small + 1
    head = r * big  # rows living in the r oversized leading buckets
    bucket = F.when(
        rn <= F.lit(head), ((rn - 1) / F.lit(big)).cast("long") + 1
    )
    if small > 0:
        bucket = bucket.otherwise(
            F.lit(r) + ((rn - F.lit(head) - 1) / F.lit(small)).cast("long") + 1
        )
    return local.withColumn("bin", bucket).drop("_pid", "_cum_in", "_off")


def percent_rank_scaled(
    df: DataFrame,
    value_col: str,
    out_col: str = "pr",
    round_to: int | None = None,
) -> DataFrame:
    """``PERCENT_RANK() OVER (ORDER BY value)`` without the
    single-partition global window over raw rows.

    The naive window funnels the whole corpus through one task. This
    shape compresses to (distinct value, count) first — one ordinary
    aggregation — runs the cumulative window over THAT relation (bounded
    by the feature's cardinality, not the corpus: a quality score or a
    length has thousands of distinct values at any corpus size), and
    broadcast-joins the value->rank map back onto the scan. Bit-identical
    to SQL PERCENT_RANK (rank(v) = 1 + #rows strictly below;
    pr = (rank-1)/(N-1); single-row input -> 0) — equality is tested
    against the window form.

    For a genuinely continuous column, pre-round/bucket it (the map must
    broadcast); rows with NULL value get NULL ``out_col`` and are
    excluded from the ranking population entirely (SQL instead sorts
    NULLs first, silently shifting every real value's rank — rarely the
    intended feature semantics; impute upstream if they should rank).
    """
    vals = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "_below", F.coalesce(F.sum("_c").over(w), F.lit(0))
    )
    tot = vals.agg(F.sum("_c").alias("_n"))
    ranked = ranked.crossJoin(F.broadcast(tot))
    pr = F.when(
        F.col("_n") > 1, F.col("_below") / (F.col("_n") - F.lit(1))
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        pr = F.round(pr, round_to)
    mapping = ranked.select(value_col, pr.alias(out_col))
    return df.join(F.broadcast(mapping), value_col, "left")


def pack_sequences_grouped(
    df: DataFrame,
    token_col: str,
    group_cols: list[str],
    key_col: str = "doc_id",
    budget: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group sequence packing: independent ``shard_id`` numbering
    inside each group (per-language shards, per-source shards).

    Same two-pass prefix sum as ``pack_sequences``, but the offsets never
    touch the driver: per-(group, partition) totals stay a DataFrame, get
    their within-group exclusive cumsum from a window over the tiny totals
    relation, and broadcast-join back onto the data. A group's rows may
    span many range partitions (a 100 TB English split still packs in
    parallel); the broadcast is ~(groups + partitions) rows — for
    millions of tiny groups prefer a plain per-group window, which is the
    same shuffle without the two-pass overhead.
    """
    toks = F.coalesce(F.col(token_col), F.lit(0))
    local, _offsets, join_back = _global_cumsum(
        df, [key_col], toks, num_partitions, group_cols=group_cols
    )
    before = F.col("_off") + F.col("_cum_in") - toks
    return (
        join_back(local)
        .withColumn("shard_id", F.floor(before / F.lit(float(budget))).cast("long"))
        .drop("_pid", "_cum_in", "_off")
    )


def sample_negatives(
    df: DataFrame,
    k: int = 4,
    key_col: str = "vec_id",
    salt: str = "neg",
) -> DataFrame:
    """``k`` deterministic pseudo-random negative keys per anchor — the
    contrastive-training sampling step (in-batch negatives' offline twin).

    Negative ``i`` for an anchor is the row at dense index
    ``floor(hash_uniform(anchor|i) * N)`` in ``key_col`` order; accidental
    self-matches are filtered (an anchor then yields ``k-1`` rows for that
    rank — deterministic, and any engine with md5 reproduces the exact
    draw). Returns ``(anchor, neg_rank, negative)``; callers join payloads.

    Scale shape: the dense index comes from the two-pass distributed
    prefix sum (``_global_cumsum`` — no single-partition window, nothing
    through the driver); candidates are a map-side sequence+explode; the
    only shuffles are the index build and the equi-join on ``_idx``.
    ``N = df.count()`` is one cheap scalar job, as in the IVF centroid
    collect.
    """
    n = df.count()
    keys = df.select(key_col)
    local, _, join_back = _global_cumsum(keys, [key_col], F.lit(1))
    idx = join_back(local).select(
        F.col(key_col).alias("_neg_key"),
        (F.col("_off") + F.col("_cum_in") - 1).cast("long").alias("_idx"),
    )
    cand = keys.select(
        F.col(key_col).alias("anchor"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_rank"),
    )
    u = hash_uniform(
        F.concat_ws(
            "|", F.col("anchor").cast("string"), F.col("neg_rank").cast("string")
        ),
        salt,
    )
    cand = cand.withColumn("_idx", F.floor(u * F.lit(float(n))).cast("long"))
    return (
        cand.join(idx, "_idx")
        .filter(F.col("_neg_key") != F.col("anchor"))
        .select(
            "anchor",
            F.col("neg_rank").cast("long").alias("neg_rank"),
            F.col("_neg_key").alias("negative"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by the deterministic
    md5-uniform order — the anti-spam "cap each domain/source" pass in
    corpus building. Which rows survive is a pure function of
    (group, key, salt): rerun-stable, engine-reproducible, no ``rand()``.

    Scale shape: one window per group ordered by the hash (ties broken by
    key) — partitioned by the group column, never global; skewed giant
    groups are exactly the rows being discarded, and AQE skew handling
    covers the shuffle.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_uniform(F.col(key_col).cast("string"), salt).asc(),
        F.col(key_col).asc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def budget_mixture_sample(
    df: DataFrame,
    budget: float,
    group_col: str = "source",
    size_col: str = "n_chars",
    key_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Downsample each group to an equal share of a global size budget —
    the training-mix construction step ("give every source budget/G
    tokens"). A group's keep rate is ``min(1, (budget/G) / group_total)``
    where G is the number of groups; rows keep deterministically when
    ``hash_uniform(key) < rate``. Oversubscribed groups thin toward their
    share, undersubscribed groups pass through whole.

    Every quantity is an exact aggregate (integer sums / counts), so both
    engines derive bit-identical rates and the kept SET reproduces exactly
    — no expected-value fuzz. Scale shape: one combiner aggregation for
    totals, one row broadcast for the group count, and a broadcast join of
    per-group rates back onto the scan; the corpus never shuffles.
    """
    totals = df.groupBy(group_col).agg(F.sum(size_col).alias("_tot"))
    ngroups = totals.agg(F.count(F.lit(1)).alias("_g"))
    rates = totals.crossJoin(F.broadcast(ngroups)).select(
        group_col,
        F.least(
            F.lit(1.0), (F.lit(float(budget)) / F.col("_g")) / F.col("_tot")
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_uniform(F.col(key_col).cast("string"), salt) < F.col("_rate"))
        .drop("_rate")
    )


def temperature_mixture_sample(
    df: DataFrame,
    budget: float,
    alpha: float = 0.3,
    group_col: str = "source",
    size_col: str = "n_chars",
    key_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-smoothed mixture sampling — the multilingual-corpus
    rebalancing recipe (mT5/XLM-R style): group shares follow
    ``p_i ∝ size_i**alpha`` instead of raw size, so ``alpha < 1`` lifts
    small groups toward uniform while big groups shrink (alpha=1 is
    proportional passthrough, alpha=0 is budget_mixture_sample's equal
    split). Each group keeps rows at ``min(1, p_i * budget / size_i)``
    via the deterministic ``hash_uniform`` draw.

    Rates are ROUNDED to 9 decimals before the comparison: ``pow`` may
    differ by an ulp across engines, and the round collapses that below
    the draw's 2^-32 granularity so both engines keep the identical set.
    Scale shape: identical to budget_mixture_sample — one combiner
    aggregation, tiny broadcast of per-group rates, the corpus never
    shuffles.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    totals = df.groupBy(group_col).agg(F.sum(size_col).alias("_tot"))
    denom = totals.agg(
        F.sum(F.pow(F.col("_tot").cast("double"), F.lit(float(alpha)))).alias(
            "_z"
        )
    )
    rates = totals.crossJoin(F.broadcast(denom)).select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                (
                    F.pow(F.col("_tot").cast("double"), F.lit(float(alpha)))
                    / F.col("_z")
                )
                * F.lit(float(budget))
                / F.col("_tot"),
            ),
            9,
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_uniform(F.col(key_col).cast("string"), salt) < F.col("_rate"))
        .drop("_rate")
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsk",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each row draws ``u = hash_uniform(key)`` and scores ``u^(1/w)``; the
    top-``k`` scores are a weighted sample without replacement — higher
    weight, stochastically higher score. Deterministic in (key, salt), so
    reruns and independent engines select the identical set.

    Scores round to 9 decimals before ranking (key-asc ties) so a libm
    ``pow`` ulp cannot flip the selection boundary cross-engine. Scale
    shape: score is a scan expression; top-k is TakeOrderedAndProject —
    only k rows per partition reach the driver stage, no global sort.
    """
    u = hash_uniform(F.col(key_col).cast("string"), salt)
    score = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    return (
        df.withColumn("_es_score", score)
        .orderBy(F.desc("_es_score"), F.col(key_col).asc())
        .limit(k)
        .drop("_es_score")
    )


def train_val_test_split(
    df: DataFrame,
    fractions: tuple[float, float] = (0.8, 0.1),
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's md5-uniform
    draw lands it in train (< f_train), val (< f_train + f_val), or test
    — a pure function of (key, salt), so the split survives reruns,
    repartitioning, and engine changes (the leakage-safety property that
    rand()-based splits lack: a regenerated corpus keeps every doc on its
    original side). Adds a ``split`` column; no shuffle.
    """
    f_train, f_val = fractions
    u = hash_uniform(F.col(key_col).cast("string"), salt)
    return df.withColumn(
        "split",
        F.when(u < f_train, "train")
        .when(u < f_train + f_val, "val")
        .otherwise("test"),
    )

"""Data-sized partitioning for the iterative graph kernels.

Every Pregel-style kernel here rescans its cached edge relation once per
superstep, so the edge DataFrame's partition count is a per-superstep task
-launch multiplier. The session default (~cores) is right for big graphs
and pure waste for small ones: a 90-edge graph over 32 partitions pays 32
task launches per superstep for microseconds of work each (measured ~1.2 s
of a 3.4 s nation-graph BFS). One partition per ~500k edges (~20 MB)
keeps genuinely large graphs saturating the cluster while a toy graph
collapses to one task.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGES_PER_PARTITION = 500_000


def edge_partition_count(df: DataFrame, n_edges: int) -> int:
    """Partitions for an ``n_edges``-row edge relation: ceil(n/500k),
    clamped to [1, cluster default parallelism]."""
    default_par = df.sparkSession.sparkContext.defaultParallelism
    return max(
        1,
        min(default_par, (n_edges + EDGES_PER_PARTITION - 1) // EDGES_PER_PARTITION),
    )


@contextmanager
def superstep_confs(spark: SparkSession, n_parts: int):
    """Pin AQE off + ``shuffle.partitions = n_parts`` for an iterative kernel.

    AQE materializes every query stage as its own job, so a k-superstep
    Pregel loop pays ~4k job launches of fixed scheduler overhead (measured:
    49 jobs for a 12-superstep BFS on the nation graph; per-superstep
    overhead is the dominant wall-time term once frontiers shrink). The
    kernels already size their partitioning to the edge relation
    (``edge_partition_count``), so AQE's runtime re-plan buys nothing here:
    with it off and shuffle partitions pre-pinned to the cached edge
    relation's count, each superstep collapses to ONE job whose shuffles
    align with the edge partitioning (no extra Exchange on the join side).

    Round 14 additionally prefers SHUFFLED-HASH joins for the kernel's
    span (``spark.sql.join.preferSortMergeJoin=false``, guide §3.1): the
    per-superstep relax join streams the frontier against the cached edge
    relation, and sort-merge paid two sorts per superstep for a join
    whose build side (one edge partition) is bounded by
    ``EDGES_PER_PARTITION`` (~20 MB) BY CONSTRUCTION — the planner only
    picks SHJ where its size conditions hold, so states with unknown
    (huge) stats keep sort-merge. Measured 2.29 s -> 1.28 s on the
    nation-graph BFS (4 supersteps); results are join-strategy-invariant
    (set semantics; group aggregates).

    Session confs are process-global: the guard assumes the kernel runs
    queries sequentially from the driver (true for every caller here) and
    restores every conf on exit, so surrounding relational queries keep
    AQE and sort-merge preference.
    """
    conf = spark.conf
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    old_sp = conf.get("spark.sql.shuffle.partitions")
    old_smj = conf.get("spark.sql.join.preferSortMergeJoin")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", str(n_parts))
    conf.set("spark.sql.join.preferSortMergeJoin", "false")
    try:
        yield
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.shuffle.partitions", old_sp)
        conf.set("spark.sql.join.preferSortMergeJoin", old_smj)


def spatial_node_parts(vertices: DataFrame, cells: int = 16) -> DataFrame:
    """(node, part) mapping for the SSSP partition-local relaxation mode:
    a ``cells x cells`` lat/lon grid over the projected vertices.

    Rationale (round 14, SCALE.md density axis): the time-expanded day
    graph's depth wall is headway-bounce chains, which are SAME-STOP
    (the WALK_TO distance-0 self loop lets an arrival chain through
    alternating lines' next departures without moving) — so any
    partitioner that keeps a stop's stoptimes together collapses them;
    a spatial grid additionally keeps walk-neighbor stops together, so
    only genuine travel crosses parts. Part count is bounded (<=
    cells^2), cells are data-bounded (min/max over the cached vertex
    relation — one tiny agg), and the mapping is a pure column
    expression: at 100 TB this is a map-side derivation, no shuffle.

    Zero-extent axes (single stop / degenerate fixtures) collapse to
    cell 0 on that axis.
    """
    b = vertices.agg(
        F.min("lat").alias("lat0"),
        F.max("lat").alias("lat1"),
        F.min("lon").alias("lon0"),
        F.max("lon").alias("lon1"),
    ).first()
    dlat = (b["lat1"] - b["lat0"]) or 1.0
    dlon = (b["lon1"] - b["lon0"]) or 1.0

    def cell(col, lo, span):
        return F.least(
            F.lit(cells - 1),
            F.floor((F.col(col) - F.lit(lo)) / F.lit(span) * cells),
        )

    return vertices.select(
        F.col("id").alias("node"),
        (
            cell("lat", b["lat0"], dlat) * cells + cell("lon", b["lon0"], dlon)
        ).cast("int").alias("part"),
    )


def pin_if_uncached(df):
    """Persist ``df`` for the span of a dispatch-count + tier run — but
    ONLY if the caller hasn't persisted it already.

    Returns ``(df, release)`` where ``release()`` undoes exactly what
    this call did. The already-cached check matters as much as the
    persist: unconditionally unpersisting in the kernel would EVICT a
    cache the caller still needs (the 9-OD routing harness shares one
    persisted day-graph across nine kernel runs — evicting it after the
    first forced eight full re-projections, a 3x bench regression before
    this guard existed).
    """
    from pyspark import StorageLevel

    if df.storageLevel != StorageLevel.NONE:
        return df, (lambda: None)
    out = df.persist()
    return out, (lambda: out.unpersist())

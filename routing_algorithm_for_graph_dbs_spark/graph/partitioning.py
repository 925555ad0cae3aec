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

from pyspark.sql import DataFrame

EDGES_PER_PARTITION = 500_000


def edge_partition_count(df: DataFrame, n_edges: int) -> int:
    """Partitions for an ``n_edges``-row edge relation: ceil(n/500k),
    clamped to [1, cluster default parallelism]."""
    default_par = df.sparkSession.sparkContext.defaultParallelism
    return max(
        1,
        min(default_par, (n_edges + EDGES_PER_PARTITION - 1) // EDGES_PER_PARTITION),
    )

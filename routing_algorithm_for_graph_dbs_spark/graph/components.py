"""Connected components via alternating star contraction (O(log n) rounds).

Parity target: the reference's variable-length reachability guard
``OPTIONAL MATCH (start)-[:A|B|C*]->(end) WHERE end IS NOT NULL``
(reference ``prova.py:211-212``, SURVEY.md G5): two nodes are mutually
reachable over the (symmetrized) footway edge set iff they share a
component.

The iterative tier is the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
each round rewrites the edge set so every node hangs closer to its
component minimum; the fixed point is a forest of stars centered at the
minima. Convergence is O(log n) ROUNDS regardless of graph diameter —
the property that matters at 100 TB, where a web-crawl-shaped graph with
million-hop chains would cost a min-label-propagation loop (the previous
implementation here) one superstep per hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    edge_partition_count,
    pin_if_uncached,
    superstep_confs,
)


# edge relations at or below this fit comfortably on the driver (~40 MB of
# pairs); union-find there beats distributed rounds. The iterative tier
# takes over beyond it — same two-tier pattern as sssp().
LOCAL_EDGE_LIMIT = 5_000_000

# rounds taken by the most recent iterative-tier run; read by the scale
# tests to assert O(log n) convergence (a 100k-node chain must finish in
# ~log2(n) rounds, not ~n supersteps).
LAST_ITERATIVE_ROUNDS = 0


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 100,
    strategy: str = "auto",
) -> DataFrame:
    """Return (node, component) where component = the minimum node id in the
    node's WEAKLY-connected component.

    ``edges``: (src, dst); always symmetrized internally — min-label
    propagation along one direction only would compute min-ancestor labels,
    which are neither weak nor strong components. (Strongly-connected
    components need a different algorithm entirely; the engine's parity
    target — the reference's reachability guard over symmetrized footways —
    is the weak form.)

    Two tiers (``strategy``: auto | local | iterative): a near-dup pair
    graph or a city footway graph is a few thousand to a few million edges
    — collected once and solved with union-find on the driver in one job.
    ``auto`` picks by edge count; the iterative star-contraction tier
    serves graphs beyond driver memory in O(log n) rounds independent of
    diameter. Cross-tier equality is pytest-asserted, including on a
    long-chain graph whose diameter vastly exceeds the round count.
    """
    global LAST_ITERATIVE_ROUNDS
    release = lambda: None
    try:
        if strategy == "auto":
            # the dispatch count and the chosen tier's first materialization
            # would otherwise EACH execute the caller's upstream pipeline —
            # for dd_canonical that is the whole minhash->LSH->verify chain,
            # roughly doubling its cost. Pin across both; release in finally.
            edges, release = pin_if_uncached(edges)
            n_in = edges.count()
            strategy = "local" if n_in <= LOCAL_EDGE_LIMIT else "iterative"
        if strategy == "local":
            return _local_components(edges, vertices)
        return _star_contraction_components(edges, vertices, max_iterations)
    finally:
        release()


def _star_contraction_components(
    edges: DataFrame, vertices: DataFrame | None, max_iterations: int
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.).

    Each round is two edge-set rewrites, each one groupBy + one join on
    the node key (map-side combinable min-aggregations, equi-joins — no
    all-pairs anywhere):

    - large-star: every node u links each STRICTLY-LARGER neighbor to the
      minimum of its closed neighborhood, halving the depth of tall
      attachment chains;
    - small-star: every node links itself and its smaller neighbors to
      that minimum, flattening local stars.

    The fixed point is a set of (child, component-min) star edges; it is
    detected by an edge-multiset checksum (count + sum of xxhash64) going
    stable — one cheap aggregate per round that doubles as the action
    materializing the round's lazy checkpoint.
    """
    global LAST_ITERATIVE_ROUNDS
    spark = edges.sparkSession
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    n_edges = e.count()
    n_parts = edge_partition_count(edges, 2 * n_edges)

    # vertex set = edge endpoints UNION the caller's vertices (isolated
    # nodes become their own components). Built from the UNFILTERED input —
    # a node appearing only in a self-loop must still get a label — and
    # endpoints are always included: treating a partial ``vertices`` as the
    # complete set would silently drop labels for unlisted endpoints.
    verts = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if vertices is not None:
        verts = verts.unionByName(
            vertices.select(F.col(vertices.columns[0]).alias("node"))
        ).distinct()
    verts = verts.localCheckpoint(eager=True)

    def large_star(b: DataFrame) -> DataFrame:
        sym = b.unionByName(b.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("mv", "u").alias("m"))
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(b: DataFrame) -> DataFrame:
        oriented = b.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        # group key is the LARGER endpoint, so every neighbor (and hence
        # the min) is strictly smaller than u — m = min of closed nbhd.
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        relink = (
            oriented.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_link = mins.select("u", F.col("m").alias("v"))
        return (
            relink.unionByName(self_link)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    b = e.localCheckpoint(eager=True)
    prev_chk = None
    rounds = 0
    with superstep_confs(spark, n_parts):
        for _ in range(max_iterations):
            nxt = small_star(large_star(b)).localCheckpoint(eager=False)
            # lazy checkpoint + checksum aggregate = one job: the agg's full
            # scan materializes the checkpoint as a side effect, and the
            # (count, xor-of-hashes) pair is the convergence signal — the
            # star fixed point reproduces its own (distinct) edge set
            # exactly. bit_xor, not sum: ANSI mode makes a 64-bit hash sum
            # overflow, while xor is closed and order-independent.
            chk = tuple(
                nxt.agg(
                    F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
                ).first()
            )
            rounds += 1
            b = nxt
            if chk == prev_chk:
                break
            prev_chk = chk
    LAST_ITERATIVE_ROUNDS = rounds

    # at the fixed point b is (child -> component-min); the min-agg is a
    # no-op safety net, and roots/isolated vertices label themselves.
    parents = b.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("parent"))
    return verts.join(parents, "node", "left").select(
        "node", F.coalesce("parent", "node").alias("component")
    )


def _local_components(edges: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """Driver-side union-find (path compression + union by min label).

    One collect of the 2-column edge list, one parallelize back out —
    the same tiny-side pattern as IVF centroid collection. Labels are the
    component minimum, matching the iterative tier exactly.
    """
    spark = edges.sparkSession
    node_type = edges.schema["src"].dataType
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while x != root:  # path compression
            nxt = parent[x]
            parent[x] = root
            x = nxt
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

    nodes = set()
    for r in edges.select("src", "dst").collect():
        a, b = r["src"], r["dst"]
        nodes.add(a)
        nodes.add(b)
        union(a, b)
    if vertices is not None:
        for r in vertices.select(
            F.col(vertices.columns[0]).alias("node")
        ).distinct().collect():
            nodes.add(r["node"])

    rows = [(n, find(n)) for n in sorted(nodes)]
    # JVM LocalRelation where the node type allows it (round 14): the
    # label table is joined back against the caller's relation, and a
    # Python-RDD-backed result paid a ~0.3 s Python-worker task per
    # materialization (functions/localrel.py); exotic node types fall
    # back inside local_rows_df itself
    from routing_algorithm_for_graph_dbs_spark.functions.localrel import (
        local_rows_df,
    )

    nt = node_type.simpleString()
    return local_rows_df(spark, rows, f"node {nt}, component {nt}")

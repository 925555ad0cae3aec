"""Strongly connected components over a DIRECTED edge relation.

Beyond-reference graph surface: the reference's reachability guard
(``prova.py:211-212``, SURVEY.md G5) only needs WEAK components over
symmetrized footways (``graph/components.py``); a corpus-lineage or
citation graph needs the strong form — u and v share a component iff
each reaches the other along edge direction.

Two tiers, same dispatch pattern as :func:`graph.components
.connected_components`:

- **local** (≤ ``LOCAL_EDGE_LIMIT`` edges): one collect of the 2-column
  edge list, iterative Tarjan on the driver (explicit stack — no
  recursion-depth ceiling), one parallelize back out. A 5M-edge relation
  is ~40 MB of pairs; a single O(V+E) pass beats any superstep scheme.

- **iterative**: the forward-backward *coloring* algorithm (Orzan; the
  standard Pregel formulation, cf. Spark GraphX's
  ``StronglyConnectedComponents``). Each peel round

  1. propagates minimum labels FORWARD to fixpoint — ``color(v)`` = the
     smallest vertex id that reaches v within the remaining subgraph;
  2. runs one backward reachability pass from each color root (the
     vertex ``v == color(v)``) restricted to edges whose endpoints share
     the color. Every vertex reached is in the root's SCC (a path
     v -> ... -> root inside color c stays inside color c: any
     intermediate w is reached by c through v, so ``color(w) <= c``, and
     w reaches the root c, so a smaller label reaching w would also
     reach c — contradicting ``color(c) = c``);
  3. emits those SCCs and peels them off; remaining vertices recolor in
     the next round (their old colors may have routed through removed
     vertices).

  Every superstep is ONE job (lazy localCheckpoint + count, AQE off,
  shuffle partitions pinned to the edge relation's partitioning — see
  ``graph/partitioning.py``). Peel rounds are bounded by the longest
  chain of SCCs in the condensation DAG; real link/citation graphs peel
  in a handful of rounds because the giant SCC and all sources fall out
  in round one.

Component label = the minimum vertex id in the SCC (matching the weak
tier's convention), so both tiers agree bit-for-bit and the DuckDB
oracle (mutual-reachability closure) can hash-check the result.

Why the weak tier's large-star/small-star contraction is NOT mirrored
here: star contraction rewrites an UNDIRECTED edge set around local
minima, which preserves connectivity but destroys direction — the
contracted graph answers "connected", not "mutually reachable". The
O(diameter) term in FW-BW lives inside the forward min-label fixpoint
(step 1), and the directed analogue of round-halving (path doubling /
transitive-closure squaring, cf. Fischer-Uhlig) squares the edge set —
O(n²) intermediate edges, a non-starter at 100 TB. Long directed
diameters inside one color are therefore this tier's documented cost
profile; in exchange, peel parallelism keeps the ROUND count at the
condensation-chain length (500k SCCs peel in 3 phases — tools/
scale_scc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    pin_if_uncached,
    edge_partition_count,
    superstep_confs,
)

LOCAL_EDGE_LIMIT = 5_000_000


def strongly_connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 100,
    strategy: str = "auto",
) -> DataFrame:
    """Return (node, scc) where scc = the minimum node id in the node's
    strongly-connected component of the directed graph ``edges`` (src, dst).

    ``vertices`` (optional, first column used) adds isolated nodes — each
    its own singleton SCC. ``strategy``: auto | local | iterative.
    """
    n_in = None
    release = lambda: None
    if strategy == "auto":
        # pin across the dispatch count + the tier's first materialization
        # — an unpersisted upstream pipeline must not execute twice, and a
        # caller-persisted input must NOT be evicted (graph/partitioning.py
        # pin_if_uncached documents both failure modes)
        edges, release = pin_if_uncached(edges)
        n_in = edges.count()
        strategy = "local" if n_in <= LOCAL_EDGE_LIMIT else "iterative"
    try:
        if strategy == "local":
            return _local_scc(edges, vertices)
        return _iterative_scc(edges, vertices, max_iterations, n_in)
    finally:
        release()


# ---------------------------------------------------------------------
# local tier: iterative Tarjan
# ---------------------------------------------------------------------


def _local_scc(edges: DataFrame, vertices: DataFrame | None) -> DataFrame:
    spark = edges.sparkSession
    node_type = edges.schema["src"].dataType

    adj: dict = {}
    nodes: set = set()
    for r in edges.select("src", "dst").collect():
        a, b = r["src"], r["dst"]
        nodes.add(a)
        nodes.add(b)
        adj.setdefault(a, []).append(b)
    if vertices is not None:
        for r in (
            vertices.select(F.col(vertices.columns[0]).alias("node"))
            .distinct()
            .collect()
        ):
            nodes.add(r["node"])

    index_of: dict = {}
    low: dict = {}
    on_stack: set = set()
    tarjan_stack: list = []
    comp: dict = {}
    counter = 0

    for root in sorted(nodes):
        if root in index_of:
            continue
        index_of[root] = low[root] = counter
        counter += 1
        tarjan_stack.append(root)
        on_stack.add(root)
        # explicit DFS stack of (vertex, child-iterator); the iterator
        # object inside the tuple keeps its position across re-visits
        dfs = [(root, iter(adj.get(root, ())))]
        while dfs:
            node, children = dfs[-1]
            pushed = False
            for w in children:
                if w not in index_of:
                    index_of[w] = low[w] = counter
                    counter += 1
                    tarjan_stack.append(w)
                    on_stack.add(w)
                    dfs.append((w, iter(adj.get(w, ()))))
                    pushed = True
                    break
                if w in on_stack and index_of[w] < low[node]:
                    low[node] = index_of[w]
            if pushed:
                continue
            dfs.pop()
            if dfs:
                parent = dfs[-1][0]
                if low[node] < low[parent]:
                    low[parent] = low[node]
            if low[node] == index_of[node]:
                members = []
                while True:
                    w = tarjan_stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == node:
                        break
                label = min(members)
                for w in members:
                    comp[w] = label

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("scc", node_type, False),
        ]
    )
    rows = [(n, comp[n]) for n in sorted(nodes)]
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------
# iterative tier: forward-backward coloring
# ---------------------------------------------------------------------


def _propagate_min_forward(verts, e, max_iterations):
    """color(v) = min vertex id reaching v along edge direction, to
    fixpoint. One job per superstep (lazy checkpoint + changed-count)."""
    labels = verts.select("node", F.col("node").alias("color")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iterations):
        nbr = (
            labels.join(e, labels["node"] == e["src"])
            .select(e["dst"].alias("node"), "color")
            .groupBy("node")
            .agg(F.min("color").alias("nbr_color"))
        )
        updated = (
            labels.alias("l")
            .join(nbr.alias("n"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("l.color"),
                    F.coalesce(F.col("n.nbr_color"), F.col("l.color")),
                ).alias("color"),
                (F.col("n.nbr_color") < F.col("l.color")).alias("_changed"),
            )
        ).localCheckpoint(eager=False)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels


def _backward_reach_within_color(colors, e, max_iterations):
    """Vertices that reach their color's root through same-color edges
    (multi-source backward BFS, all colors at once)."""
    # same-color edge list, reversed: walk dst -> src
    ec = (
        e.join(colors.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("color", "src_color")
        .join(colors.withColumnRenamed("node", "dst"), "dst")
        .filter(F.col("src_color") == F.col("color"))
        .select(F.col("dst").alias("from_"), F.col("src").alias("to_"))
    )
    reached = colors.filter(F.col("node") == F.col("color")).select(
        "node"
    ).localCheckpoint(eager=True)
    frontier = reached
    for _ in range(max_iterations):
        step = (
            frontier.join(ec, frontier["node"] == ec["from_"])
            .select(F.col("to_").alias("node"))
            .distinct()
            .join(reached, "node", "left_anti")
        ).localCheckpoint(eager=False)
        n_new = step.count()
        if n_new == 0:
            break
        reached = reached.unionByName(step).localCheckpoint(eager=True)
        frontier = step
    return reached


def _iterative_scc(
    edges: DataFrame,
    vertices: DataFrame | None,
    max_iterations: int,
    n_in: int | None,
) -> DataFrame:
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    if n_in is None:
        n_in = edges.count()
    n_parts = edge_partition_count(edges, n_in)
    e = e.repartition(n_parts, "src").persist()

    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if vertices is not None:
        verts = verts.unionByName(
            vertices.select(F.col(vertices.columns[0]).alias("node"))
        ).distinct()
    remaining = verts.localCheckpoint(eager=True)

    result = None
    with superstep_confs(spark, n_parts):
        for _ in range(max_iterations):
            if remaining.count() == 0:
                break
            # live edges: both endpoints still unassigned
            live = (
                e.join(remaining.withColumnRenamed("node", "src"), "src", "left_semi")
                .join(remaining.withColumnRenamed("node", "dst"), "dst", "left_semi")
                .select("src", "dst")
            ).localCheckpoint(eager=True)
            colors = _propagate_min_forward(remaining, live, max_iterations)
            done = _backward_reach_within_color(colors, live, max_iterations)
            assigned = colors.join(done, "node", "left_semi").select(
                "node", F.col("color").alias("scc")
            )
            result = (
                assigned
                if result is None
                else result.unionByName(assigned)
            ).localCheckpoint(eager=True)
            remaining = remaining.join(done, "node", "left_anti").localCheckpoint(
                eager=True
            )

    e.unpersist()
    return result if result is not None else verts.select(
        "node", F.col("node").alias("scc")
    )

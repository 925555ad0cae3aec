"""Multi-source single-source-shortest-path as an iterative DataFrame program.

Parity target: ``gds.shortestPath.dijkstra.stream(graph, {sourceNode,
targetNode, relationshipWeightProperty})`` (reference ``main.py:95-101``,
``main.py:143-148``) and ``apoc.algo.dijkstra`` over the footway graph
(reference ``prova.py:209-220``).

The reference calls Dijkstra once per candidate (source, target) pair — a
driver-side loop. Here ALL sources run in one program: the state carries a
``lane`` column (one lane per source), so k sources cost one traversal of
the edge relation per superstep instead of k traversals. Semantics per lane
are identical to per-pair Dijkstra (non-negative weights; Bellman-Ford-style
relaxation converges to the same fixpoint, and ties resolve to the same
cost — path choice among equal-cost ties is nondeterministic in GDS too).

Scale notes (100 TB design):
- the edge DataFrame is hash-partitioned on ``src`` once and cached; every
  superstep's join then reuses that partitioning (no re-shuffle of edges).
- the frontier shrinks to only *improved* nodes each superstep (delta
  relaxation), so supersteps touch a fraction of the graph.
- ``localCheckpoint`` every superstep cuts the lineage chain that would
  otherwise grow linearly with iterations and blow up the planner.
- paths accumulate as ``array<string>`` node ids; for huge graphs callers
  can disable path tracking (``track_paths=False``) and keep only costs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-superstep checkpoint storage: SERIALIZED memory+disk. The default
# deserialized level holds the whole settled state as Java objects —
# several times the Tungsten size — so at 100x-scale states (tens of
# millions of (lane, node) rows) two live checkpoints alone filled the
# heap and GC churn grew the superstep wall time (round 14; see also
# _release_local_checkpoint). Serialized blocks cost one extra
# deserialization per superstep read — noise next to the relax join.
_CKPT_LEVEL = StorageLevel.MEMORY_AND_DISK

from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
    pin_if_uncached,
    edge_partition_count,
    superstep_confs,
)

# supersteps used / convergence of the most recent multi_source_dijkstra
# run — read by the scale tools to report the batch-regime cost honestly
LAST_ITERATIVE_SUPERSTEPS = 0

# opt-in per-superstep progress line on stderr (scale-run forensics:
# the r13 25x probe needed to distinguish "superstep count exploded"
# from "per-superstep wall exploded" without waiting for the final
# JSON) — zero cost unless SPARK_GRAFT_SSSP_LOG=1
import os as _os  # noqa: E402

_SSSP_LOG = _os.environ.get("SPARK_GRAFT_SSSP_LOG", "") == "1"
# opt-in per-superstep physical-plan dump (round 15): the superstep plans
# are runtime-internal (never surfaced by PLANS.md's declared-query sweep),
# so the join-strategy claims (§3.1 SHJ relax/merge joins) need a hook to
# produce committable evidence. Writes one file per superstep into the
# given directory; zero cost unless SPARK_GRAFT_SSSP_EXPLAIN_DIR is set.
_SSSP_EXPLAIN_DIR = _os.environ.get("SPARK_GRAFT_SSSP_EXPLAIN_DIR", "")


def _dump_superstep_plan(df, it: int) -> None:
    if not _SSSP_EXPLAIN_DIR:
        return
    try:
        qe = df._jdf.queryExecution()
        mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        text = qe.explainString(mode.fromString("formatted"))
        path = _os.path.join(_SSSP_EXPLAIN_DIR, f"superstep_{it:03d}.txt")
        with open(path, "w") as f:
            f.write(text)
    except Exception:  # noqa: BLE001 — forensics hook, never fatal
        pass
LAST_ITERATIVE_CONVERGED = True
# lanes retired before global convergence (targets settled early) — the
# per-lane retirement optimization's observable effect
LAST_ITERATIVE_RETIRED = 0


def _release_local_checkpoint(df) -> None:
    """Unpersist a ``localCheckpoint``'ed DataFrame's storage blocks.

    ``Dataset.unpersist`` only serves ``cache()``-managed plans; a local
    checkpoint's blocks belong to the internal RDD inside its LogicalRDD
    node, reachable only through the JVM plan (round 14 — superseded
    superstep states otherwise accumulate for the whole run, because
    checkpoint blocks are non-recomputable and the block store never
    evicts them). Best-effort by design: any py4j or plan-shape surprise
    leaves the blocks to end-of-application cleanup, which is exactly
    the pre-round-14 behavior."""
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getSimpleName() == "LogicalRDD":
            node.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — release is advisory, never fatal
        pass


def _make_local_relax(out_cols, node_mode, lane_ub, max_cost):
    """Build the per-superstep cogrouped partition-local relaxation kernel
    (round 14 — the density-axis depth-wall fix, SCALE.md round-13).

    Each invocation receives ONE graph partition's frontier rows and its
    out-edge set (edges grouped by the part of ``src``) and runs a local
    Dijkstra per lane over the intra-partition subgraph, emitting the full
    improved closure in ONE superstep instead of one hop per superstep.
    On a time-expanded transit graph partitioned by spatial cell, the
    headway-bounce chains that made superstep depth track trip density
    (r13: 25x density = 167+ supersteps, non-converged) are same-stop —
    hence same-cell — so they collapse into a single superstep; global
    supersteps shrink to ~the winner path's cell-boundary crossings.

    ``node_mode``: "full" (accumulate path arrays), "pred" (immediate
    predecessor pointer) or "cost" (costs only). ``lane_ub`` / ``max_cost``
    are captured per-superstep: the in-kernel expansion prune mirrors the
    frontier-level prune exactly (strict `<` for the lane upper bound,
    inclusive `<=` for the horizon), so it is sound for the same reason.
    """
    inf = float("inf")

    def relax(key, fr, ed):
        import heapq

        import pandas as pd

        part = int(key[0])
        if fr.empty or ed.empty:
            # empty columns need explicit dtypes: a default float64 empty
            # column cannot Arrow-cast to a list/string schema slot
            dtypes = ["object", "object", "float64", "int32", "bool"] + (
                ["object"] * (len(out_cols) - 5)
            )
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype=t)
                    for c, t in zip(out_cols, dtypes)
                }
            )
        adj_idx = ed.groupby("src", sort=False).indices
        dsts = ed["dst"].to_numpy()
        ws = ed["w"].to_numpy()
        dps = ed["dp"].to_numpy()
        o_lane: list = []
        o_node: list = []
        o_cost: list = []
        o_part: list = []
        o_intra: list = []
        o_extra: list = []
        seed_cols = ["node", "cost"] + (["path"] if node_mode == "full" else [])
        for lane, g in fr.groupby("lane", sort=False):
            ub = lane_ub.get(lane, inf)
            seeds: dict = {}
            spath: dict = {}
            for row in g[seed_cols].itertuples(index=False, name=None):
                node, cost = row[0], row[1]
                if cost < seeds.get(node, inf):
                    seeds[node] = cost
                    if node_mode == "full":
                        spath[node] = row[2]
            dist = dict(seeds)
            pred: dict = {}
            partof: dict = {}
            heap = [(c, n) for n, c in seeds.items()]
            heapq.heapify(heap)
            while heap:
                d, n = heapq.heappop(heap)
                if d >= ub:
                    break  # heap pops nondecreasing: nothing below ub left
                if d != dist.get(n, inf):
                    continue  # stale entry
                if partof.get(n, part) != part:
                    continue  # export sink: its out-edges live in its own part
                idx = adj_idx.get(n)
                if idx is None:
                    continue
                for i in idx:
                    m = dsts[i]
                    nd = d + ws[i]
                    if (
                        nd < dist.get(m, inf)
                        and nd < ub
                        and (max_cost is None or nd <= max_cost)
                    ):
                        dist[m] = nd
                        pred[m] = n
                        partof[m] = dps[i]
                        heapq.heappush(heap, (nd, m))
            for n, d in dist.items():
                if d >= seeds.get(n, inf):
                    continue  # the seed itself (or an unimproved seed)
                p = int(partof.get(n, part))
                o_lane.append(lane)
                o_node.append(n)
                o_cost.append(float(d))
                o_part.append(p)
                o_intra.append(p == part)
                if node_mode == "full":
                    chain = []
                    cur = n
                    while cur in pred:
                        chain.append(cur)
                        cur = pred[cur]
                    o_extra.append(list(spath[cur]) + chain[::-1])
                elif node_mode == "pred":
                    o_extra.append(pred[n])
        data = {
            out_cols[0]: o_lane,
            out_cols[1]: o_node,
            out_cols[2]: o_cost,
            out_cols[3]: pd.Series(o_part, dtype="int32"),
            out_cols[4]: pd.Series(o_intra, dtype="bool"),
        }
        if node_mode != "cost":
            data[out_cols[5]] = o_extra
        return pd.DataFrame(data)

    return relax


def multi_source_dijkstra(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "weight",
    max_iterations: int = 200,
    track_paths: bool = True,
    checkpoint_every: int = 1,
    n_edges: int | None = None,
    max_cost: float | None = None,
    shuffle_parts: int | None = None,
    targets: list | dict | None = None,
    target_ranks: dict | None = None,
    node_parts: DataFrame | None = None,
) -> DataFrame:
    """Shortest path costs (and paths) from every source to every reachable node.

    Parameters
    ----------
    edges : DataFrame with columns (src, dst, <weight_col>) — directed.
    sources : DataFrame with columns (lane, node). ``lane`` identifies the
        source run (the reference's per-(source,target) Dijkstra call index);
        one lane per source node, but several lanes may share a node.
    max_cost : optional cost horizon. Frontier rows beyond it are pruned
        each superstep and the result keeps only nodes with cost <=
        max_cost — EXACT within the horizon (weights are non-negative, so
        an over-horizon node can never improve an in-horizon one). NOTE:
        routing must NOT pass one — the reference caps only the target
        departure window, never path cost, and CHANGE weights exceed
        elapsed time by the walking component, so a cost cap can prune a
        reference-feasible winner. Target settlement (below) is what
        bounds routing supersteps instead.
    targets : optional node list — or dict of lane -> node list — enabling
        EXACT early termination: at each checkpoint, a target is settled
        once its state cost <= its lane's frontier minimum (non-negative
        weights: any later improvement would route through a frontier row
        of cost >= that minimum). When every requested target of every
        still-active lane is settled the loop stops. With an early stop,
        only TARGET rows are guaranteed final — callers that read other
        rows must not pass targets.
    target_ranks : mutually exclusive with ``targets``: dict of
        lane -> [(group, node, rank)] for RANK-PRUNED settlement. The
        consumer ranks each group by (rank, cost) ascending — routing's
        ORDER BY arrival, cost — so once a group member settles with rank
        r, members with rank > r can never win and stop blocking
        termination (they may hold non-final costs in the output; the
        consumer's rank discards them). Cuts the superstep count to the
        winner's cost radius instead of the farthest target's.
    node_parts : optional (node, part:int) DataFrame switching the kernel
        to PARTITION-LOCAL RELAXATION (round 14): edges are grouped by the
        part of ``src`` and each superstep runs a cogrouped local Dijkstra
        per part (one Arrow task per active part), emitting the whole
        improved intra-part closure plus one-hop exports — so superstep
        count tracks the shortest paths' PART-BOUNDARY CROSSINGS, not
        their hop count. This is the density depth-wall fix: on a
        time-expanded transit graph partitioned by spatial cell
        (:func:`routing_algorithm_for_graph_dbs_spark.graph.partitioning.spatial_node_parts`),
        same-stop headway-bounce chains are intra-cell and collapse into
        one superstep. EXACT for the same reason one-hop relaxation is:
        whenever a state cost improves, its full intra-part closure and
        export relaxations at that cost are applied the same superstep
        (local Dijkstra is transitive within the part), so only
        cross-part improvements need to re-seed — intra-improved rows
        are excluded from the next frontier and the fixpoint is
        unchanged. Nodes absent from the mapping fall back to a hash
        part; costs/winners are identical either way, only locality
        (superstep count) varies.
    checkpoint_every : supersteps per localCheckpoint. Between checkpoints
        each superstep's plan references the previous merged state twice
        (as ``best`` and via the frontier), so planning cost grows
        O(2^k) until the next checkpoint truncates it — capped at 8.
    Returns (lane, node, cost, path) — ``path`` is the array of node ids from
    the source to ``node`` inclusive. ``track_paths``: True = accumulate
    path arrays in-state; ``"pred"`` = carry only a predecessor pointer
    (narrow state — reconstruct with :func:`reconstruct_paths`); False =
    costs only.
    """
    if not 1 <= checkpoint_every <= 8:
        raise ValueError(
            f"checkpoint_every={checkpoint_every} outside [1, 8]: plan size "
            "doubles per un-checkpointed superstep (O(2^k) growth)"
        )
    e = edges.select(
        F.col("src"), F.col("dst"), F.col(weight_col).cast("double").alias("w")
    )
    release_sizing = lambda: None  # noqa: E731
    if n_edges is None:
        # the sizing count used to run the (uncached) edge pipeline once
        # and the repartition+persist below then recomputed it from
        # scratch — pin across both so direct callers pay ONE pass
        # (round 14; the dispatcher passes n_edges at scale, so the
        # transient second cache here only exists for small direct calls)
        e, release_sizing = pin_if_uncached(e)
        n_edges = e.count()
    # see graph/partitioning.py: edge partition count is a per-superstep
    # task-launch multiplier — size it to the graph, not the session default.
    # ``shuffle_parts`` overrides upward for STATE-heavy runs: batch routing
    # drags (lane x horizon-ball) rows with path arrays through every
    # superstep, so the state, not the edge relation, is the work to spread
    # (measured 3x on the 1x day graph: 4 edge-sized partitions left 28
    # cores idle per superstep).
    n_parts = edge_partition_count(e, n_edges)
    if shuffle_parts is not None:
        n_parts = max(n_parts, shuffle_parts)
    parts_mode = node_parts is not None
    if parts_mode:
        # hash fallback for unmapped nodes: any CONSISTENT node->part
        # function preserves exactness (see docstring); 1024 keeps the
        # fallback parts disjoint-ish from typical cell ids without a
        # second pass over the mapping
        def _part_of(col):
            return F.coalesce(
                F.col("_p"), F.pmod(F.xxhash64(col), F.lit(1024)).cast("int")
            )

        np_df = node_parts.select(
            F.col("node"), F.col("part").cast("int").alias("_p")
        )
        e = (
            e.join(
                np_df.select(F.col("node").alias("src"), F.col("_p")),
                "src",
                "left",
            )
            .select("src", "dst", "w", _part_of(F.col("src")).alias("part"))
            .join(
                np_df.select(F.col("node").alias("dst"), F.col("_p")),
                "dst",
                "left",
            )
            .select(
                "part", "src", "dst", "w", _part_of(F.col("dst")).alias("dp")
            )
        )
        e = e.repartition(n_parts, "part")
    else:
        e = e.repartition(n_parts, "src")
    e = e.persist()

    full_paths = track_paths is True
    pred_mode = track_paths == "pred"
    if full_paths:
        best = sources.select(
            "lane",
            F.col("node"),
            F.lit(0.0).alias("cost"),
            F.array(F.col("node")).alias("path"),
        )
    elif pred_mode:
        # predecessor pointers instead of accumulated path arrays: the
        # per-superstep state rewrite (union + groupBy + checkpoint) is
        # O(state WIDTH x rows), and a horizon-ball state dragging ~100-
        # element id arrays costs ~10x the narrow (lane, node, cost, pred)
        # row — reconstruct full paths afterward only for the few rows that
        # need them (graph.sssp.reconstruct_paths)
        best = sources.select(
            "lane",
            F.col("node"),
            F.lit(0.0).alias("cost"),
            F.lit(None).cast(sources.schema["node"].dataType).alias("pred"),
        )
    else:
        best = sources.select("lane", F.col("node"), F.lit(0.0).alias("cost"))
    if parts_mode:
        # state rows carry their node's part so the frontier can group
        # straight into the cogroup without a per-superstep mapping join
        best = (
            best.join(np_df, "node", "left")
            .withColumn("part", _part_of(F.col("node")))
            .drop("_p")
        )
    # generic callers may seed duplicate (lane, node) rows; the merge join
    # below relies on per-key uniqueness of the state (all dups carry the
    # identical cost-0 seed row, so dropping is exact)
    best = best.dropDuplicates(["lane", "node"]).localCheckpoint(
        eager=True, storageLevel=_CKPT_LEVEL
    )
    frontier = best
    prev_ck = best  # superseded-checkpoint handle (released per superstep)

    # settlement targets: normalized to explicit (lane, node) pairs. A
    # global list means every lane must settle every target; a dict gives
    # per-lane target sets (batch routing). The pair set stays driver-side
    # (|lanes| x |targets| — bounded, both are candidate lists the caller
    # already collected) and rides each checkpoint probe as one broadcast.
    tgt_df = None
    tgt_pairs: set = set()
    tgt_cost: dict = {}
    tgt_groups: dict | None = None  # (lane, group) -> {node: rank}
    if targets and target_ranks:
        raise ValueError("pass either targets or target_ranks, not both")
    if targets or target_ranks:
        src_pairs = [
            (r["lane"], r["node"])
            for r in sources.select("lane", "node").distinct().collect()
        ]
        if target_ranks:
            tgt_groups = {}
            for lane, triples in target_ranks.items():
                for grp_id, node, rank in triples:
                    tgt_groups.setdefault((lane, grp_id), {})[node] = rank
            pair_rows = sorted(
                {(l, n) for (l, _g), ns in tgt_groups.items() for n in ns}
            )
        elif isinstance(targets, dict):
            pair_rows = [(l, n) for l, ns in targets.items() for n in ns]
        else:
            lanes = sorted({l for l, _ in src_pairs})
            pair_rows = [(l, n) for l in lanes for n in targets]
        tgt_pairs = set(pair_rows)
        # a target that IS a seed is known settled at cost 0 up front
        tgt_cost = {p: 0.0 for p in tgt_pairs & set(src_pairs)}
        # dedup in ALL modes: the public `targets` list/dict forms may
        # carry duplicate (lane, node) pairs, and the settlement probe's
        # broadcast left join must stay unique per pair or it duplicates
        # frontier rows (inflating n_frontier and the collected hits)
        pair_rows = sorted(tgt_pairs)
        if pair_rows:
            # JVM LocalRelation: the settlement probe broadcast-joins this
            # table EVERY checkpoint, and a Python-RDD-backed one paid a
            # Python-worker task per superstep (functions/localrel.py)
            from routing_algorithm_for_graph_dbs_spark.functions.localrel import (
                local_rows_df,
            )

            tgt_df = local_rows_df(
                edges.sparkSession,
                pair_rows,
                f"lane {sources.schema['lane'].dataType.simpleString()},"
                f" node {sources.schema['node'].dataType.simpleString()}",
            )

    def _lane_done(lane, fm: float) -> bool:
        """This lane's requested targets are all provably final given its
        current frontier minimum ``fm``. With ``tgt_groups`` (rank-pruned
        mode), a group member whose rank exceeds the group's best settled
        rank is DEAD — the consumer ranks by (rank, cost) ascending, so
        it can never win — and stops blocking; equal-rank members still
        must settle (they compete on the cost tiebreak)."""
        if tgt_groups is None:
            return all(
                tgt_cost.get(p, float("inf")) <= fm
                for p in tgt_pairs
                if p[0] == lane
            )
        for (l, _g), members in tgt_groups.items():
            if l != lane:
                continue
            settled = [
                r
                for n, r in members.items()
                if tgt_cost.get((lane, n), float("inf")) <= fm
            ]
            thresh = min(settled) if settled else None
            for n, r in members.items():
                if thresh is not None and r > thresh:
                    continue
                if tgt_cost.get((lane, n), float("inf")) > fm:
                    return False
        return True

    def _lane_ubs() -> dict:
        """Per-lane UPPER-BOUND for frontier pruning (round 13): once
        every target the consumer can actually use has SOME cost, any
        frontier row with cost >= the worst of those costs can never
        improve a consumed target (non-negative weights) — prune it.
        Without this, the label-correcting walk keeps draining the
        whole reachable ball long after the answers are bounded: the
        r13 25x routing probe (45M edges, 25x trip density) sat at
        1.8M frontier rows and 119+ supersteps where 10x needed 47,
        because denser feeds have a much deeper improvement cascade
        past the winners' cost radius. In rank-pruned mode the bound
        covers only NON-DOMINATED members (rank <= the best rank that
        already has a cost) — dominated members may stay non-final,
        which the target contract already allows. Costs only ever
        decrease, so a stale bound (refreshed at checkpoints) is
        conservative, never unsound."""
        out: dict = {}
        for lane in {p[0] for p in tgt_pairs}:
            if tgt_groups is None:
                costs = [tgt_cost.get(p) for p in tgt_pairs if p[0] == lane]
                if costs and all(c is not None for c in costs):
                    out[lane] = max(costs)
                continue
            worst, ok = 0.0, True
            for (l, _g), members in tgt_groups.items():
                if l != lane:
                    continue
                known = [
                    r for n, r in members.items() if (lane, n) in tgt_cost
                ]
                if not known:
                    ok = False
                    break
                thresh = min(known)
                for n, r in members.items():
                    if r > thresh:
                        continue  # dominated: consumer ranks it out
                    c = tgt_cost.get((lane, n))
                    if c is None:
                        ok = False
                        break
                    worst = max(worst, c)
                if not ok:
                    break
            if ok:
                out[lane] = worst
        return out

    def _targets_done(fmin: dict) -> bool:
        """All requested targets provably final for every lane that still
        has a frontier (absent lanes are exhausted — nothing can improve;
        RETIRED lanes were removed at an earlier checkpoint when already
        done)."""
        return all(_lane_done(lane, fm) for lane, fm in fmin.items())

    early_stop = False
    retired_lanes: set = set()
    if parts_mode:
        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        node_t = sources.schema["node"].dataType
        cand_fields = [
            StructField("lane", sources.schema["lane"].dataType),
            StructField("node2", node_t),
            StructField("cost2", DoubleType()),
            StructField("part2", IntegerType()),
            StructField("intra2", BooleanType()),
        ]
        relax_mode = "full" if full_paths else ("pred" if pred_mode else "cost")
        if full_paths:
            cand_fields.append(StructField("path2", ArrayType(node_t)))
        elif pred_mode:
            cand_fields.append(StructField("pred2", node_t))
        cand_schema = StructType(cand_fields)
        cand_cols = [f.name for f in cand_fields]
    with superstep_confs(edges.sparkSession, n_parts):
        it, n_frontier = -1, 0  # max_iterations=0: zero supersteps, converged
        lane_ub: dict = {}  # per-lane frontier upper bound (see _lane_ubs)
        for it in range(max_iterations):
            done_now: set = set()  # lanes retiring THIS superstep (filter once)
            # relax: candidate distances through the current frontier. String
            # aliases (not DataFrame column refs) keep the join unambiguous when
            # a non-checkpointed frontier still carries e's attribute ids from
            # the previous superstep.
            if parts_mode:
                # partition-local relaxation: only parts holding frontier
                # rows do work — the broadcast semi-join keeps the Arrow
                # traffic proportional to the active cells, and the
                # persisted hash-partitioning on ``part`` satisfies the
                # cogroup's clustering requirement without a re-exchange
                active = frontier.select("part").distinct()
                ep = e.join(F.broadcast(active), "part")
                cand = (
                    frontier.groupBy("part")
                    .cogroup(ep.groupBy("part"))
                    .applyInPandas(
                        _make_local_relax(
                            cand_cols, relax_mode, lane_ub, max_cost
                        ),
                        cand_schema,
                    )
                )
                # several parts can emit the same (lane, node): its own
                # part's closure and exports from neighbors — keep the
                # min; the winning row's intra flag / path travel together
                # (struct min_by) so a tie never mixes rows
                win = [F.col("intra2")] + (
                    [F.col("path2")]
                    if full_paths
                    else ([F.col("pred2")] if pred_mode else [])
                )
                cand = (
                    cand.groupBy("lane", "node2")
                    .agg(
                        F.min("cost2").alias("cost2"),
                        F.first("part2").alias("part2"),
                        F.min_by(F.struct(*win), "cost2").alias("_w"),
                    )
                    .select(
                        "lane",
                        "node2",
                        "cost2",
                        "part2",
                        F.col("_w.intra2").alias("intra2"),
                        *(
                            [F.col("_w.path2").alias("path2")]
                            if full_paths
                            else (
                                [F.col("_w.pred2").alias("pred2")]
                                if pred_mode
                                else []
                            )
                        ),
                    )
                )
            else:
                proj = [
                    F.col("f.lane").alias("lane"),
                    F.col("g.dst").alias("node2"),
                    (F.col("f.cost") + F.col("g.w")).alias("cost2"),
                ]
                if full_paths:
                    proj.append(
                        F.concat(
                            F.col("f.path"), F.array(F.col("g.dst"))
                        ).alias("path2")
                    )
                elif pred_mode:
                    proj.append(F.col("f.node").alias("pred2"))
                cand = (
                    frontier.alias("f")
                    .join(e.alias("g"), F.col("f.node") == F.col("g.src"), "inner")
                    .select(*proj)
                )

                # keep the per-(lane,node) minimum among candidates (min_by
                # keeps one arbitrary path among exact ties, matching GDS
                # tie behavior)
                aggs = [F.min("cost2").alias("cost2")]
                if full_paths:
                    aggs.append(F.min_by("path2", "cost2").alias("path2"))
                elif pred_mode:
                    aggs.append(F.min_by("pred2", "cost2").alias("pred2"))
                cand = cand.groupBy("lane", "node2").agg(*aggs)

            # improvement detection + state merge in ONE full-outer join:
            # both sides are unique per (lane, node), so a CASE picks the
            # winner per row — no union + re-aggregation of the whole state
            # (the old shape shuffled the full state TWICE per superstep:
            # once into the improved-join, once into the merge groupBy; this
            # shuffles it once and runs no agg over it). ``better`` folds in
            # the horizon: an over-cap improvement is never accepted, which
            # both prunes the frontier at the cap and keeps over-horizon
            # state rows at their (equally over-horizon) old values — the
            # final cost <= max_cost filter drops them either way.
            better = F.col("c.cost2").isNotNull() & (
                F.col("b.cost").isNull() | (F.col("c.cost2") < F.col("b.cost"))
            )
            if max_cost is not None:
                better = better & (F.col("c.cost2") <= F.lit(max_cost))
            sel = [
                F.coalesce(F.col("b.lane"), F.col("c.lane")).alias("lane"),
                F.coalesce(F.col("b.node"), F.col("c.node2")).alias("node"),
                F.when(better, F.col("c.cost2")).otherwise(F.col("b.cost")).alias(
                    "cost"
                ),
                better.alias("is_frontier"),
            ]
            if parts_mode:
                sel.append(
                    F.coalesce(F.col("b.part"), F.col("c.part2")).alias("part")
                )
                # an intra-improved row's full intra-part closure and export
                # relaxations were applied THIS superstep (local Dijkstra is
                # transitive within the part) — only cross-part improvements
                # still owe relaxations and must seed the next superstep
                sel.append(
                    (better & ~F.coalesce(F.col("c.intra2"), F.lit(False))).alias(
                        "is_seed"
                    )
                )
            if full_paths:
                sel.append(
                    F.when(better, F.col("c.path2")).otherwise(F.col("b.path")).alias(
                        "path"
                    )
                )
            elif pred_mode:
                sel.append(
                    F.when(better, F.col("c.pred2")).otherwise(F.col("b.pred")).alias(
                        "pred"
                    )
                )
            if not full_paths:
                # §3.1 (round 15): the state-merge full-outer join planned
                # SHJ for the first ~3 supersteps and then fell back to
                # SORT-MERGE for the rest of the run — localCheckpoint
                # preserves the checkpointed plan's ESTIMATED stats, and
                # join-size estimates compound multiplicatively per
                # superstep until canBuildLocalHashMap's threshold fails
                # (captured: plans/r15/superstep_merge_join). The candidate
                # side is bounded by construction in the narrow modes
                # (cost/pred rows are ~tens of bytes; cand rows <= state
                # rows, spread over the same edge-sized partitioning the
                # relax-join SHJ already builds from), so hint SHUFFLE_HASH
                # on it and stop paying two full-state sorts per superstep.
                # Full-path mode keeps the planner's choice: path arrays
                # make the per-partition build unbounded in row width.
                cand = cand.hint("shuffle_hash")
            merged = (
                best.alias("b")
                .join(
                    cand.alias("c"),
                    (F.col("b.lane") == F.col("c.lane"))
                    & (F.col("b.node") == F.col("c.node2")),
                    "full_outer",
                )
                .select(*sel)
                # cand-only rows rejected by the horizon would surface as
                # NULL-cost state — they never entered the state before
                .filter(F.col("cost").isNotNull())
            )
            _dump_superstep_plan(merged, it)
            frontier_cols = (
                ["lane", "node", "cost"]
                + (["part"] if parts_mode else [])
                + (["path"] if full_paths else (["pred"] if pred_mode else []))
            )
            # parts mode: the next frontier is the SEED rows (cross-part
            # improvements); intra-improved rows' relaxations are already
            # fully applied, so they neither re-seed nor block settlement
            # (fmin over seeds only is sound: all future improvements
            # originate from seed rows), but their target hits still count
            seed_col = F.col("is_seed") if parts_mode else F.col("is_frontier")
            n_frontier = None
            if (it + 1) % checkpoint_every == 0:
                # LAZY checkpoint + count = ONE job per superstep: the count
                # scans every partition of merged, which materializes the local
                # checkpoint as a side effect. An eager checkpoint followed by
                # isEmpty() was TWO jobs, and per-superstep job launch overhead
                # dominates wall time once frontiers are small (hundreds of
                # supersteps in the 100x-scale batch routing regime).
                merged = merged.localCheckpoint(
                    eager=False, storageLevel=_CKPT_LEVEL
                )
                if tgt_df is None:
                    n_frontier = merged.filter(seed_col).count()
                else:
                    # settlement probe fused into the materializing scan:
                    # a target's cost only ever changes by appearing in a
                    # frontier, so collecting target-matching FRONTIER rows
                    # (broadcast left join + conditional collect_list —
                    # tiny per lane) keeps a driver-side cost dict current
                    # with NO scan of the full state. One job per
                    # checkpoint, same as the plain count.
                    stats = (
                        merged.filter(F.col("is_frontier"))
                        .join(
                            F.broadcast(tgt_df.withColumn("_t", F.lit(1))),
                            ["lane", "node"],
                            "left",
                        )
                        .groupBy("lane")
                        .agg(
                            F.count(F.when(seed_col, F.lit(1))).alias("n"),
                            F.min(F.when(seed_col, F.col("cost"))).alias("fmin"),
                            F.collect_list(
                                F.when(
                                    F.col("_t").isNotNull(),
                                    F.struct("node", "cost"),
                                )
                            ).alias("hits"),
                        )
                        .collect()
                    )
                    n_frontier = sum(r["n"] for r in stats)
                    for r in stats:
                        for hit in r["hits"]:
                            tgt_cost[(r["lane"], hit["node"])] = hit["cost"]
                    lane_ub = _lane_ubs()
                    if n_frontier:
                        # a lane with hits but no seed rows (parts mode) is
                        # exhausted — same as absent from the frontier
                        fmin = {
                            r["lane"]: r["fmin"]
                            for r in stats
                            if r["fmin"] is not None
                        }
                        # settled = cost can no longer improve: any future
                        # relaxation passes through a frontier row of cost
                        # >= fmin and adds a non-negative weight. (With
                        # checkpoint_every>1 a target improved only in a
                        # non-checkpoint superstep is seen late or not at
                        # all — the stop is then merely DELAYED, never
                        # premature, since tgt_cost only over-estimates.)
                        if _targets_done(fmin):
                            early_stop = True
                        else:
                            # per-lane RETIREMENT: a lane whose targets are
                            # all settled-or-dead gains nothing from further
                            # expansion — its non-target state may stay
                            # non-final, which the target contract already
                            # allows ("only TARGET rows are guaranteed
                            # final"). Dropping its frontier rows shrinks
                            # every later superstep to the unfinished lanes
                            # instead of the whole lane set.
                            done_now = {
                                lane
                                for lane, fm in fmin.items()
                                if lane not in retired_lanes
                                and _lane_done(lane, fm)
                            }
                            if done_now:
                                retired_lanes |= done_now
            if n_frontier is not None and prev_ck is not None:
                # Release the SUPERSEDED checkpoint's blocks: once the
                # new checkpoint materialized (the count/stats job
                # above), each superstep's state is self-contained and
                # the previous one only occupies storage memory.
                # localCheckpoint blocks are non-recomputable, so the
                # store never evicts them on its own — without this,
                # long runs accumulate every superstep's state and GC
                # churn grows the superstep wall time super-linearly
                # (round-14 density-25x probe: 112 s -> 283 s -> 557 s
                # per superstep by ss23 under a 48 GiB heap).
                _release_local_checkpoint(prev_ck)
                prev_ck = merged
            if n_frontier is not None and _SSSP_LOG:
                import sys as _sys
                import time as _time

                print(
                    f"sssp superstep {it + 1}: frontier={n_frontier} "
                    f"retired={len(retired_lanes)} bounded={len(lane_ub)} "
                    f"t={_time.monotonic():.0f}",
                    file=_sys.stderr,
                )
            best = merged.drop("is_frontier", "is_seed")
            frontier = merged.filter(seed_col).select(*frontier_cols)
            if done_now:
                # Drop a retired lane's rows ONCE, the superstep it retires:
                # a lane's frontier derives only from its own previous
                # frontier rows, so a lane filtered here can never reappear
                # — no need to re-apply the cumulative retired set (whose
                # IN-list would grow O(|retired|) per superstep at large
                # lane counts).
                frontier = frontier.filter(
                    ~F.col("lane").isin(sorted(done_now))
                )
            if lane_ub:
                # upper-bound prune (see _lane_ubs): rows at or past a
                # lane's bound can never improve a consumed target. A
                # tiny literal map per superstep (|lanes| entries);
                # lanes without a bound pass through (NULL lookup).
                kv: list = []
                for lane, u in sorted(lane_ub.items()):
                    kv += [F.lit(lane), F.lit(float(u))]
                ubm = F.create_map(*kv)[F.col("lane")]
                frontier = frontier.filter(
                    ubm.isNull() | (F.col("cost") < ubm)
                )
            # between checkpoints (checkpoint_every>1) convergence goes
            # unchecked; the extra relaxation on an empty frontier is a no-op.
            if n_frontier == 0 or early_stop:
                break

    if n_frontier is None and not early_stop:
        # max_iterations landed between checkpoints: run the frontier count
        # now so convergence is reported truthfully instead of defaulting
        # to not-converged (the un-checkpointed plan tail is at most
        # checkpoint_every-1 supersteps deep)
        n_frontier = frontier.count()
    global LAST_ITERATIVE_SUPERSTEPS, LAST_ITERATIVE_CONVERGED
    global LAST_ITERATIVE_RETIRED
    LAST_ITERATIVE_RETIRED = len(retired_lanes)
    LAST_ITERATIVE_SUPERSTEPS = it + 1
    LAST_ITERATIVE_CONVERGED = early_stop or n_frontier == 0
    e.unpersist()
    release_sizing()
    if (targets or target_ranks) and not LAST_ITERATIVE_CONVERGED:
        # target callers consume ONLY target rows and assume them final;
        # returning non-settled costs here would hand a ranking consumer a
        # plausible-but-wrong winner with no signal. Fail loudly instead —
        # the caller raises max_iterations (each superstep = one BFS/
        # Dijkstra frontier hop).
        raise RuntimeError(
            f"SSSP hit max_iterations={max_iterations} before the requested"
            " targets settled — target costs would be non-final; raise"
            " max_iterations"
        )
    if max_cost is not None:
        # over-horizon entries in best may hold non-final costs (their
        # improvements were pruned) — the horizon contract only returns
        # settled rows
        best = best.filter(F.col("cost") <= max_cost)
    if parts_mode:
        best = best.drop("part")  # internal locality column, not contract
    return best


def reconstruct_paths(
    state: DataFrame,
    heads: DataFrame,
    carry_cols: tuple[str, ...] = (),
    max_hops: int = 100_000,
) -> DataFrame:
    """Walk predecessor pointers backward to full path arrays — the read
    side of ``track_paths='pred'``.

    ``state``: (lane, node, cost, pred) from the pred-mode kernel.
    ``heads``: (lane, node [, *carry_cols]) rows to reconstruct — expected
    FEW (ranked winners), which is the whole point: the kernel never drags
    path arrays through its per-superstep state rewrite, and only these
    rows pay reconstruction. Each hop is one pushdown filter + tiny
    collect against the persisted narrow state, so the job count is the
    longest path's hop count while every job touches ~|heads| rows.
    Returns (*carry_cols, path) with path source->node inclusive.
    """
    from functools import reduce

    spark = state.sparkSession
    slim = state.select("lane", "node", "pred").persist()
    slim.count()
    rows = heads.collect()
    paths = {i: [r["node"]] for i, r in enumerate(rows)}
    cur = {i: (r["lane"], r["node"]) for i, r in enumerate(rows)}
    hops = 0
    while cur and hops < max_hops:
        keys = sorted(set(cur.values()))
        cond = reduce(
            lambda a, b: a | b,
            [
                (F.col("lane") == F.lit(l)) & (F.col("node") == F.lit(n))
                for l, n in keys
            ],
        )
        got = {
            (r["lane"], r["node"]): r["pred"]
            for r in slim.filter(cond).select("lane", "node", "pred").collect()
        }
        nxt = {}
        for i, (l, n) in cur.items():
            p = got.get((l, n))
            if p is not None:
                paths[i].insert(0, p)
                nxt[i] = (l, p)
        cur = nxt
        hops += 1
    slim.unpersist()

    from pyspark.sql import types as T

    node_t = heads.schema["node"].dataType
    fields = [T.StructField(c, heads.schema[c].dataType) for c in carry_cols]
    fields.append(T.StructField("path", T.ArrayType(node_t)))
    out_rows = [
        tuple(r[c] for c in carry_cols) + (paths[i],) for i, r in enumerate(rows)
    ]
    return spark.createDataFrame(out_rows, T.StructType(fields))


# edges below this count are broadcast and solved per-lane in memory;
# a city-year GTFS graph (~738k edges, BASELINE.md) is ~30 MB — far under
# any executor budget. Above it, the iterative shuffling kernel takes over.
BROADCAST_EDGE_LIMIT = 5_000_000


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "weight",
    track_paths: bool = True,
    strategy: str = "auto",
    max_iterations: int = 200,
    targets: list | dict | None = None,
    max_cost: float | None = None,
    checkpoint_every: int = 1,
    shuffle_parts: int | None = None,
    n_edges: int | None = None,
    target_ranks: dict | None = None,
    node_parts=None,
    n_lanes: int | None = None,
) -> DataFrame:
    """Two-tier SSSP dispatcher (same (lane, node, cost[, path]) contract).

    ``n_lanes``: caller-known lane cardinality — sizes the broadcast
    tier's lane partitioning to the actual lane count instead of the
    cluster default (a 2-lane interactive query otherwise launches a
    defaultParallelism-sized Arrow stage of mostly empty tasks).

    ``node_parts``: optional (node, part:int) DataFrame — or a zero-arg
    callable returning one, resolved only if the iterative tier actually
    runs — switching that tier to partition-local relaxation (see
    :func:`multi_source_dijkstra`). The broadcast tier ignores it (the
    whole graph is already local there).

    ``n_edges``: caller-known edge cardinality (ProjectedGraph.edge_count
    memoizes it) — skips the dispatch count job, which is pure overhead on
    repeated kernel runs over the same graph (interactive routing).

    - ``broadcast``: graph fits in executor memory -> broadcast it once and
      run one in-memory Dijkstra task per lane (graph/local_sssp.py). This is
      the regime the reference operates in (one Neo4j server JVM) — but
      lanes parallelize across the cluster instead of queueing per pair.
    - ``iterative``: Pregel-style frontier relaxation for graphs no single
      executor can hold (``multi_source_dijkstra`` above).
    - ``auto``: pick by ``edges.count()`` vs ``BROADCAST_EDGE_LIMIT`` (the
      count is free when the edge relation is already cached, which the
      projection catalog guarantees).

    ``targets``: optional node list — or dict of lane -> node list for
    per-lane target sets (batch routing) — the broadcast tier then returns
    only target rows and early-terminates once all are settled; the
    iterative tier keeps relaxing until every requested target's cost is
    provably final (settlement check per checkpoint) and then stops, so
    with targets only TARGET rows are guaranteed settled in its output —
    exactly the rows routing reads. Callers that consume non-target rows
    must not pass targets.

    ``max_cost``: optional cost horizon — both tiers return only rows with
    cost <= max_cost; the iterative tier additionally PRUNES its frontier
    at the cap each superstep (see ``multi_source_dijkstra``). Routing
    does NOT use it (the reference caps the target departure window, not
    path cost — a cost cap would prune winners whose walking component
    pushes cost past the elapsed-time horizon); target settlement bounds
    the routing superstep count instead.
    """
    release = lambda: None
    if strategy == "auto":
        # pin across the dispatch count + the tier's first materialization
        # — an unpersisted upstream pipeline must not execute twice, and a
        # caller-persisted input (the routing harness shares one persisted
        # day-graph across nine kernel runs) must NOT be evicted
        # (graph/partitioning.py pin_if_uncached documents both)
        edges, release = pin_if_uncached(edges)
        if n_edges is None:
            n_edges = edges.count()
        strategy = "broadcast" if n_edges <= BROADCAST_EDGE_LIMIT else "iterative"

    try:
        if strategy == "broadcast":
            from routing_algorithm_for_graph_dbs_spark.graph.local_sssp import (
                broadcast_dijkstra,
            )

            return broadcast_dijkstra(
                # "pred" coerces to full paths here: the CSR tier's prev-
                # pointer walk is already cheap, and its contract is (path)
                edges, sources, weight_col, bool(track_paths), targets,
                max_cost=max_cost, target_ranks=target_ranks,
                n_lanes=n_lanes,
            )
        if callable(node_parts):
            node_parts = node_parts()
        return multi_source_dijkstra(
            edges, sources, weight_col, max_iterations, track_paths,
            n_edges=n_edges, max_cost=max_cost, checkpoint_every=checkpoint_every,
            shuffle_parts=shuffle_parts, targets=targets,
            target_ranks=target_ranks, node_parts=node_parts,
        )
    finally:
        release()

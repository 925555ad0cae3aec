"""Broadcast-graph Dijkstra: the fast tier of the SSSP dispatcher.

The reference answers each routing query with one GDS Dijkstra call per
candidate (source, target) pair inside the Neo4j JVM (``main.py:143-148``) —
the whole graph lives in one process. The Spark-first translation of that
regime is NOT per-superstep shuffling (that tier — graph/sssp.py — exists
for graphs too big for any one executor): when the edge relation fits in
executor memory (a city-year GTFS graph is ~1-2M edges ≈ tens of MB), the
right plan is **broadcast the graph once, parallelize across query lanes** —
each lane's Dijkstra is an independent task, so k concurrent routing queries
scale out linearly with executors instead of queueing per-pair like the
reference.

Engineering for interactive latency (reference median 2.87 s/query,
BASELINE.md):

- **CSR, not dicts.** The driver Arrow-collects (src, dst, w) once per
  cached edge relation, factorizes node ids to ints, and broadcasts numpy
  CSR arrays. Collection + build are memoized on the DataFrame identity, so
  the 2nd..nth query on the same projected graph pays zero prep.
- **Early termination.** Routing knows its target nodes; Dijkstra stops
  when every target is settled instead of exhausting the day's graph.
- **Paths only where needed.** Full per-node path arrays are O(V * depth);
  with targets given, only target rows are emitted and only their paths are
  reconstructed from the prev-pointer array.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)
from pyspark.sql import types as T

# lanes at or below this run IN-DRIVER (one process — the regime the
# reference's per-pair GDS calls run in anyway): the CSR is already on
# the driver, each pruned per-lane Dijkstra is milliseconds, and the
# Arrow stage's job + Python-task round-trip dwarfs the compute. Above
# it, lanes parallelize across the cluster as before.
DRIVER_LANE_LIMIT = 8

# driver-side prep cache: (id(edges), weight_col) -> (edges_ref, broadcast).
# The DataFrame reference is held ON PURPOSE: the key uses id(), and CPython
# recycles ids after GC — without the ref, a new DataFrame landing at a
# recycled address would silently reuse the CSR of a different graph.
_PREP_CACHE: dict[tuple, tuple] = {}
# executor-side decoded-graph cache keyed by id(broadcast.value); each value
# holds the payload ref for the same id-stability reason
_GRAPH_CACHE: dict[int, dict] = {}


def _prepare(edges: DataFrame, weight_col: str | None):
    """Collect the edge relation once and broadcast CSR arrays.

    ``weight_col=None`` = unweighted: (src, dst) deduped, weight 1.0 — the
    betweenness configuration, cached under the SAME original DataFrame so
    repeated calls hit.
    """
    key = (id(edges), weight_col)
    hit = _PREP_CACHE.get(key)
    if hit is not None:
        return hit[1]
    if weight_col is None:
        sel = edges.select(
            F.col("src").cast("string"), F.col("dst").cast("string")
        ).distinct().withColumn("w", F.lit(1.0))
    else:
        sel = edges.select(
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.col(weight_col).cast("double").alias("w"),
        )
    pdf = sel.toPandas()
    all_ids, uniques = pd.factorize(
        pd.concat([pdf["src"], pdf["dst"]], ignore_index=True)
    )
    m = len(pdf)
    src_i = all_ids[:m].astype(np.int64)
    dst_i = all_ids[m:].astype(np.int64)
    w = pdf["w"].to_numpy(dtype=np.float64)
    n = len(uniques)
    order = np.argsort(src_i, kind="stable")
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src_i, minlength=n), out=indptr[1:])
    payload = {
        "indptr": indptr,
        "nbr": dst_i[order],
        "w": w[order],
        "ids": uniques.to_numpy(dtype=object),
    }
    bc = edges.sparkSession.sparkContext.broadcast(payload)
    while len(_PREP_CACHE) >= 4:  # bound driver+executor memory, FIFO evict
        _, old_bc = _PREP_CACHE.pop(next(iter(_PREP_CACHE)))
        old_bc.unpersist()  # actually free the executor-side blocks
    _PREP_CACHE[key] = (edges, bc)
    return bc


def _decoded(payload: dict) -> dict:
    """Per-worker-process memo: adds the id->index map to the CSR payload."""
    key = id(payload)
    g = _GRAPH_CACHE.get(key)
    if g is None:
        g = dict(payload)
        g["index"] = {s: i for i, s in enumerate(payload["ids"])}
        g["_payload"] = payload  # keep alive: the cache key is id(payload)
        while len(_GRAPH_CACHE) >= 4:
            _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE)))
        _GRAPH_CACHE[key] = g
    return g


def _dijkstra_csr(
    g: dict,
    seeds: list[int],
    target_idx: set[int] | None,
    target_groups: list[dict] | None = None,
):
    """Multi-seed Dijkstra over broadcast CSR arrays.

    ``target_idx``: plain early stop — break once every target settles.
    ``target_groups``: RANK-PRUNED early stop (a list of {node_idx: rank}
    dicts, one per consumer group). The routing consumer ranks candidates
    by (rank, cost) ascending per group, so once a group member settles
    with rank r, members with rank > r can never win that group — they
    are dropped from the group's remaining set, which stops the search at
    the winner's cost radius instead of the farthest target's (~4 h of
    day-graph for routing's departure window). Equal-rank members are
    KEPT for the downstream cost/src/dst tiebreaks. Returns
    (dist, prev, settled) — with pruning, only SETTLED target rows carry
    final costs (a pruned target's dist may be a live overestimate).
    """
    indptr, nbr, w = g["indptr"], g["nbr"], g["w"]
    n = len(indptr) - 1
    dist = np.full(n, np.inf)
    prev = np.full(n, -1, dtype=np.int64)
    heap = [(0.0, s) for s in seeds]
    heapq.heapify(heap)
    for s in seeds:
        dist[s] = 0.0
    remaining = None if target_idx is None else set(target_idx)
    groups_of: dict[int, list] = {}
    n_remaining = 0
    settled: set[int] = set()
    if target_groups is not None:
        remaining = None
        groups = [dict(grp) for grp in target_groups]
        for grp in groups:
            for u in grp:
                groups_of.setdefault(u, []).append(grp)
            n_remaining += len(grp)
        if n_remaining == 0:
            return dist, prev, settled
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        if remaining is not None:
            if u in remaining:
                remaining.discard(u)
                settled.add(u)
                if not remaining:
                    break
        elif target_groups is not None and u in groups_of:
            settled.add(u)
            for grp in groups_of[u]:
                r = grp.pop(u, None)
                if r is None:
                    continue
                n_remaining -= 1
                doomed = [v for v, rv in grp.items() if rv > r]
                for v in doomed:
                    del grp[v]
                n_remaining -= len(doomed)
            if n_remaining == 0:
                break
        for j in range(indptr[u], indptr[u + 1]):
            v = nbr[j]
            nd = d + w[j]
            if nd < dist[v]:
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, v))
    return dist, prev, settled


def _walk_path(prev: np.ndarray, ids: np.ndarray, node: int) -> list:
    out = [ids[node]]
    while prev[node] != -1:
        node = prev[node]
        out.append(ids[node])
    out.reverse()
    return out


def broadcast_dijkstra(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "weight",
    track_paths: bool = True,
    targets: list | dict | None = None,
    max_cost: float | None = None,
    target_ranks: dict | None = None,
    n_lanes: int | None = None,
) -> DataFrame:
    """Same contract as ``multi_source_dijkstra``: (lane, node, cost[, path]).

    With ``targets`` given, only target-node rows are returned (what the
    routing pipelines consume) and Dijkstra early-terminates once all
    targets are settled. A ``dict`` maps each lane to ITS OWN target list
    (keys stringified) — batch routing uses this so a lane only expands
    until its pair's targets settle, not the union of every pair's (lanes
    absent from the dict fall back to full expansion, the ``None``
    behavior). ``edges`` must fit in executor memory (the dispatcher
    checks).

    ``target_ranks`` (mutually exclusive with ``targets``): dict of
    lane -> list of (group, node, rank) triples for RANK-PRUNED early
    termination. The consumer ranks each group's candidates by
    (rank, cost) ascending — routing's ORDER BY arrival, cost — so once
    a group member settles with rank r, members with rank > r are dead
    and the kernel stops at the winner's cost radius (see
    ``_dijkstra_csr``). Only SETTLED rows are emitted; a pruned target's
    cost is a live overestimate the consumer must not read (it can only
    lose its group's rank anyway).
    """
    if target_ranks is not None and targets is not None:
        raise ValueError("pass either targets or target_ranks, not both")
    bc = _prepare(edges, weight_col)
    node_t = edges.schema["src"].dataType
    integral = isinstance(node_t, (T.LongType, T.IntegerType, T.ShortType))

    fields = [
        T.StructField("lane", sources.schema["lane"].dataType),
        T.StructField("node", node_t),
        T.StructField("cost", T.DoubleType()),
    ]
    if track_paths:
        fields.append(T.StructField("path", T.ArrayType(node_t)))
    out_schema = T.StructType(fields)
    if isinstance(targets, dict):
        target_list = None
        target_map = {str(k): list(v) for k, v in targets.items()}
    else:
        target_list = list(targets) if targets is not None else None
        target_map = None
    rank_map = (
        {str(k): list(v) for k, v in target_ranks.items()}
        if target_ranks is not None
        else None
    )

    def _run_lane(g: dict, lane, nodes) -> list[tuple]:
        """One lane's Dijkstra over the decoded CSR — the single source of
        truth for BOTH execution paths (Arrow tasks and the in-driver
        tier), so their rows are identical by construction."""
        index, ids = g["index"], g["ids"]
        # the CSR is factorized over stringified ids; convert back on emit
        conv = (lambda x: int(x)) if integral else (lambda x: x)
        seeds = [
            index[str(s)] for s in dict.fromkeys(nodes) if str(s) in index
        ]
        tl = target_map.get(str(lane)) if target_map is not None else target_list
        t_idx = (
            {index[str(t)] for t in tl if str(t) in index}
            if tl is not None
            else None
        )
        t_groups = None
        tr = rank_map.get(str(lane)) if rank_map is not None else None
        if tr is not None:  # absent lane = full expansion, like target_map
            by_group: dict = {}
            for grp_id, node, rank in tr:
                i = index.get(str(node))
                if i is not None:
                    by_group.setdefault(grp_id, {})[i] = rank
            t_groups = list(by_group.values())
        if not seeds:
            return []
        dist, prev, settled = _dijkstra_csr(g, seeds, t_idx, t_groups)
        if t_groups is not None:
            emit = sorted(settled)  # pruned targets hold live overestimates
        elif t_idx is not None:
            emit = sorted(t_idx)
        else:
            emit = np.flatnonzero(np.isfinite(dist)).tolist()
        recs = []
        for u in emit:
            if not np.isfinite(dist[u]):
                continue
            if max_cost is not None and dist[u] > max_cost:
                # horizon contract applied at emit time — cheaper than a
                # post-UDF filter stage over the Arrow output
                continue
            if track_paths:
                recs.append(
                    (
                        lane,
                        conv(ids[u]),
                        float(dist[u]),
                        [conv(x) for x in _walk_path(prev, ids, u)],
                    )
                )
            else:
                recs.append((lane, conv(ids[u]), float(dist[u])))
        return recs

    # IN-DRIVER tier (round 14): with a handful of lanes there is nothing
    # to parallelize — the CSR payload already lives on the driver
    # (_prepare built it there before broadcasting), each lane's pruned
    # Dijkstra is milliseconds, and the Arrow stage's one job + Python
    # task round-trip (~0.3-0.4 s on the gate box) dwarfs the compute.
    # The result returns as a JVM LocalRelation, so the consumer's joins
    # fold it into their own job. Identical rows by construction
    # (_run_lane is shared); tests assert the cross-path identity.
    if (
        n_lanes is not None
        and 0 < n_lanes <= DRIVER_LANE_LIMIT
        # target-bounded emission only: a full-expansion lane emits every
        # reachable node, which must stream as Arrow batches, not sit in
        # a driver-built local relation
        and (target_list is not None or target_map is not None
             or rank_map is not None)
        and isinstance(node_t, (T.StringType, T.LongType, T.IntegerType))
    ):
        from routing_algorithm_for_graph_dbs_spark.functions.localrel import (
            local_rows_df,
        )

        g = _decoded(bc.value)
        by_lane: dict = {}
        for r in sources.select("lane", "node").collect():
            by_lane.setdefault(r["lane"], []).append(r["node"])
        recs = []
        for lane in sorted(by_lane):
            recs.extend(_run_lane(g, lane, by_lane[lane]))
        nt = node_t.simpleString()
        lane_ddl = sources.schema["lane"].dataType.simpleString()
        ddl = f"lane {lane_ddl}, node {nt}, cost double" + (
            f", path array<{nt}>" if track_paths else ""
        )
        return local_rows_df(edges.sparkSession, recs, ddl)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        g = _decoded(bc.value)
        lane = pdf["lane"].iloc[0]
        recs = _run_lane(g, lane, list(pdf["node"]))
        return pd.DataFrame(recs, columns=[f.name for f in out_schema.fields])

    # one group per lane -> one (multi-seed) Dijkstra per task; concurrent
    # lanes land on different cores/executors. The repartition MUST carry an
    # explicit partition count: the lane rows are a few KB, so AQE's
    # post-shuffle coalescing would otherwise merge them into ONE partition
    # and serialize every lane's Dijkstra into a single task (measured 5.8x
    # slower on the 9-OD batch) — explicit counts are exempt from coalescing,
    # and a lane-partitioned input satisfies the groupBy's distribution so
    # no second exchange is planned. With a caller-known lane count the
    # stage is sized to the lanes themselves (round 14): a 2-lane
    # interactive query otherwise launched defaultParallelism mostly-empty
    # Arrow tasks of pure per-task overhead.
    default_par = sources.sparkSession.sparkContext.defaultParallelism
    if n_lanes is not None and n_lanes > 0:
        # 2x overprovision (ADVICE r14): hashing n lanes into exactly n
        # partitions lands 2-3 lanes in one task with birthday-bound
        # probability for the 9-16-lane counts just above the driver
        # tier, serializing them; doubling the partition count keeps the
        # expected per-partition lane load near 1 while still far below
        # the old defaultParallelism fan-out of empty tasks.
        n_part = max(1, min(default_par, 2 * n_lanes))
    else:
        n_part = max(default_par, 8)
    srcs = sources.repartition(n_part, "lane")
    return srcs.groupBy("lane").applyInPandas(run, schema=out_schema)
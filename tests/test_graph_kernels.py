"""SSSP / components / betweenness kernels vs hand-computed + pure-Python
oracles on tiny graphs (SURVEY.md §5: the graph ops get fixture oracles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges_df(spark, triples):
    return spark.createDataFrame(triples, ["src", "dst", "weight"])


def test_sssp_simple(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import multi_source_dijkstra

    # diamond with a shortcut: a->b(1), b->c(1), a->c(3), c->d(1), a->d(10)
    e = _edges_df(
        spark,
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 3.0), ("c", "d", 1.0), ("a", "d", 10.0)],
    )
    src = spark.createDataFrame([("a", "a")], ["lane", "node"])
    got = {
        r["node"]: (r["cost"], r["path"])
        for r in multi_source_dijkstra(e, src).collect()
    }
    assert got["a"][0] == 0.0
    assert got["b"][0] == 1.0
    assert got["c"][0] == 2.0 and got["c"][1] == ["a", "b", "c"]
    assert got["d"][0] == 3.0 and got["d"][1] == ["a", "b", "c", "d"]


def test_sssp_multi_lane_independent(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import multi_source_dijkstra

    e = _edges_df(spark, [("a", "b", 2.0), ("b", "c", 2.0), ("c", "a", 2.0)])
    src = spark.createDataFrame(
        [("L1", "a"), ("L2", "b")], ["lane", "node"]
    )
    res = multi_source_dijkstra(e, src)
    got = {(r["lane"], r["node"]): r["cost"] for r in res.collect()}
    assert got[("L1", "c")] == 4.0
    assert got[("L2", "c")] == 2.0
    assert got[("L2", "a")] == 4.0


def test_broadcast_kernel_lanes_fan_out(spark):
    """Lanes must spread across partitions: AQE's post-shuffle coalescing
    once merged the few-KB lane rows into ONE partition and serialized
    every lane's Dijkstra into a single task (measured 5.8x slower on the
    9-OD batch). The explicit-count repartition keeps it exempt."""
    from routing_algorithm_for_graph_dbs_spark.graph.local_sssp import (
        broadcast_dijkstra,
    )

    e = _edges_df(spark, [(f"n{i}", f"n{i + 1}", 1.0) for i in range(40)])
    lanes = spark.createDataFrame(
        [(f"n{i}", f"n{i}") for i in range(0, 20)], ["lane", "node"]
    )
    res = broadcast_dijkstra(e, lanes)
    assert res.rdd.getNumPartitions() > 1
    # and the fan-out changes nothing semantically
    got = {(r["lane"], r["node"]): r["cost"] for r in res.collect()}
    assert got[("n0", "n40")] == 40.0
    assert got[("n19", "n40")] == 21.0


def test_broadcast_kernel_driver_tier_identity(spark):
    """Round 14: with few lanes AND target-bounded emission, the broadcast
    tier runs the (shared) lane kernel in-driver and returns a JVM
    LocalRelation — rows must be identical to the Arrow-stage path, and
    the tier must NOT engage without targets (unbounded emission) or when
    the lane count exceeds the limit."""
    from routing_algorithm_for_graph_dbs_spark.graph.local_sssp import (
        DRIVER_LANE_LIMIT,
        broadcast_dijkstra,
    )

    e = _edges_df(spark, [(f"n{i}", f"n{i + 1}", float(i % 3 + 1)) for i in range(30)])
    lanes = spark.createDataFrame(
        [(f"n{i}", f"n{i}") for i in range(3)], ["lane", "node"]
    )
    tgt = {f"n{i}": [f"n{i + 5}", "n29"] for i in range(3)}

    drv = broadcast_dijkstra(e, lanes, targets=tgt, n_lanes=3)
    arrow = broadcast_dijkstra(e, lanes, targets=tgt)
    assert "LocalRelation" in drv._jdf.queryExecution().optimizedPlan().toString()
    key = lambda rows: sorted((r["lane"], r["node"], r["cost"], tuple(r["path"])) for r in rows)
    assert key(drv.collect()) == key(arrow.collect())

    # rank-pruned mode too
    ranks = {f"n{i}": [(0, f"n{i + 5}", 1.0), (0, "n29", 2.0)] for i in range(3)}
    drv_r = broadcast_dijkstra(e, lanes, target_ranks=ranks, n_lanes=3)
    arrow_r = broadcast_dijkstra(e, lanes, target_ranks=ranks)
    assert key(drv_r.collect()) == key(arrow_r.collect())

    # no targets -> unbounded emission -> the driver tier must not engage
    full = broadcast_dijkstra(e, lanes, n_lanes=3)
    assert "LocalRelation" not in full._jdf.queryExecution().optimizedPlan().toString()
    # lane count over the limit -> Arrow path
    many = spark.createDataFrame(
        [(f"n{i}", f"n{i}") for i in range(DRIVER_LANE_LIMIT + 1)],
        ["lane", "node"],
    )
    over = broadcast_dijkstra(
        e, many, targets=["n29"], n_lanes=DRIVER_LANE_LIMIT + 1
    )
    assert "LocalRelation" not in over._jdf.queryExecution().optimizedPlan().toString()


def test_sssp_iterative_target_settlement_early_stop(spark):
    """With targets, the iterative kernel stops once every requested
    target's cost is provably final (cost <= lane frontier minimum) —
    a 60-hop chain with a target at hop 3 must settle in far fewer than
    60 supersteps, with the target cost exact (= broadcast tier)."""
    import importlib

    # graph/__init__ re-exports the sssp FUNCTION over the module name
    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")

    n = 60
    e = _edges_df(spark, [(f"n{i}", f"n{i+1}", 1.0) for i in range(n)])
    src = spark.createDataFrame([("n0", "n0")], ["lane", "node"])
    res = S.multi_source_dijkstra(e, src, targets={"n0": ["n3"]})
    got = {r["node"]: r["cost"] for r in res.collect()}
    assert got["n3"] == 3.0
    assert S.LAST_ITERATIVE_SUPERSTEPS < n // 2
    assert S.LAST_ITERATIVE_CONVERGED  # converged FOR THE TARGETS
    # dispatcher plumbs targets through to the iterative tier too
    res2 = S.sssp(e, src, strategy="iterative", targets=["n3"])
    assert {r["node"]: r["cost"] for r in res2.collect()}["n3"] == 3.0
    assert S.LAST_ITERATIVE_SUPERSTEPS < n // 2


def test_sssp_convergence_flag_between_checkpoints(spark):
    """ADVICE r6: when max_iterations lands between checkpoints the
    kernel must still report convergence truthfully (a final frontier
    count), not default to not-converged."""
    import importlib

    # graph/__init__ re-exports the sssp FUNCTION over the module name
    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")

    # 3-hop chain converges on superstep 4 (last frontier empties);
    # max_iterations=5, checkpoint_every=2 -> final iteration is not a
    # checkpoint iteration
    e = _edges_df(spark, [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)])
    src = spark.createDataFrame([("a", "a")], ["lane", "node"])
    got = {
        r["node"]: r["cost"]
        for r in S.multi_source_dijkstra(
            e, src, max_iterations=5, checkpoint_every=2
        ).collect()
    }
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}
    assert S.LAST_ITERATIVE_CONVERGED
    # and a genuinely unconverged run still reports False
    e2 = _edges_df(spark, [(f"n{i}", f"n{i+1}", 1.0) for i in range(20)])
    src2 = spark.createDataFrame([("n0", "n0")], ["lane", "node"])
    S.multi_source_dijkstra(e2, src2, max_iterations=3, checkpoint_every=2)
    assert not S.LAST_ITERATIVE_CONVERGED

    with pytest.raises(ValueError, match="checkpoint_every"):
        S.multi_source_dijkstra(e2, src2, checkpoint_every=9)


def test_sssp_unreachable_absent(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import multi_source_dijkstra

    e = _edges_df(spark, [("a", "b", 1.0), ("x", "y", 1.0)])
    src = spark.createDataFrame([("a", "a")], ["lane", "node"])
    nodes = {r["node"] for r in multi_source_dijkstra(e, src).collect()}
    assert nodes == {"a", "b"}


def test_sssp_bounded_horizon_exact_within_cap(spark):
    """max_cost prunes the frontier at the cap but stays EXACT inside it
    (non-negative weights: a prefix of an optimal path never exceeds the
    whole), and both tiers return the same capped set. (Routing does NOT
    use the horizon — see test_routing.py cap-boundary test — generic
    cost-bounded traversals do.)"""
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import (
        multi_source_dijkstra,
        sssp,
    )

    # diamond + tail: d reachable at 3, e at 4 — cap at 3 keeps a,b,c,d
    e = _edges_df(
        spark,
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 3.0), ("c", "d", 1.0),
         ("d", "e", 1.0)],
    )
    src = spark.createDataFrame([("a", "a")], ["lane", "node"])
    it = {
        r["node"]: r["cost"]
        for r in multi_source_dijkstra(e, src, max_cost=3.0).collect()
    }
    assert it == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}
    bc = {
        r["node"]: r["cost"]
        for r in sssp(e, src, strategy="broadcast", max_cost=3.0).collect()
    }
    assert bc == it


def test_connected_components(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"]
    assert got["a"] != got["x"]


def _brandes_py(edges, nodes):
    """Reference implementation (pure Python, Brandes 2001, unweighted,
    directed) used only as a test oracle."""
    from collections import deque

    adj = {n: [] for n in nodes}
    for s, d in edges:
        adj[s].append(d)
    bc = {n: 0.0 for n in nodes}
    for s in nodes:
        stack, preds = [], {n: [] for n in nodes}
        sigma = {n: 0.0 for n in nodes}
        dist = {n: -1 for n in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {n: 0.0 for n in nodes}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_vs_python_oracle(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.betweenness import (
        betweenness_centrality,
    )

    edges = [
        ("a", "b"),
        ("b", "c"),
        ("c", "d"),
        ("a", "e"),
        ("e", "d"),
        ("b", "e"),
        ("d", "a"),
    ]
    nodes = sorted({n for e in edges for n in e})
    expect = _brandes_py(edges, nodes)
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["score"] for r in betweenness_centrality(e).collect()}
    for n in nodes:
        assert abs(got[n] - expect[n]) < 1e-9, (n, got[n], expect[n])


def test_betweenness_tiers_agree(spark):
    """Broadcast per-source Brandes must equal the iterative lane-parallel
    DataFrame Brandes exactly (both unweighted directed), exact and sampled."""
    from routing_algorithm_for_graph_dbs_spark.graph.betweenness import (
        betweenness,
        betweenness_centrality,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (3, 4), (1, 3), (4, 0), (2, 4)],
        ["src", "dst"],
    )
    exact_fast = {
        r["node"]: round(r["score"], 6)
        for r in betweenness(edges, strategy="broadcast").collect()
    }
    exact_iter = {
        r["node"]: round(r["score"], 6)
        for r in betweenness_centrality(edges).collect()
    }
    assert exact_fast == exact_iter
    sample = spark.createDataFrame([(0,), (2,)], ["node"])
    s_fast = {
        r["node"]: round(r["score"], 6)
        for r in betweenness(edges, sources=sample, strategy="broadcast").collect()
    }
    s_iter = {
        r["node"]: round(r["score"], 6)
        for r in betweenness_centrality(edges, sources=sample).collect()
    }
    assert s_fast == s_iter


def test_components_tiers_agree(spark):
    """local union-find tier == iterative min-label tier on a random graph
    with several components, including isolated vertices."""
    import random

    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )

    rng = random.Random(11)
    edges = []
    # three chains + random intra-chain extras (chains force propagation depth)
    for base in (0, 100, 200):
        for i in range(30):
            edges.append((base + i, base + i + 1))
        for _ in range(10):
            edges.append((base + rng.randrange(30), base + rng.randrange(30)))
    edf = spark.createDataFrame(edges, "src long, dst long")
    vdf = spark.createDataFrame([(999,), (0,), (100,)], "node long")
    local = connected_components(edf, vdf, strategy="local")
    iterative = connected_components(edf, vdf, strategy="iterative")
    lm = {r["node"]: r["component"] for r in local.collect()}
    im = {r["node"]: r["component"] for r in iterative.collect()}
    assert lm == im
    assert lm[999] == 999                    # isolated vertex is its own comp
    assert lm[30] == 0 and lm[130] == 100 and lm[230] == 200


def test_sssp_checkpoint_batching_equivalent(spark):
    """checkpoint_every > 1 (relaxations batched between checkpoints)
    must produce the same costs as per-superstep checkpointing — the
    convergence check goes unchecked between checkpoints, so the extra
    relaxations must be provable no-ops."""
    import random

    from routing_algorithm_for_graph_dbs_spark.graph.sssp import (
        multi_source_dijkstra,
    )

    rng = random.Random(5)
    edges = [
        (rng.randrange(12), rng.randrange(12), float(rng.randint(1, 9)))
        for _ in range(40)
    ]
    e = spark.createDataFrame(edges, ["src", "dst", "weight"]).filter(
        "src != dst"
    )
    src = spark.createDataFrame([("L", 0)], ["lane", "node"])
    one = {
        r["node"]: r["cost"]
        for r in multi_source_dijkstra(e, src, track_paths=False).collect()
    }
    batched = {
        r["node"]: r["cost"]
        for r in multi_source_dijkstra(
            e, src, track_paths=False, checkpoint_every=3
        ).collect()
    }
    assert one == batched and one[0] == 0.0


def test_components_long_chain_logarithmic_rounds(spark):
    """Scale-shape evidence for the iterative tier: a 50k-node chain has
    diameter 50k, so min-label propagation (the pre-round-6 kernel) would
    need ~50k supersteps; alternating large-star/small-star contraction
    must converge in O(log n) rounds (~17 measured) and still agree with
    the driver union-find tier. This is the plan shape that keeps
    dd_canonical's transitive closure tractable on a 100 TB web-crawl
    graph with million-hop chains."""
    import math

    from routing_algorithm_for_graph_dbs_spark.graph import components as C

    n = 50_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    iterative = C.connected_components(edges, strategy="iterative")
    rounds = C.LAST_ITERATIVE_ROUNDS
    assert rounds <= 2 * math.ceil(math.log2(n))  # 17 observed vs 50k diameter
    # every node labels to the chain minimum (node 0)
    assert iterative.filter(F.col("component") != 0).count() == 0
    assert iterative.count() == n


def test_scc_hand_graph(spark):
    """Cycle {1,2,3}, 2-cycle {4,5}, self-loop 6, bridges between them,
    isolated vertex 7 via the vertices param."""
    from routing_algorithm_for_graph_dbs_spark.graph.scc import (
        strongly_connected_components,
    )

    edf = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6), (6, 6)],
        "src long, dst long",
    )
    vdf = spark.createDataFrame([(7,)], "node long")
    got = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(edf, vdf, strategy="local").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_scc_direction_matters(spark):
    """a->b->c chain (no back edges): every node its own SCC — the weak
    tier would merge them. Locks the directed semantics."""
    from routing_algorithm_for_graph_dbs_spark.graph.scc import (
        strongly_connected_components,
    )

    edf = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r["node"]: r["scc"]
        for r in strongly_connected_components(edf, strategy="local").collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


def test_scc_tiers_agree(spark):
    """Driver Tarjan == distributed forward-backward coloring on a graph
    whose condensation is a chain of cycles (forces multiple peel rounds:
    the min-id root sits at the END of the reachability order)."""
    from routing_algorithm_for_graph_dbs_spark.graph.scc import (
        strongly_connected_components,
    )

    edges = []
    # four 6-cycles: [0..5], [10..15], [20..25], [30..35]
    for base in (0, 10, 20, 30):
        for i in range(6):
            edges.append((base + i, base + (i + 1) % 6))
    # one-way bridges HIGH base -> LOW base (30->20->10->0), so the
    # smallest ids are the deepest targets
    for hi, lo in ((30, 20), (20, 10), (10, 0)):
        edges.append((hi, lo))
    # plus an acyclic tail off the bottom cycle
    edges += [(3, 40), (40, 41)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    local = strongly_connected_components(edf, strategy="local")
    iterative = strongly_connected_components(edf, strategy="iterative")
    lm = {r["node"]: r["scc"] for r in local.collect()}
    im = {r["node"]: r["scc"] for r in iterative.collect()}
    assert lm == im
    assert lm[35] == 30 and lm[5] == 0 and lm[40] == 40 and lm[41] == 41


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LPA converges to one
    community per clique (labeled by its min id); the bridge endpoints
    stay with their cliques because 3 internal neighbors outvote 1."""
    from routing_algorithm_for_graph_dbs_spark.graph.labelprop import (
        label_propagation,
    )

    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((3, 10))  # bridge
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edf, iterations=4).collect()
    }
    assert {got[i] for i in range(4)} == {0}
    assert {got[10 + i] for i in range(4)} == {10}


def test_label_propagation_isolated_keeps_own(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.labelprop import (
        label_propagation,
    )

    edf = spark.createDataFrame([(1, 2)], "src long, dst long")
    vdf = spark.createDataFrame([(9,)], "node long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edf, vdf, iterations=3).collect()
    }
    # the 2-cycle is bipartite: sync LPA swaps labels every round (the
    # documented oscillation caveat) — after 3 (odd) rounds each node
    # holds the other's id; the isolated node keeps its own
    assert got[9] == 9 and got[1] == 2 and got[2] == 1


def test_random_walks_deterministic_and_valid(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.walks import random_walks

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)]  # 4 is a dead end
    edf = spark.createDataFrame(edges, "src long, dst long")
    eset = set(edges)
    a = {r["walk_id"]: r["walk"] for r in random_walks(edf, length=5).collect()}
    b = {r["walk_id"]: r["walk"] for r in random_walks(edf, length=5).collect()}
    assert a == b  # pure function of the graph
    for wid, walk in a.items():
        assert walk[0] == wid
        for u, v in zip(walk, walk[1:]):
            assert (u, v) in eset  # every hop is a real edge
    # a walk reaching 4 must stop there (dead end truncates)
    for walk in a.values():
        if 4 in walk:
            assert walk[-1] == 4


def test_random_walks_salt_changes_corpus(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.walks import random_walks

    edges = [(i, j) for i in range(8) for j in range(8) if i != j]
    edf = spark.createDataFrame(edges, "src long, dst long")
    a = {r["walk_id"]: r["walk"] for r in random_walks(edf, 6, salt="s1").collect()}
    b = {r["walk_id"]: r["walk"] for r in random_walks(edf, 6, salt="s2").collect()}
    assert a != b


def test_random_walks_starts_subset(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.walks import random_walks

    edf = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    starts = spark.createDataFrame([(1,)], "node long")
    got = random_walks(edf, 3, starts=starts).collect()
    assert len(got) == 1 and got[0]["walk_id"] == 1 and len(got[0]["walk"]) == 4


def test_betweenness_sampled_within_tolerance_of_exact(spark):
    """VERDICT r6 item 6: the Brandes/Pich sampled estimate (scaled by
    n/|sample|) on a fixed-seed half sample must track exact Brandes —
    bounded total absolute deviation and a stable top-5 — so the
    4x-scale sampled runs (SCALE.md) rest on a tested estimator, not
    just a tier-agreement check."""
    import hashlib

    from routing_algorithm_for_graph_dbs_spark.graph.betweenness import (
        betweenness,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest(), 16)

    n = 48
    edges = sorted(
        {
            (i, h(f"e{i}|{j}") % n)
            for i in range(n)
            for j in range(4)
            if h(f"e{i}|{j}") % n != i
        }
    )
    e = spark.createDataFrame(edges, ["src", "dst"])
    exact = {
        r["node"]: r["score"]
        for r in betweenness(e, strategy="broadcast").collect()
    }
    picks = sorted(range(n), key=lambda i: h(f"seed42|{i}"))[: n // 2]
    s = spark.createDataFrame([(p,) for p in picks], ["node"])
    samp = {
        r["node"]: r["score"]
        for r in betweenness(
            e, sources=s, strategy="broadcast", scaled=True
        ).collect()
    }
    total = sum(exact.values())
    dev = sum(
        abs(samp.get(v, 0.0) - exact.get(v, 0.0)) for v in set(exact) | set(samp)
    )
    # measured 0.182 on this fixed seed; the bound leaves noise-free margin
    # (everything here is deterministic, so this is a regression pin)
    assert dev / total < 0.25, dev / total
    top_e = set(sorted(exact, key=exact.get, reverse=True)[:5])
    top_s = set(sorted(samp, key=samp.get, reverse=True)[:5])
    assert len(top_e & top_s) >= 3, (top_e, top_s)


def test_rank_pruned_settlement_both_tiers(spark):
    """Rank-pruned targets (r7): on a 60-hop unit chain with group
    targets {n3: rank 5.0, n50: rank 9.0}, settling n3 (rank 5) makes
    n50 (rank 9) unwinnable under the consumer's (rank, cost) order —
    both tiers must stop near hop 3 instead of walking to hop 50, and
    only SETTLED targets are guaranteed/emitted. An equal-rank sibling
    (n4, rank 5.0) must NOT be pruned: it competes on the cost tiebreak."""
    import importlib

    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")
    from routing_algorithm_for_graph_dbs_spark.graph.local_sssp import (
        broadcast_dijkstra,
    )

    n = 60
    e = _edges_df(spark, [(f"n{i}", f"n{i+1}", 1.0) for i in range(n)])
    src = spark.createDataFrame([("n0", "n0")], ["lane", "node"])
    ranks = {"n0": [(0, "n3", 5.0), (0, "n4", 5.0), (0, "n50", 9.0)]}

    got_b = {
        r["node"]: r["cost"]
        for r in broadcast_dijkstra(e, src, target_ranks=ranks).collect()
    }
    # settled, exact: n3 and its equal-rank sibling n4; pruned: n50
    assert got_b["n3"] == 3.0 and got_b["n4"] == 4.0
    assert "n50" not in got_b

    res_i = S.multi_source_dijkstra(e, src, target_ranks=ranks)
    got_i = {r["node"]: r["cost"] for r in res_i.collect()}
    assert got_i["n3"] == 3.0 and got_i["n4"] == 4.0
    assert S.LAST_ITERATIVE_SUPERSTEPS < 15  # stopped at the winners' radius
    assert S.LAST_ITERATIVE_CONVERGED

    # separate GROUPS are independent: pair 1's early settle must not
    # prune pair 2's later-rank target
    ranks2 = {"n0": [(1, "n3", 5.0), (2, "n50", 9.0)]}
    got_b2 = {
        r["node"]: r["cost"]
        for r in broadcast_dijkstra(e, src, target_ranks=ranks2).collect()
    }
    assert got_b2["n3"] == 3.0 and got_b2["n50"] == 50.0

    with pytest.raises(ValueError, match="not both"):
        broadcast_dijkstra(e, src, targets=["n3"], target_ranks=ranks)


def test_sssp_targets_unsettled_raises(spark):
    """Review r7: exhausting max_iterations before requested targets
    settle must RAISE, not return non-final target costs that a ranking
    consumer would silently trust."""
    import importlib

    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")

    e = _edges_df(spark, [(f"n{i}", f"n{i+1}", 1.0) for i in range(20)])
    src = spark.createDataFrame([("n0", "n0")], ["lane", "node"])
    with pytest.raises(RuntimeError, match="max_iterations"):
        S.multi_source_dijkstra(e, src, targets={"n0": ["n20"]}, max_iterations=3)
    # targetless callers keep partial-result semantics (flag, no raise)
    S.multi_source_dijkstra(e, src, max_iterations=3)
    assert not S.LAST_ITERATIVE_CONVERGED


def test_sssp_duplicate_targets_deduped(spark):
    """ADVICE r7 low: the public ``targets`` list/dict forms accept
    duplicates; the settlement probe's broadcast join must be unique per
    (lane, node) or duplicate target rows inflate the frontier stats.
    Duplicated targets must give byte-identical results to unique ones."""
    import importlib

    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")

    n = 30
    e = _edges_df(spark, [(f"n{i}", f"n{i+1}", 1.0) for i in range(n)])
    src = spark.createDataFrame([("n0", "n0")], ["lane", "node"])
    dup = S.multi_source_dijkstra(
        e, src, targets={"n0": ["n3", "n3", "n5", "n3", "n5"]}
    )
    got_dup = {(r["lane"], r["node"]): r["cost"] for r in dup.collect()}
    steps_dup = S.LAST_ITERATIVE_SUPERSTEPS
    uniq = S.multi_source_dijkstra(e, src, targets={"n0": ["n3", "n5"]})
    got_uniq = {(r["lane"], r["node"]): r["cost"] for r in uniq.collect()}
    assert got_dup == got_uniq
    assert got_dup[("n0", "n5")] == 5.0
    assert S.LAST_ITERATIVE_SUPERSTEPS == steps_dup
    # list form dedups too
    res = S.sssp(e, src, strategy="iterative", targets=["n4", "n4", "n4"])
    assert {r["node"]: r["cost"] for r in res.collect()}["n4"] == 4.0


def test_iterative_per_lane_retirement(spark):
    """A lane whose targets settle early must be RETIRED (frontier rows
    dropped) while a farther lane keeps searching — results identical to
    the unretired run, and the retirement counter observes it. Chain
    graph: lane A targets node n1 (settles at superstep 1), lane B
    targets the far end."""
    import importlib

    sssp_mod = importlib.import_module(
        "routing_algorithm_for_graph_dbs_spark.graph.sssp"
    )
    n = 12
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}", 1.0) for i in range(n)],
        "src string, dst string, weight double",
    )
    sources = spark.createDataFrame(
        [("A", "n0"), ("B", "n0")], "lane string, node string"
    )
    res = sssp_mod.sssp(
        edges, sources, weight_col="weight", strategy="iterative",
        n_edges=n, max_iterations=50,
        target_ranks={"A": [(0, "n1", 1.0)], "B": [(0, f"n{n}", 1.0)]},
    )
    rows = {(r["lane"], r["node"]): r["cost"] for r in res.collect()}
    # target rows are exact despite lane A's early retirement
    assert rows[("A", "n1")] == 1.0
    assert rows[("B", f"n{n}")] == float(n)
    assert sssp_mod.LAST_ITERATIVE_RETIRED == 1
    assert sssp_mod.LAST_ITERATIVE_CONVERGED


# ---------------------------------------------------------------------------
# round 14: partition-local relaxation (the density depth-wall fix)


def _hash_parts(spark, n_nodes, k=4, prefix="n"):
    """Adversarial node->part mapping: round-robin over k parts, so almost
    every edge is cross-part (the worst locality the mode can see)."""
    return spark.createDataFrame(
        [(f"{prefix}{i}", i % k) for i in range(n_nodes)], ["node", "part"]
    )


def _random_graph(seed=7, n=60, m=300):
    import random

    random.seed(seed)
    return [
        (
            f"n{random.randrange(n)}",
            f"n{random.randrange(n)}",
            float(random.randint(1, 9)),
        )
        for _ in range(m)
    ]


def test_local_relax_matches_onehop_all_modes(spark):
    """node_parts switches candidate generation to cogrouped per-part
    Dijkstra; results must be identical to the one-hop kernel in every
    track_paths mode — costs exactly, paths/preds as valid optimal
    witnesses (tie class members)."""
    import importlib

    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")

    triples = _random_graph()
    e = _edges_df(spark, triples)
    src = spark.createDataFrame([("L1", "n0"), ("L2", "n5")], ["lane", "node"])
    np_df = _hash_parts(spark, 60)

    base = {
        (r["lane"], r["node"]): r["cost"]
        for r in S.multi_source_dijkstra(e, src, track_paths=False).collect()
    }
    got = {
        (r["lane"], r["node"]): r["cost"]
        for r in S.multi_source_dijkstra(
            e, src, track_paths=False, node_parts=np_df
        ).collect()
    }
    assert got == base and len(base) > 10

    wmap: dict = {}
    for s, d, w in triples:
        wmap[(s, d)] = min(w, wmap.get((s, d), float("inf")))

    # pred mode: every pred row must be cost-consistent at the fixpoint
    st = {
        (r["lane"], r["node"]): (r["cost"], r["pred"])
        for r in S.multi_source_dijkstra(
            e, src, track_paths="pred", node_parts=np_df
        ).collect()
    }
    assert {k: v[0] for k, v in st.items()} == base
    for (lane, node), (cost, pred) in st.items():
        if pred is not None:
            assert st[(lane, pred)][0] + wmap[(pred, node)] == pytest.approx(cost)

    # full-path mode: each path is a real walk of total weight == cost
    for r in S.multi_source_dijkstra(e, src, node_parts=np_df).collect():
        p = r["path"]
        assert p[-1] == r["node"]
        assert sum(wmap[(a, b)] for a, b in zip(p, p[1:])) == pytest.approx(
            r["cost"]
        )


def test_local_relax_targets_and_ranks(spark):
    """Target settlement, per-lane retirement and rank pruning must hold
    under partition-local relaxation (the settlement fmin is computed
    over SEED rows only — intra-improved rows cannot cause future
    improvements, so excluding them is sound, and the early stop must
    still deliver exact target costs)."""
    import importlib

    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")

    triples = _random_graph(seed=11)
    e = _edges_df(spark, triples)
    src = spark.createDataFrame([("L1", "n0"), ("L2", "n5")], ["lane", "node"])
    np_df = _hash_parts(spark, 60)
    base = {
        (r["lane"], r["node"]): r["cost"]
        for r in S.multi_source_dijkstra(e, src, track_paths=False).collect()
    }

    tgts = {"L1": ["n17", "n33"], "L2": ["n17"]}
    got = {
        (r["lane"], r["node"]): r["cost"]
        for r in S.multi_source_dijkstra(
            e, src, track_paths=False, node_parts=np_df, targets=tgts
        ).collect()
    }
    assert S.LAST_ITERATIVE_CONVERGED
    for lane, nodes in tgts.items():
        for n in nodes:
            assert got.get((lane, n)) == base.get((lane, n))

    # rank-pruned settlement on a 2-part unit chain: the kernel must stop
    # at the winner's radius, and the chain collapses to ~1 superstep per
    # part crossing instead of one per hop
    chain = [(f"c{i}", f"c{i+1}", 1.0) for i in range(60)]
    e2 = _edges_df(spark, chain)
    src2 = spark.createDataFrame([("c0", "c0")], ["lane", "node"])
    np2 = spark.createDataFrame(
        [(f"c{i}", 0 if i < 30 else 1) for i in range(61)], ["node", "part"]
    )
    ranks = {"c0": [(0, "c3", 5.0), (0, "c50", 9.0)]}
    got2 = {
        r["node"]: r["cost"]
        for r in S.multi_source_dijkstra(
            e2, src2, target_ranks=ranks, node_parts=np2
        ).collect()
    }
    assert got2["c3"] == 3.0
    # depth collapse: 60-hop chain over 2 parts needs ~2 supersteps, not 60
    assert S.LAST_ITERATIVE_SUPERSTEPS <= 4


def test_local_relax_horizon_and_unsettled_raise(spark):
    """max_cost horizon semantics and the unsettled-targets raise are
    mode-independent."""
    import importlib

    S = importlib.import_module("routing_algorithm_for_graph_dbs_spark.graph.sssp")

    e = _edges_df(spark, [(f"n{i}", f"n{i+1}", 1.0) for i in range(20)])
    src = spark.createDataFrame([("n0", "n0")], ["lane", "node"])
    np_df = _hash_parts(spark, 21, k=7)
    got = {
        r["node"]: r["cost"]
        for r in S.multi_source_dijkstra(
            e, src, track_paths=False, node_parts=np_df, max_cost=5.0
        ).collect()
    }
    assert got == {f"n{i}": float(i) for i in range(6)}

    # round-robin parts make every chain hop cross-part, so the budget
    # still binds one superstep per hop: unsettled targets must RAISE
    with pytest.raises(RuntimeError, match="max_iterations"):
        S.multi_source_dijkstra(
            e, src, targets={"n0": ["n20"]}, node_parts=np_df,
            max_iterations=3,
        )
    # an EMPTY mapping falls back to hash parts for every node — results
    # must still be exact
    empty_map = spark.createDataFrame([], "node string, part int")
    got_f = {
        r["node"]: r["cost"]
        for r in S.multi_source_dijkstra(
            e, src, track_paths=False, node_parts=empty_map
        ).collect()
    }
    assert got_f == {f"n{i}": float(i) for i in range(21)}


def test_spatial_node_parts_grid(spark):
    """The spatial partitioner: bounded part ids, co-located nearby
    vertices, degenerate (single-point) extents collapse to part 0."""
    from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
        spatial_node_parts,
    )

    rows = [
        (f"v{i}", 1, 11.0 + (i % 10) * 0.01, 44.0 + (i // 10) * 0.01)
        for i in range(100)
    ]
    v = spark.createDataFrame(rows, ["id", "stop_sequence", "lon", "lat"])
    parts = {r["node"]: r["part"] for r in spatial_node_parts(v, cells=4).collect()}
    assert set(parts) == {f"v{i}" for i in range(100)}
    assert all(0 <= p < 16 for p in parts.values())
    # neighbors in the same quadrant share a part
    assert parts["v0"] == parts["v1"]
    # far corners do not
    assert parts["v0"] != parts["v99"]

    v1 = spark.createDataFrame([("a", 1, 5.0, 5.0)], ["id", "stop_sequence", "lon", "lat"])
    assert spatial_node_parts(v1).collect()[0]["part"] == 0

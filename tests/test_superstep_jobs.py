"""Regression guard on per-superstep scheduler-job count.

The iterative kernels' wall time at scale is dominated by fixed
per-superstep scheduling overhead (hundreds of supersteps in the
100x-scale batch routing regime). With AQE pinned off inside the loop and
the lazy-checkpoint + termination-count pattern, a 12-superstep BFS costs
~18 jobs; before (eager checkpoint + isEmpty under AQE) it was 49. This
test fails if a change quietly reintroduces per-superstep job
multiplication.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _jobs(spark):
    return set(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])


def test_bfs_superstep_job_budget(spark, testdata_dir):
    from routing_algorithm_for_graph_dbs_spark.driver_surface import QUERIES

    # warm: catalog + codegen caches out of the measurement
    QUERIES["graph_bfs_hops"](spark, testdata_dir).count()

    before = _jobs(spark)
    QUERIES["graph_bfs_hops"](spark, testdata_dir).count()
    n_jobs = len(_jobs(spark) - before)
    # 12 supersteps x 1 job + edge count + seed checkpoint + final count
    # + small slack; the pre-fix shape measured 49.
    assert n_jobs <= 24, f"BFS launched {n_jobs} jobs (superstep overhead regressed)"


def test_superstep_confs_restores_session(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
        superstep_confs,
    )

    conf = spark.conf
    aqe0 = conf.get("spark.sql.adaptive.enabled")
    sp0 = conf.get("spark.sql.shuffle.partitions")
    smj0 = conf.get("spark.sql.join.preferSortMergeJoin")
    with superstep_confs(spark, 3):
        assert conf.get("spark.sql.adaptive.enabled") == "false"
        assert conf.get("spark.sql.shuffle.partitions") == "3"
        # round 14: the kernel span prefers shuffled-hash joins (the relax
        # join's build side is one ~20 MB edge partition by construction)
        assert conf.get("spark.sql.join.preferSortMergeJoin") == "false"
    assert conf.get("spark.sql.adaptive.enabled") == aqe0
    assert conf.get("spark.sql.shuffle.partitions") == sp0
    assert conf.get("spark.sql.join.preferSortMergeJoin") == smj0

    # restored even when the kernel body raises
    try:
        with superstep_confs(spark, 5):
            raise RuntimeError("kernel blew up")
    except RuntimeError:
        pass
    assert conf.get("spark.sql.adaptive.enabled") == aqe0
    assert conf.get("spark.sql.shuffle.partitions") == sp0
    assert conf.get("spark.sql.join.preferSortMergeJoin") == smj0


def test_components_converges_with_lazy_checkpoint(spark):
    """Star contraction terminates and labels correctly with the one-job
    round (checksum-materialized lazy checkpoint), incl. self-loop nodes."""
    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["src", "dst"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, strategy="iterative").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_pagerank_mass_and_dangling(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    # A -> B with B dangling: after one iteration with d=0.85,
    # base = 0.15/2 + 0.85*(0.5/2) = 0.2875; pr(B) = base + 0.85*0.5 = 0.7125
    e = spark.createDataFrame([(0, 1)], ["src", "dst"])
    got = {r["node"]: r["pr"] for r in pagerank(e, iterations=1).collect()}
    assert abs(got[0] - 0.2875) < 1e-12
    assert abs(got[1] - 0.7125) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9  # dangling mass conserved


def test_pagerank_converges_on_cycle(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    # a directed 4-cycle is vertex-transitive: every node must hold 1/4
    e = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], ["src", "dst"]
    )
    got = [r["pr"] for r in pagerank(e, iterations=12).collect()]
    assert all(abs(p - 0.25) < 1e-9 for p in got)
    assert abs(sum(got) - 1.0) < 1e-9


def test_triangle_counts_hand_graph(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.triangles import (
        triangle_counts,
    )

    # K4 on {0,1,2,3} has 4 triangles, each node in exactly 3 of them;
    # node 9 hangs off node 0 and is in none. Direction/dupes must not
    # matter: feed some edges reversed and one duplicated.
    edges = [(0, 1), (0, 2), (0, 3), (2, 1), (1, 3), (3, 2), (2, 3), (9, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}


def test_node_similarity_hand_graph(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.triangles import (
        node_similarity,
    )

    # N(0)={1,2}, N(3)={1,2}, N(4)={2,5}: (0,3) identical sets -> 1.0;
    # (0,4) and (3,4) share only node 2 -> 1/3. Sinks never appear as pairs.
    edges = [(0, 1), (0, 2), (3, 1), (3, 2), (4, 2), (4, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r["a"], r["b"]): (r["inter"], r["jaccard"]) for r in node_similarity(df).collect()}
    assert got == {
        (0, 3): (2, 1.0),
        (0, 4): (1, 0.333333),
        (3, 4): (1, 0.333333),
    }
    filtered = node_similarity(df, min_jaccard=0.5).collect()
    assert {(r["a"], r["b"]) for r in filtered} == {(0, 3)}


def test_kcore_hand_graph(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.kcore import k_core

    # K4 {0,1,2,3} with a pendant path 3-9-8: the 3-core is exactly K4
    # (peeling 8 first drops 9's degree below 3 — the cascade matters).
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9), (9, 8)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["core_degree"] for r in k_core(df, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above the max degree empties the graph
    assert k_core(df, k=5).count() == 0


def test_pagerank_tiers_agree(spark):
    from pyspark.sql import functions as F2

    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 9), (9, 2), (5, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=8, strategy="local")
        .select("node", F2.round("pr", 6).alias("pr"))
        .collect()
    }
    b = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=8, strategy="iterative")
        .select("node", F2.round("pr", 6).alias("pr"))
        .collect()
    }
    assert a == b  # both tiers produce the same 6-decimal ranks


def test_kcore_tiers_agree(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.kcore import k_core

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9), (9, 8),
             (8, 7), (7, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for k in (2, 3):
        a = sorted(map(tuple, k_core(df, k=k, strategy="local").collect()))
        b = sorted(map(tuple, k_core(df, k=k, strategy="iterative").collect()))
        assert a == b, f"tiers diverge at k={k}"


def test_centrality_bfs_tiers_agree(spark):
    """graph_closeness/graph_harmonic derive from one multi-source BFS —
    both SSSP tiers must produce identical centrality values (locks the
    all-lanes kernel path the centrality queries depend on)."""
    from pyspark.sql import functions as F2

    from routing_algorithm_for_graph_dbs_spark.graph.sssp import sssp

    edges = spark.createDataFrame(
        [(a, b) for a, b in [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0)]],
        ["src", "dst"],
    ).withColumn("weight", F2.lit(1.0))
    verts = (
        edges.select(F2.col("src").alias("node"))
        .unionByName(edges.select(F2.col("dst").alias("node")))
        .distinct()
    )
    lanes = verts.select(F2.col("node").alias("lane"), "node")

    def centralities(strategy):
        res = sssp(edges, lanes, track_paths=False, strategy=strategy)
        rows = (
            res.groupBy("lane")
            .agg(
                F2.round(
                    F2.sum(
                        F2.when(F2.col("cost") > 0, 1.0 / F2.col("cost")).otherwise(0.0)
                    ),
                    6,
                ).alias("harmonic"),
                F2.count(F2.lit(1)).alias("n_reached"),
            )
            .collect()
        )
        return {r["lane"]: (r["harmonic"], r["n_reached"]) for r in rows}

    assert centralities("broadcast") == centralities("iterative")


def test_clustering_coefficient_hand_graph(spark):
    from routing_algorithm_for_graph_dbs_spark.graph.triangles import (
        clustering_coefficient,
    )

    # K4 plus pendant 9-0: K4 nodes have deg 3 (within K4) except node 0
    # whose pendant raises deg to 4. lcc = 2*3/(3*2) = 1.0 for 1,2,3;
    # node 0: 2*3/(4*3) = 0.5; pendant 9: deg 1 -> 0.0.
    edges = [(0, 1), (0, 2), (0, 3), (2, 1), (1, 3), (3, 2), (2, 3), (9, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: (r["triangles"], r["lcc"]) for r in clustering_coefficient(df).collect()}
    assert got == {
        0: (3, 0.5),
        1: (3, 1.0),
        2: (3, 1.0),
        3: (3, 1.0),
        9: (0, 0.0),
    }


def test_personalized_pagerank_tiers_agree_and_concentrate(spark):
    from pyspark.sql import functions as F2

    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 9), (9, 2), (5, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = [0]
    a = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=8, strategy="local", seeds=seeds)
        .select("node", F2.round("pr", 6).alias("pr"))
        .collect()
    }
    b = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=8, strategy="iterative", seeds=seeds)
        .select("node", F2.round("pr", 6).alias("pr"))
        .collect()
    }
    assert a == b
    # teleportation concentrates rank near the seed: the seed outranks a
    # node with no path from it (5 only ever teleports)
    assert a[0] > a[5]
    # node 5 has no in-edges and is not a seed: its only rank is teleport
    # mass, which PPR gives exclusively to seeds -> exactly 0
    assert a[5] == 0.0


def test_personalized_pagerank_rejects_empty_seed_list(spark):
    import pytest as _pytest

    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    df = spark.createDataFrame([(0, 1)], ["src", "dst"])
    with _pytest.raises(ValueError, match="non-empty"):
        pagerank(df, seeds=[])

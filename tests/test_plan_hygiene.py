"""Physical-plan hygiene across the whole driver query surface.

At 100 TB the difference between a right plan and a wrong one is a
cartesian product, a lost filter pushdown, or a fact-table broadcast.
These checks run `.explain` over every registered query at sf0.001 and
assert the properties that must survive refactors."""

from __future__ import annotations

import pytest

from routing_algorithm_for_graph_dbs_spark.driver_surface import QUERIES

SF = "/root/testdata/sf0.001"

# queries where per-iteration/collect-driven execution makes a static plan
# check meaningless (iterative kernels, applyInPandas over collected seeds)
DYNAMIC = {
    "graph_bfs_hops",
    "graph_components",
    "graph_betweenness",
    "graph_betweenness_directed",
}


def _plan(spark, name):
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - DYNAMIC))
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "p3_p4_filters")
    assert "PushedFilters: [" in plan
    # at least one non-empty pushed filter on the lineitem scan
    assert any(
        "PushedFilters: [" in line and "[]" not in line
        for line in plan.splitlines()
    ), "expected pushed filters on the parquet scan"


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "p1_project_rename")
    read = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert read and "l_comment" not in read[0], "projection should prune unused columns"


def test_join_chain_broadcasts_dimensions(spark):
    plan = _plan(spark, "j1_join_chain")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, not sort-merge"


def test_simhash_stays_whole_stage_codegen(spark):
    """The 64-bit-vote aggregate must compile under whole-stage codegen:
    with fallback disabled, a Janino failure (e.g. the 64KB method limit,
    the risk of the old 64x-nested-aggregate formulation) throws here, and
    the executed plan must show the HashAggregates inside a codegen stage."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import simhash

    old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df = spark.createDataFrame(
            [(i, f"tok{i} tok{i + 1} shared words here") for i in range(30)],
            ["doc_id", "text"],
        )
        for fn in ("xxhash64", "md5"):
            out = simhash(df, hash_fn=fn)
            assert len(out.collect()) == 30, fn
            # final AQE plan only (toString appends the un-annotated
            # "Initial Plan" section after it)
            plan = (
                out._jdf.queryExecution()
                .executedPlan()
                .toString()
                .split("== Initial Plan ==")[0]
            )
            agg_lines = [l for l in plan.splitlines() if "HashAggregate" in l]
            assert agg_lines, fn
            # '*(n)' prefix marks operators fused into a codegen stage
            assert all("*(" in l for l in agg_lines), f"{fn}: aggregate fell out of codegen:\n{plan}"
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


@pytest.mark.parametrize(
    "name",
    ["ev_zscore_outliers", "txt_unigram_logprob", "txt_tfidf_top3",
     "smp_budget_mixture", "a10_histogram"],
)
def test_stats_join_back_broadcasts(spark, name):
    """Queries that aggregate small stats and join them back onto the fact
    scan must broadcast the stats side — a sort-merge there would shuffle
    the 100 TB fact table for a handful of rows."""
    plan = (
        QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, name
    assert "SortMergeJoin" not in plan, f"{name} sort-merges its stats join"


def test_arrow_stages_declare_their_partitioning():
    """Every mapInPandas/applyInPandas site in the package must make its
    partitioning deliberate (VERDICT r10 #3). The round-10 lesson: Spark
    sizes scan splits by BYTES, and AQE coalesces shuffles by BYTES — both
    the wrong signal for a CPU-bound Arrow kernel, which can end up
    serialized on one core behind a byte-small input (knn_ivf_join's sf1.0
    guardrail ran 12.6 s on ONE split until the kernels spread; the pair
    stage ran 202 s behind a 13 MB shuffle coalesced to 4 partitions).

    A site passes when, within its statement context (the 12 preceding
    source lines), it either
      - spreads explicitly: ``spread_for_compute(`` or ``.repartition(``,
      - is grouped (``​.groupBy(`` / ``.cogroup(``): partitioning comes
        from the keyed shuffle, not scan splits — per-group cost must
        then be bounded by the operator (e.g. knn's hot-cell blocks,
        semdedup's pair budget), or
      - carries an explicit exemption comment ``# arrow-stage: <reason>``
        (multimodal extractors: map-side by design, payloads must never
        cross a shuffle; scan splits provide scale parallelism).
    A new Arrow kernel without any of these fails here until its
    partitioning story is written down.
    """
    import glob
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "routing_algorithm_for_graph_dbs_spark",
    )
    markers = (
        "spread_for_compute(",
        ".repartition(",
        ".groupBy(",
        ".cogroup(",
        "# arrow-stage:",
    )
    call = re.compile(r"\.(mapInPandas|applyInPandas)\(")
    sites, bad = [], []
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines):
            if not call.search(line):
                continue
            rel = os.path.relpath(path, pkg)
            sites.append(f"{rel}:{i + 1}")
            ctx = "\n".join(lines[max(0, i - 12) : i + 1])
            if not any(m in ctx for m in markers):
                bad.append(f"{rel}:{i + 1}  {line.strip()}")
    # the scanner itself must keep finding the known kernel surface — a
    # regex or layout change that finds nothing would pass vacuously
    assert len(sites) >= 25, f"arrow-stage scan looks broken: {sites}"
    assert not bad, (
        "Arrow stages without a declared partitioning strategy "
        "(spread_for_compute / .repartition / grouped / '# arrow-stage:'):\n"
        + "\n".join(bad)
    )

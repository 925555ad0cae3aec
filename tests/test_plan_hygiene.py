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

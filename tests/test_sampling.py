"""Deterministic sampling + sequence packing (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
    hash_uniform,
    mixture_sample,
    pack_sequences,
    pack_sequences_naive,
    stratified_sample,
    weighted_replicate,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 400 docs across 4 groups with skewed sizes
    return (
        spark.range(0, 400)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
            ((F.col("id") * 37) % 191 + 1).alias("toks"),
        )
        .persist()
    )


def test_hash_uniform_deterministic_and_bounded(spark, docs):
    u = docs.select(hash_uniform(F.col("doc_id"), "s").alias("u"))
    rows = [r["u"] for r in u.collect()]
    assert all(0.0 <= x < 1.0 for x in rows)
    # independent of partitioning
    again = docs.repartition(13).select(
        "doc_id", hash_uniform(F.col("doc_id"), "s").alias("u")
    )
    m1 = {r["doc_id"]: r["u"] for r in docs.select(
        "doc_id", hash_uniform(F.col("doc_id"), "s").alias("u")).collect()}
    m2 = {r["doc_id"]: r["u"] for r in again.collect()}
    assert m1 == m2


def test_mixture_sample_rates_and_determinism(docs):
    rates = {"g0": 1.0, "g1": 0.5, "g2": 0.0}
    out = mixture_sample(docs, rates, group_col="grp", key_col="doc_id")
    got = out.groupBy("grp").count().collect()
    counts = {r["grp"]: r["count"] for r in got}
    assert counts.get("g0") == 100          # rate 1.0 keeps everything
    assert counts.get("g2") is None         # rate 0.0 drops everything
    assert "g3" not in counts               # absent from rates -> dropped
    assert 30 <= counts.get("g1", 0) <= 70  # ~50% of 100, hash-binomial
    # exact same selection when the input is partitioned differently
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(
            docs.repartition(7), rates, group_col="grp"
        ).collect()
    )
    assert a == b


def test_mixture_sample_rejects_bad_rate(docs):
    with pytest.raises(ValueError, match="rate"):
        mixture_sample(docs, {"g0": 1.5}, group_col="grp")


def test_mixture_sample_no_shuffle(docs):
    plan = mixture_sample(
        docs, {"g0": 0.5}, group_col="grp"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-side filter


def test_stratified_sample_exact_counts(docs):
    out = stratified_sample(docs, "grp", 7)
    counts = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    assert counts == {"g0": 7, "g1": 7, "g2": 7, "g3": 7}
    # stratum smaller than n -> whole stratum
    small = docs.filter((F.col("grp") == "g0") & (F.col("doc_id") < 12))
    assert stratified_sample(small, "grp", 7).count() == 3


def test_stratified_sample_deterministic(docs):
    a = sorted(r["doc_id"] for r in stratified_sample(docs, "grp", 5).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(11), "grp", 5).collect()
    )
    assert a == b


@pytest.mark.parametrize("budget", [64, 100, 1000])
def test_pack_two_pass_equals_naive(docs, budget):
    a = {r["doc_id"]: r["shard_id"] for r in pack_sequences(
        docs, "toks", budget=budget).collect()}
    b = {r["doc_id"]: r["shard_id"] for r in pack_sequences_naive(
        docs, "toks", budget=budget).collect()}
    assert a == b


def test_pack_shards_contiguous_and_bounded(docs):
    budget = 256
    out = pack_sequences(docs, "toks", budget=budget).collect()
    by_key = sorted(out, key=lambda r: r["doc_id"])
    # shard ids are non-decreasing in key order and start at 0
    sids = [r["shard_id"] for r in by_key]
    assert sids[0] == 0
    assert all(x <= y for x, y in zip(sids, sids[1:]))
    # every shard's PRE-document fill is under budget (greedy fill: the
    # last document may overflow past the boundary, but it must START
    # inside the shard)
    fill: dict[int, int] = {}
    for r in by_key:
        start = fill.get(r["shard_id"], 0)
        assert start < budget
        fill[r["shard_id"]] = start + r["toks"]


def test_pack_null_tokens_treated_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 10)], "doc_id long, toks int"
    )
    out = {r["doc_id"]: r["shard_id"] for r in pack_sequences(
        df, "toks", budget=15).collect()}
    assert out == {1: 0, 2: 0, 3: 0}


def test_pack_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, toks long")
    assert pack_sequences(df, "toks", budget=10).count() == 0


def test_weighted_replicate_semantics(docs):
    rates = {"g0": 2.0, "g1": 1.5, "g2": 0.0}
    out = weighted_replicate(docs, rates, group_col="grp", key_col="doc_id")
    counts = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    assert counts["g0"] == 200                  # exactly 2 copies each
    assert 120 <= counts["g1"] <= 180           # 100 + ~50 hash-extras
    assert "g2" not in counts and "g3" not in counts
    # copy ids enumerate 1..n
    ids = out.filter(F.col("grp") == "g0").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_id")).alias("c")).collect()
    assert all(r["c"] == [1, 2] for r in ids)
    # deterministic under repartitioning
    a = sorted((r["doc_id"], r["copy_id"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["copy_id"])
        for r in weighted_replicate(
            docs.repartition(9), rates, group_col="grp"
        ).collect()
    )
    assert a == b


def test_weighted_replicate_rejects_negative(docs):
    with pytest.raises(ValueError, match=">= 0"):
        weighted_replicate(docs, {"g0": -0.1}, group_col="grp")


@pytest.mark.parametrize("n,bins", [(6, 4), (103, 10), (10, 3), (3, 7)])
def test_ntile_by_matches_window_ntile(spark, n, bins):
    from pyspark.sql import Window

    from routing_algorithm_for_graph_dbs_spark.operators.sampling import ntile_by

    df = spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") * 37 % 91).alias("v")
    )
    mine = {r["doc_id"]: r["bin"] for r in ntile_by(
        df, bins, ["v", "doc_id"]).collect()}
    ref = {r["doc_id"]: r["nt"] for r in df.withColumn(
        "nt", F.ntile(bins).over(Window.orderBy("v", "doc_id"))).collect()}
    assert mine == ref


def test_ntile_by_empty_and_validation(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import ntile_by

    empty = spark.createDataFrame([], "doc_id long, v long")
    assert ntile_by(empty, 5, ["v", "doc_id"]).count() == 0
    with pytest.raises(ValueError, match="n_bins"):
        ntile_by(empty, 0, ["v"])


def test_pack_grouped_matches_per_group_window(docs):
    from pyspark.sql import Window

    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        pack_sequences_grouped,
    )

    got = {
        r["doc_id"]: (r["grp"], r["shard_id"])
        for r in pack_sequences_grouped(
            docs, "toks", ["grp"], budget=300, num_partitions=5
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = docs.withColumn(
        "shard_id",
        F.floor(
            F.coalesce(F.sum("toks").over(w), F.lit(0)) / F.lit(300.0)
        ).cast("long"),
    )
    want = {r["doc_id"]: (r["grp"], r["shard_id"]) for r in naive.collect()}
    assert got == want
    # each group numbers its shards from 0 independently
    assert sorted({v[1] for k, v in got.items() if v[0] == "g0"})[0] == 0
    assert sorted({v[1] for k, v in got.items() if v[0] == "g3"})[0] == 0

"""Bucketed layout (sources/bucketing.py) + skew shapes (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.operators.skew import (
    salted_join,
    skew_count_distinct,
)
from routing_algorithm_for_graph_dbs_spark.sources.bucketing import (
    assert_no_shuffle,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.range(0, 1000).select(
        F.col("id").alias("okey"), (F.col("id") % 7).alias("status")
    )
    lines = (
        spark.range(0, 5000)
        .select(
            (F.col("id") % 1000).alias("okey"),
            F.col("id").alias("line_id"),
            (F.col("id") * 3 % 100).alias("qty"),
        )
    )
    write_bucketed(orders, "b_orders", "okey", 8, sort_col="okey",
                   path=str(base / "o"))
    write_bucketed(lines, "b_lines", "okey", 8, sort_col="okey",
                   path=str(base / "l"))
    yield "b_orders", "b_lines"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_compiles_shuffle_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, "okey")
    assert_no_shuffle(j)  # both sides pre-shuffled at write time


def test_bucketed_join_results_match_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, "okey")
    assert j.count() == 5000
    agg = j.groupBy("status").agg(F.sum("qty").alias("s"))
    # groupBy on a non-bucket key still shuffles, but only the join output
    plain = (
        spark.table(lt).join(spark.table(rt), "okey")
        .groupBy("status").agg(F.sum("qty").alias("s"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_groupby_on_bucket_key_shuffle_free(spark, bucketed_tables):
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("okey").agg(F.sum("qty").alias("s"))
    assert_no_shuffle(agg)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(0, 9000).select(
        F.lit(0).alias("k"), (F.col("id") % 50).alias("v")
    )
    tail = spark.range(0, 1000).select(
        (F.col("id") % 100 + 1).alias("k"), (F.col("id") % 20).alias("v")
    )
    return hot.unionByName(tail).persist()


def test_skew_count_distinct_matches_naive(spark, skewed):
    mine = {r["k"]: r["n_distinct"] for r in skew_count_distinct(
        skewed, ["k"], "v").collect()}
    naive = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(
        F.countDistinct("v").alias("n")).collect()}
    assert mine == naive
    assert mine[0] == 50


def test_skew_count_distinct_first_shuffle_spreads_hot_key(spark, skewed):
    plan = skew_count_distinct(
        skewed, ["k"], "v"
    )._jdf.queryExecution().executedPlan().toString()
    # some exchange must partition on (k, v) — the stage-1 distinct spread;
    # (the plan prints top-down, so the final k-only exchange comes first)
    import re

    heads = [
        m.group(0)
        for m in re.finditer(r"Exchange hashpartitioning\([^)]*\)", plan)
    ]
    assert any("k#" in h and "v#" in h for h in heads), heads


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.range(0, 101).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    for how in ("inner", "left"):
        a = sorted(
            map(tuple, salted_join(skewed, dim, ["k"], salt_n=8, how=how)
                .select("k", "v", "name").collect())
        )
        b = sorted(
            map(tuple, skewed.join(dim, "k", how)
                .select("k", "v", "name").collect())
        )
        assert a == b, how


def test_salted_join_rejects_right_outer(spark, skewed):
    dim = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, ["k"], how="right")


def test_skew_count_distinct_null_values_skipped(spark):
    """SQL COUNT(DISTINCT v) skips NULLs: {1, 2, NULL} counts 2, an
    all-NULL key counts 0 (the naive plan agrees)."""
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, None), (2, None), (2, None)],
        "k int, v int",
    )
    mine = {r["k"]: r["n_distinct"] for r in skew_count_distinct(
        df, ["k"], "v").collect()}
    naive = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.countDistinct("v").alias("n")).collect()}
    assert mine == naive == {1: 2, 2: 0}


def test_partitioned_write_prunes_partitions(spark, tmp_path, testdata_dir):
    """Hive-style partitionBy(day) layout: a day-filtered read must show
    non-empty PartitionFilters at the scan (directories skipped outright),
    with the filter absent from the post-scan data filters."""
    ev = spark.read.parquet(f"{testdata_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    out = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(out)

    days = [r["day"] for r in spark.read.parquet(out).select("day").distinct()
            .orderBy("day").limit(2).collect()]
    q = spark.read.parquet(out).filter(F.col("day") == days[0])
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and not any("PartitionFilters: []" in ln for ln in pf), plan
    # and the pruned read returns exactly that day's rows
    batch = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    assert q.count() == batch.filter(F.col("day") == days[0]).count()


def test_zorder_layout_shrinks_file_footprints(spark, tmp_path):
    """Z-ordered files must carry tight min/max stats on BOTH interleaved
    columns (the data-skipping payoff), unlike a single-column sort which
    leaves the secondary column at full range in every file."""
    import glob

    import pyarrow.parquet as pq

    from routing_algorithm_for_graph_dbs_spark.sources.zorder import write_zordered

    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    zdir = str(tmp_path / "zpart")
    kdir = str(tmp_path / "kpart")
    write_zordered(part, zdir, ["p_partkey", "p_size"], n_files=8)
    (
        part.repartitionByRange(8, "p_partkey")
        .sortWithinPartitions("p_partkey")
        .write.mode("overwrite")
        .parquet(kdir)
    )

    def mean_span(path, col):
        spans = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.read_metadata(f)
            lo = hi = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                spans.append(hi - lo)
        return sum(spans) / len(spans)

    lo, hi = part.agg(F.min("p_size"), F.max("p_size")).first()
    size_range = hi - lo
    # single-column sort: p_size spans ~the full range in every file
    assert mean_span(kdir, "p_size") > 0.8 * size_range
    # z-order: the secondary column's footprint shrinks decisively
    assert mean_span(zdir, "p_size") < 0.6 * size_range
    # and the primary column still has sub-global locality
    klo, khi = part.agg(F.min("p_partkey"), F.max("p_partkey")).first()
    assert mean_span(zdir, "p_partkey") < 0.8 * (khi - klo)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from routing_algorithm_for_graph_dbs_spark.sources.zorder import compact_parquet

    src = str(tmp_path / "frag")
    df = spark.range(10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)  # 64 tiny files
    before = sorted(map(tuple, spark.read.parquet(src).collect()))

    stats = compact_parquet(spark, src, target_mb=128)
    assert stats["files_before"] == 64
    assert stats["files_after"] < 8  # tiny data -> one-ish file
    after = sorted(map(tuple, spark.read.parquet(src).collect()))
    assert after == before  # content identical

    # sorted compaction restores clustering
    stats2 = compact_parquet(spark, src, target_mb=128, sort_cols=["id"])
    assert sorted(map(tuple, spark.read.parquet(src).collect())) == before
    assert stats2["files_after"] >= 1


# ---------- JSONL interchange ----------


def test_jsonl_roundtrip_schema_and_content(spark, tmp_path, testdata_dir):
    from routing_algorithm_for_graph_dbs_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(
        spark,
        out,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    assert back.schema == docs.select(*back.columns).schema
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_jsonl_partitioned_write_prunes(spark, tmp_path, testdata_dir):
    """An equality filter on the partition column must read only that
    partition's files — pruning happens at planning time, same contract
    as the parquet layout."""
    from routing_algorithm_for_graph_dbs_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )

    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet")
    out = str(tmp_path / "docs_by_source")
    write_jsonl(docs, out, partition_by=["source"])
    schema = "doc_id bigint, text string, lang string, n_chars bigint, source string"
    back = read_jsonl(spark, out, schema)
    src = docs.select("source").orderBy("source").first()["source"]
    one = back.filter(F.col("source") == src)
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and not any("PartitionFilters: []" in ln for ln in pf), plan
    assert one.count() == docs.filter(F.col("source") == src).count()


def test_jsonl_corrupt_lines_quarantine(spark, tmp_path):
    from routing_algorithm_for_graph_dbs_spark.sources.jsonl import (
        corrupt_line_stats,
        read_jsonl,
    )

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id bigint, text string", keep_corrupt=True)
    clean, bad = corrupt_line_stats(df)
    assert (clean, bad) == (2, 1)
    kept = {r["doc_id"] for r in df.filter(F.col("_corrupt_record").isNull()).collect()}
    assert kept == {1, 2}


def test_jsonl_to_parquet_ingestion(spark, tmp_path, testdata_dir):
    from routing_algorithm_for_graph_dbs_spark.sources.jsonl import (
        jsonl_to_parquet,
        write_jsonl,
    )

    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    j = str(tmp_path / "ingest_jsonl")
    pq = str(tmp_path / "ingest_parquet")
    write_jsonl(docs, j)
    jsonl_to_parquet(
        spark, j, pq, "doc_id bigint, text string, source string",
        partition_by=["source"],
    )
    back = spark.read.parquet(pq)
    assert back.count() == docs.count()
    src = docs.select("source").orderBy("source").first()["source"]
    one = back.filter(F.col("source") == src)
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and not any("PartitionFilters: []" in ln for ln in pf), plan


# ---------------------------------------------------------------- bloom join


@pytest.fixture(scope="module")
def bloom_sides(spark):
    # fact with 10k rows over 1000 keys; dim keeps 30 of them -> a
    # selective join where most fact rows can never match
    fact = spark.range(0, 10_000).select(
        (F.col("id") % 1000).alias("fk"), (F.col("id") % 7).alias("val")
    )
    dim = spark.range(0, 30).select(
        (F.col("id") * 33).alias("fk"), F.lit("d").alias("tag")
    )
    return fact.persist(), dim.persist()


def test_bloom_prefilter_join_matches_plain_join(spark, bloom_sides):
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        bloom_prefilter_join,
    )

    fact, dim = bloom_sides
    for how in ("inner", "left_semi"):
        mine = sorted(
            map(tuple, bloom_prefilter_join(fact, dim, ["fk"], how=how).collect())
        )
        plain = sorted(map(tuple, fact.join(dim, "fk", how).collect()))
        assert mine == plain, how


def test_bloom_prefilter_join_exact_under_heavy_false_positives(spark, bloom_sides):
    # an undersized filter (64 bits for 30 keys) false-positives wildly;
    # the trailing exact join must still produce the plain-join result
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        bloom_prefilter_join,
    )

    fact, dim = bloom_sides
    mine = sorted(
        map(tuple, bloom_prefilter_join(fact, dim, ["fk"], m_bits=64, k=2).collect())
    )
    plain = sorted(map(tuple, fact.join(dim, "fk").collect()))
    assert mine == plain


def test_bloom_filter_no_false_negatives_and_prunes(spark, bloom_sides):
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        bloom_filter_keys,
        build_key_bloom,
    )

    fact, dim = bloom_sides
    bloom = build_key_bloom(dim, ["fk"])
    kept = bloom_filter_keys(fact, ["fk"], bloom)
    kept_keys = {r["fk"] for r in kept.select("fk").distinct().collect()}
    dim_keys = {r["fk"] for r in dim.collect()}
    fact_keys = {r["fk"] for r in fact.select("fk").distinct().collect()}
    # recall 1.0: every key actually in the dim survives the filter
    assert dim_keys & fact_keys <= kept_keys
    # and the filter genuinely prunes (2^18 bits / 30 keys -> FP ~ 0)
    assert kept.count() < fact.count() / 10


def test_bloom_filter_runs_before_join_exchange(spark, bloom_sides):
    # the membership predicate must sit in the fact scan's stage, below
    # the join's shuffle — that placement IS the operator's value at scale
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        bloom_prefilter_join,
    )

    fact, dim = bloom_sides
    joined = bloom_prefilter_join(fact.hint("merge"), dim, ["fk"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    ex = plan.find("Exchange")
    flt = plan.find("xxhash64")
    assert ex != -1 and flt != -1
    assert flt > ex or "Exchange" not in plan[:flt], plan


def test_bloom_prefilter_join_rejects_outer(spark, bloom_sides):
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        bloom_prefilter_join,
    )

    fact, dim = bloom_sides
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefilter_join(fact, dim, ["fk"], how="left")


# ------------------------------------------------------------------- ORC


def test_orc_roundtrip_schema_and_content(spark, tmp_path, testdata_dir):
    # format coverage: the engine's relations round-trip through ORC
    # (Spark-native columnar alternative to parquet) with schema intact
    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet").limit(200)
    out = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == docs.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_orc_predicate_pushdown(spark, tmp_path, testdata_dir):
    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet").limit(200)
    out = str(tmp_path / "docs_orc_pd")
    docs.write.mode("overwrite").orc(out)
    plan = (
        spark.read.orc(out)
        .filter("n_chars > 100")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_chars" in plan.split("PushedFilters")[1][:200]


# -------------------------------------------------------- key overlap


def test_estimate_key_overlap_exact_below_sketch_threshold(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        estimate_key_overlap,
    )

    # 300 left keys (0..299), 200 right keys (200..399): inter=100,
    # union=400 — all below theta's 4096 nominal entries, so EXACT
    left = spark.range(0, 300).select(F.col("id").alias("k"))
    right = spark.range(200, 400).select(F.col("id").alias("k"))
    row = estimate_key_overlap(left, right, ["k"]).collect()[0]
    assert round(row["inter_est"]) == 100
    assert round(row["union_est"]) == 400
    assert round(row["left_only_est"]) == 200
    assert round(row["right_only_est"]) == 100


def test_estimate_key_overlap_multicolumn_and_duplicates(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        estimate_key_overlap,
    )

    # duplicates must not inflate the DISTINCT estimates; composite keys
    # hash to one lane
    left = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c")], "k long, s string"
    )
    right = spark.createDataFrame(
        [(2, "b"), (2, "b"), (9, "z")], "k long, s string"
    )
    row = estimate_key_overlap(left, right, ["k", "s"]).collect()[0]
    assert round(row["inter_est"]) == 1
    assert round(row["union_est"]) == 4
    assert round(row["left_only_est"]) == 2
    assert round(row["right_only_est"]) == 1


def test_estimate_key_overlap_tolerance_above_threshold(spark):
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        estimate_key_overlap,
    )

    # 40k vs 30k overlapping ranges: estimate mode; ~2.6% 2σ error at
    # lgK=12 — assert within 5% of truth
    left = spark.range(0, 40_000).select(F.col("id").alias("k"))
    right = spark.range(20_000, 50_000).select(F.col("id").alias("k"))
    row = estimate_key_overlap(left, right, ["k"]).collect()[0]
    assert abs(row["inter_est"] - 20_000) < 1_000
    assert abs(row["union_est"] - 50_000) < 2_500


# ------------------------------------------------------------ AQE skew join


def test_aqe_splits_skewed_join_partition(spark):
    """The skew story this repo tells is two-part: salting/two-stage
    shapes for aggregations AQE can't rewrite (operators/skew.py), and
    AQE's runtime skew-join split for plain joins. This locks the second
    claim with evidence: a 75%-hot-key sort-merge join re-plans with a
    skew=true partition split in the FINAL adaptive plan. Thresholds are
    lowered only to make a test-sized dataset look skewed; the session's
    production confs keep the defaults."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 150_000, 0)
            .otherwise(F.col("id") % 97 + 1)
            .alias("k"),
            F.concat(F.lit("x" * 60), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(0, 98).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200_000  # hot key matches dim key 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

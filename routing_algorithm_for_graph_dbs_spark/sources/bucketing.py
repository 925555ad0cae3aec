"""Bucketed table layout: pre-shuffled storage for co-located joins.

The 100 TB join story: a fact-to-fact equi-join (orders x lineitem on
orderkey) shuffles BOTH sides every query. Writing each side bucketed on
the join key moves that shuffle to write time, once — every subsequent
join (and groupBy on the key) reads co-located buckets and skips the
exchange entirely. This is Spark's native bucketing (`DataFrameWriter
.bucketBy` + a saveAsTable catalog entry); the plan-hygiene test asserts
the join compiles with NO shuffle exchange on either side.

Bucket count is a layout-time decision: aim for 100-200 MB per bucket at
the target scale (buckets are the parallelism floor for every downstream
join — too few serializes, too many makes small files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) managed
    table. Sorting within buckets additionally enables shuffle-AND-sort-
    free sort-merge joins."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with the SAME bucket column and
    count. Catalyst recognizes the matching output partitionings and plans
    the join with zero Exchange operators (assert with
    ``assert_no_shuffle``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle exchange — the
    machine-checkable definition of "this join is co-located"."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan:
        raise AssertionError(
            "plan contains a shuffle exchange; expected co-located buckets:\n"
            + plan
        )

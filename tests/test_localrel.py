"""functions/localrel.py — JVM local relations must be value- and
type-identical to the createDataFrame path they replace (round-14
optimization: the routing pipelines build lane seeds / candidate join
sides / OD tables through it)."""

import pytest
from pyspark.sql import Row

from routing_algorithm_for_graph_dbs_spark.functions.localrel import local_rows_df


@pytest.fixture(scope="module")
def spark():
    from routing_algorithm_for_graph_dbs_spark.session import get_spark

    return get_spark(app_name="test_localrel", cpus=2)


def _same(spark, rows, schema):
    a = local_rows_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    # names and types must match exactly; nullability may be TIGHTER on the
    # VALUES path (LocalRelation proves non-null when no NULL appears),
    # which every consumer accepts
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ], (a.schema, b.schema)
    key = lambda t: tuple(map(repr, t))  # noqa: E731 — None sorts don't
    assert sorted(map(tuple, a.collect()), key=key) == sorted(
        map(tuple, b.collect()), key=key
    )


def test_strings_and_longs(spark):
    _same(
        spark,
        [("R8_T79#4", 50700), ("plain", 0), ("", -3)],
        "stoptime_id string, departure_s bigint",
    )


def test_quote_and_backslash_escaping(spark):
    _same(
        spark,
        [("O'Hare", 1), ('he said "hi"', 2), ("back\\slash", 3), ("new\nline", 4)],
        "name string, n int",
    )


def test_doubles_roundtrip_exactly(spark):
    vals = [(0.1 + 0.2,), (1e-300,), (-1.5,), (12345.0,)]
    df = local_rows_df(spark, vals, "x double")
    assert sorted(r["x"] for r in df.collect()) == sorted(v for (v,) in vals)
    # an integral-valued float must stay DOUBLE, not collapse to int
    assert df.schema["x"].dataType.simpleString() == "double"


def test_nulls_and_booleans(spark):
    _same(
        spark,
        [("a", None, True), (None, 7, False), ("b", 9, None)],
        "s string, n bigint, f boolean",
    )


def test_empty_falls_back(spark):
    df = local_rows_df(spark, [], "a string, b bigint")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_unsupported_type_falls_back(spark):
    rows = [([1, 2],), ([3],)]
    df = local_rows_df(spark, rows, "xs array<int>")
    assert sorted(tuple(r["xs"]) for r in df.collect()) == [(1, 2), (3,)]


def test_is_local_relation(spark):
    """The whole point: the plan must be a LocalRelation/LocalTableScan,
    not a Python-RDD-backed ExistingRDD."""
    df = local_rows_df(spark, [("x", 1)], "a string, b bigint")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan, plan

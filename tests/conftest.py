from __future__ import annotations

import os

import pytest

FIXTURE_GTFS = os.path.join(os.path.dirname(__file__), "fixtures", "gtfs")


@pytest.fixture(scope="session")
def spark():
    from routing_algorithm_for_graph_dbs_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def gtfs(spark):
    from routing_algorithm_for_graph_dbs_spark.sources.gtfs import read_gtfs

    return read_gtfs(spark, FIXTURE_GTFS)


@pytest.fixture(scope="session")
def testdata_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

"""Snapshot `explain("formatted")` for the queries the round-14
optimization touches, into plans/r14/<query>_<tag>.txt (tag = before/after).

Usage: python tools/dump_r14_plans.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.driver_surface import QUERIES  # noqa: E402
from routing_algorithm_for_graph_dbs_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "plans", "r14")

# bench-harness workloads (not in QUERIES) get a builder here
def _routing_one_pair(spark, sf_dir):
    from bench import _reference_scale_graph
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing

    _, g = _reference_scale_graph(spark)
    return routing(g, time_s=14 * 3600, source_stop_name="Stop 948",
                   target_stop_name="Stop 921")


def _routing_batch(spark, sf_dir):
    from bench import _reference_scale_graph
    from routing_algorithm_for_graph_dbs_spark.plans.routing import routing_batch
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import od_pairs_9

    _, g = _reference_scale_graph(spark)
    return routing_batch(g, od_pairs_9(), time_s=14 * 3600)


def _find_near_one(spark, sf_dir):
    import bench
    from bench import _reference_scale_graph
    from routing_algorithm_for_graph_dbs_spark.operators.queries import find_near_stops
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import (
        _GRID, _LAT0, _LON0, _STEP,
    )

    tables, _ = _reference_scale_graph(spark)
    return find_near_stops(
        tables, "2024-01-18", _LAT0 + 3 * _STEP, _LON0 + 5 * _STEP, 300.0,
        day_st=bench._GRAPH_MEMO["active_stops"],
    )


def _find_near_batch(spark, sf_dir):
    import bench
    from bench import _reference_scale_graph
    from routing_algorithm_for_graph_dbs_spark.operators.queries import (
        find_near_stops_batch,
    )
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import (
        _GRID, _LAT0, _LON0, _STEP,
    )

    tables, _ = _reference_scale_graph(spark)
    points = [
        (_LAT0 + (i * 3 % _GRID) * _STEP, _LON0 + (i * 5 % _GRID) * _STEP)
        for i in range(9)
    ]
    return find_near_stops_batch(
        tables, "2024-01-18", points, 300.0,
        day_st=bench._GRAPH_MEMO["active_stops"],
    )


EXTRA = {
    "routing_one_pair": _routing_one_pair,
    "routing_batch": _routing_batch,
    "find_near_one": _find_near_one,
    "find_near_batch": _find_near_batch,
}

DEFAULT = [
    "routing_one_pair",
    "routing_batch",
    "find_near_one",
    "find_near_batch",
    "graph_bfs_hops",
    "dd_canonical",
    "sem_dedup",
    "dd_decontaminate",
    "txt_repetition",
    "j1_join_chain",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="dump_r14_plans")
    for name in names:
        fn = EXTRA.get(name) or QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

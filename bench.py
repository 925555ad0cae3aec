"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query materializes fully through the noop sink (computes every output
column — .count() would let Catalyst prune the work). One warmup pass
(catalog/code-gen caches), then one timed pass, mirroring how the reference's
stored timings exclude driver connection setup (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from routing_algorithm_for_graph_dbs_spark.driver_surface import QUERIES
from routing_algorithm_for_graph_dbs_spark.session import get_spark

HEADLINE = [
    "j1_join_chain",        # 5-hop broadcast join chain + agg
    "w1_lead_consecutive",  # PRECEDES-shape window over the fact table
    "j5_earliest_transfer", # CHANGE-shape theta join + rank
    "j4_band_selfjoin",     # banded distance self-join (WALK_TO shape)
    "a1_a2_aggregates",     # grouped aggregates
    "t1_t2_topk",           # top-k
    "st_tumbling_window",   # event-time windows
    "st_sessionization",    # session windows
    "dd_exact_dedup",       # hash dedup
    "dd_minhash_sig",       # minhash signatures
    "txt_language_id",      # regex-heavy text scan
    "sim_cosine_topk",      # embedding similarity scan
    "graph_bfs_hops",       # iterative SSSP kernel
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        _materialize(fn(spark, sf_dir))  # warmup
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""sf0.1 -> sf1.0 wall-time scaling curve for the headline queries
(round 10, VERDICT r9 #5).

Correctness is proven at sf1.0 (CORRECTNESS_local_sf1.0); this records
how the HEADLINE wall times actually scale across the 10x data step —
the one measured curve the 100x story was missing. Uses the bench
harness's discipline (warmup pass, min of N timed passes, noop-sink
materialization) on local[32]. ``routing_9od_batch`` is excluded: its
scale knob is the synthetic GTFS feed, not the sf tables, and its 4x
record lives in SCALE.md's routing sections.

Exponent: alpha = log10(t_sf1 / t_sf0.1) — alpha = 1 is linear scaling
across the 10x step; alpha < 1 means fixed per-job overhead still
dominates at these sizes.

    python tools/bench_sf_curve.py [sf0.1_dir] [sf1.0_dir] [query ...]

Round 12 (VERDICT r11 #3): the curve had only ever run on the
similarity/graph headliners; trailing query names select any registered
query, and the default set now includes the §2 relational headliners
(j1/w1/j4/j5) the 100x question is actually about. The routing lane's
10x point comes from tools/scale_routing.py SCALE_MULT=10 (its scale
knob is the synthetic GTFS feed, not the sf tables).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.driver_surface import QUERIES
from routing_algorithm_for_graph_dbs_spark.session import get_spark

HEADLINE = [
    "sem_dedup", "knn_ivf_join", "graph_bfs_hops", "dd_canonical",
    "j1_join_chain", "w1_lead_consecutive", "j4_band_selfjoin",
    "j5_earliest_transfer",
]


def main() -> None:
    lo_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hi_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/synth_sf1.0"
    names = sys.argv[3:] or HEADLINE
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(app_name="bench_sf_curve")

    def timed(fn, sf_dir):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        return min(runs), runs

    out = {"metric": "bench_sf_curve", "sf_lo": 0.1, "sf_hi": 1.0,
           "runs_per_point": n_runs, "queries": {}}
    for name in names:
        lo, lo_runs = timed(QUERIES[name], lo_dir)
        hi, hi_runs = timed(QUERIES[name], hi_dir)
        out["queries"][name] = {
            "sf0.1_s": lo,
            "sf1.0_s": hi,
            "ratio_10x_data": round(hi / lo, 2),
            "alpha": round(math.log10(hi / lo), 2),
            "spread": {"sf0.1": lo_runs, "sf1.0": hi_runs},
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

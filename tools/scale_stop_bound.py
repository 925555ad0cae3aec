"""Stop-bound per-pair apportionment at its DESIGN regime (round 11).

VERDICT r10 #2: round 10 replaced the single global coarsening bucket
with per-pair budget apportionment (graph/stop_bound.py — cheap pairs
keep exact keys, heavy pairs coarsen individually), but the only
evidence was synthetic unit tests; the recorded 4x routing run predates
it and its quotient (~4.4M rows) never crossed the 20M-row cap. This
driver builds a feed whose EXACT stop-level quotient exceeds
``AUTO_BUCKET_TARGET_ROWS``, so the auto-sizing genuinely takes the
apportionment path, then measures what the verdict asked for:

1. the apportionment telemetry from a real run
   (``LAST_AUTO_EXACT_PAIRS`` / ``LAST_AUTO_COARSE_PAIRS`` /
   ``LAST_AUTO_BUCKET_S`` / clamp flag);
2. prune efficacy vs the exact bound: over the 9-OD harness's real
   (lane, target) candidate sets — the same construction as
   plans/routing._run_pairs (minItems-per-line sources, all
   departure-feasible target stoptimes) — the apportioned certificate
   must prove-unreachable at least 90% of what the exact certificate
   proves;
3. soundness cross-check: every pair the apportioned bound prunes must
   ALSO be pruned by the exact bound (keys round UP -> labels can only
   DECREASE -> coarse prunes are a subset; asserting it catches a
   rounding-direction regression at data volume).

Prints one JSON line; the recorded run lives in SCALE.md. Run:

    SPARK_GRAFT_DRIVER_MEM=24g python tools/scale_stop_bound.py
    SCALE_MULT=32 ... python tools/scale_stop_bound.py   # bigger feed

(The quotient grows ~linearly with trips_per_route: measured 849,230
rows at 1x, so the default 28x lands ~24M — above the 20M cap with
margin; 20x measured just under.)
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.session import get_spark


def main() -> None:
    mult = float(os.environ.get("SCALE_MULT", "28"))
    # NOT `from ...graph import stop_bound` — module-global telemetry
    # must be read off the real module object (memory: graph/__init__
    # re-exports shadow module names)
    sb = importlib.import_module(
        "routing_algorithm_for_graph_dbs_spark.graph.stop_bound"
    )
    from pyspark.sql import functions as F

    from routing_algorithm_for_graph_dbs_spark.plans.projection import project_graph
    from routing_algorithm_for_graph_dbs_spark.plans.routing import _pick_sources
    from routing_algorithm_for_graph_dbs_spark.sources.synth_gtfs import (
        od_pairs_9,
        synth_gtfs,
    )

    spark = get_spark(app_name="scale-stop-bound")

    t0 = time.perf_counter()
    tables = synth_gtfs(spark, trips_per_route=int(140 * mult))
    g = project_graph(tables, "2024-01-18", speed=1.0, name="scale_stop_bound")
    n_edges = g.edges.count()
    t_projection = round(time.perf_counter() - t0, 1)

    # --- apportioned (auto) bound: must take the per-pair path
    t0 = time.perf_counter()
    data_auto = sb.timetable_bound_data(g)  # bucket_s=None
    t_auto = round(time.perf_counter() - t0, 1)
    telemetry = {
        "bucket_s_max": sb.LAST_AUTO_BUCKET_S,
        "exact_pairs": sb.LAST_AUTO_EXACT_PAIRS,
        "coarse_pairs": sb.LAST_AUTO_COARSE_PAIRS,
        "clamped": sb.LAST_AUTO_BUCKET_CLAMPED,
    }
    assert telemetry["coarse_pairs"] > 0, (
        "auto sizing never coarsened — the quotient did not cross"
        f" AUTO_BUCKET_TARGET_ROWS; raise SCALE_MULT (telemetry={telemetry})"
    )
    auto_rows = sum(
        len(keys) for lst in data_auto[0].values() for _, keys, _ in lst
    )

    # --- exact bound (bucket_s=0 forces the full quotient collect)
    t0 = time.perf_counter()
    data_exact = sb.timetable_bound_data(g, bucket_s=0)
    t_exact = round(time.perf_counter() - t0, 1)
    exact_rows = sum(
        len(keys) for lst in data_exact[0].values() for _, keys, _ in lst
    )
    assert exact_rows > sb.AUTO_BUCKET_TARGET_ROWS, (
        f"exact quotient {exact_rows} rows does not exceed the"
        f" {sb.AUTO_BUCKET_TARGET_ROWS} cap; raise SCALE_MULT"
    )

    # --- the 9-OD harness's real candidate sets (plans/routing shapes)
    time_s, max_duration_h = 14 * 3600, 4
    end_s = time_s + max_duration_h * 3600
    day_st = g.stoptimes
    lanes: list[tuple[str, int]] = []
    lane_targets: list[tuple[int, str, int, str, float]] = []
    for pair_id, (src_name, dst_name) in enumerate(od_pairs_9()):
        srcs = _pick_sources(
            day_st.filter(
                (F.col("stop_name") == src_name)
                & (F.col("departure_s") > time_s)
            )
        ).select("stop_id", "departure_s").collect()
        tgts = (
            day_st.filter(
                (F.col("stop_name") == dst_name)
                & (F.col("departure_s") < end_s)
            )
            .select("stop_id", "departure_s", "arrival_s")
            .collect()
        )
        for s in srcs:
            lanes.append((s["stop_id"], int(s["departure_s"])))
            for t in tgts:
                if t["departure_s"] > s["departure_s"]:
                    lane_targets.append(
                        (
                            pair_id,
                            s["stop_id"],
                            int(s["departure_s"]),
                            t["stop_id"],
                            float(t["arrival_s"]),
                        )
                    )

    def prune_set(data) -> set:
        labels = {
            (stop, dep): sb._spfa(data, stop, dep) for stop, dep in set(lanes)
        }
        assert all(v is not None for v in labels.values()), "SPFA cap hit"
        bounds = (labels, data[1])
        return {
            i
            for i, (_pid, ss, sd, ts, ta) in enumerate(lane_targets)
            if sb.provably_unreachable(bounds, ss, sd, ts, ta)
        }

    t0 = time.perf_counter()
    pruned_exact = prune_set(data_exact)
    pruned_auto = prune_set(data_auto)
    t_spfa = round(time.perf_counter() - t0, 1)

    unsound = pruned_auto - pruned_exact
    assert not unsound, (
        f"{len(unsound)} targets pruned by the APPORTIONED bound but not"
        " the exact one — coarsening must round keys UP (weaker bound)"
    )
    efficacy = (
        len(pruned_auto & pruned_exact) / len(pruned_exact)
        if pruned_exact
        else 1.0
    )
    assert len(pruned_exact) > 0, "probe found nothing to prune — not a test"
    assert efficacy >= 0.9, (
        f"apportioned prune efficacy {efficacy:.3f} < 0.9 of exact"
    )

    print(
        json.dumps(
            {
                "metric": "scale_stop_bound",
                "scale_mult": mult,
                "edges": n_edges,
                "t_projection_s": t_projection,
                "quotient_rows_exact": exact_rows,
                "quotient_rows_apportioned": auto_rows,
                "auto_target_rows": sb.AUTO_BUCKET_TARGET_ROWS,
                "telemetry": telemetry,
                "t_bound_apportioned_s": t_auto,
                "t_bound_exact_s": t_exact,
                "t_spfa_probe_s": t_spfa,
                "n_lanes": len(set(lanes)),
                "n_lane_targets": len(lane_targets),
                "pruned_exact": len(pruned_exact),
                "pruned_apportioned": len(pruned_auto),
                "prune_efficacy": round(efficacy, 4),
                "unsound_prunes": 0,
            }
        )
    )


if __name__ == "__main__":
    main()

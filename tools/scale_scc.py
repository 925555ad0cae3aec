"""Scale-validation for the iterative SCC tier (round-5 kernel).

The testdata graphs are tiny, and local-tier Tarjan can't check the
iterative tier at the scale where the dispatcher actually picks it
(> LOCAL_EDGE_LIMIT = 5M edges). So this driver builds a directed graph
with PROVABLE SCC structure by construction, big enough to force the
iterative FW-BW tier, and asserts exact agreement with the closed-form
answer:

- N nodes in K = N/L directed cycles of length L: cycle c owns nodes
  [c*L, (c+1)*L), each node points to its cyclic successor. Every cycle
  is one SCC whose canonical label is its min node, c*L.
- Cross edges only ever point "forward" in cycle-id order (0 -> every
  cycle start, every cycle start -> last cycle's start), so they form a
  DAG between cycles and can never merge SCCs — the ground truth stays
  scc(node) = (node // L) * L, provable without running any reference
  implementation.

The hub shape also keeps the FW-BW phase count small (~3: the global-min
cycle peels first, then every interior cycle in one parallel phase, then
the sink cycle), so the run exercises deep per-phase propagation (L
rounds around each cycle) without degenerating into thousands of phases.

Prints one JSON line; the recorded run lives in SCALE.md. Run:

    SCC_NODES=5000000 SCC_CYCLE_LEN=10 python tools/scale_scc.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.session import get_spark


def main() -> None:
    n = int(os.environ.get("SCC_NODES", "5000000"))
    cl = int(os.environ.get("SCC_CYCLE_LEN", "10"))
    assert n % cl == 0, "SCC_NODES must be a multiple of SCC_CYCLE_LEN"
    k = n // cl

    from pyspark.sql import functions as F

    from routing_algorithm_for_graph_dbs_spark.graph.scc import (
        LOCAL_EDGE_LIMIT,
        strongly_connected_components,
    )

    spark = get_spark(app_name="scale_scc")

    ids = spark.range(0, n).select(F.col("id").alias("node"))
    cyc = ids.select(
        F.col("node").alias("src"),
        (
            (F.col("node") - (F.col("node") % cl))
            + ((F.col("node") % cl) + 1) % cl
        ).alias("dst"),
    )
    starts = spark.range(1, k).select((F.col("id") * cl).alias("s"))
    hub_out = starts.select(F.lit(0).alias("src"), F.col("s").alias("dst"))
    hub_in = starts.filter(F.col("s") < (k - 1) * cl).select(
        F.col("s").alias("src"), F.lit((k - 1) * cl).alias("dst")
    )
    edges = cyc.unionByName(hub_out).unionByName(hub_in).persist()
    n_edges = edges.count()
    assert n_edges > LOCAL_EDGE_LIMIT, (
        f"{n_edges} edges does not force the iterative tier"
        f" (limit {LOCAL_EDGE_LIMIT}); raise SCC_NODES"
    )

    t0 = time.time()
    scc = strongly_connected_components(edges, strategy="iterative")
    expected = (F.col("node") - (F.col("node") % cl)).alias("want")
    mism = scc.filter(F.col("scc") != expected).count()
    n_out = scc.count()
    t1 = time.time()

    print(
        json.dumps(
            {
                "metric": "scale_scc",
                "nodes": n,
                "edges": n_edges,
                "cycle_len": cl,
                "n_sccs_expected": k,
                "local_edge_limit": LOCAL_EDGE_LIMIT,
                "tier": "iterative (forced; auto would pick it too)",
                "rows_out": n_out,
                "mismatches": mism,
                "exact_match": bool(mism == 0 and n_out == n),
                "t_scc_s": round(t1 - t0, 1),
            }
        )
    )
    edges.unpersist()


if __name__ == "__main__":
    main()

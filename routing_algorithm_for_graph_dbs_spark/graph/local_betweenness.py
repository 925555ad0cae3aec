"""Broadcast-graph Brandes betweenness: the fast tier for city-scale graphs.

Parity target: ``gds.betweenness.stream`` (reference ``main.py:46-60``),
which runs multi-threaded exact Brandes inside the Neo4j JVM. Same
translation as local_sssp: broadcast the CSR once, make each SOURCE's
single-source Brandes pass an independent task — exact betweenness
parallelizes over all vertices, sampled betweenness over the sample (the
standard Brandes/Pich approximation: scores scale by n/k, callers opt in by
passing sources). Partial dependency vectors are summed with one groupBy —
the only shuffle.

The iterative lane-parallel DataFrame Brandes (graph/betweenness.py) remains
the tier for graphs beyond single-executor memory; the ``betweenness``
dispatcher in graph/betweenness.py picks like sssp() does.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from routing_algorithm_for_graph_dbs_spark.graph.local_sssp import _decoded, _prepare


def _brandes_source(g: dict, s: int) -> np.ndarray:
    """Single-source dependency vector (Brandes 2001, unweighted directed)."""
    indptr, nbr = g["indptr"], g["nbr"]
    n = len(indptr) - 1
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n)
    delta = np.zeros(n)
    dist[s] = 0
    sigma[s] = 1.0
    order = []
    q = deque([s])
    while q:
        u = q.popleft()
        order.append(u)
        for j in range(indptr[u], indptr[u + 1]):
            v = nbr[j]
            if dist[v] < 0:
                dist[v] = dist[u] + 1
                q.append(v)
            if dist[v] == dist[u] + 1:
                sigma[v] += sigma[u]
    for u in reversed(order):
        du, su = dist[u], sigma[u]
        for j in range(indptr[u], indptr[u + 1]):
            v = nbr[j]
            if dist[v] == du + 1:
                delta[u] += (su / sigma[v]) * (1.0 + delta[v])
    delta[s] = 0.0
    return delta


def broadcast_betweenness(
    edges: DataFrame,
    sources: DataFrame | None = None,
) -> DataFrame:
    """(node, score) summed over the given source set (all vertices if None
    — exact Brandes). One task per source batch; tasks share the broadcast
    CSR; one shuffle to sum partials."""
    spark = edges.sparkSession
    # weight_col=None = unweighted+deduped inside _prepare, cached against
    # the ORIGINAL edges DataFrame so the 2nd..nth call pays zero prep
    bc = _prepare(edges, None)

    verts = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    src_nodes = (
        verts
        if sources is None
        else sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    )
    node_t = edges.schema["src"].dataType
    integral = isinstance(node_t, (T.LongType, T.IntegerType, T.ShortType))
    n_part = max(spark.sparkContext.defaultParallelism, 8)

    out_schema = T.StructType(
        [T.StructField("node", node_t), T.StructField("score", T.DoubleType())]
    )

    def run(pdfs):
        for pdf in pdfs:
            g = _decoded(bc.value)
            index, ids = g["index"], g["ids"]
            acc = np.zeros(len(ids))
            for s in pdf["node"]:
                si = index.get(str(s))
                if si is not None:
                    acc += _brandes_source(g, si)
            nz = np.flatnonzero(acc)
            conv = (lambda x: int(x)) if integral else (lambda x: x)
            yield pd.DataFrame(
                {"node": [conv(ids[i]) for i in nz], "score": acc[nz]}
            )

    partials = src_nodes.repartition(n_part).mapInPandas(run, schema=out_schema)
    score = partials.groupBy("node").agg(F.sum("score").alias("score"))
    return verts.join(score, "node", "left").select(
        "node", F.coalesce("score", F.lit(0.0)).alias("score")
    )
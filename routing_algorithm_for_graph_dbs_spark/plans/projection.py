"""Day-parameterized routing-graph projection (SURVEY.md §2.9 G1, §3 EP2).

Parity target: ``App.routing_graph_creation(date, speed)`` (reference
``main.py:13-22``) — a ``gds.graph.project.cypher`` call that materializes
the in-memory graph ``graph_walk``:

- **vertices** (``main.py:16``): Stoptimes valid on the day, with
  ``(id, stop_sequence, lon, lat)``.
- **edges** (``main.py:17``): ``UNION ALL`` of
  (a) CHANGE edges — for each day-valid Stoptime ``source`` (arriving at stop
      P on trip/line L): every Stoptime ``target`` of the SAME service id, on
      a different trip AND different line, located at a stop Q with a WALK_TO
      edge Q->P (WALK_TO includes the distance-0 self loop, so same-stop
      transfers exist), such that
      ``source.arrival + floor(dist(Q,P)/speed) < target.departure``;
      among candidates, per (source, Q->P walk edge, other line) only the
      earliest-departing target(s) survive (``apoc.agg.minItems`` keeps
      ties). Weight ``waiting_time = (target.departure - source.arrival) +
      floor(dist/speed)``; ``walking_time = floor(dist/speed)``.
  (b) PRECEDES edges of day-valid trips with their stored ``waiting_time``
      and ``walking_time = 0``.

Spark shape: vertices/edges are DataFrames, cached and registered in a
driver-side catalog keyed by (day, speed) — the analogue of the GDS graph
catalog (``gds.graph.list``). The CHANGE derivation is a broadcast of the
(small) WALK_TO relation against the day's Stoptimes, then a window rank —
no cartesian products; at 100 TB the stoptimes relation shuffles once on
``stop_id`` and once for the rank window.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.operators.calendar import service_day_stoptimes


@dataclass
class ProjectedGraph:
    """The engine's analogue of a GDS named graph."""

    name: str
    day: str
    speed: float
    vertices: DataFrame  # (id, stop_sequence, lon, lat)
    edges: DataFrame  # (src, dst, type, waiting_time, walking_time)
    # enrichment relation for leg decomposition (J6): stoptime attributes
    stoptimes: DataFrame = None
    # the PERSISTED day relation when ``stoptimes`` is a (narrow) coalesce
    # over it — unpersist() must release the cache itself, not the view
    day_cache: DataFrame = None

    def unpersist(self) -> None:
        for df in (self.vertices, self.edges, self.stoptimes, self.day_cache):
            if df is not None:
                df.unpersist()

    def edge_count(self) -> int:
        """Edge cardinality, counted once per graph and memoized — the
        SSSP dispatcher needs it for tier selection on EVERY kernel run,
        and re-counting a ~2M-row (cached) relation cost ~0.26 s per
        interactive routing query. The edge relation is immutable after
        projection, so the memo is sound."""
        n = getattr(self, "_edge_count", None)
        if n is None:
            n = self.edges.count()
            object.__setattr__(self, "_edge_count", n)
        return n

    def node_parts(self) -> DataFrame:
        """Spatial-cell (node, part) mapping for the SSSP iterative
        tier's partition-local relaxation (graph/partitioning.py
        spatial_node_parts) — memoized: the vertex relation is immutable
        after projection and the bounds agg should run once per graph,
        not once per kernel run."""
        np_df = getattr(self, "_node_parts", None)
        if np_df is None:
            from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
                spatial_node_parts,
            )

            np_df = spatial_node_parts(self.vertices)
            object.__setattr__(self, "_node_parts", np_df)
        return np_df


# driver-side graph catalog, parity with the GDS catalog
_CATALOG: dict[str, ProjectedGraph] = {}


def _change_sources_targets(day_stoptimes, walk_to):
    source = day_stoptimes.select(
        F.col("stoptime_id").alias("src"),
        F.col("trip_id").alias("src_trip"),
        F.col("route_id").alias("src_line"),
        F.col("service_id").alias("src_service"),
        F.col("stop_id").alias("src_stop"),
        F.col("arrival_s").alias("src_arrival"),
    )
    target = day_stoptimes.select(
        F.col("stoptime_id").alias("dst"),
        F.col("trip_id").alias("dst_trip"),
        F.col("route_id").alias("dst_line"),
        F.col("service_id").alias("dst_service"),
        F.col("stop_id").alias("dst_stop"),
        F.col("departure_s").alias("dst_departure"),
    )
    w = walk_to.select(
        F.col("src_stop_id").alias("walk_src"),
        F.col("dst_stop_id").alias("walk_dst"),
        F.col("distance").alias("walk_distance"),
    )
    return source, target, w


def _finish_change(cand, walk_secs):
    # apoc.agg.minItems groups by (source, other_line, walking_distance) in
    # the reference (main.py:17) — NOT by walk edge. The distinction only
    # matters when two walk edges out of the same stop have exactly equal
    # distance (e.g. two co-located stops): the reference keeps one earliest
    # target per DISTANCE, so we partition the rank window the same way.
    # rank (not row_number) keeps departure-time ties, as minItems does.
    sel_w = Window.partitionBy("src", "dst_line", "walk_distance").orderBy(
        "dst_departure"
    )
    return (
        cand.withColumn("rk", F.rank().over(sel_w))
        .filter(F.col("rk") == 1)
        .select(
            "src",
            "dst",
            F.lit(":CHANGE").alias("type"),
            (
                (F.col("dst_departure") - F.col("src_arrival")) + walk_secs
            ).alias("waiting_time"),
            walk_secs.alias("walking_time"),
        )
    )


def build_change_edges_naive(
    day_stoptimes: DataFrame, walk_to: DataFrame, speed: float
) -> DataFrame:
    """CHANGE edges, literal formulation (the reference's own join shape):
    every (source, walkable stop) pair against EVERY stoptime at that stop,
    then rank. O(|stoptimes| x walk-degree x stoptimes-per-stop) candidate
    rows — correct, and fine at fixture scale, but the candidate blow-up is
    the projection bottleneck at city-year scale. Kept as the semantics
    oracle for the bucketed formulation below."""
    walk_secs = F.floor(F.col("walk_distance") / F.lit(speed)).cast("long")
    source, target, w = _change_sources_targets(day_stoptimes, walk_to)
    cand = (
        source.join(F.broadcast(w), source["src_stop"] == w["walk_dst"])
        .join(target, target["dst_stop"] == F.col("walk_src"))
        .filter(
            (F.col("dst_trip") != F.col("src_trip"))
            & (F.col("dst_line") != F.col("src_line"))
            & (F.col("dst_service") == F.col("src_service"))
            & (F.col("src_arrival") + walk_secs < F.col("dst_departure"))
        )
    )
    return _finish_change(cand, walk_secs)


def build_change_edges(
    day_stoptimes: DataFrame,
    walk_to: DataFrame,
    speed: float,
    bucket_s: int = 900,
) -> DataFrame:
    """CHANGE edges per reference ``main.py:17`` — bucketed as-of-join
    formulation.

    The semantics are an as-of join: per (source stoptime, walk edge, other
    line), the earliest target departing after ``source.arrival + walk``.
    Joining every source to every stoptime at the stop (the naive shape, and
    the reference's own) makes candidate volume O(sources x walk-degree x
    stoptimes-per-stop) — at city-year scale that is 10^8 rows into a rank
    window. Instead, targets are bucketed by departure time:

    - raw targets join only within the THRESHOLD bucket (they may or may not
      clear the threshold — filtered);
    - a per-(stop, line, service, bucket) suffix-minimum row — the earliest
      target in any LATER bucket, precomputed with one window — joins for
      the threshold bucket and is by construction past the threshold.

    The union's earliest per (source, walk edge, line) equals the naive
    answer exactly (ties preserved by rank), with ~(bucket/headway + 1)
    candidates per group instead of every stoptime at the stop. Equality is
    asserted against the naive build in tests/test_projection.py.

    ``day_stoptimes``: output of service_day_stoptimes(with_route=True).
    ``walk_to``: (src_stop_id, dst_stop_id, distance) incl. self loops.
    """
    walk_secs = F.floor(F.col("walk_distance") / F.lit(speed)).cast("long")
    source, target, w = _change_sources_targets(day_stoptimes, walk_to)

    tgt_b = target.withColumn("tbucket", F.floor(F.col("dst_departure") / bucket_s))
    # no targets at all -> b0=0 flows through the normal plan and every
    # branch is empty, yielding the correct empty result
    b0 = tgt_b.agg(F.min("tbucket")).first()[0] or 0
    # earliest departure per (stop, line, service, bucket) ...
    eb = tgt_b.groupBy("dst_stop", "dst_line", "dst_service", "tbucket").agg(
        F.min("dst_departure").alias("eb_dep")
    )
    # ... densified over the full bucket range [global min, per-line max] so
    # EVERY possible source bucket finds its "next departure" row ...
    dense = (
        eb.groupBy("dst_stop", "dst_line", "dst_service")
        .agg(F.max("tbucket").alias("mx"))
        .select(
            "dst_stop",
            "dst_line",
            "dst_service",
            F.explode(F.sequence(F.lit(b0), F.col("mx"))).alias("tbucket"),
        )
        .join(eb, ["dst_stop", "dst_line", "dst_service", "tbucket"], "left")
    )
    # ... next_dep(b) = earliest departure in any bucket >= b (reverse
    # running min, includes the current bucket) ...
    sfx_w = (
        Window.partitionBy("dst_stop", "dst_line", "dst_service")
        .orderBy(F.col("tbucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = dense.withColumn("nxt_dep", F.min("eb_dep").over(sfx_w)).filter(
        F.col("nxt_dep").isNotNull()
    )
    # ... recovering every target row at that departure (rank keeps ties,
    # exactly like the naive build / the reference's minItems)
    sfx = nxt.join(
        tgt_b.select(
            F.col("dst_stop").alias("s_stop"),
            F.col("dst_line").alias("s_line"),
            F.col("dst_service").alias("s_service"),
            "dst",
            "dst_trip",
            F.col("dst_departure"),
        ),
        (F.col("s_stop") == F.col("dst_stop"))
        & (F.col("s_line") == F.col("dst_line"))
        & (F.col("s_service") == F.col("dst_service"))
        & (F.col("dst_departure") == F.col("nxt_dep")),
    ).select("dst_stop", "dst_line", "dst_service", "tbucket", "dst", "dst_trip", "dst_departure")

    src_b = (
        source.join(F.broadcast(w), source["src_stop"] == w["walk_dst"])
        .withColumn("threshold", F.col("src_arrival") + walk_secs)
        .withColumn("bucket", F.floor((F.col("src_arrival") + walk_secs) / bucket_s))
    )

    tgt_cols = ["dst_stop", "dst_line", "dst_service", "tbucket", "dst", "dst_trip", "dst_departure"]
    raw_cand = src_b.join(
        tgt_b.select(*tgt_cols),
        (F.col("dst_stop") == F.col("walk_src")) & (F.col("tbucket") == F.col("bucket")),
    )
    # the suffix branch joins on bucket+1 (clamped up to the range start):
    # its rows depart in buckets >= b+1, always past the threshold
    sfx_cand = src_b.withColumn(
        "jbucket", F.greatest(F.col("bucket") + 1, F.lit(b0))
    ).join(
        sfx,
        (F.col("dst_stop") == F.col("walk_src")) & (F.col("tbucket") == F.col("jbucket")),
    ).drop("jbucket")
    # branches are disjoint by construction: raw rows depart in bucket b,
    # suffix rows in buckets > b — no dedup needed
    cand = raw_cand.unionByName(sfx_cand).filter(
        (F.col("dst_trip") != F.col("src_trip"))
        & (F.col("dst_line") != F.col("src_line"))
        & (F.col("dst_service") == F.col("src_service"))
        & (F.col("threshold") < F.col("dst_departure"))
    )
    return _finish_change(cand, walk_secs)


def project_graph(
    tables: dict[str, DataFrame],
    day: str | dt.date,
    speed: float,
    precedes: DataFrame | None = None,
    walk_to: DataFrame | None = None,
    name: str = "graph_walk",
    cache: bool = True,
) -> ProjectedGraph:
    """Build and register the day's routing graph (parity ``main.py:13-22``).

    ``precedes``/``walk_to`` default to building from tables via
    operators.derived (at scale they are pre-built parquet, built once at ETL
    like the reference's PRECEDES/WALK_TO relationships).
    """
    from routing_algorithm_for_graph_dbs_spark.operators.derived import (
        build_precedes,
        build_walk_to,
    )

    if precedes is None:
        precedes = build_precedes(tables["stop_times"])
    if walk_to is None:
        walk_to = build_walk_to_with_self_loops(tables["stops"])

    day_st = service_day_stoptimes(tables, day, with_route=True)
    if cache:
        # persist BEFORE the CHANGE build: the bucketed as-of derivation
        # references the day's stoptimes several times (targets, bucket
        # bounds, tie recovery) and would otherwise recompute the calendar
        # join chain per reference
        day_st = day_st.persist()

    vertices = day_st.select(
        F.col("stoptime_id").alias("id"),
        "stop_sequence",
        F.col("stop_lon").alias("lon"),
        F.col("stop_lat").alias("lat"),
    )

    change = build_change_edges(day_st, walk_to, speed)

    day_trips = day_st.select("trip_id").distinct()
    prec = (
        precedes.join(F.broadcast(day_trips), "trip_id")
        .select(
            F.col("src_stoptime_id").alias("src"),
            F.col("dst_stoptime_id").alias("dst"),
            F.lit("PRECEDES").alias("type"),
            F.col("waiting_time").cast("long").alias("waiting_time"),
            F.lit(0).cast("long").alias("walking_time"),
        )
    )
    edges = change.unionByName(prec)

    stoptimes = day_st
    if cache:
        vertices = vertices.persist()
        edges = edges.persist()
        # Size the catalog-facing stoptimes relation's SCAN parallelism to
        # the data (round 14, guide §2/§6): the cached day relation arrives
        # with the session's shuffle-partition count, so every interactive
        # read — routing candidate filters, leg-decomposition joins, radius
        # probes — launched that many tasks for a few hundred KB of rows
        # (~90 ms of pure task overhead per scan on the gate box). A
        # narrow coalesce OVER the cache keeps the projection build itself
        # (which reads ``day_st`` directly) at full parallelism and adds no
        # second copy; large days keep one task per ~500k rows. The count
        # also materializes the cache before the CHANGE build re-reads it.
        n_st = day_st.count()
        from routing_algorithm_for_graph_dbs_spark.graph.partitioning import (
            EDGES_PER_PARTITION,
        )

        parts = max(1, (n_st + EDGES_PER_PARTITION - 1) // EDGES_PER_PARTITION)
        if parts < day_st.rdd.getNumPartitions():
            stoptimes = day_st.coalesce(parts)

    g = ProjectedGraph(
        name=name,
        day=str(day),
        speed=speed,
        vertices=vertices,
        edges=edges,
        stoptimes=stoptimes,
        day_cache=(day_st if cache and stoptimes is not day_st else None),
    )
    # re-projection under the same name must release the old graph's cached
    # DataFrames, or repeated day/speed changes pin orphaned storage
    old = _CATALOG.pop(name, None)
    if old is not None:
        old.unpersist()
    _CATALOG[name] = g
    return g


def build_walk_to_with_self_loops(stops: DataFrame, radius_m: float = 300.0) -> DataFrame:
    """WALK_TO incl. the distance-0 self loops the reference creates
    (``new_dbSetup.py:94-100`` has no s1<>s2 filter)."""
    from routing_algorithm_for_graph_dbs_spark.operators.derived import build_walk_to

    pairs = build_walk_to(stops, radius_m)
    self_loops = stops.select(
        F.col("stop_id").alias("src_stop_id"),
        F.col("stop_id").alias("dst_stop_id"),
        F.lit(0.0).alias("distance"),
    )
    return pairs.unionByName(self_loops)


def save_graph(g: ProjectedGraph, out_dir: str) -> None:
    """Persist a projected graph as parquet (vertices/edges/stoptimes) plus
    a metadata file — the operational path at scale: project a day ONCE at
    ETL time, then any number of routing sessions load the artifact instead
    of re-deriving CHANGE edges."""
    import json
    import os

    g.vertices.write.mode("overwrite").parquet(os.path.join(out_dir, "vertices"))
    g.edges.write.mode("overwrite").parquet(os.path.join(out_dir, "edges"))
    if g.stoptimes is not None:
        g.stoptimes.write.mode("overwrite").parquet(os.path.join(out_dir, "stoptimes"))
    with open(os.path.join(out_dir, "graph.json"), "w") as f:
        json.dump({"name": g.name, "day": g.day, "speed": g.speed}, f)


def load_graph(spark, in_dir: str, cache: bool = True) -> ProjectedGraph:
    """Load a graph saved by :func:`save_graph`, register it in the catalog
    under its saved name, and (by default) cache its relations."""
    import json
    import os

    with open(os.path.join(in_dir, "graph.json")) as f:
        meta = json.load(f)
    vertices = spark.read.parquet(os.path.join(in_dir, "vertices"))
    edges = spark.read.parquet(os.path.join(in_dir, "edges"))
    st_path = os.path.join(in_dir, "stoptimes")
    stoptimes = spark.read.parquet(st_path) if os.path.exists(st_path) else None
    if cache:
        vertices = vertices.persist()
        edges = edges.persist()
        if stoptimes is not None:
            stoptimes = stoptimes.persist()
    g = ProjectedGraph(
        name=meta["name"],
        day=meta["day"],
        speed=meta["speed"],
        vertices=vertices,
        edges=edges,
        stoptimes=stoptimes,
    )
    old = _CATALOG.pop(g.name, None)
    if old is not None:
        old.unpersist()
    _CATALOG[g.name] = g
    return g


def get_graph(name: str = "graph_walk") -> ProjectedGraph:
    return _CATALOG[name]


def drop_graph(name: str = "graph_walk") -> None:
    g = _CATALOG.pop(name, None)
    if g is not None:
        g.unpersist()


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a DataFrame's optimized plan. For a
    persisted (materialized) relation this reflects the actual cached bytes
    — the closest Spark analogue of GDS's in-memory graph size."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def graph_metrics(g: ProjectedGraph) -> dict:
    """Parity: ``gds.graph.list('graph_walk')`` metrics (reference
    ``main.py:24-44``): nodeCount, relationshipCount, degreeDistribution
    percentiles, density, and ``sizeInBytes`` (GDS reports the in-memory
    graph's memory usage; here it is the Catalyst stats estimate of the
    vertex + edge relations, which for cached graphs is the materialized
    cache size).
    """
    n = g.vertices.count()
    m = g.edges.count()
    # degrees over ALL vertices: sinks (e.g. a trip's final stoptime with no
    # feasible transfer) count as degree 0, matching gds.graph.list's
    # degreeDistribution over nodeCount nodes
    deg = (
        g.vertices.select(F.col("id").alias("src"))
        .join(g.edges.groupBy("src").count(), "src", "left")
        .select(F.coalesce("count", F.lit(0)).alias("count"))
    )
    pct = deg.select(
        F.min("count").alias("min"),
        F.expr("percentile_approx(count, 0.5)").alias("p50"),
        F.expr("percentile_approx(count, 0.75)").alias("p75"),
        F.expr("percentile_approx(count, 0.90)").alias("p90"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.max("count").alias("max"),
        F.avg("count").alias("mean"),
    ).collect()[0]
    return {
        "nodeCount": n,
        "relationshipCount": m,
        "degreeDistribution": pct.asDict(),
        "density": (m / (n * (n - 1))) if n > 1 else 0.0,
        "sizeInBytes": _plan_size_bytes(g.vertices) + _plan_size_bytes(g.edges),
    }

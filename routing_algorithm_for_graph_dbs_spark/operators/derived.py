"""Derived edge relations (SURVEY.md §2.3 J3/J4, §2.5 W1).

PRECEDES and WALK_TO are the two edge tables the reference computes (rather
than loads) at ETL time (``new_dbSetup.py:66-100``). Both are re-expressed so
the plan survives 100 TB:

- PRECEDES: the reference self-joins Stoptimes on ``stop_sequence + 1``
  (``new_dbSetup.py:66-70``). A self-join shuffles the fact table twice; a
  window ``lead() over (partition by trip_id order by stop_sequence)``
  shuffles it once and is the canonical Spark plan.
- WALK_TO: the reference runs the full O(n²) cross product with a distance
  filter (``new_dbSetup.py:94-100``) — fine at 2k stops, catastrophic at
  scale. Here: grid-cell bucketing -> equi-join on neighboring cells ->
  exact haversine filter. Work is O(n · density) instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.functions.spatial import (
    grid_cell,
    haversine_meters,
    meters_to_deg_lat,
    meters_to_deg_lon,
)


def build_precedes(stop_times: DataFrame) -> DataFrame:
    """PRECEDES edges between consecutive Stoptimes of a trip.

    Parity: reference ``new_dbSetup.py:66-74`` — edge (s1 -> s2) where
    ``s2.stop_sequence = s1.stop_sequence + 1`` with property
    ``waiting_time = duration.inSeconds(s1.departure_time, s2.arrival_time)``.

    Returns (trip_id, src_stoptime_id, dst_stoptime_id, src_stop_id,
    dst_stop_id, src_departure_s, dst_arrival_s, waiting_time).
    """
    w = Window.partitionBy("trip_id").orderBy("stop_sequence")
    return (
        stop_times.select(
            "trip_id",
            "stop_sequence",
            F.col("stoptime_id").alias("src_stoptime_id"),
            F.col("stop_id").alias("src_stop_id"),
            F.col("departure_s").alias("src_departure_s"),
            F.lead("stoptime_id").over(w).alias("dst_stoptime_id"),
            F.lead("stop_id").over(w).alias("dst_stop_id"),
            F.lead("arrival_s").over(w).alias("dst_arrival_s"),
            F.lead("stop_sequence").over(w).alias("dst_stop_sequence"),
        )
        # reference only links *consecutive* sequence numbers; GTFS sequences
        # are usually consecutive but the guard keeps exact parity.
        .filter(F.col("dst_stop_sequence") == F.col("stop_sequence") + 1)
        .withColumn("waiting_time", F.col("dst_arrival_s") - F.col("src_departure_s"))
        .drop("dst_stop_sequence")
    )


def spatial_self_join(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_m: float,
    ref_lat: float | None = None,
) -> DataFrame:
    """All ordered pairs of points within ``radius_m`` meters (grid-bucketed).

    Generic distance self-join used for WALK_TO and nearest-neighbor ops.
    Each point is assigned to one cell; the left side is replicated to its
    3x3 cell neighborhood so every pair within the radius meets in exactly
    one equi-join bucket. Returns (src_<id>, dst_<id>, distance) with
    src != dst, both directions present (the reference MERGEs an undirected
    WALK_TO but traverses it both ways).

    ``ref_lat`` sizes the longitude cell width; it defaults to the DATA's
    maximum |latitude| (one tiny agg at build time) so cells are never
    narrower than the radius anywhere in the dataset — a fixed mid-latitude
    constant would silently drop in-radius pairs for data closer to the
    poles (cells shrink with cos(lat)).
    """
    if ref_lat is None:
        row = points.agg(F.max(F.abs(F.col(lat_col))).alias("m")).first()
        ref_lat = float(row["m"]) if row and row["m"] is not None else 0.0
    dlat = meters_to_deg_lat(radius_m)
    dlon = meters_to_deg_lon(radius_m, ref_lat)

    cell = grid_cell(
        F.col(lat_col).cast("double"), F.col(lon_col).cast("double"), dlat, dlon
    )
    pts = points.select(
        F.col(id_col).alias("_pid"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        cell.getField("cy").alias("_cy"),
        cell.getField("cx").alias("_cx"),
    )

    # replicate left to the 3x3 neighborhood: 9 rows per point, constant factor
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("_pid").alias("src_id"),
        F.col("_lat").alias("src_lat"),
        F.col("_lon").alias("src_lon"),
        "_cy",
        "_cx",
        F.explode(offsets).alias("_off"),
    ).select(
        "src_id",
        "src_lat",
        "src_lon",
        (F.col("_cy") + F.col("_off.dy")).alias("_cy"),
        (F.col("_cx") + F.col("_off.dx")).alias("_cx"),
    )
    right = pts.select(
        F.col("_pid").alias("dst_id"),
        F.col("_lat").alias("dst_lat"),
        F.col("_lon").alias("dst_lon"),
        "_cy",
        "_cx",
    )

    joined = left.join(right, ["_cy", "_cx"])
    dist = haversine_meters(
        F.col("src_lat"), F.col("src_lon"), F.col("dst_lat"), F.col("dst_lon")
    )
    return (
        joined.filter(F.col("src_id") != F.col("dst_id"))
        .withColumn("distance", dist)
        .filter(F.col("distance") < radius_m)
        .select("src_id", "dst_id", "distance", "src_lat", "src_lon", "dst_lat", "dst_lon")
    )


def build_walk_to(stops: DataFrame, radius_m: float = 300.0) -> DataFrame:
    """WALK_TO edges between stops closer than ``radius_m`` (default 300 m).

    Parity: reference ``new_dbSetup.py:94-100`` (``point.distance < 300``,
    property ``distance``). Returns (src_stop_id, dst_stop_id, distance).
    """
    pairs = spatial_self_join(stops, "stop_id", "stop_lat", "stop_lon", radius_m)
    return pairs.select(
        F.col("src_id").alias("src_stop_id"),
        F.col("dst_id").alias("dst_stop_id"),
        "distance",
    )

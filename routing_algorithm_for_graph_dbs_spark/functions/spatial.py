"""Spatial column functions.

The reference uses Neo4j WGS-84 ``point({latitude, longitude})`` +
``point.distance`` (meters) — e.g. the <300 m walk-edge build
(reference ``new_dbSetup.py:94-100``) and radius stop search
(reference ``main.py:62-67``). Spark has no point type; we keep
``(lat DOUBLE, lon DOUBLE)`` columns and compute great-circle distance with
built-in math functions, which Catalyst folds into whole-stage codegen.

Neo4j's WGS-84 ``point.distance`` uses a haversine-on-sphere formula with
Earth's mean radius, so haversine here is parity, not approximation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean Earth radius, meters


def haversine_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) degree pairs.

    Pure column expression: ``2 R asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2)))``.
    """
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlmb / 2), 2)
    )
    # clamp for float noise at antipodes/identical points
    return 2 * F.lit(EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_meters_scalar(
    lat1: float, lon1: float, lat2: float, lon2: float
) -> float:
    """Driver-side scalar twin of :func:`haversine_meters` — same formula,
    same EARTH_RADIUS_M, same antipode clamp, so client-loop fallbacks
    (plans.routing.plan_trip) agree bit-for-bit with the column version."""
    import math

    phi1 = math.radians(lat1)
    phi2 = math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlmb = math.radians(lon2 - lon1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(phi1) * math.cos(phi2) * math.sin(dlmb / 2) ** 2
    )
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(min(a, 1.0)))


def grid_cell(lat: Column, lon: Column, cell_deg_lat: float, cell_deg_lon: float) -> Column:
    """Integer grid-cell id pair for bucketed spatial joins.

    Banding a distance join: a radius-r join only needs to compare points in
    the same or neighboring cells when the cell edge is >= r in degrees. This
    turns the reference's O(n²) cross-product distance join
    (``new_dbSetup.py:94-100``) into an equi-join — the 100 TB-safe plan.
    """
    return F.struct(
        F.floor(lat / F.lit(cell_deg_lat)).cast("long").alias("cy"),
        F.floor(lon / F.lit(cell_deg_lon)).cast("long").alias("cx"),
    )


def meters_to_deg_lat(meters: float) -> float:
    """Degrees of latitude spanning ``meters`` (constant on the sphere)."""
    return meters / 111_320.0


def meters_to_deg_lon(meters: float, at_lat_deg: float) -> float:
    """Degrees of longitude spanning ``meters`` at a given latitude."""
    import math

    return meters / (111_320.0 * max(math.cos(math.radians(at_lat_deg)), 1e-6))

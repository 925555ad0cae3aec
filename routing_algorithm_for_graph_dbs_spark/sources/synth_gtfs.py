"""Deterministic synthetic GTFS feed at configurable scale.

The reference's perf anchor (BASELINE.md) is a city-scale feed: transport
graph 249,052 nodes / 738,424 relationships (Tesina pp. 3-4). The driver's
synthetic tables are TPC-H-shaped, so scale benchmarking of the ROUTING
pipelines needs a GTFS-shaped generator. This one is fully deterministic
(pure column expressions over ``spark.range`` — no RNG, no driver loops, so
it generates any scale distributedly) and produces the same typed-table dict
as ``sources.gtfs.read_gtfs``.

Topology: a grid city. Stops form a ``g x g`` lattice with ~245 m spacing
(WALK_TO radius 300 m connects 4-neighbors). Even routes run horizontally,
odd routes vertically, each visiting ``stops_per_trip`` consecutive cells;
transfers happen where they cross — the classic grid transit network, giving
nontrivial path depth (an L-shaped journey needs one change, like the
reference's Autostazione -> Tonini anchor itinerary).

Default scale matches the reference: 60 routes x 140 trips x 30 stops
= 252,000 stoptimes (~249k day-valid graph vertices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY = "2024-01-18"
_GRID = 45  # g x g stop lattice
_LAT0, _LON0 = 44.60, 10.85  # Modena-ish bbox corner
_STEP = 0.0022  # ~245 m in lat; ~173 m in lon at 44.6N


def synth_gtfs(
    spark: SparkSession,
    n_routes: int = 60,
    trips_per_route: int = 140,
    stops_per_trip: int = 30,
    day: str = DAY,
) -> dict[str, DataFrame]:
    """Generate the typed GTFS table dict (same shape as ``read_gtfs``)."""
    n_stops = _GRID * _GRID

    stops = spark.range(n_stops).select(
        F.concat(F.lit("S"), F.col("id")).alias("stop_id"),
        F.concat(F.lit("Stop "), F.col("id")).alias("stop_name"),
        (F.lit(_LAT0) + (F.col("id") / _GRID).cast("int") * _STEP).alias("stop_lat"),
        (F.lit(_LON0) + (F.col("id") % _GRID) * _STEP).alias("stop_lon"),
    )

    routes = spark.range(n_routes).select(
        F.concat(F.lit("R"), F.col("id")).alias("route_id"),
        F.lit("A1").alias("agency_id"),
        F.col("id").cast("string").alias("short_name"),
        F.concat(F.lit("Route "), F.col("id")).alias("route_long_name"),
        F.lit(3).alias("route_type"),
    )

    trips = (
        spark.range(n_routes * trips_per_route)
        .select(
            (F.col("id") / trips_per_route).cast("long").alias("r"),
            (F.col("id") % trips_per_route).alias("t"),
        )
        .select(
            F.concat(F.lit("R"), F.col("r")).alias("route_id"),
            F.lit("SV1").alias("service_id"),
            F.concat(F.lit("R"), F.col("r"), F.lit("_T"), F.col("t")).alias("trip_id"),
            (F.col("t") % 2).cast("string").alias("direction_id"),
            F.lit(None).cast("string").alias("shape_id"),
            F.concat(F.lit("to terminus "), F.col("r")).alias("trip_headsign"),
        )
    )

    # stop_times: even route 2h runs horizontally along row (h*7) % k over
    # columns 0..k-1; odd route 2v+1 runs vertically down column (v*7) % k
    # over rows 0..k-1 (k = stops_per_trip <= GRID). Every horizontal and
    # every vertical route therefore cross at a shared stop — guaranteed
    # transfer points, like a real grid network. Trip t departs
    # 06:00 + t * 360 s; dwell 20 s, 90 s between stops.
    if stops_per_trip > _GRID:
        raise ValueError(f"stops_per_trip must be <= {_GRID}")
    k = stops_per_trip
    st = (
        spark.range(n_routes * trips_per_route * stops_per_trip)
        .select(
            (F.col("id") / (trips_per_route * stops_per_trip)).cast("long").alias("r"),
            ((F.col("id") / stops_per_trip) % trips_per_route).cast("long").alias("t"),
            (F.col("id") % stops_per_trip).alias("seq"),
        )
        .withColumn(
            "cell",
            F.when(
                F.col("r") % 2 == 0,
                ((F.col("r") / 2).cast("long") * 7) % k * _GRID + F.col("seq"),
            ).otherwise(
                F.col("seq") * _GRID + ((F.col("r") / 2).cast("long") * 7) % k
            ),
        )
        .withColumn("arr", F.lit(6 * 3600) + F.col("t") * 360 + F.col("seq") * 90)
    )
    stop_times = st.select(
        F.concat(F.lit("R"), F.col("r"), F.lit("_T"), F.col("t")).alias("trip_id"),
        F.col("arr").cast("long").alias("arrival_s"),
        (F.col("arr") + 20).cast("long").alias("departure_s"),
        F.concat(F.lit("S"), F.col("cell")).alias("stop_id"),
        F.col("seq").cast("int").alias("stop_sequence"),
    ).withColumn(
        "stoptime_id", F.concat_ws("#", F.col("trip_id"), F.col("stop_sequence"))
    )

    calendar = spark.createDataFrame([("SV1", day, "1")], ["service_id", "d", "exception_type"]).select(
        "service_id", F.to_date("d").alias("day"), "exception_type"
    )

    agency = spark.createDataFrame(
        [("A1", "Synthetic Transit", "http://example.invalid", "Europe/Rome")],
        ["agency_id", "agency_name", "agency_url", "agency_timezone"],
    )

    return {
        "agency": agency,
        "routes": routes,
        "trips": trips,
        "stops": stops,
        "stop_times": stop_times,
        "calendar": calendar,
    }


def od_pairs_9(stops_per_trip: int = 30) -> list[tuple[str, str]]:
    """Nine OD stop-name pairs spanning short to cross-city journeys —
    the analogue of the reference's 9-pair harness (``main.py:326-338``).
    Source i sits on horizontal route 2i (row (i*7)%k, column i); target i
    sits on vertical route 2i+1 (column (i*7)%k, row (i+17)%k): one change
    at their guaranteed crossing."""
    k = stops_per_trip
    pairs = []
    for i in range(9):
        src_cell = (i * 7) % k * _GRID + i
        dst_cell = (i + 17) % k * _GRID + (i * 7) % k
        pairs.append((f"Stop {src_cell}", f"Stop {dst_cell}"))
    return pairs

"""Driver-facing query surface: SURVEY.md §2 operator inventory mapped onto
the synthetic tables (TESTDATA.md), each with a DuckDB oracle twin.

Organization: ``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``
exercising one operator (or tight operator cluster) from the inventory;
``ORACLES[name]`` is the ANSI-SQL equivalent DuckDB runs on the same parquet.
Real GTFS parity (projection, routing, footway) is covered by the pytest
fixture suite (tests/) — here the same operator *shapes* run on the TPC-H-ish
tables so the driver's hash-compare gate can check them.

Cross-engine determinism rules used throughout:
- every computed column is aliased identically on both sides;
- integers -> BIGINT/long, floats rounded (same op order both sides),
  dates/timestamps stringified;
- LIMIT queries carry total deterministic tie-breaks.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # the events table stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects unless this legacy conf is on. Our own get_spark
        # sets it at build time, but the DRIVER hands us ITS session — set
        # it defensively here (runtime-settable) or every events query dies
        # with PARQUET_TYPE_ILLEGAL at the correctness gate.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # fold TIMESTAMP(NANOS)-as-bigint and Spark-4.x TIMESTAMP_NTZ to
        # plain TimestampType once, at the source boundary (UTC session tz
        # makes both micro-exact vs DuckDB's epoch_us).
        from routing_algorithm_for_graph_dbs_spark.sources.testdata import normalize_event_ts

        df = normalize_event_ts(df)
    return df


def _t_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_t`` + conditional round-robin repartition up to cluster
    parallelism (operators.skew.spread_for_compute) — for queries whose
    per-row work is CPU-bound (regex scans, minhash permutations, IVF
    dot products): a kilobyte-sized parquet arrives as ONE byte-sized
    split and would otherwise serialize the whole stage onto one core.
    No-op at real scale, where the scan already has >= parallelism
    splits."""
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    return spread_for_compute(_t(spark, sf_dir, name))


# =====================================================================
# §2.1/§2.2 scans, projections, filters
# =====================================================================


@_register(
    "p1_project_rename",
    """
    SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
           ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    """,
)
def p1_project_rename(spark, sf_dir):
    """P1: projection with renaming (reference RETURN ... AS, main.py:16)."""
    return _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.round("l_extendedprice", 2).alias("price"),
    )


@_register(
    "p3_p4_filters",
    """
    SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
           l_quantity AS qty, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_quantity > 25
    """,
)
def p3_p4_filters(spark, sf_dir):
    """P3 equality + P4 range/theta filters (main.py:82-93)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 25)
    ).select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.col("l_quantity").alias("qty"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


@_register(
    "p6_radius_filter",
    """
    SELECT s_suppkey AS skey, ROUND(ABS(s_acctbal - 5000.0), 2) AS dist
    FROM supplier WHERE ABS(s_acctbal - 5000.0) < 2500.0
    """,
)
def p6_radius_filter(spark, sf_dir):
    """P6: radius predicate (spatial shape; real haversine in f4_haversine)."""
    s = _t(spark, sf_dir, "supplier")
    dist = F.abs(F.col("s_acctbal") - 5000.0)
    return (
        s.filter(dist < 2500.0)
        .select(F.col("s_suppkey").alias("skey"), F.round(dist, 2).alias("dist"))
    )


@_register(
    "p6_radius_batch",
    """
    WITH probes(probe_id, p_lat, p_lon) AS (
      VALUES (0, 0.1, 0.1), (1, 0.4, 0.5), (2, 0.7, 0.9)
    ),
    pts AS (
      SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
             l_tax * 10 AS lat, l_discount * 10 AS lon
      FROM lineitem WHERE l_orderkey <= 1000
    )
    SELECT CAST(probe_id AS BIGINT) AS probe_id, okey, line_no,
           ROUND(2 * 6371008.8 * ASIN(SQRT(LEAST(
             POW(SIN(RADIANS(lat - p_lat)/2), 2)
             + COS(RADIANS(p_lat)) * COS(RADIANS(lat))
             * POW(SIN(RADIANS(lon - p_lon)/2), 2), 1.0))), 1) AS dist_m
    FROM pts CROSS JOIN probes
    WHERE 2 * 6371008.8 * ASIN(SQRT(LEAST(
             POW(SIN(RADIANS(lat - p_lat)/2), 2)
             + COS(RADIANS(p_lat)) * COS(RADIANS(lat))
             * POW(SIN(RADIANS(lon - p_lon)/2), 2), 1.0))) < 30000
    """,
)
def p6_radius_batch(spark, sf_dir):
    """P6 batched: N radius probes answered by ONE scan — the
    find_near_stops_batch shape (broadcast probe list x point set,
    BroadcastNestedLoopJoin, no per-probe jobs)."""
    from routing_algorithm_for_graph_dbs_spark.functions.spatial import (
        haversine_meters,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").cast("long").alias("line_no"),
            (F.col("l_tax") * 10).alias("lat"),
            (F.col("l_discount") * 10).alias("lon"),
        )
    )
    probes = spark.createDataFrame(
        [(0, 0.1, 0.1), (1, 0.4, 0.5), (2, 0.7, 0.9)],
        "probe_id long, p_lat double, p_lon double",
    )
    d = haversine_meters(F.col("lat"), F.col("lon"), F.col("p_lat"), F.col("p_lon"))
    return (
        li.crossJoin(F.broadcast(probes))
        .filter(d < 30000)
        .select("probe_id", "okey", "line_no", F.round(d, 1).alias("dist_m"))
    )


@_register(
    "f4_haversine",
    """
    SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
           ROUND(2 * 6371008.8 * ASIN(SQRT(
             LEAST(POW(SIN(RADIANS(l_tax*10 - 0.4)/2), 2)
             + COS(RADIANS(0.4)) * COS(RADIANS(l_tax*10))
             * POW(SIN(RADIANS(l_discount*10 - 0.5)/2), 2), 1.0)
           )), 1) AS dist_m
    FROM lineitem WHERE l_orderkey <= 100
    """,
)
def f4_haversine(spark, sf_dir):
    """F4: the WGS-84 haversine used for point.distance parity
    (new_dbSetup.py:94-100), cross-checked against DuckDB's trig."""
    from routing_algorithm_for_graph_dbs_spark.functions.spatial import haversine_meters

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    d = haversine_meters(
        F.col("l_tax") * 10, F.col("l_discount") * 10, F.lit(0.4), F.lit(0.5)
    )
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.round(d, 1).alias("dist_m"),
    )


@_register(
    "p8_p9_p10_membership",
    """
    SELECT DISTINCT c_mktsegment AS segment,
           CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS bal_sign
    FROM customer WHERE c_nationkey IN (1, 3, 5, 7)
    """,
)
def p8_p9_p10_membership(spark, sf_dir):
    """P8 isin + P9 case/null guard + P10 distinct (main.py:132,64-67)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_nationkey").isin(1, 3, 5, 7))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("c_acctbal") > 0, "pos").otherwise("nonpos").alias("bal_sign"),
        )
        .distinct()
    )


# =====================================================================
# §2.3 joins
# =====================================================================


@_register(
    "j1_join_chain",
    """
    SELECT n_name AS nation, r_name AS region,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def j1_join_chain(spark, sf_dir):
    """J1: the 5-hop calendar-join shape (main.py:16) — fact table joined
    through a chain of broadcast dims, aggregated. The Spark plan must show
    BroadcastHashJoins with the fact never shuffling before the agg."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "j2_fk_dims",
    """
    SELECT s_suppkey AS skey, s_name AS sname, n_name AS nation, r_name AS region
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def j2_fk_dims(spark, sf_dir):
    """J2: FK equi-joins to dimensions (new_dbSetup.py:41-84)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("s_suppkey").alias("skey"),
            F.col("s_name").alias("sname"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


@_register(
    "w1_lead_consecutive",
    """
    SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
           l_partkey AS pkey,
           LEAD(l_partkey) OVER w AS next_pkey,
           ROUND(LEAD(l_quantity) OVER w - l_quantity, 2) AS qty_delta
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice)
    """,
)
def w1_lead_consecutive(spark, sf_dir):
    """J3/W1: consecutive-row pairing via lead() — the PRECEDES build
    (new_dbSetup.py:66-70) re-expressed as a window, one shuffle not two."""
    li = _t(spark, sf_dir, "lineitem")
    # the synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    # the window order carries a total tiebreak (mirrored in the oracle)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.col("l_partkey").alias("pkey"),
        F.lead("l_partkey").over(w).alias("next_pkey"),
        F.round(F.lead("l_quantity").over(w) - F.col("l_quantity"), 2).alias("qty_delta"),
    )


@_register(
    "j4_band_selfjoin",
    """
    SELECT a.s_suppkey AS a, b.s_suppkey AS b,
           ROUND(ABS(a.s_acctbal - b.s_acctbal), 2) AS gap
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey
     AND ABS(a.s_acctbal - b.s_acctbal) < 150.0
    """,
)
def j4_band_selfjoin(spark, sf_dir):
    """J4: distance self-join via banding — the scale-safe WALK_TO shape
    (new_dbSetup.py:94-100). Each row joins only its own and neighboring
    bands, then the exact filter runs; equivalent to the O(n²) cross
    product the oracle runs."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    width = 150.0
    banded = s.select(
        F.col("s_suppkey").alias("k"),
        F.col("s_acctbal").alias("v"),
        F.floor(F.col("s_acctbal") / width).cast("long").alias("band"),
    )
    left = banded.select(
        F.col("k").alias("a"),
        F.col("v").alias("va"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    right = banded.select(F.col("k").alias("b"), F.col("v").alias("vb"), "band")
    return (
        left.join(right, "band")
        .filter((F.col("a") < F.col("b")) & (F.abs(F.col("va") - F.col("vb")) < width))
        .select("a", "b", F.round(F.abs(F.col("va") - F.col("vb")), 2).alias("gap"))
        .distinct()
    )


@_register(
    "j5_earliest_transfer",
    """
    WITH cand AS (
      SELECT o1.o_orderkey AS okey, o1.o_custkey AS cust,
             o2.o_orderkey AS next_okey,
             date_diff('day', o1.o_orderdate, o2.o_orderdate) AS gap_days,
             RANK() OVER (PARTITION BY o1.o_orderkey
                          ORDER BY o2.o_orderdate, o2.o_orderkey) AS rk
      FROM orders o1 JOIN orders o2
        ON o1.o_custkey = o2.o_custkey
       AND o2.o_orderkey <> o1.o_orderkey
       AND o2.o_orderdate > o1.o_orderdate
       AND date_diff('day', o1.o_orderdate, o2.o_orderdate) <= 30
    )
    SELECT okey, cust, next_okey, CAST(gap_days AS BIGINT) AS gap_days
    FROM cand WHERE rk = 1
    """,
)
def j5_earliest_transfer(spark, sf_dir):
    """J5: the CHANGE-edge derivation shape (main.py:17): per anchor row,
    feasible later partners via theta-join, keep the earliest per group
    (minItems -> rank keeps ties)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    o1 = o.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("d1"),
    )
    o2 = o.select(
        F.col("o_orderkey").alias("next_okey"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("d2"),
    )
    gap = F.datediff(F.col("d2").cast("date"), F.col("d1").cast("date"))
    cand = (
        o1.join(o2, "cust")
        .filter(
            (F.col("next_okey") != F.col("okey"))
            & (F.col("d2") > F.col("d1"))
            & (gap <= 30)
        )
        .withColumn("gap_days", gap.cast("long"))
    )
    w = Window.partitionBy("okey").orderBy("d2", "next_okey")
    return (
        cand.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("okey", "cust", "next_okey", "gap_days")
    )


@_register(
    "j6_explode_rejoin",
    """
    WITH seq AS (
      SELECT l_orderkey, l_linenumber, l_partkey,
             LEAD(l_partkey) OVER w AS next_pk,
             ROW_NUMBER() OVER w - 1 AS pos
      FROM lineitem WHERE l_orderkey <= 500
      WINDOW w AS (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice)
    )
    SELECT s.l_orderkey AS okey, CAST(s.pos AS BIGINT) AS pos,
           pa.p_name AS part_a, pb.p_name AS part_b
    FROM seq s JOIN part pa ON s.l_partkey = pa.p_partkey
    JOIN part pb ON s.next_pk = pb.p_partkey
    WHERE s.next_pk IS NOT NULL
    """,
)
def j6_explode_rejoin(spark, sf_dir):
    """J6: path-pair enrichment (main.py:103-114): collect each order's parts
    as an ordered array, explode consecutive pairs, re-join the part dim
    twice. The oracle produces the identical rows via lead()."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    p = _t(spark, sf_dir, "part")
    path = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
            )
        ).alias("steps")
    )
    pairs = path.select(
        F.col("l_orderkey").alias("okey"),
        F.posexplode(
            F.expr(
                "arrays_zip(slice(steps, 1, size(steps)-1), slice(steps, 2, size(steps)-1))"
            )
        ).alias("pos", "pair"),
    ).select(
        "okey",
        F.col("pos").cast("long").alias("pos"),
        F.col("pair.0.l_partkey").alias("pk_a"),
        F.col("pair.1.l_partkey").alias("pk_b"),
    )
    pa = p.select(F.col("p_partkey").alias("pk_a"), F.col("p_name").alias("part_a"))
    pb = p.select(F.col("p_partkey").alias("pk_b"), F.col("p_name").alias("part_b"))
    return (
        pairs.join(F.broadcast(pa), "pk_a")
        .join(F.broadcast(pb), "pk_b")
        .select("okey", "pos", "part_a", "part_b")
    )


@_register(
    "j7_nn_top1",
    """
    SELECT s_suppkey AS skey, ROUND(ABS(s_acctbal - 5000.0), 2) AS dist
    FROM supplier ORDER BY ABS(s_acctbal - 5000.0), s_suppkey LIMIT 1
    """,
)
def j7_nn_top1(spark, sf_dir):
    """J7/T3: top-1 nearest neighbor (prova.py:184-198)."""
    s = _t(spark, sf_dir, "supplier")
    dist = F.abs(F.col("s_acctbal") - 5000.0)
    return (
        s.select(F.col("s_suppkey").alias("skey"), F.round(dist, 2).alias("dist"))
        .orderBy(F.abs(F.col("dist")), "skey")
        .limit(1)
    )


@_register(
    "j8_semi_join",
    """
    SELECT c_custkey AS ckey, c_name AS cname FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def j8_semi_join(spark, sf_dir):
    """J8: left-semi join (reshape.py:9-36 service-id filter)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select(
        F.col("c_custkey").alias("ckey"), F.col("c_name").alias("cname")
    )


@_register(
    "j9_anti_join",
    """
    SELECT c_custkey AS ckey, c_name AS cname FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def j9_anti_join(spark, sf_dir):
    """Anti join (complement of J8; the r.id <> line exclusion family):
    customers with no finished order."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select(
        F.col("c_custkey").alias("ckey"), F.col("c_name").alias("cname")
    )


@_register(
    "jlo_left_outer",
    """
    SELECT c_custkey AS ckey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def jlo_left_outer(spark, sf_dir):
    """Left outer join (the OPTIONAL MATCH at prova.py:211)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("ckey"))
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# =====================================================================
# §2.4/§2.5 aggregations & windows
# =====================================================================


@_register(
    "a1_a2_aggregates",
    """
    SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_a2_aggregates(spark, sf_dir):
    """A1 count-distinct (main.py:186-191) + A2 avg (main.py:193-205)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_returnflag").alias("rflag"), F.col("l_linestatus").alias("lstatus")
    ).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "a3_argmin_ties",
    """
    SELECT o_orderpriority AS priority, o_orderkey AS okey,
           strftime(o_orderdate, '%Y-%m-%d') AS odate
    FROM (SELECT *, RANK() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderdate) AS rk FROM orders)
    WHERE rk = 1
    """,
)
def a3_argmin_ties(spark, sf_dir):
    """A3: apoc.agg.minItems — ALL rows attaining the group minimum
    (main.py:85,133,196). rank() == 1, not row_number."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("okey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        )
    )


@_register(
    "a4_argmax_ties",
    """
    SELECT o_orderpriority AS priority, o_orderkey AS okey,
           strftime(o_orderdate, '%Y-%m-%d') AS odate
    FROM (SELECT *, RANK() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderdate DESC) AS rk FROM orders)
    WHERE rk = 1
    """,
)
def a4_argmax_ties(spark, sf_dir):
    """A4: apoc.agg.maxItems (main.py:197)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_orderdate"))
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("okey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        )
    )


@_register(
    "a5_collect_sorted",
    """
    SELECT r_name AS region, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def a5_collect_sorted(spark, sf_dir):
    """A5: collect() to list (main.py:86-89), stringified for stable
    cross-engine comparison."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@_register(
    "w3_running_sum",
    """
    SELECT o_custkey AS cust, o_orderkey AS okey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w3_running_sum(spark, sf_dir):
    """W2/W3: ranking + running aggregate windows."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("okey"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
    )


# =====================================================================
# §2.6/§2.7 top-k, union
# =====================================================================


@_register(
    "t1_t2_topk",
    """
    SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
           ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
    """,
)
def t1_t2_topk(spark, sf_dir):
    """T1/T2: multi-key sort + LIMIT (main.py:94,102,158-159). The plan
    should be TakeOrderedAndProject, not a global sort."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").cast("long").alias("line_no"),
            F.round("l_extendedprice", 2).alias("price"),
        )
        .limit(10)
    )


@_register(
    "u1_union_all",
    """
    SELECT event_id AS eid, user_id AS uid, 'click' AS kind, ROUND(value, 3) AS val
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id AS eid, user_id AS uid, 'view' AS kind, ROUND(value, 3) AS val
    FROM events WHERE event_type = 'view'
    """,
)
def u1_union_all(spark, sf_dir):
    """U1: UNION ALL of two typed edge sets (the CHANGE ∪ PRECEDES shape,
    main.py:17 tail)."""
    ev = _t(spark, sf_dir, "events")
    click = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        F.lit("click").alias("kind"),
        F.round("value", 3).alias("val"),
    )
    view = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        F.lit("view").alias("kind"),
        F.round("value", 3).alias("val"),
    )
    return click.unionByName(view)


# =====================================================================
# §2.8 scalar functions
# =====================================================================


@_register(
    "f1_casts",
    """
    SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
           CAST(FLOOR(l_extendedprice / 100.0) AS BIGINT) AS price_h,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def f1_casts(spark, sf_dir):
    """F1: toInteger/toFloat casts with truncation (new_dbSetup.py:42,55)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.floor(F.col("l_extendedprice") / 100.0).cast("long").alias("price_h"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@_register(
    "f2_temporal",
    """
    SELECT o_orderkey AS okey,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS week_later
    FROM orders WHERE o_orderkey <= 500
    """,
)
def f2_temporal(spark, sf_dir):
    """F2/F8: temporal constructors + date arithmetic + formatting
    (main.py:16,83; reshape.py:33-35)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        F.col("o_orderkey").alias("okey"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 7), "yyyy-MM-dd").alias(
            "week_later"
        ),
    )


@_register(
    "f3_durations",
    """
    SELECT event_id AS eid,
           CAST(FLOOR(EPOCH(ts)) - EPOCH(TIMESTAMP '2024-01-01') AS BIGINT) AS secs_since,
           CAST(FLOOR((FLOOR(EPOCH(ts)) - EPOCH(TIMESTAMP '2024-01-01')) / 3600) AS BIGINT) AS hours_since
    FROM events WHERE event_id <= 500
    """,
)
def f3_durations(spark, sf_dir):
    """F3: duration arithmetic in seconds/hours (main.py:17,101,157,201)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    secs = F.unix_timestamp("ts") - F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
    return ev.select(
        F.col("event_id").alias("eid"),
        secs.cast("long").alias("secs_since"),
        F.floor(secs / 3600).cast("long").alias("hours_since"),
    )


@_register(
    "f7_arrays",
    """
    SELECT p_partkey AS pkey,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           array_to_string(list_transform(string_split(p_name, ' '), x -> upper(x)), '_') AS words_upper
    FROM part
    """,
)
def f7_arrays(spark, sf_dir):
    """F7: array literals/transform/size/join (main.py:87-112)."""
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        F.col("p_partkey").alias("pkey"),
        F.size(words).cast("long").alias("n_words"),
        words.getItem(0).alias("first_word"),
        F.array_join(F.transform(words, lambda x: F.upper(x)), "_").alias("words_upper"),
    )


@_register(
    "f8_strings",
    """
    SELECT c_custkey AS ckey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           upper(substr(c_mktsegment, 1, 3)) AS seg3
    FROM customer
    """,
)
def f8_strings(spark, sf_dir):
    """F8: string functions (reshape.py:33-35, main.py:218-236)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("ckey"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.upper(F.substring("c_mktsegment", 1, 3)).alias("seg3"),
    )


# =====================================================================
# streaming-shaped analytics over events (batch-checked; the Structured
# Streaming variants live in routing_algorithm_for_graph_dbs_spark.streaming)
# =====================================================================


@_register(
    "st_tumbling_window",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type AS etype, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_val
    FROM events GROUP BY 1, 2
    """,
)
def st_tumbling_window(spark, sf_dir):
    """Tumbling event-time window aggregation (streaming shape, batch
    semantics identical)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type").alias("etype")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "etype",
            "n",
            "sum_val",
        )
    )


@_register(
    "st_watermark_dedup",
    """
    SELECT DISTINCT event_id, user_id, event_type, epoch_us(ts) AS t_us
    FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    """,
)
def st_watermark_dedup(spark, sf_dir):
    """Batch twin of streaming.pipelines.streaming_dedup
    (dropDuplicatesWithinWatermark on event_id): at-least-once redelivery
    simulated by doubling the input; exactly one row per event survives.
    The real streaming execution (bounded state, replayed-batch dedup) is
    exercised in tests/test_streaming.py."""
    ev = _t(spark, sf_dir, "events")
    doubled = ev.unionByName(ev)
    return doubled.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )


@_register(
    "st_sessionization",
    """
    WITH g AS (
      SELECT user_id,
             CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                       - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 THEN 1 ELSE 0 END AS new_sess
      FROM events
    )
    SELECT user_id AS uid, CAST(1 + SUM(new_sess) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
)
def st_sessionization(spark, sf_dir):
    """Session windows with a 30-min inactivity gap (lag + cumulative flag —
    the batch formulation of stream sessionization)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts").cast("long")
    new_sess = F.when(sec - F.lag(sec).over(w) > 1800, 1).otherwise(0)
    return (
        ev.select(F.col("user_id"), new_sess.alias("new_sess"))
        .groupBy(F.col("user_id").alias("uid"))
        .agg((F.lit(1) + F.sum("new_sess")).cast("long").alias("n_sessions"))
    )


# =====================================================================
# training-data pipeline surface (documents / embeddings)
# =====================================================================


@_register(
    "dd_exact_dedup",
    """
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM (SELECT doc_id,
                 md5(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
          FROM documents)
    GROUP BY fp
    """,
)
def dd_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized-text digest."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


@_register(
    "dd_minhash_sig",
    """
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               list_filter(list_zip(t, t[2:], t[3:]), x -> x[3] IS NOT NULL),
               x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS shingles
      FROM toks WHERE len(t) >= 3
    )
    SELECT doc_id,
           list_min(list_transform(shingles, s -> md5('0|' || s))) AS sig0,
           list_min(list_transform(shingles, s -> md5('1|' || s))) AS sig1
    FROM sh
    """,
)
def dd_minhash_sig(spark, sf_dir):
    """MinHash signatures are cross-engine checkable because the hash is
    md5-of-shingle (operators.dedup.minhash_signatures): DuckDB reproduces
    seeds 0 and 1 exactly."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        minhash_signatures,
    )

    sigs = minhash_signatures(_min3_docs(spark, sf_dir), num_hashes=2, hash_fn="md5")
    return sigs.select(
        "doc_id",
        F.col("sig").getItem(0).alias("sig0"),
        F.col("sig").getItem(1).alias("sig1"),
    )


@_register(
    "txt_token_counts",
    """
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)) AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def txt_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish pre-tokenizer."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import token_counts

    return token_counts(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
    )


@_register(
    "txt_language_id",
    """
    WITH hits AS (
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '(?i)\\b(der|die|und|das|ist|nicht|mit|ein)\\b', 0)) AS BIGINT) AS hits_de,
        CAST(len(regexp_extract_all(text, '(?i)\\b(the|and|of|to|in|is|that|with)\\b', 0)) AS BIGINT) AS hits_en,
        CAST(len(regexp_extract_all(text, '(?i)\\b(el|la|los|que|y|de|es|por)\\b', 0)) AS BIGINT) AS hits_es,
        CAST(len(regexp_extract_all(text, '(?i)\\b(le|la|les|et|des|est|que|dans)\\b', 0)) AS BIGINT) AS hits_fr,
        CAST(len(regexp_extract_all(text, '(?i)\\b(il|la|di|che|e|un|per|non)\\b', 0)) AS BIGINT) AS hits_it
      FROM documents
    )
    SELECT doc_id, hits_de, hits_en, hits_es, hits_fr, hits_it,
           CASE WHEN GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_it) = 0 THEN 'und'
                WHEN hits_de = GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_it) THEN 'de'
                WHEN hits_en = GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_it) THEN 'en'
                WHEN hits_es = GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_it) THEN 'es'
                WHEN hits_fr = GREATEST(hits_de, hits_en, hits_es, hits_fr, hits_it) THEN 'fr'
                ELSE 'it' END AS lang_pred
    FROM hits
    """,
)
def txt_language_id(spark, sf_dir):
    """Marker-word language ID (argmax with lexicographic tie-break)."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import language_id

    out = language_id(_t_spread(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("hits_de").cast("long").alias("hits_de"),
        F.col("hits_en").cast("long").alias("hits_en"),
        F.col("hits_es").cast("long").alias("hits_es"),
        F.col("hits_fr").cast("long").alias("hits_fr"),
        F.col("hits_it").cast("long").alias("hits_it"),
        "lang_pred",
    )


@_register(
    "txt_quality",
    """
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_words,
           ROUND((length(text) - length(regexp_replace(text, '[^\\p{L}\\p{N}_\\s]', '', 'g')))
                 * 1.0 / GREATEST(length(text), 1), 6) AS punct_ratio
    FROM documents
    """,
)
def txt_quality(spark, sf_dir):
    """Quality features. NOTE: regex character-class dialects differ between
    Java and RE2 for \\w; this query keeps the oracle-checked columns to the
    dialect-safe subset (n_words, punct_ratio via explicit classes); the full
    feature set is tested in tests/test_dataops.py."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import quality_scores

    out = quality_scores(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "punct_ratio",
    )


@_register(
    "sim_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))), 4) AS cosine_sim
    FROM embeddings, q
    ORDER BY list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))) DESC,
             vec_id
    LIMIT 10
    """,
)
def sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 to the vec_id=0 embedding (exact ANN
    baseline). Rounded to 4 dp on both engines."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = cosine_topk(emb, list(q), k=10)
    return out.select("vec_id", F.round("cosine_sim", 4).alias("cosine_sim"))


@_register(
    "emb_norms",
    """
    SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 4) AS l2
    FROM embeddings
    """,
)
def emb_norms(spark, sf_dir):
    """Vector norms via aggregate expressions (F.aggregate/zip_with)."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import norm

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(norm(F.col("embedding")), 4).alias("l2"),
    )


# =====================================================================
# graph kernels on a deterministic testdata-derived graph
# =====================================================================

# nation graph: intra-region cliques plus a deterministic ring of
# cross-region edges i -> (i+7) mod 25, both directions.
_NATION_EDGES_SQL = """
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
      UNION
      SELECT n_nationkey, (n_nationkey + 7) % 25 FROM nation
      UNION
      SELECT (n_nationkey + 7) % 25, n_nationkey FROM nation
"""


def _nation_edges(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("rg"))
    b = n.select(F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("rg"))
    clique = a.join(b, "rg").filter(F.col("src") != F.col("dst")).select("src", "dst")
    ring = n.select(
        F.col("n_nationkey").alias("src"),
        ((F.col("n_nationkey") + 7) % 25).alias("dst"),
    )
    ring_rev = ring.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        clique.unionByName(ring)
        .unionByName(ring_rev)
        .distinct()
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
    )


@_register(
    "graph_bfs_hops",
    f"""
    WITH RECURSIVE e AS ({_NATION_EDGES_SQL}),
    r(node, d) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION
      SELECT CAST(e.dst AS BIGINT), r.d + 1 FROM r JOIN e ON e.src = r.node
      WHERE r.d < 10
    )
    SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM r GROUP BY node
    """,
)
def graph_bfs_hops(spark, sf_dir):
    """G2-shape: hop-distance SSSP from nation 0 over the nation graph via
    the engine's Pregel kernel; DuckDB oracles it with a recursive CTE."""
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import multi_source_dijkstra

    from routing_algorithm_for_graph_dbs_spark.functions.localrel import (
        local_rows_df,
    )

    e = _nation_edges(spark, sf_dir).withColumn("weight", F.lit(1.0))
    # seed as a JVM LocalRelation: the createDataFrame seed paid a
    # Python-worker task inside the kernel's first checkpoint job
    src = local_rows_df(spark, [(0, 0)], "lane bigint, node bigint")
    res = multi_source_dijkstra(e, src, track_paths=False, max_iterations=12)
    return res.select(
        F.col("node").cast("long").alias("node"), F.col("cost").cast("long").alias("dist")
    )


@_register(
    "graph_components",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS node,
           CAST(MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS BIGINT) AS component
    FROM nation
    """,
)
def graph_components(spark, sf_dir):
    """G5-shape: connected components of the region-clique graph (no ring):
    components are exactly the regions, labeled by min member — the oracle
    states that closed form directly."""
    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("rg"))
    b = n.select(F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("rg"))
    clique = a.join(b, "rg").filter(F.col("src") != F.col("dst")).select("src", "dst")
    verts = n.select(F.col("n_nationkey").alias("node"))
    res = connected_components(clique, vertices=verts)
    return res.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


@_register(
    "graph_degree_metrics",
    f"""
    WITH e AS ({_NATION_EDGES_SQL}),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
    SELECT COUNT(*) AS n_nodes, CAST(SUM(d) AS BIGINT) AS n_edges,
           CAST(MIN(d) AS BIGINT) AS min_deg, CAST(MAX(d) AS BIGINT) AS max_deg,
           ROUND(AVG(d), 4) AS avg_deg
    FROM deg
    """,
)
def graph_degree_metrics(spark, sf_dir):
    """A6/G7: gds.graph.list-style metrics (main.py:24-44) over the nation
    graph: node count, edge count, degree min/max/mean."""
    e = _nation_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("d").cast("long").alias("n_edges"),
        F.min("d").cast("long").alias("min_deg"),
        F.max("d").cast("long").alias("max_deg"),
        F.round(F.avg("d"), 4).alias("avg_deg"),
    )


# =====================================================================
# near-dup pipeline stages (LSH candidates, Jaccard verify), fingerprints
# =====================================================================

# shared CTE prefix: normalized 3-token shingles per document (>=3 tokens),
# identical to operators.dedup.word_shingles / dd_minhash_sig's oracle.
_SHINGLES_CTE = r"""
    toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               list_filter(list_zip(t, t[2:], t[3:]), x -> x[3] IS NOT NULL),
               x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS shingles
      FROM toks WHERE len(t) >= 3
    )
"""

_SIG8_CTE = (
    "sig AS (\n      SELECT doc_id,\n"
    + ",\n".join(
        f"        list_min(list_transform(shingles, s -> md5('{i}|' || s))) AS h{i}"
        for i in range(8)
    )
    + "\n      FROM sh\n    )"
)

_BANDED_CTE = (
    "banded AS (\n"
    + "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(h{2 * b} || ',' || h{2 * b + 1}) AS bucket FROM sig"
        for b in range(4)
    )
    + "\n    )"
)

_CANDS_SQL = (
    "SELECT DISTINCT l.doc_id AS a, r.doc_id AS b\n"
    "    FROM banded l JOIN banded r\n"
    "      ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id"
)


def _min3_docs(spark, sf_dir):
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import normalize_text

    # spread: minhash permutations are CPU-per-row (md5 x shingles x
    # hashes) and the toy parquet is a single byte-sized split
    docs = _t_spread(spark, sf_dir, "documents")
    return docs.filter(F.size(F.split(normalize_text(F.col("text")), " ")) >= 3)


@_register(
    "dd_lsh_candidates",
    f"WITH {_SHINGLES_CTE}, {_SIG8_CTE}, {_BANDED_CTE}\n    {_CANDS_SQL}",
)
def dd_lsh_candidates(spark, sf_dir):
    """MinHash-LSH candidate pairs (8 md5 min-hashes, 4 bands x 2 rows):
    documents sharing any band bucket. Candidates meet in an equi-join on
    (band, bucket) — the cross product never materializes (dedup.py
    lsh_candidate_pairs)."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(_min3_docs(spark, sf_dir), num_hashes=8, hash_fn="md5")
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return pairs.select(F.col("a").cast("long"), F.col("b").cast("long"))


@_register(
    "dd_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE}, {_SIG8_CTE}, {_BANDED_CTE},
    cands AS ({_CANDS_SQL})
    SELECT c.a, c.b,
           ROUND(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                 / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
    FROM cands c
    JOIN sh sa ON sa.doc_id = c.a
    JOIN sh sb ON sb.doc_id = c.b
    WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                / len(list_distinct(sa.shingles || sb.shingles)), 6) >= 0.7
    """,
)
def dd_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard verify over the LSH candidates (the second
    stage of minhash_dedup): pairs with 3-gram Jaccard >= 0.7."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _min3_docs(spark, sf_dir)
    sigs = minhash_signatures(docs, num_hashes=8, hash_fn="md5")
    cands = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    out = jaccard_verify(cands, docs, threshold=0.7)
    return out.select(
        F.col("a").cast("long"), F.col("b").cast("long"), "jaccard"
    )


@_register(
    "txt_fingerprint",
    r"""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      FROM documents
    )
    SELECT doc_id, md5(nt) AS fp_md5, md5(substr(nt, 1, 256)) AS fp_head
    FROM n
    """,
)
def txt_fingerprint(spark, sf_dir):
    """Whole-document + head fingerprints (text.fingerprint)."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "fp_md5", "fp_head"
    )


@_register(
    "txt_winnow",
    r"""
    WITH n AS (
      SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS nt
      FROM documents
    ), grams0 AS (
      SELECT doc_id, nt,
             unnest(generate_series(1, GREATEST(length(nt) - 7, 1))) AS pos
      FROM n
    ), grams AS (
      SELECT doc_id, pos, md5(substr(nt, pos, 8)) AS h FROM grams0
    ), mins AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             MAX(pos) OVER (PARTITION BY doc_id) AS maxpos
      FROM grams
    )
    SELECT DISTINCT doc_id, fp FROM mins WHERE pos <= GREATEST(maxpos - 3, 1)
    """,
)
def txt_winnow(spark, sf_dir):
    """Winnowing fingerprints (k=8 char-grams, window w=4) — the MOSS
    document-fingerprint scheme as a relational program (text.
    winnow_fingerprints)."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        winnow_fingerprints,
    )

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=8, w=4).select(
        "doc_id", "fp"
    )


# =====================================================================
# ANN over embeddings: hyperplane LSH (oracle via literal planes) + IVF
# =====================================================================


def _plane_literals(n_planes: int) -> list[str]:
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        hyperplanes,
    )

    return [
        "[" + ", ".join(repr(w) for w in p) + "]"
        for p in hyperplanes(64, n_planes, seed=42)
    ]


_ANN_PLANES = _plane_literals(4)
_ANN_BUCKET_SQL = " || ".join(
    f"(CASE WHEN list_dot_product(v, {p}) >= 0 THEN '1' ELSE '0' END)"
    for p in _ANN_PLANES
)
_COS_SQL = (
    "ROUND(list_dot_product(l.v, r.v) / (sqrt(list_dot_product(l.v, l.v))"
    " * sqrt(list_dot_product(r.v, r.v))), 6)"
)


@_register(
    "ann_lsh_pairs",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_ANN_BUCKET_SQL} AS bucket FROM e)
    SELECT l.vec_id AS a, r.vec_id AS b, {_COS_SQL} AS cosine_sim
    FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
    WHERE {_COS_SQL} >= 0.35
    """,
)
def ann_lsh_pairs(spark, sf_dir):
    """Hyperplane-LSH near-dup pairs over embeddings. Fully oracle-checked:
    the planes are deterministic (similarity.hyperplanes seed 42), so DuckDB
    reproduces bucketing and the in-bucket cosine verify bit-for-bit."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    # the synthetic embeddings are near-orthogonal (max pairwise cosine
    # ~0.51), so the demo threshold is low enough to surface candidates
    out = embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_planes=4
    )
    return out.select(
        F.col("a").cast("long"), F.col("b").cast("long"), "cosine_sim"
    )


_IVF_COS = (
    "ROUND(list_dot_product({x}, {y}) / (sqrt(list_dot_product({x}, {x}))"
    " * sqrt(list_dot_product({y}, {y}))), 6)"
)


@_register(
    "ann_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    assign AS (
      SELECT vec_id, cid, v,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY {_IVF_COS.format(x="v", y="cv")} DESC, cid
             ) AS rn
      FROM e CROSS JOIN c
    ),
    probe AS (
      SELECT cid FROM c CROSS JOIN q
      ORDER BY {_IVF_COS.format(x="cv", y="qv")} DESC, cid
      LIMIT 2
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS centroid_id,
           {_IVF_COS.format(x="a.v", y="qv")} AS cosine_sim
    FROM assign a CROSS JOIN q
    WHERE a.rn = 1 AND a.cid IN (SELECT cid FROM probe)
    ORDER BY cosine_sim DESC, a.vec_id
    LIMIT 10
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed approximate top-k: deterministic seeded centroids
    (vec_id < 8), nprobe=2 — the partition-pruning scale path next to the
    exact sim_cosine_topk baseline (similarity.ivf_topk)."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = ivf_topk(emb, list(q), k=10, n_centroids=8, nprobe=2)
    return out.select(
        "vec_id", F.col("centroid_id").cast("long").alias("centroid_id"), "cosine_sim"
    )


@_register(
    "knn_ivf_join",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    -- centroid count scales with the corpus (max(8, floor(sqrt(n))) —
    -- cells stay ~sqrt(n) so per-cell candidate work is bounded; a count
    -- pinned for the sf0.01 gate put 50k vectors in 8 cells at sf1.0 and
    -- went quadratic). IEEE sqrt is exact on perfect squares, so
    -- FLOOR(SQRT(n)) == python isqrt for every n here.
    c AS (
      SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < (SELECT GREATEST(8, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))
                      FROM e)
    ),
    assign AS (
      SELECT vec_id, cid, v,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY {_IVF_COS.format(x="v", y="cv")} DESC, cid
             ) AS rn
      FROM e CROSS JOIN c
    ),
    rcell AS (SELECT vec_id AS r_id, cid AS cell, v AS rv FROM assign WHERE rn = 1),
    lcell AS (SELECT vec_id AS l_id, cid AS cell, v AS lv FROM assign WHERE rn <= 2),
    cand AS (
      SELECT l.l_id, r.r_id, {_IVF_COS.format(x="l.lv", y="r.rv")} AS cosine_sim
      FROM lcell l JOIN rcell r ON l.cell = r.cell AND l.l_id <> r.r_id
    )
    SELECT l_id, r_id, cosine_sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT l_id, r_id, cosine_sim,
             ROW_NUMBER() OVER (
               PARTITION BY l_id ORDER BY cosine_sim DESC, r_id
             ) AS rn
      FROM cand
    ) WHERE rn <= 3
    """,
)
def knn_ivf_join(spark, sf_dir):
    """IVF-partitioned kNN self-join (the 100 TB tier of similarity.knn_join,
    forced here so the cell equi-join path is what the oracle checks):
    deterministic seeded centroids, nprobe=2, top-3 per vector,
    n_centroids = max(8, isqrt(n)) so cell population tracks sqrt(n) at
    every sf (round 9: the gate-sized pin of 8 made the sf1.0 probe
    quadratic — 50k vectors in 8 cells). The oracle mirrors the centroid
    count, cell assignment, probe sets, and the per-left rank in SQL."""
    import math

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    nc = max(8, math.isqrt(emb.count()))
    out = knn_join(
        emb, emb, k=3, strategy="ivf", n_centroids=nc, nprobe=2,
        exclude_same_key=True,
    )
    return out.select(
        F.col("l_id").cast("long").alias("l_id"),
        F.col("r_id").cast("long").alias("r_id"),
        "cosine_sim",
        F.col("rn").cast("long").alias("rn"),
    )


# =====================================================================
# multimodal plumbing over a deterministic documents-derived media table
# =====================================================================


def _media(spark, sf_dir):
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        media_from_documents,
    )

    return media_from_documents(_t(spark, sf_dir, "documents"))


@_register(
    "mm_media_stats",
    """
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           ELSE 'video' END AS kind,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CASE WHEN doc_id % 3 = 0 THEN n_chars % 512 + 1 END), 4)
             AS avg_width,
           ROUND(AVG(CASE WHEN doc_id % 3 <> 0 THEN n_chars * 10 END), 4)
             AS avg_duration_ms
    FROM documents GROUP BY doc_id % 3
    """,
)
def mm_media_stats(spark, sf_dir):
    """Metadata-only media rollup — the payload column is pruned at the scan
    (multimodal.media_stats)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import media_stats

    out = media_stats(_media(spark, sf_dir))
    return out.select(
        "kind",
        F.col("n").cast("long").alias("n"),
        F.round("avg_width", 4).alias("avg_width"),
        F.round("avg_duration_ms", 4).alias("avg_duration_ms"),
    )


_HEXBYTE = (
    "(strpos('0123456789abcdef', substr(hx, {a}, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(hx, {b}, 1)) - 1"
)


@_register(
    "mm_image_features",
    f"""
    WITH img AS (
      SELECT doc_id AS media_id, sha256(text) AS hx,
             octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id % 3 = 0
    ), b AS (
      SELECT media_id, hx, n_bytes,
             {_HEXBYTE.format(a=1, b=2)} AS b0,
             {_HEXBYTE.format(a=3, b=4)} AS b1,
             {_HEXBYTE.format(a=5, b=6)} AS b2
      FROM img
    )
    SELECT media_id, hx AS sha256, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(64 + b0 % 192 AS BIGINT) AS width,
           CAST(64 + b1 % 192 AS BIGINT) AS height,
           ROUND(b2 / 255.0, 6) AS mean_luma,
           'fake' AS decoder
    FROM b
    """,
)
def mm_image_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary payloads,
    value-checked cross-engine: the deterministic fake decode derives its
    outputs from the sha256 digest, which DuckDB reproduces from the same
    payload bytes (multimodal.image_features)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
    )

    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # the Arrow-batched extractor is Python-CPU per row; a single-split
    # toy scan would serialize every batch onto one core (no-op at scale)
    media = spread_for_compute(
        _media(spark, sf_dir).filter(F.col("kind") == "image")
    )
    out = image_features(media)
    return out.select(
        "media_id",
        "sha256",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_audio_features",
    f"""
    WITH aud AS (
      SELECT doc_id AS media_id, sha256(text) AS hx,
             octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id % 3 = 1
    ), b AS (
      SELECT media_id, hx, n_bytes,
             {_HEXBYTE.format(a=7, b=8)} AS b3,
             {_HEXBYTE.format(a=9, b=10)} AS b4,
             {_HEXBYTE.format(a=11, b=12)} AS b5
      FROM aud
    )
    SELECT media_id, hx AS sha256, CAST(n_bytes AS BIGINT) AS n_bytes,
           ROUND(b3 / 255.0, 6) AS rms,
           CAST(b4 * 256 + b5 AS BIGINT) AS zero_crossings,
           'fake' AS decoder
    FROM b
    """,
)
def mm_audio_features(spark, sf_dir):
    """Arrow-batched audio feature extraction over binary payloads —
    value-checked like mm_image_features via the sha256-derived fake decode
    (these payloads are text bytes, so the dispatcher's RIFF sniff routes
    them past the REAL WAV decoder; operators/wav.py is golden-tested with
    real PCM bytes in tests/)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
    )

    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    media = spread_for_compute(
        _media(spark, sf_dir).filter(F.col("kind") == "audio")
    )
    out = audio_features(media)
    return out.select(
        "media_id",
        "sha256",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "rms",
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        "decoder",
    )


@_register(
    "mm_resize_plan",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             n_chars % 512 + 1 AS w, (n_chars * 7) % 512 + 1 AS h
      FROM documents WHERE doc_id % 3 = 0
    ), s AS (
      SELECT media_id, w, h,
             CASE WHEN GREATEST(w, h) > 256
                  THEN 256.0 / GREATEST(w, h) ELSE 1.0 END AS scale
      FROM img
    )
    SELECT media_id, ROUND(scale, 6) AS scale,
           CAST(GREATEST(FLOOR(w * scale), 1) AS BIGINT) AS target_w,
           CAST(GREATEST(FLOOR(h * scale), 1) AS BIGINT) AS target_h
    FROM s
    """,
)
def mm_resize_plan(spark, sf_dir):
    """Aspect-preserving resize plan from metadata only — the payload stays
    out of the plan entirely (multimodal.resize_plan)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import resize_plan

    out = resize_plan(_media(spark, sf_dir), max_dim=256)
    return out.select(
        "media_id",
        "scale",
        F.col("target_w").cast("long").alias("target_w"),
        F.col("target_h").cast("long").alias("target_h"),
    )


@_register(
    "mm_frame_plan",
    """
    SELECT doc_id AS media_id,
           CAST(unnest(generate_series(0, n_chars * 10, 5000)) AS BIGINT)
             AS frame_ts_ms
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def mm_frame_plan(spark, sf_dir):
    """Video frame-sampling grid from metadata only — one row per
    (media_id, frame_ts); the payload is never touched
    (multimodal.frame_sample_plan)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        frame_sample_plan,
    )

    out = frame_sample_plan(_media(spark, sf_dir), every_ms=5000)
    return out.select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


@_register(
    "p5_computed_theta",
    """
    SELECT event_id,
           CAST(epoch_us(ts) - CAST(FLOOR(value * 1000000) AS BIGINT)
                - 1705276800000000 AS BIGINT) AS slack_us
    FROM events
    WHERE epoch_us(ts) - CAST(FLOOR(value * 1000000) AS BIGINT)
          > 1705276800000000
    """,
)
def p5_computed_theta(spark, sf_dir):
    """P5: computed theta filter — a predicate over an expression mixing two
    columns and a literal (the reference's ``departure_time - walk_duration
    > time(t)``, main.py:132,140), here over the events table: event time
    minus a value-derived penalty past a cutoff."""
    ev = _t(spark, sf_dir, "events")
    adj = F.unix_micros("ts") - F.floor(F.col("value") * 1_000_000).cast("long")
    cutoff = 1705276800000000
    return (
        ev.withColumn("slack_us", (adj - F.lit(cutoff)).cast("long"))
        .filter(adj > F.lit(cutoff))
        .select("event_id", "slack_us")
    )


# =====================================================================
# as-of / range joins over the events stream table
# =====================================================================


@_register(
    "asof_last_view",
    """
    WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t
               FROM events WHERE event_type = 'click'),
         v AS (SELECT user_id, t, MIN(event_id) AS event_id
               FROM (SELECT event_id, user_id, epoch_us(ts) AS t
                     FROM events WHERE event_type = 'view')
               GROUP BY user_id, t)
    SELECT c.event_id, c.user_id, v.event_id AS view_event_id,
           CAST(c.t - v.t AS BIGINT) AS gap_us
    FROM c ASOF JOIN v ON c.user_id = v.user_id AND c.t >= v.t
    """,
)
def asof_last_view(spark, sf_dir):
    """Backward as-of join: every click paired with the same user's most
    recent prior view (operators.asof.asof_join, bucketed next-event
    formulation; DuckDB's native ASOF JOIN is the oracle)."""
    from routing_algorithm_for_graph_dbs_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").withColumn("t", F.unix_micros("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "t"
    )
    # same-microsecond views are deduped to the min event id on both
    # engines: DuckDB's ASOF picks an arbitrary row among exact time ties
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "t")
        .agg(F.min("event_id").alias("event_id"))
    )
    out = asof_join(
        clicks, views, on="user_id", left_time="t", right_time="t",
        direction="backward", bucket_s=3600 * 1_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_r").alias("view_event_id"),
        (F.col("t") - F.col("t_r")).cast("long").alias("gap_us"),
    )


@_register(
    "asof_next_view",
    """
    WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t
               FROM events WHERE event_type = 'click'),
         v AS (SELECT user_id, t, MIN(event_id) AS event_id
               FROM (SELECT event_id, user_id, epoch_us(ts) AS t
                     FROM events WHERE event_type = 'view')
               GROUP BY user_id, t)
    SELECT c.event_id, c.user_id, v.event_id AS view_event_id,
           CAST(v.t - c.t AS BIGINT) AS gap_us
    FROM c ASOF JOIN v ON c.user_id = v.user_id AND c.t <= v.t
    """,
)
def asof_next_view(spark, sf_dir):
    """FORWARD as-of join: every click paired with the same user's next
    view at-or-after it (operators.asof.asof_join direction='forward' —
    the reverse running-extreme branch; backward is asof_last_view)."""
    from routing_algorithm_for_graph_dbs_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").withColumn("t", F.unix_micros("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "t"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "t")
        .agg(F.min("event_id").alias("event_id"))
    )
    out = asof_join(
        clicks, views, on="user_id", left_time="t", right_time="t",
        direction="forward", bucket_s=3600 * 1_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_r").alias("view_event_id"),
        (F.col("t_r") - F.col("t")).cast("long").alias("gap_us"),
    )


@_register(
    "rng_followup_events",
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
         err AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
                 WHERE event_type = 'error')
    SELECT err.event_id, CAST(COUNT(f.event_id) AS BIGINT) AS n_follow
    FROM err LEFT JOIN e f
      ON f.user_id = err.user_id
     AND f.t > err.t AND f.t <= err.t + 300000000
    GROUP BY err.event_id
    """,
)
def rng_followup_events(spark, sf_dir):
    """Range (interval) join: for each error event, how many events the same
    user produced in the following 5 minutes (operators.asof.range_join —
    bucket-explode + equi-join, no inequality cross product)."""
    from routing_algorithm_for_graph_dbs_spark.operators.asof import range_join

    ev = _t(spark, sf_dir, "events").withColumn("t", F.unix_micros("ts"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "t"
    )
    all_ev = ev.select("event_id", "user_id", "t")
    joined = range_join(
        errors, all_ev, on="user_id", left_time="t", right_time="t",
        lo=1, hi=300_000_000, bucket_s=3600 * 1_000_000,
    )
    counts = joined.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_follow")
    )
    return (
        errors.select("event_id")
        .join(counts, "event_id", "left")
        .select("event_id", F.coalesce("n_follow", F.lit(0)).cast("long").alias("n_follow"))
    )


# SimHash oracle: DuckDB reproduces the md5-based 64-bit token hash
# (first 16 hex chars, big-endian) nibble-by-nibble, votes per bit, and
# reassembles the signed 64-bit fingerprint. Bit b of the hash lives in hex
# char j = 16 - b//4 at nibble bit k = b%4 (char 1 is the most significant).
_SIMHASH_V_COLS = ",\n".join(
    f"        SUM(CASE WHEN ((strpos('0123456789abcdef',"
    f" substr(hx, {16 - b // 4}, 1)) - 1) >> {b % 4}) & 1 = 1"
    f" THEN 1 ELSE -1 END) AS v{b}"
    for b in range(64)
)
_SIMHASH_REASSEMBLE = "\n          + ".join(
    f"CASE WHEN v{b} > 0 THEN {(1 << b) if b < 63 else '(-9223372036854775807 - 1)'}"
    f" ELSE 0 END"
    for b in range(64)
)
_SIMHASH_SQL = rf"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), tok AS (
      SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks
    ), h AS (
      SELECT doc_id, md5(tok) AS hx FROM tok
    ), v AS (
      SELECT doc_id,
{_SIMHASH_V_COLS}
      FROM h GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST({_SIMHASH_REASSEMBLE} AS BIGINT) AS simhash
    FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
"""


@_register("dd_simhash", _SIMHASH_SQL)
def dd_simhash(spark, sf_dir):
    """SimHash fingerprints. hash_fn='md5' makes the 64-bit token hash
    engine-agnostic so DuckDB reproduces the fingerprint bit-for-bit
    (xxhash64 remains the production fast path; both paths share the
    explode + 64-bit-vote aggregation shape and are cross-checked in
    tests/test_dataops.py)."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import simhash

    return simhash(_t_spread(spark, sf_dir, "documents"), hash_fn="md5")


# Betweenness oracles: the nation graph is SF-independent (25 fixed rows),
# so the expected scores are inlined as literal tables. Values are computed
# by TWO independent implementations — the pure-Python BFS Brandes oracle
# (tests/test_graph_kernels.py) and a matrix path-counting method — and the
# engine's broadcast/iterative tiers are additionally cross-checked against
# the same oracle in pytest. The symmetric graph (clique + two-way ring) is
# vertex-transitive enough that every score is exactly 26.0; the directed
# variant below has 12 distinct score values, making the hash check
# discriminating.
_BETWEENNESS_SQL = (
    "SELECT CAST(node AS BIGINT) AS node, CAST(score AS DOUBLE) AS score"
    " FROM (VALUES "
    + ", ".join(f"({n}, 26.0)" for n in range(25))
    + ") t(node, score)"
)

_BETWEENNESS_DIRECTED_SCORES = [
    (0, 63.075), (1, 64.225), (2, 80.4667), (3, 73.4667), (4, 80.4667),
    (5, 70.2583), (6, 69.1083), (7, 37.7833), (8, 34.925), (9, 38.3667),
    (10, 35.5917), (11, 48.45), (12, 52.6333), (13, 48.45), (14, 35.5917),
    (15, 38.3667), (16, 34.925), (17, 37.7833), (18, 69.1083), (19, 70.2583),
    (20, 80.4667), (21, 73.4667), (22, 80.4667), (23, 64.225), (24, 63.075),
]
_BETWEENNESS_DIRECTED_SQL = (
    "SELECT CAST(node AS BIGINT) AS node, CAST(score AS DOUBLE) AS score"
    " FROM (VALUES "
    + ", ".join(f"({n}, {s})" for n, s in _BETWEENNESS_DIRECTED_SCORES)
    + ") t(node, score)"
)


@_register("graph_betweenness", _BETWEENNESS_SQL)
def graph_betweenness(spark, sf_dir):
    """G3: Brandes betweenness over the nation graph (two-tier dispatcher:
    broadcast per-source Brandes here; the iterative lane-parallel DataFrame
    program beyond executor memory). Oracle: literal expected table — see
    _BETWEENNESS_SQL's derivation note."""
    from routing_algorithm_for_graph_dbs_spark.graph.betweenness import betweenness

    e = _nation_edges(spark, sf_dir)
    res = betweenness(e)
    return res.select(
        F.col("node").cast("long").alias("node"), F.round("score", 4).alias("score")
    )


def _nation_edges_directed(spark, sf_dir):
    """Asymmetric nation graph: within-region clique directed low->high key
    only, plus the one-way +7 ring — deliberately NOT vertex-transitive so
    betweenness scores differ across nodes."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("rg"))
    b = n.select(F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("rg"))
    clique = a.join(b, "rg").filter(F.col("src") < F.col("dst")).select("src", "dst")
    ring = n.select(
        F.col("n_nationkey").alias("src"),
        ((F.col("n_nationkey") + 7) % 25).alias("dst"),
    )
    return (
        clique.unionByName(ring)
        .distinct()
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
    )


@_register("graph_betweenness_directed", _BETWEENNESS_DIRECTED_SQL)
def graph_betweenness_directed(spark, sf_dir):
    """G3 on a non-symmetric digraph: 12 distinct betweenness values, so the
    value-hash check discriminates (the symmetric nation graph's scores are
    all equal — a constant-valued oracle would pass trivially)."""
    from routing_algorithm_for_graph_dbs_spark.graph.betweenness import betweenness

    e = _nation_edges_directed(spark, sf_dir)
    res = betweenness(e)
    return res.select(
        F.col("node").cast("long").alias("node"), F.round("score", 4).alias("score")
    )


# =====================================================================
# deterministic sampling + sequence packing (operators/sampling.py)
# =====================================================================

_MIX_RATES = {"en": 0.9, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.2}


@_register(
    "smp_mixture",
    """
    WITH u AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS uu
      FROM documents
    )
    SELECT doc_id, lang, ROUND(uu, 6) AS u
    FROM u
    WHERE uu < CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.5
                         WHEN 'fr' THEN 0.5 WHEN 'es' THEN 0.5
                         WHEN 'zh' THEN 0.2 ELSE 0.0 END
    """,
)
def smp_mixture(spark, sf_dir):
    """Deterministic mixture sampling: per-language keep rates, decision a
    pure function of doc_id (sampling.mixture_sample) — rerun-stable and
    engine-exact, unlike rand()."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        hash_uniform,
        mixture_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    out = mixture_sample(docs, _MIX_RATES, group_col="lang")
    return out.select(
        F.col("doc_id").cast("long"),
        "lang",
        F.round(hash_uniform(F.col("doc_id"), "mix"), 6).alias("u"),
    )


@_register(
    "smp_stratified",
    """
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM r WHERE rn <= 10
    """,
)
def smp_stratified(spark, sf_dir):
    """Exact-count stratified sampling: 10 docs per language by
    deterministic hash order (sampling.stratified_sample)."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        stratified_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", 10)
    return out.select(F.col("doc_id").cast("long"), "lang")


@_register(
    "pack_shards",
    r"""
    WITH t AS (
      SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS toks
      FROM documents
    )
    SELECT doc_id, toks,
           CAST(FLOOR(COALESCE(SUM(toks) OVER (
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS shard_id
    FROM t
    """,
)
def pack_shards(spark, sf_dir):
    """Sequence packing: documents in doc_id order fill fixed 512-token
    shards (sampling.pack_sequences — distributed two-pass prefix sum; the
    oracle is the single-window formulation, equality tested in pytest)."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        pack_sequences,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.text import token_counts

    docs = token_counts(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long"), F.col("ws_tokens").cast("long").alias("toks")
    )
    return pack_sequences(docs, "toks", budget=512)


@_register(
    "txt_top_ngrams",
    r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               list_filter(list_zip(t, t[2:]), x -> x[2] IS NOT NULL),
               x -> x[1] || ' ' || x[2])) AS gs
      FROM toks WHERE len(t) >= 2
    ), g AS (
      SELECT doc_id, unnest(gs) AS gram FROM sh
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM g GROUP BY gram
    ORDER BY doc_freq DESC, gram
    LIMIT 20
    """,
)
def txt_top_ngrams(spark, sf_dir):
    """Heavy hitters: top-20 word bigrams by document frequency (distinct
    per doc via word_shingles, so a gram repeated inside one document counts
    once). Map-side partial agg + TakeOrdered — no global sort materializes."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        normalize_text,
        word_shingles,
    )

    docs = _t(spark, sf_dir, "documents")
    docs = docs.filter(F.size(F.split(normalize_text(F.col("text")), " ")) >= 2)
    grams = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), n=2)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "gram")
        .limit(20)
    )


@_register(
    "txt_corpus_stats",
    r"""
    WITH t AS (
      SELECT lang,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS toks
      FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_toks,
           ROUND(AVG(toks), 4) AS avg_toks,
           ROUND(quantile_cont(toks, 0.25), 4) AS p25,
           ROUND(quantile_cont(toks, 0.50), 4) AS p50,
           ROUND(quantile_cont(toks, 0.90), 4) AS p90
    FROM t GROUP BY lang
    """,
)
def txt_corpus_stats(spark, sf_dir):
    """Per-language corpus statistics with EXACT interpolated percentiles
    (Spark `percentile` == DuckDB `quantile_cont`, both type-7) — the
    shard-size / length-filter calibration step of a data pipeline."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import token_counts

    t = token_counts(_t(spark, sf_dir, "documents")).select(
        "lang", F.col("ws_tokens").alias("toks")
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_toks"),
        F.round(F.avg("toks"), 4).alias("avg_toks"),
        F.round(F.percentile("toks", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("toks", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("toks", F.lit(0.90)), 4).alias("p90"),
    )


@_register(
    "dd_canonical",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE}, {_SIG8_CTE}, {_BANDED_CTE},
    cands AS ({_CANDS_SQL}),
    pairs AS (
      SELECT c.a, c.b
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.a
      JOIN sh sb ON sb.doc_id = c.b
      WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
            / len(list_distinct(sa.shingles || sb.shingles)) >= 0.7
    ),
    edges AS (
      SELECT a AS s, b AS d FROM pairs UNION SELECT b AS s, a AS d FROM pairs
    ),
    reach AS (
      SELECT s AS node, d AS r FROM edges
      UNION
      SELECT reach.node, edges.d FROM reach JOIN edges ON reach.r = edges.s
    ),
    rep AS (
      SELECT node, LEAST(node, MIN(r)) AS canon FROM reach GROUP BY node
    )
    SELECT d.doc_id, COALESCE(rep.canon, d.doc_id) AS canon_id
    FROM (SELECT doc_id FROM sh) d
    LEFT JOIN rep ON rep.node = d.doc_id
    """,
)
def dd_canonical(spark, sf_dir):
    """Duplicate-cluster canonicalization: transitive closure of the
    verified near-dup pairs via connected components (min-label
    propagation), every document mapped to its cluster representative (the
    minimum doc_id; singletons map to themselves). The strict-transitive
    complement to minhash_dedup's greedy drop — the oracle closes the pair
    graph with a recursive CTE."""
    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _min3_docs(spark, sf_dir)
    sigs = minhash_signatures(docs, num_hashes=8, hash_fn="md5")
    cands = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    pairs = jaccard_verify(cands, docs, threshold=0.7)
    comp = connected_components(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    return (
        docs.select(F.col("doc_id").cast("long"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).cast("long").alias("canon_id"),
        )
    )


# =====================================================================
# embedding compression + corpus scrubbing
# =====================================================================


@_register(
    "emb_quantize",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
      FROM e
    )
    SELECT vec_id,
           array_to_string(CASE WHEN sc = 0 THEN list_transform(v, x -> 0)
                ELSE list_transform(v, x ->
                  CAST(GREATEST(-127, LEAST(127, FLOOR(x / sc + 0.5))) AS INT))
           END, ',') AS q8,
           ROUND(sc, 9) AS q_scale
    FROM s
    """,
)
def emb_quantize(spark, sf_dir):
    """Symmetric int8 embedding quantization (similarity.quantize_int8):
    floor(x/scale + 0.5) is engine-exact where round() is not (negative-half
    disagreement). q8 is serialized as a comma-joined string because the
    driver's pandas canonicalizer cannot sort array cells."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        quantize_int8,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return quantize_int8(emb).select(
        F.col("vec_id").cast("long"),
        F.concat_ws(",", F.col("q8").cast("array<string>")).alias("q8"),
        F.round("q_scale", 9).alias("q_scale"),
    )


def _proj_sql(out_dim: int, dim: int = 64) -> str:
    import math

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        hyperplanes,
    )

    inv = repr(1.0 / math.sqrt(out_dim))
    comps = ",\n           ".join(
        f"ROUND(list_dot_product(v, ["
        + ", ".join(repr(w) for w in p)
        + f"]) * {inv}, 6) AS c{i}"
        for i, p in enumerate(hyperplanes(dim, out_dim, seed=42))
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)\n"
        f"    SELECT vec_id,\n           {comps}\n    FROM e"
    )


@_register("emb_random_proj", _proj_sql(8))
def emb_random_proj(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64 -> 8 dims
    (similarity.random_projection); the deterministic plane matrix is inlined
    into the oracle as literals, like ann_lsh_pairs does."""
    from routing_algorithm_for_graph_dbs_spark.operators.similarity import (
        random_projection,
    )

    emb = _t(spark, sf_dir, "embeddings")
    out = random_projection(emb, out_dim=8)
    return out.select(
        F.col("vec_id").cast("long"),
        *[
            F.round(F.element_at("proj", i + 1), 6).alias(f"c{i}")
            for i in range(8)
        ],
    )


from routing_algorithm_for_graph_dbs_spark.operators.text import (  # noqa: E402
    EMAIL_PATTERN as _SCRUB_EMAIL,
    URL_PATTERN as _SCRUB_URL,
)


@_register(
    "txt_scrub",
    rf"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com via https://ex.org/d/'
                       || CAST(doc_id AS VARCHAR)
                  ELSE text END AS t
      FROM documents
    ), s AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '{_SCRUB_URL}', 0)) AS BIGINT)
               AS n_urls,
             regexp_replace(t, '{_SCRUB_URL}', '<URL>', 'g') AS no_urls
      FROM aug
    )
    SELECT doc_id, n_urls,
           CAST(len(regexp_extract_all(no_urls, '{_SCRUB_EMAIL}', 0)) AS BIGINT)
             AS n_emails,
           md5(regexp_replace(no_urls, '{_SCRUB_EMAIL}', '<EMAIL>', 'g'))
             AS scrub_md5
    FROM s
    """,
)
def txt_scrub(spark, sf_dir):
    """URL + email scrubbing (text.scrub_text). The synthetic corpus carries
    no addresses, so the query plants deterministic ones on every 5th doc —
    the oracle must then agree on extraction counts AND the masked text's
    md5."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import scrub_text

    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com via https://ex.org/d/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    out = scrub_text(aug, text_col="t")
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("n_urls").cast("long"),
        F.col("n_emails").cast("long"),
        F.md5("scrubbed").alias("scrub_md5"),
    )


@_register(
    "smp_replicate",
    """
    WITH rt AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'zh' THEN 2.5 WHEN 'es' THEN 1.25
                       WHEN 'en' THEN 0.5 ELSE 0.0 END AS rate,
             ('0x' || substr(md5('rep' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM documents
    ), n AS (
      SELECT doc_id, lang,
             CAST(FLOOR(rate) AS INT)
               + CASE WHEN u < rate - FLOOR(rate) THEN 1 ELSE 0 END AS nc
      FROM rt
    )
    SELECT doc_id, lang, CAST(unnest(generate_series(1, nc)) AS BIGINT) AS copy_id
    FROM n WHERE nc > 0
    """,
)
def smp_replicate(spark, sf_dir):
    """Deterministic weighted replication (upsampling low-resource
    languages): floor(rate) copies + one hash-decided extra, expected
    copies == rate with zero rerun variance (sampling.weighted_replicate)."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        weighted_replicate,
    )

    docs = _t(spark, sf_dir, "documents")
    out = weighted_replicate(
        docs, {"zh": 2.5, "es": 1.25, "en": 0.5}, group_col="lang"
    )
    return out.select(
        F.col("doc_id").cast("long"), "lang", F.col("copy_id").cast("long")
    )


@_register(
    "smp_ntile",
    r"""
    WITH t AS (
      SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS toks
      FROM documents
    )
    SELECT doc_id, toks,
           CAST(NTILE(10) OVER (ORDER BY toks, doc_id) AS BIGINT) AS bin
    FROM t
    """,
)
def smp_ntile(spark, sf_dir):
    """Length-decile curriculum binning via the distributed exact NTILE
    (sampling.ntile_by) — no single-partition global window; bit-identical
    to SQL NTILE including remainder buckets."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import ntile_by
    from routing_algorithm_for_graph_dbs_spark.operators.text import token_counts

    docs = token_counts(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long"), F.col("ws_tokens").cast("long").alias("toks")
    )
    return ntile_by(docs, 10, ["toks", "doc_id"]).withColumn(
        "bin", F.col("bin").cast("long")
    )


@_register(
    "skw_count_distinct",
    """
    SELECT l_partkey AS pkey,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct
    FROM lineitem GROUP BY l_partkey
    """,
)
def skw_count_distinct(spark, sf_dir):
    """Exact COUNT(DISTINCT) via the two-stage skew-resistant shape
    (operators/skew.py skew_count_distinct): the first shuffle partitions on
    (key, value) so a hot key spreads across the cluster; equality to the
    naive plan is also pytest-asserted."""
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        skew_count_distinct,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pkey"), "l_suppkey"
    )
    return skew_count_distinct(li, ["pkey"], "l_suppkey")


@_register(
    "st_enriched_counts",
    """
    WITH dim AS (
      SELECT i AS user_id, 'seg' || CAST(i % 4 AS VARCHAR) AS segment
      FROM generate_series(0, 9999) t(i) WHERE i % 4 <> 3
    )
    SELECT strftime(time_bucket(INTERVAL '1 hour', e.ts), '%Y-%m-%d %H:%M:%S')
             AS win_start,
           COALESCE(d.segment, 'unknown') AS segment,
           COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sum_val
    FROM events e LEFT JOIN dim d ON d.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def st_enriched_counts(spark, sf_dir):
    """Batch twin of streaming.pipelines.enriched_segment_counts: the
    stream-static enrichment join + windowed per-segment rollup, on the
    same deterministic user->segment dim (ids % 4 == 3 absent ->
    'unknown'). Stream == batch is asserted in tests/test_streaming.py."""
    from routing_algorithm_for_graph_dbs_spark.streaming.pipelines import (
        enriched_segment_counts,
        user_segments,
    )

    ev = _t(spark, sf_dir, "events")
    return enriched_segment_counts(ev, user_segments(spark))


@_register(
    "f10_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
    FROM events
    """,
)
def f10_json_extract(spark, sf_dir):
    """F8-family JSON accessors over the events.props payload column:
    path extraction with typed cast, absent paths -> NULL (identical
    semantics in Spark's get_json_object and DuckDB's
    json_extract_string)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("long"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.missing").cast("long").alias("absent"),
    )


@_register(
    "pipe_corpus_prep",
    r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS toks
      FROM documents
    ), kept AS (
      SELECT doc_id, lang, toks FROM t
      WHERE toks >= 20
        AND ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              / 4294967296.0
            < CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.5
                        WHEN 'fr' THEN 0.5 WHEN 'es' THEN 0.5
                        WHEN 'zh' THEN 0.2 ELSE 0.0 END
    )
    SELECT doc_id, lang, toks,
           CAST(FLOOR(COALESCE(SUM(toks) OVER (
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) / 1024.0) AS BIGINT) AS shard_id
    FROM kept
    """,
)
def pipe_corpus_prep(spark, sf_dir):
    """End-to-end corpus preparation, the operators composed as a user
    would: token-length floor -> deterministic per-language mixture
    sampling -> sequence packing into 1024-token shards. Every stage is a
    pure function of the data, so the whole pipeline is rerun-stable and
    the oracle reproduces it exactly."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        mixture_sample,
        pack_sequences,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.text import token_counts

    docs = token_counts(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long"),
        "lang",
        F.col("ws_tokens").cast("long").alias("toks"),
    )
    kept = mixture_sample(
        docs.filter(F.col("toks") >= 20), _MIX_RATES, group_col="lang"
    )
    return pack_sequences(kept, "toks", budget=1024)


@_register(
    "pack_shards_grouped",
    r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS toks
      FROM documents
    )
    SELECT doc_id, lang, toks,
           CAST(FLOOR(COALESCE(SUM(toks) OVER (
                  PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 512.0) AS BIGINT) AS shard_id
    FROM t
    """,
)
def pack_shards_grouped(spark, sf_dir):
    """Per-language sequence packing (sampling.pack_sequences_grouped):
    each language numbers its 512-token shards independently; offsets
    never touch the driver (broadcast-joined totals cumsum)."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        pack_sequences_grouped,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.text import token_counts

    docs = token_counts(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long"),
        "lang",
        F.col("ws_tokens").cast("long").alias("toks"),
    )
    return pack_sequences_grouped(docs, "toks", ["lang"], budget=512)


@_register(
    "apx_sketches",
    """
    SELECT l_returnflag AS rf,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
           TRUE AS hll_ok, TRUE AS p50_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def apx_sketches(spark, sf_dir):
    """Approximate analytics with a hash-checkable accuracy contract:
    sketch values differ across engines by construction, so the oracle
    pins (a) the exact companion aggregates and (b) booleans asserting the
    approximations land within their documented error (HLL++ rsd=0.05;
    approx percentile rank error <= n/accuracy). A sketch drifting out of
    tolerance flips a flag and fails the value-hash.

    The percentile check is a RANK window, not a value-relative bound:
    l_quantity is dense integer data whose true median can sit exactly on
    a value boundary (uniform 1..50 puts it on 25|26), where the sketch's
    documented +-n/10000 rank wobble legitimately returns either side —
    a 2%-of-value tolerance flips on sample luck (caught by the sf0.3
    probe, round 8). Any value between the exact 0.498 and 0.502
    quantiles is within 20x the documented rank error; a broken sketch
    lands far outside."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("n_apx"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("p50_apx"),
        F.percentile("l_quantity", F.lit(0.498)).alias("p50_lo"),
        F.percentile("l_quantity", F.lit(0.502)).alias("p50_hi"),
    )
    return g.select(
        "rf",
        "n_exact",
        (
            F.abs(F.col("n_apx") - F.col("n_exact"))
            <= 0.05 * 3 * F.col("n_exact")
        ).alias("hll_ok"),
        (
            # floor/ceil: the exact quantile interpolates BETWEEN the
            # integer runs at the window edge; the sketch returns actual
            # (integer) data values, so snap the window outward
            (F.col("p50_apx") >= F.floor(F.col("p50_lo")))
            & (F.col("p50_apx") <= F.ceil(F.col("p50_hi")))
        ).alias("p50_ok"),
    )


@_register(
    "a8_rollup",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS rf,
           COALESCE(l_linestatus, '<all>') AS ls,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a8_rollup(spark, sf_dir):
    """OLAP subtotals: ROLLUP over (returnflag, linestatus) with GROUPING
    markers distinguishing real NULL groups from subtotal rows — the
    classic report shape Spark plans as a single expand + aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "g_rf",
            "g_ls",
            "n",
            "revenue",
        )
    )


@_register(
    "a9_pivot",
    """
    SELECT l_returnflag AS rf,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
                 THEN l_quantity END), 0), 2) AS qty_F,
           ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
                 THEN l_quantity END), 0), 2) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_pivot(spark, sf_dir):
    """Pivot with an explicit value list (Spark plans it as conditional
    aggregates — exactly the CASE formulation the oracle states)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy(F.col("l_returnflag").alias("rf"))
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "rf",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
    )


@_register(
    "u2_intersect_except",
    """
    WITH a AS (SELECT DISTINCT c_nationkey AS k FROM customer),
         b AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
    SELECT k, 'both' AS src FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    UNION ALL
    SELECT k, 'cust_only' AS src FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
    """,
)
def u2_intersect_except(spark, sf_dir):
    """U-family set operations beyond UNION ALL: INTERSECT and EXCEPT
    (distinct semantics on both engines), tagged and unioned into one
    checkable relation."""
    a = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    b = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    return (
        a.intersect(b).withColumn("src", F.lit("both"))
        .unionByName(a.exceptAll(b).withColumn("src", F.lit("cust_only")))
        .select(F.col("k").cast("long"), "src")
    )


@_register(
    "w4_rank_distributions",
    """
    SELECT s_suppkey AS skey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY s_nationkey
                 ORDER BY s_acctbal, s_suppkey), 6) AS prank,
           ROUND(CUME_DIST() OVER (PARTITION BY s_nationkey
                 ORDER BY s_acctbal, s_suppkey), 6) AS cdist
    FROM supplier
    """,
)
def w4_rank_distributions(spark, sf_dir):
    """W-family distribution functions: percent_rank and cume_dist per
    nation over account balance (total order via the key tiebreak)."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        F.col("s_suppkey").cast("long").alias("skey"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@_register(
    "f11_maps",
    """
    SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line_no,
           ROUND(map(['q', 'p'], [l_quantity, l_extendedprice])['q'][1], 2)
             AS m_qty,
           ROUND(map(['q', 'p'], [l_quantity, l_extendedprice])['p'][1], 2)
             AS m_price,
           CAST(cardinality(map(['q', 'p'],
                [l_quantity, l_extendedprice])) AS BIGINT) AS m_size
    FROM lineitem
    """,
)
def f11_maps(spark, sf_dir):
    """F-family map functions: construct a map column, extract by key,
    take its cardinality (DuckDB's map[key] yields a one-element list —
    the [1] unwraps it to Spark's element_at scalar)."""
    li = _t(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("q"), F.col("l_quantity"), F.lit("p"), F.col("l_extendedprice")
    )
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.round(F.element_at(m, "q"), 2).alias("m_qty"),
        F.round(F.element_at(m, "p"), 2).alias("m_price"),
        F.size(m).cast("long").alias("m_size"),
    )


# =====================================================================
# round 3: within-doc repetition, benchmark decontamination, SemDeDup
# =====================================================================


@_register(
    "txt_repetition",
    r"""
    WITH p AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
                 x -> trim(x)), x -> len(x) > 0) AS lines,
             list_filter(list_transform(regexp_split_to_array(text,
                 '[ \t\n\x0B\f\r]+'),
                 x -> trim(x)), x -> len(x) > 0) AS words
      FROM documents
    ), s AS (
      SELECT doc_id, lines, words,
             COALESCE(list_aggregate(list_transform(lines, x -> len(x)),
                 'sum'), 0) AS lc,
             COALESCE(list_aggregate(list_transform(list_distinct(lines),
                 x -> len(x)), 'sum'), 0) AS lcd,
             COALESCE(list_aggregate(list_transform(words, x -> len(x)),
                 'sum'), 0) AS wc,
             COALESCE(list_aggregate(list_transform(list_distinct(words),
                 x -> len(x)), 'sum'), 0) AS wcd
      FROM p
    ), fracs AS (
      SELECT doc_id,
        CASE WHEN len(lines) > 0 THEN ROUND((len(lines) -
             len(list_distinct(lines))) * 1.0 / len(lines), 6)
             ELSE 0.0 END AS dup_line_frac,
        CASE WHEN lc > 0 THEN ROUND((lc - lcd) * 1.0 / lc, 6)
             ELSE 0.0 END AS dup_line_char_frac,
        CASE WHEN len(words) > 0 THEN ROUND((len(words) -
             len(list_distinct(words))) * 1.0 / len(words), 6)
             ELSE 0.0 END AS dup_word_frac,
        CASE WHEN wc > 0 THEN ROUND((wc - wcd) * 1.0 / wc, 6)
             ELSE 0.0 END AS dup_word_char_frac
      FROM s
    ), toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks WHERE len(t) >= 2
    ), cnt AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ), top AS (
      SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS n_grams
      FROM cnt GROUP BY doc_id
    )
    SELECT f.doc_id, f.dup_line_frac, f.dup_line_char_frac,
           f.dup_word_frac, f.dup_word_char_frac,
           CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
           COALESCE(ROUND(t.top_cnt * 1.0 / t.n_grams, 6), 0.0)
             AS top_ngram_frac
    FROM fracs f LEFT JOIN top t USING (doc_id)
    """,
)
def txt_repetition(spark, sf_dir):
    """Gopher-style within-document repetition filters
    (text.repetition_profile): duplicate-part fractions at line and word
    granularity (count- and char-weighted) plus the most-frequent-bigram
    occupancy — ONE projection over one scan, zero shuffles/joins (each
    stat is a sorted-run fold over the part array). spread_for_compute:
    the work is regex-CPU-bound per row, so a byte-sized scan split must
    not serialize the corpus onto one core (no-op at real scale). Line-
    level columns exercise the canonical Gopher unit (the synthetic
    corpus is single-line, so they are structurally 0 here — the
    crafted-fixture pytest proves the line/paragraph semantics);
    word-level columns carry the real signal."""
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        repetition_profile,
    )

    docs = spread_for_compute(_t(spark, sf_dir, "documents"))
    # explicit whitespace class: Java's \s and RE2's \s disagree on \x0B
    # (vertical tab), so both engines get the same literal class.
    return repetition_profile(
        docs, parts={"line": r"\n", "word": r"[ \t\n\x0B\f\r]+"}, n=2
    )


@_register(
    "dd_decontaminate",
    f"""
    WITH {_SHINGLES_CTE},
    g AS (SELECT doc_id, unnest(shingles) AS gram FROM sh),
    b AS (SELECT DISTINCT gram, doc_id AS bench_id FROM g
          WHERE doc_id % 41 = 0),
    hits AS (
      SELECT g.doc_id, g.gram, b.bench_id
      FROM g JOIN b USING (gram) WHERE g.doc_id <> b.bench_id
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_shared_grams,
           CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_docs
    FROM hits GROUP BY doc_id
    """,
)
def dd_decontaminate(spark, sf_dir):
    """Benchmark decontamination (decontam.decontaminate): training
    documents sharing any word 3-gram with the 'benchmark' slice
    (doc_id % 41 = 0, standing in for an eval set), with shared-shingle
    and benchmark-doc counts. The corpus side reduces to distinct hashed
    shingles and probes a BROADCAST benchmark digest set — the 100 TB
    corpus never shuffles. Self-matches are excluded."""
    from routing_algorithm_for_graph_dbs_spark.operators.decontam import (
        decontaminate,
    )

    docs = _min3_docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    out = decontaminate(docs, bench, n=3)
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("n_shared_grams").cast("long"),
        F.col("n_bench_docs").cast("long"),
    )


@_register(
    "sem_dedup",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    -- centroid count scales as sqrt(n) like knn_ivf_join (round 9): the
    -- gate-sized pin of 8 made per-cell pair work quadratic at sf1.0
    c AS (
      SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < (SELECT GREATEST(8, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))
                      FROM e)
    ),
    assign AS (
      SELECT vec_id, cid, v,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id
               ORDER BY {_IVF_COS.format(x="v", y="cv")} DESC, cid
             ) AS rn
      FROM e CROSS JOIN c
    ),
    a AS (SELECT vec_id, cid, v FROM assign WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT l.vec_id
      FROM a l JOIN a r ON l.cid = r.cid AND r.vec_id < l.vec_id
      WHERE {_IVF_COS.format(x="l.v", y="r.v")} >= 0.35
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS centroid_id,
           (d.vec_id IS NULL) AS kept
    FROM a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
)
def sem_dedup(spark, sf_dir):
    """SemDeDup (similarity.semdedup): embedding-cosine near-dup pruning
    inside IVF clusters — drop every vector with a lower-keyed same-cluster
    neighbor at cosine >= threshold. Deterministic keep rule, one
    cluster-key equi-join; the demo threshold 0.35 fits the near-orthogonal
    synthetic embeddings (same rationale as ann_lsh_pairs). n_centroids =
    max(8, isqrt(n)) — sqrt-sized cells at every sf (round 9)."""
    import math

    from routing_algorithm_for_graph_dbs_spark.operators.similarity import semdedup

    emb = _t_spread(spark, sf_dir, "embeddings")
    # size the centroid count from the PLAIN scan, not the spread one: the
    # row count is identical, and a bare-parquet count(*) folds to footer
    # metadata (session parquet aggregate pushdown) instead of a scan job
    out = semdedup(
        emb,
        threshold=0.35,
        n_centroids=max(8, math.isqrt(_t(spark, sf_dir, "embeddings").count())),
    )
    return out.select(
        "vec_id", F.col("centroid_id").cast("long").alias("centroid_id"), "kept"
    )


@_register(
    "txt_sentence_dedup",
    """
    WITH s0 AS (
      SELECT doc_id, trim(x) AS s
      FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+')) AS x
            FROM documents)
    ), s AS (
      SELECT doc_id, md5(lower(s)) AS h, len(s) AS slen
      FROM s0 WHERE len(s) >= 20
    ), c AS (
      SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd
                     FROM s GROUP BY h) WHERE nd >= 2
    ), j AS (
      SELECT s.doc_id, s.slen, (c.h IS NOT NULL) AS dup
      FROM s LEFT JOIN c ON s.h = c.h
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_sentences,
      CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_sentences,
      ROUND(SUM(CASE WHEN dup THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
        AS dup_sentence_frac,
      ROUND(CASE WHEN SUM(slen) > 0
            THEN SUM(CASE WHEN dup THEN slen ELSE 0 END) * 1.0 / SUM(slen)
            ELSE 0.0 END, 6) AS dup_char_frac
    FROM j GROUP BY doc_id
    """,
)
def txt_sentence_dedup(spark, sf_dir):
    """Cross-corpus duplicate-sentence filter stats
    (text.sentence_dedup_stats): the RefinedWeb/C4 'drop repeated lines'
    pass at sentence granularity — per-doc counts and char fractions of
    sentences whose lowercase md5 appears in >= 2 distinct documents.
    Sentences shuffle as 16-byte digests, never text; count-distinct
    collapses to a (hash, doc) distinct before the per-hash count."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        sentence_dedup_stats,
    )

    return sentence_dedup_stats(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_sentences",
        "n_dup_sentences",
        "dup_sentence_frac",
        "dup_char_frac",
    )


@_register(
    "txt_chunks",
    """
    WITH d AS (
      SELECT doc_id, text, len(text) AS L FROM documents WHERE text IS NOT NULL
    ), n AS (
      SELECT doc_id, text,
             CASE WHEN L <= 512 THEN 1
                  ELSE CAST(ceil((L - 512) * 1.0 / 448) AS BIGINT) + 1 END AS nc
      FROM d
    ), c AS (
      SELECT doc_id, unnest(range(nc)) AS chunk_id, text FROM n
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 448 AS BIGINT) AS chunk_start,
           substr(text, CAST(chunk_id * 448 + 1 AS INT), 512) AS chunk_text,
           CAST(len(substr(text, CAST(chunk_id * 448 + 1 AS INT), 512))
                AS BIGINT) AS chunk_len
    FROM c
    """,
)
def txt_chunks(spark, sf_dir):
    """Fixed-size overlapping chunking (text.chunk_documents, 512 chars /
    64 overlap): the pre-embedding / context-window packing step. Map-side
    sequence+explode, no shuffle — a corpus chunks at scan speed."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import (
        chunk_documents,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return chunk_documents(docs, chunk_size=512, overlap=64).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_id",
        "chunk_start",
        "chunk_text",
        "chunk_len",
    )


@_register(
    "smp_negatives",
    """
    WITH ids AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS idx
      FROM embeddings
    ), n AS (SELECT COUNT(*) AS cnt FROM embeddings),
    cand AS (
      SELECT e.vec_id AS anchor, r.neg_rank,
             CAST(floor(
               (CAST(('0x' || substr(md5('neg' || CAST(e.vec_id AS VARCHAR)
                      || '|' || CAST(r.neg_rank AS VARCHAR)), 1, 8)) AS BIGINT)
                / 4294967296.0) * n.cnt) AS BIGINT) AS idx
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range(4)) AS neg_rank) r, n
    )
    SELECT c.anchor, CAST(c.neg_rank AS BIGINT) AS neg_rank,
           i.vec_id AS negative
    FROM cand c JOIN ids i USING (idx)
    WHERE i.vec_id <> c.anchor
    """,
)
def smp_negatives(spark, sf_dir):
    """Deterministic negative sampling (sampling.sample_negatives, k=4):
    per anchor, 4 pseudo-random other keys by md5-uniform draw over the
    dense key index — contrastive-training prep. Index via the two-pass
    prefix sum (no single-partition window); draws reproduce exactly in
    any md5-capable engine."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        sample_negatives,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return sample_negatives(emb, k=4).select(
        F.col("anchor").cast("long").alias("anchor"),
        "neg_rank",
        F.col("negative").cast("long").alias("negative"),
    )


@_register(
    "st_interval_join",
    """
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
    """,
)
def st_interval_join(spark, sf_dir):
    """Stream-stream interval join, batch twin
    (streaming.pipelines.view_click_interval_join — withWatermark is a
    documented no-op in batch): views matched to same-user clicks within
    12 hours after (sized to the synthetic feed's event density). State in the streaming form is bounded by horizon +
    watermark, not history; tests replay it with availableNow and compare
    to this exact batch answer."""
    from routing_algorithm_for_graph_dbs_spark.streaming.pipelines import (
        view_click_interval_join,
    )

    ev = _t(spark, sf_dir, "events")
    return view_click_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        horizon="12 hours",
    )


def _pagerank_oracle_sql(iterations: int = 10, d: float = 0.85) -> str:
    """Unrolled power iteration — one CTE per step, so DuckDB reproduces
    the fixed-iteration PageRank without recursive aggregation (which SQL
    recursive CTEs disallow). The directed nation graph has no dangling
    vertices (every node carries a one-way ring out-edge), so the update
    is pr' = (1-d)/n + d * inflow exactly as in graph/pagerank.py."""
    parts = [
        """WITH e AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      UNION
      SELECT n_nationkey, (n_nationkey + 7) % 25 FROM nation
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    v AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    nn AS (SELECT COUNT(*) AS n FROM v),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM v)"""
    ]
    for i in range(iterations):
        parts.append(
            f"""pr{i + 1} AS (
      SELECT v.node,
             (1 - {d}) / (SELECT n FROM nn)
               + {d} * COALESCE(c.inflow, 0.0) AS pr
      FROM v LEFT JOIN (
        SELECT e.dst AS node, SUM(p.pr / deg.deg) AS inflow
        FROM pr{i} p
        JOIN e ON e.src = p.node
        JOIN deg ON deg.src = p.node
        GROUP BY e.dst
      ) c ON v.node = c.node)"""
        )
    return (
        ",\n".join(parts)
        + f"""
    SELECT CAST(node AS BIGINT) AS node, ROUND(pr, 6) AS pr
    FROM pr{iterations}"""
    )


@_register("graph_pagerank", _pagerank_oracle_sql())
def graph_pagerank(spark, sf_dir):
    """PageRank (graph/pagerank.py, 10 fixed power iterations, d=0.85)
    over the directed nation graph — the GDS-catalog companion to G2/G3
    on the same cached-edge superstep machinery (one scheduler job per
    iteration). Oracle: the identical update unrolled as 10 CTEs."""
    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    e = _nation_edges_directed(spark, sf_dir)
    res = pagerank(e, damping=0.85, iterations=10)
    return res.select(
        F.col("node").cast("long").alias("node"), F.round("pr", 6).alias("pr")
    )


@_register(
    "ts_resample_ffill",
    """
    WITH b AS (
      SELECT user_id AS k, date_trunc('day', ts) AS day,
             COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_val
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT k, MIN(day) AS d0, MAX(day) AS d1 FROM b GROUP BY k
    ), grid AS (
      SELECT k, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM span
    )
    SELECT g.k AS user_id, strftime(g.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n,
           LAST_VALUE(b.sum_val IGNORE NULLS) OVER (
             PARTITION BY g.k ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ffill_sum
    FROM grid g LEFT JOIN b ON g.k = b.k AND g.day = b.day
    """,
)
def ts_resample_ffill(spark, sf_dir):
    """Daily resample + gap-fill + forward fill (asof.resample_daily):
    dense per-user day grid over each user's span, zero-count gap days,
    last non-empty sum carried forward — the timeseries densification
    operator (rollups / feature grids)."""
    from routing_algorithm_for_graph_dbs_spark.operators.asof import (
        resample_daily,
    )

    return resample_daily(_t(spark, sf_dir, "events")).select(
        F.col("user_id").cast("long").alias("user_id"),
        "day",
        "n",
        "ffill_sum",
    )


@_register(
    "graph_triangles",
    f"""
    WITH e0 AS ({_NATION_EDGES_SQL}),
    und AS (
      SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
    ),
    o AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    per_node AS (
      SELECT node, COUNT(*) AS triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    verts AS (SELECT DISTINCT a AS node FROM o UNION SELECT b FROM o)
    SELECT CAST(v.node AS BIGINT) AS node,
           CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles
    FROM verts v LEFT JOIN per_node p ON v.node = p.node
    """,
)
def graph_triangles(spark, sf_dir):
    """Per-node undirected triangle counts (graph/triangles.py) over the
    nation graph — wedge join + closing-edge probe, two hash equi-joins,
    each triangle once via low->high orientation. Oracle: the identical
    three-way join stated in SQL."""
    from routing_algorithm_for_graph_dbs_spark.graph.triangles import (
        triangle_counts,
    )

    return triangle_counts(_nation_edges(spark, sf_dir)).select(
        F.col("node").cast("long").alias("node"), "triangles"
    )


@_register(
    "graph_node_similarity",
    f"""
    WITH e0 AS ({_NATION_EDGES_SQL}),
    e AS (SELECT DISTINCT src, dst FROM e0),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    inter AS (
      SELECT l.src AS a, r.src AS b, COUNT(*) AS inter
      FROM e l JOIN e r ON l.dst = r.dst AND l.src < r.src
      GROUP BY l.src, r.src
    )
    SELECT CAST(i.a AS BIGINT) AS a, CAST(i.b AS BIGINT) AS b,
           CAST(i.inter AS BIGINT) AS inter,
           ROUND(i.inter * 1.0 / (da.deg + db.deg - i.inter), 6) AS jaccard
    FROM inter i
    JOIN deg da ON da.src = i.a
    JOIN deg db ON db.src = i.b
    """,
)
def graph_node_similarity(spark, sf_dir):
    """Neighbor-set Jaccard node similarity (graph/triangles.py
    node_similarity — gds.nodeSimilarity.stream shape) over the nation
    graph: pairs meet through the shared neighbor, never all-pairs."""
    from routing_algorithm_for_graph_dbs_spark.graph.triangles import (
        node_similarity,
    )

    return node_similarity(_nation_edges(spark, sf_dir)).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        "inter",
        "jaccard",
    )


@_register(
    "ev_zscore_outliers",
    """
    WITH s AS (
      SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type
    ), z AS (
      SELECT e.event_id, e.event_type AS etype,
             ROUND((e.value - s.m) / s.sd, 4) AS z
      FROM events e JOIN s ON e.event_type = s.event_type
    )
    SELECT event_id, etype, z, (abs(z) > 2.5) AS is_outlier
    FROM z
    """,
)
def ev_zscore_outliers(spark, sf_dir):
    """Per-group z-score outlier flagging over the event stream — the
    standard monitoring / data-cleaning pass. One combiner aggregation for
    per-type (mean, stddev) and a BROADCAST join back onto the fact scan:
    the 100 TB fact table never shuffles. The flag derives from the
    ROUNDED z on both engines, so the comparison boundary is identical
    cross-engine."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = F.round((F.col("value") - F.col("m")) / F.col("sd"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            F.col("event_type").alias("etype"),
            z.alias("z"),
        )
        .withColumn("is_outlier", F.abs(F.col("z")) > 2.5)
    )


@_register(
    "smp_cap_per_source",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substr(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) / 4294967296.0 ASC, doc_id ASC
             ) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def smp_cap_per_source(spark, sf_dir):
    """Per-source document cap (sampling.cap_per_group, n=10): keep at
    most 10 docs per source by the deterministic md5-uniform order — the
    anti-spam domain-capping pass. Window per group, never global."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        cap_per_group,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, "source", 10).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


def _kcore_oracle_sql(k: int = 6, iterations: int = 10) -> str:
    """Unrolled parallel peeling — one (degree filter, edge restriction)
    CTE pair per round; idempotent once converged, so a fixed unroll depth
    reproduces the Spark kernel's fixed iteration budget exactly."""
    # MATERIALIZED: each e{i} is referenced twice (its degree filter and
    # the next restriction); inlined CTEs would expand the scan tree
    # exponentially in the unroll depth (DuckDB hits the fd limit).
    parts = [
        """WITH raw AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS src, 1000000 + o_orderkey % 2000 AS dst
      FROM orders
    ),
    e0 AS MATERIALIZED (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw)"""
    ]
    for i in range(iterations):
        parts.append(
            f"""k{i} AS MATERIALIZED (
      SELECT src FROM e{i} GROUP BY src HAVING COUNT(*) >= {k}
    ),
    e{i + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i} e
      JOIN k{i} a ON e.src = a.src
      JOIN k{i} b ON e.dst = b.src
    )"""
        )
    return (
        ",\n".join(parts)
        + f"""
    SELECT CAST(src AS BIGINT) AS node,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{iterations} GROUP BY src"""
    )


@_register("graph_kcore", _kcore_oracle_sql())
def graph_kcore(spark, sf_dir):
    """6-core of the bipartite customer/order-bucket graph
    (graph/kcore.py — parallel peeling, one termination-checked job per
    round; 6 peel rounds cascade at sf0.01). Oracle: the identical
    peeling unrolled as CTE pairs."""
    from routing_algorithm_for_graph_dbs_spark.graph.kcore import k_core

    o = _t(spark, sf_dir, "orders")
    e = o.select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.lit(1000000) + F.col("o_orderkey") % 2000).cast("long").alias("dst"),
    ).distinct()
    return k_core(e, k=6, iterations=10).select(
        F.col("node").cast("long").alias("node"), "core_degree"
    )


@_register(
    "ev_conversion_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS view_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, v.view_ts, MIN(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.view_ts
      GROUP BY e.user_id, v.view_ts
    ), p AS (
      SELECT e.user_id, c.click_ts, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
      GROUP BY e.user_id, c.click_ts
    )
    SELECT v.user_id,
           epoch_us(v.view_ts) AS view_us,
           epoch_us(c.click_ts) AS click_us,
           epoch_us(p.purchase_ts) AS purchase_us,
           CASE WHEN p.purchase_ts IS NOT NULL THEN 'purchase'
                WHEN c.click_ts IS NOT NULL THEN 'click'
                ELSE 'view' END AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def ev_conversion_funnel(spark, sf_dir):
    """Per-user conversion funnel: first view, first click at-or-after it,
    first purchase at-or-after that — the chained-as-of analytic every
    event pipeline ships. Three combiner-friendly min-aggregations, each
    joined on user_id (the fact table shuffles on the user key once per
    stage; no windows over full history)."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id", "view_ts")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "click_ts"), "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id", "click_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c.select("user_id", "click_ts"), "user_id", "left")
        .join(p.select("user_id", "purchase_ts"), "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("view_ts").alias("view_us"),
            F.unix_micros("click_ts").alias("click_us"),
            F.unix_micros("purchase_ts").alias("purchase_us"),
            F.when(F.col("purchase_ts").isNotNull(), "purchase")
            .when(F.col("click_ts").isNotNull(), "click")
            .otherwise("view")
            .alias("stage"),
        )
    )


@_register(
    "smp_budget_mixture",
    """
    WITH t AS (
      SELECT source, SUM(n_chars) AS tot FROM documents GROUP BY source
    ), g AS (SELECT COUNT(*) AS ng FROM t),
    r AS (
      SELECT t.source,
             LEAST(1.0, (60000.0 / g.ng) / t.tot) AS rate
      FROM t, g
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5('budget' || CAST(d.doc_id AS VARCHAR)), 1, 8))
          AS BIGINT) / 4294967296.0 < r.rate
    """,
)
def smp_budget_mixture(spark, sf_dir):
    """Equal-share budget mixture (sampling.budget_mixture_sample,
    60k-char budget): every source thins deterministically toward
    budget/G chars; rates derive from exact integer aggregates, so the
    kept set reproduces bit-identically cross-engine."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        budget_mixture_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return budget_mixture_sample(docs, budget=60_000.0).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


@_register(
    "a10_histogram",
    """
    WITH s AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    ), b AS (
      SELECT CAST(LEAST(9, CAST(floor((l_extendedprice - s.lo)
                   / ((s.hi - s.lo) / 10)) AS BIGINT)) AS BIGINT) AS bucket
      FROM lineitem, s
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
)
def a10_histogram(spark, sf_dir):
    """Equi-width 10-bucket histogram of l_extendedprice — the profiling
    aggregate. Bounds come from one min/max pass broadcast back onto the
    scan (identical doubles both engines, so bucket edges agree exactly);
    the histogram itself is one combiner-friendly groupBy."""
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    s = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    return (
        li.crossJoin(F.broadcast(s))
        .select(
            F.least(
                F.lit(9),
                F.floor(
                    (F.col("l_extendedprice") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 10)
                ),
            )
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "txt_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g')), ' ')) AS tok
      FROM documents
      WHERE len(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g'))) > 0
    ), cnt AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), n AS (SELECT SUM(c) AS n FROM cnt),
    vocab AS (
      SELECT tok, c FROM cnt ORDER BY c DESC, tok ASC LIMIT 500
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           ROUND(AVG(CASE WHEN v.tok IS NOT NULL
                          THEN ln(v.c / n.n)
                          ELSE ln(0.5 / n.n) END), 6) AS avg_logprob
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok, n
    GROUP BY t.doc_id
    """,
)
def txt_unigram_logprob(spark, sf_dir):
    """Unigram log-probability fluency score — the model-free stand-in for
    a perplexity quality filter: corpus-derived top-500 vocabulary with
    exact counts (ties broken by token, so the vocab is deterministic),
    OOV tokens at half-count floor, per-doc mean log-prob. Scale shape:
    one combiner count aggregation, a tiny BROADCAST vocab join onto the
    token stream, one per-doc aggregation — the corpus shuffles once on
    (doc) for the final mean."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "),
            r"[ ]+",
            " ",
        )
    )
    toks = (
        docs.select("doc_id", norm.alias("nt"))
        .filter(F.length("nt") > 0)
        .select("doc_id", F.explode(F.split(F.col("nt"), " ")).alias("tok"))
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = cnt.agg(F.sum("c").alias("n"))
    vocab = cnt.orderBy(F.desc("c"), F.asc("tok")).limit(500)
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(
                F.avg(
                    F.when(
                        F.col("c").isNotNull(), F.log(F.col("c") / F.col("n"))
                    ).otherwise(F.log(F.lit(0.5) / F.col("n")))
                ),
                6,
            ).alias("avg_logprob"),
        )
    )


@_register(
    "graph_closeness",
    f"""
    WITH RECURSIVE e AS ({_NATION_EDGES_SQL}),
    v AS (SELECT DISTINCT src AS node FROM e UNION SELECT dst FROM e),
    r(lane, node, d) AS (
      SELECT node, node, 0 FROM v
      UNION
      SELECT r.lane, CAST(e.dst AS BIGINT), r.d + 1
      FROM r JOIN e ON e.src = r.node WHERE r.d < 12
    ),
    m AS (SELECT lane, node, MIN(d) AS d FROM r GROUP BY lane, node)
    SELECT CAST(lane AS BIGINT) AS node,
           ROUND((COUNT(*) - 1) * 1.0 / SUM(d), 6) AS closeness
    FROM m GROUP BY lane
    """,
)
def graph_closeness(spark, sf_dir):
    """Closeness centrality (gds.closeness shape): every vertex runs as a
    lane of ONE multi-source BFS kernel pass — the same machinery as G2,
    25 lanes for the price of one edge traversal per superstep — then
    closeness = (reached - 1) / sum(hop distances). Oracle: all-lanes
    recursive-CTE BFS."""
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import sssp

    e = _nation_edges(spark, sf_dir).withColumn("weight", F.lit(1.0))
    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    src = verts.select(F.col("node").alias("lane"), "node")
    res = sssp(e, src, track_paths=False)
    return (
        res.groupBy(F.col("lane").cast("long").alias("node"))
        .agg(
            F.round(
                (F.count(F.lit(1)) - 1) / F.sum("cost"), 6
            ).alias("closeness")
        )
    )


@_register(
    "txt_tfidf_top3",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g')), ' ')) AS tok
      FROM documents
      WHERE len(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g'))) > 0
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             ROUND(tf.tf * ln(nd.n * 1.0 / df.df), 6) AS score
      FROM tf JOIN df ON tf.tok = df.tok, nd
    ), ranked AS (
      SELECT doc_id, tok, score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, tok ASC
             ) AS rn
      FROM scored
    )
    SELECT doc_id, CAST(rn AS BIGINT) AS rn, tok, score
    FROM ranked WHERE rn <= 3
    """,
)
def txt_tfidf_top3(spark, sf_dir):
    """Top-3 TF-IDF terms per document — the keyword-extraction pass.
    Scores round to 6 BEFORE ranking on both engines (with term-asc ties),
    so a sub-rounding libm ulp cannot swap ranks cross-engine. Shape: two
    combiner aggregations (tf, df), a broadcast idf join onto tf, one
    per-doc window."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "),
            r"[ ]+",
            " ",
        )
    )
    toks = (
        docs.select("doc_id", norm.alias("nt"))
        .filter(F.length("nt") > 0)
        .select("doc_id", F.explode(F.split(F.col("nt"), " ")).alias("tok"))
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.count_distinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", F.col("rn").cast("long").alias("rn"), "tok", "score")
    )


@_register(
    "w5_moving_avg",
    """
    WITH d AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             ROUND(SUM(value), 2) AS day_sum
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           ROUND(AVG(day_sum) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 4) AS avg7
    FROM d
    """,
)
def w5_moving_avg(spark, sf_dir):
    """7-row trailing moving average of per-user daily sums — the
    smoothing window every metrics pipeline ships. Day sums round before
    the window so both engines average identical inputs; per-user
    partitioned frame, never global."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_sum"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return d.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.avg("day_sum").over(w), 4).alias("avg7"),
    )


@_register(
    "a11_corr_cov",
    """
    SELECT l_returnflag AS rflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_corr_cov(spark, sf_dir):
    """Correlation + sample covariance per group — the co-moment
    aggregates (feature screening / drift checks). One combiner-friendly
    aggregation; rounding absorbs sub-1e-10 accumulation-order noise."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("rflag")).agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_cov"),
    )


def _zorder_sql_expr(cols: list[str], bits: int = 16) -> str:
    """Unrolled Morton-interleave as SQL bit ops (mirror of
    sources.zorder.zorder_key — same bit positions, any engine)."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return " | ".join(terms)


@_register(
    "lay_zorder_key",
    f"""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           CAST(p_size AS BIGINT) AS p_size,
           CAST({_zorder_sql_expr(['p_partkey', 'p_size'])} AS BIGINT) AS zkey
    FROM part
    """,
)
def lay_zorder_key(spark, sf_dir):
    """Morton/Z-order key (sources.zorder.zorder_key) over (p_partkey,
    p_size) — the multi-column data-skipping layout device
    (OPTIMIZE ZORDER BY built from plain bit ops + repartitionByRange).
    The key is a pure deterministic bit interleave, hash-checked here;
    the locality payoff (per-file min/max footprints shrink on BOTH
    columns) is measured from parquet row-group stats in
    tests/test_layout.py."""
    from routing_algorithm_for_graph_dbs_spark.sources.zorder import zorder_key

    p = _t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.col("p_size").cast("long").alias("p_size"),
        zorder_key([F.col("p_partkey"), F.col("p_size")]).alias("zkey"),
    )


@_register(
    "dq_constraint_checks",
    """
    SELECT 'qty_positive' AS rule,
           CAST(SUM(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT)
             AS violations, CAST(COUNT(*) AS BIGINT) AS rows_checked
    FROM lineitem
    UNION ALL
    SELECT 'price_nonneg',
           CAST(SUM(CASE WHEN NOT (l_extendedprice >= 0) THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'shipdate_not_null',
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'discount_in_range',
           CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1) THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM lineitem
    """,
)
def dq_constraint_checks(spark, sf_dir):
    """Data-quality constraint gate: violation counts for a rule set in
    ONE scan (conditional aggregation — not one job per rule), the
    expectation-checking pass a pipeline runs before promoting a batch.
    At 100 TB the single-pass shape is the whole point."""
    li = _t(spark, sf_dir, "lineitem")
    rules = {
        "qty_positive": F.col("l_quantity") > 0,
        "price_nonneg": F.col("l_extendedprice") >= 0,
        "shipdate_not_null": F.col("l_shipdate").isNotNull(),
        "discount_in_range": F.col("l_discount").between(0, 1),
    }
    agg = li.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.when(~cond, 1).otherwise(0)).alias(f"_v_{name}")
            for name, cond in rules.items()
        ],
    )
    stack = ", ".join(f"'{n}', _v_{n}" for n in rules)
    return agg.selectExpr(
        f"stack({len(rules)}, {stack}) as (rule, violations)", "_n as rows_checked"
    ).select(
        "rule",
        F.col("violations").cast("long"),
        F.col("rows_checked").cast("long"),
    )


@_register(
    "er_fuzzy_name_pairs",
    """
    WITH n AS (SELECT DISTINCT lower(p_name) AS n FROM part),
    b AS (SELECT n, substr(n, 1, 3) AS blk FROM n)
    SELECT a.n AS name_a, c.n AS name_b,
           CAST(levenshtein(a.n, c.n) AS BIGINT) AS dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.n < c.n
    WHERE levenshtein(a.n, c.n) <= 3
    """,
)
def er_fuzzy_name_pairs(spark, sf_dir):
    """Entity-resolution candidate pairs: distinct normalized names meet
    in a BLOCKED equi-join (3-char prefix block — never all-pairs) and
    survive on edit distance <= 3. The classic blocking+verify ER shape;
    at 100 TB the block key bounds the quadratic term exactly like LSH
    bands bound MinHash."""
    p = _t(spark, sf_dir, "part")
    n = p.select(F.lower("p_name").alias("n")).distinct()
    b = n.withColumn("blk", F.substring("n", 1, 3))
    a = b.select(F.col("n").alias("name_a"), "blk")
    c = b.select(F.col("n").alias("name_b"), "blk")
    return (
        a.join(c, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
    )


@_register(
    "w6_inactivity_gaps",
    """
    WITH g AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id))) / 3600000000.0
               AS gap_h
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_h) AS BIGINT) AS n_gaps,
           ROUND(MAX(gap_h), 4) AS max_gap_h,
           ROUND(AVG(gap_h), 4) AS avg_gap_h
    FROM g GROUP BY user_id
    """,
)
def w6_inactivity_gaps(spark, sf_dir):
    """Per-user inactivity gaps (churn signal): lag over the user's event
    stream (event_id tiebreak for determinism), gaps in hours, max/avg per
    user. Per-user partitioned window — never global."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / 3600000000.0
        ).alias("gap_h"),
    )
    return g.groupBy("user_id").agg(
        F.count("gap_h").alias("n_gaps"),
        F.round(F.max("gap_h"), 4).alias("max_gap_h"),
        F.round(F.avg("gap_h"), 4).alias("avg_gap_h"),
    )


@_register(
    "a12_cube",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS rflag,
           COALESCE(l_linestatus, '<all>') AS lstatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rflag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_lstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a12_cube(spark, sf_dir):
    """CUBE: all 2^k grouping-set subtotals in one pass (the ROLLUP
    sibling, a8_rollup) with GROUPING markers disambiguating real NULLs
    from subtotal rows. Catalyst expands to grouping sets with one
    shuffle — not 2^k scans."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rflag"),
            F.grouping("l_linestatus").cast("long").alias("g_lstatus"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("lstatus"),
            "g_rflag",
            "g_lstatus",
            "n",
            "sum_qty",
        )
    )


@_register(
    "smp_weighted_k",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROUND(POWER(
               CAST(('0x' || substr(md5('wsk' || CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) / 4294967296.0,
               1.0 / CAST(n_chars AS DOUBLE)), 9) AS s
      FROM documents
    ) ORDER BY s DESC, doc_id ASC LIMIT 100
    """,
)
def smp_weighted_k(spark, sf_dir):
    """Weighted sampling without replacement (sampling.weighted_sample_k,
    Efraimidis-Spirakis, k=100, weight = n_chars): longer documents are
    proportionally likelier, the drawn SET is deterministic and
    reproduced exactly by the oracle (scores round to 9 before ranking).
    Scan-expression score + TakeOrderedAndProject top-k."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        weighted_sample_k,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_sample_k(docs, k=100, weight_col="n_chars").select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )


@_register(
    "dq_column_profile",
    """
    WITH s AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_qty,
             COUNT(DISTINCT l_quantity) AS nd_qty,
             SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS null_rflag,
             COUNT(DISTINCT l_returnflag) AS nd_rflag,
             SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_ship,
             COUNT(DISTINCT l_shipdate) AS nd_ship
      FROM lineitem
    )
    SELECT col, CAST(nulls AS BIGINT) AS nulls,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(n AS BIGINT) AS rows_profiled
    FROM s, (VALUES ('l_quantity'), ('l_returnflag'), ('l_shipdate')) v(col),
    LATERAL (SELECT CASE col WHEN 'l_quantity' THEN null_qty
                             WHEN 'l_returnflag' THEN null_rflag
                             ELSE null_ship END AS nulls,
                    CASE col WHEN 'l_quantity' THEN nd_qty
                             WHEN 'l_returnflag' THEN nd_rflag
                             ELSE nd_ship END AS n_distinct) x
    """,
)
def dq_column_profile(spark, sf_dir):
    """Column profiling in ONE scan: null and exact distinct counts per
    profiled column via a single multi-aggregate pass, unpivoted to one
    row per column — the schema-drift / ingest-health summary. At 100 TB
    the single-pass shape (not one job per column) is the point."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_returnflag", "l_shipdate"]
    agg = li.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}")
            for c in cols
        ],
        *[F.count_distinct(F.col(c)).alias(f"_nd_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', _null_{c}, _nd_{c}" for c in cols)
    return agg.selectExpr(
        f"stack({len(cols)}, {stack}) as (col, nulls, n_distinct)",
        "_n as rows_profiled",
    ).select(
        "col",
        F.col("nulls").cast("long"),
        F.col("n_distinct").cast("long"),
        F.col("rows_profiled").cast("long"),
    )


@_register(
    "smp_train_val_test",
    """
    SELECT doc_id,
           CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 AS u
      FROM documents
    )
    """,
)
def smp_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split
    (sampling.train_val_test_split): assignment is a pure function of the
    key, so regenerating the corpus never leaks a document across the
    boundary — the property rand() splits lack. Scan expression, no
    shuffle."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        train_val_test_split,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return train_val_test_split(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"), "split"
    )


@_register(
    "ft_minmax_norm",
    """
    WITH s AS (
      SELECT source, MIN(n_chars) AS lo, MAX(n_chars) AS hi
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source,
           ROUND(CASE WHEN s.hi > s.lo
                 THEN (d.n_chars - s.lo) * 1.0 / (s.hi - s.lo)
                 ELSE 0.5 END, 6) AS n_chars_norm
    FROM documents d JOIN s ON d.source = s.source
    """,
)
def ft_minmax_norm(spark, sf_dir):
    """Per-group min-max feature scaling — normalize a numeric feature to
    [0,1] within its group (constant groups pin to 0.5). One combiner
    aggregation for the bounds, broadcast back onto the scan; the fact
    table never shuffles. The feature-engineering sibling of
    ev_zscore_outliers' standardization."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    s = docs.groupBy("source").agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    return (
        docs.join(F.broadcast(s), "source")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.round(
                F.when(
                    F.col("hi") > F.col("lo"),
                    (F.col("n_chars") - F.col("lo"))
                    * 1.0
                    / (F.col("hi") - F.col("lo")),
                ).otherwise(F.lit(0.5)),
                6,
            ).alias("n_chars_norm"),
        )
    )


@_register(
    "apx_mergeable_sketches",
    """
    SELECT event_type AS etype,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_exact,
           TRUE AS kll_ok, TRUE AS theta_ok
    FROM events GROUP BY event_type
    """,
)
def apx_mergeable_sketches(spark, sf_dir):
    """Mergeable DataSketches aggregates (Spark 4.x built-ins): per group,
    a KLL quantile sketch over `value` and a theta sketch over distinct
    users — the structures a 100 TB rollup keeps instead of raw keys
    (partition sketches merge associatively; no shuffle of raw values).
    Sketch internals differ across engines, so the oracle pins the exact
    companions plus booleans asserting each estimate honors its
    documented error (KLL k=200 rank error ~1.65%; theta ~2% at this
    cardinality) — same contract pattern as apx_sketches."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(F.col("event_type").alias("etype")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_distinct("user_id").alias("nd_exact"),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("value"), F.lit(0.5)
        ).alias("p50_kll"),
        F.percentile("value", F.lit(0.5)).alias("p50_exact"),
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias("nd_theta"),
    )
    # KLL rank error eps=~1.65% at k=200: the value at estimated rank 0.5
    # is the exact quantile of some rank in [0.5-eps, 0.5+eps]
    lo = F.percentile("value", F.lit(0.40))
    hi = F.percentile("value", F.lit(0.60))
    bounds = ev.groupBy(F.col("event_type").alias("etype")).agg(
        lo.alias("p40"), hi.alias("p60")
    )
    return (
        g.join(F.broadcast(bounds), "etype")
        .select(
            "etype",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("nd_exact").cast("long").alias("nd_exact"),
            ((F.col("p50_kll") >= F.col("p40")) & (F.col("p50_kll") <= F.col("p60"))).alias("kll_ok"),
            (
                F.abs(F.col("nd_theta") - F.col("nd_exact"))
                <= 0.02 * 3 * F.col("nd_exact") + F.lit(1.0)
            ).alias("theta_ok"),
        )
    )


@_register(
    "graph_harmonic",
    f"""
    WITH RECURSIVE e AS ({_NATION_EDGES_SQL}),
    v AS (SELECT DISTINCT src AS node FROM e UNION SELECT dst FROM e),
    r(lane, node, d) AS (
      SELECT node, node, 0 FROM v
      UNION
      SELECT r.lane, CAST(e.dst AS BIGINT), r.d + 1
      FROM r JOIN e ON e.src = r.node WHERE r.d < 12
    ),
    m AS (SELECT lane, node, MIN(d) AS d FROM r GROUP BY lane, node)
    SELECT CAST(lane AS BIGINT) AS node,
           ROUND(SUM(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END), 6) AS harmonic
    FROM m GROUP BY lane
    """,
)
def graph_harmonic(spark, sf_dir):
    """Harmonic centrality (gds.closeness.harmonic shape): sum of inverse
    hop distances over reachable vertices — the disconnection-robust
    sibling of graph_closeness, from the same single multi-source BFS
    kernel pass (every vertex a lane). Oracle: the all-lanes recursive
    CTE with the inverse-distance sum."""
    from routing_algorithm_for_graph_dbs_spark.graph.sssp import sssp

    e = _nation_edges(spark, sf_dir).withColumn("weight", F.lit(1.0))
    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    src = verts.select(F.col("node").alias("lane"), "node")
    res = sssp(e, src, track_paths=False)
    return res.groupBy(F.col("lane").cast("long").alias("node")).agg(
        F.round(
            F.sum(F.when(F.col("cost") > 0, 1.0 / F.col("cost")).otherwise(0.0)),
            6,
        ).alias("harmonic")
    )


@_register(
    "pipe_training_mix",
    """
    WITH split AS (
      SELECT doc_id, source, n_chars
      FROM documents
      WHERE CAST(('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) / 4294967296.0 < 0.8
    ), capped AS (
      SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY CAST(('0x' || substr(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) / 4294967296.0 ASC, doc_id ASC
               ) AS rn
        FROM split
      ) WHERE rn <= 15
    ), t AS (
      SELECT source, SUM(n_chars) AS tot FROM capped GROUP BY source
    ), g AS (SELECT COUNT(*) AS ng FROM t),
    r AS (
      SELECT t.source, LEAST(1.0, (30000.0 / g.ng) / t.tot) AS rate
      FROM t, g
    )
    SELECT c.doc_id, c.source
    FROM capped c JOIN r ON c.source = r.source
    WHERE CAST(('0x' || substr(md5('budget' || CAST(c.doc_id AS VARCHAR)), 1, 8))
          AS BIGINT) / 4294967296.0 < r.rate
    """,
)
def pipe_training_mix(spark, sf_dir):
    """Composed training-mix pipeline: train-side split (leakage-safe) ->
    per-source cap (anti-spam) -> equal-share char budget — three
    deterministic sampling stages chained exactly as a corpus build runs
    them, the whole chain hash-checked end to end. Every stage is a scan
    expression or a per-group window; the corpus shuffles once (the cap
    window)."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        budget_mixture_sample,
        cap_per_group,
        train_val_test_split,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    train = train_val_test_split(docs).filter(F.col("split") == "train").drop("split")
    capped = cap_per_group(train, "source", 15)
    mixed = budget_mixture_sample(capped, budget=30_000.0)
    return mixed.select(F.col("doc_id").cast("long").alias("doc_id"), "source")


# =====================================================================
# strongly connected components (directed; beyond-reference graph surface)
# =====================================================================

_NATION_SCC_EDGES_SQL = """
    SELECT src, dst FROM (
      SELECT k AS src, LEAD(k) OVER (PARTITION BY rg ORDER BY k) AS dst
      FROM (SELECT n_nationkey AS k, n_regionkey AS rg FROM nation)
    ) WHERE dst IS NOT NULL
    UNION ALL
    SELECT mx AS src, mn AS dst FROM (
      SELECT rg, MAX(k) AS mx, MIN(k) AS mn
      FROM (SELECT n_nationkey AS k, n_regionkey AS rg FROM nation)
      GROUP BY rg
    ) WHERE rg > 0
    UNION ALL
    SELECT a.mx AS src, b.mn AS dst
    FROM (SELECT rg, MAX(k) AS mx FROM
          (SELECT n_nationkey AS k, n_regionkey AS rg FROM nation) GROUP BY rg) a
    JOIN (SELECT rg, MIN(k) AS mn FROM
          (SELECT n_nationkey AS k, n_regionkey AS rg FROM nation) GROUP BY rg) b
      ON b.rg = a.rg + 1
"""


def _nation_scc_edges(spark, sf_dir):
    """Directed nation graph with a nontrivial condensation: within each
    region, nations form a key-ordered chain; regions 1-4 close the chain
    into a cycle (one 5-node SCC each) while region 0 stays open (five
    singleton SCCs); one-way bridges max(r) -> min(r+1) link the regions
    acyclically. 9 SCCs total — exercises both cycle detection and the
    DAG between components."""
    nk = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_regionkey").alias("rg")
    )
    w = Window.partitionBy("rg").orderBy("k")
    chain = (
        nk.withColumn("dst", F.lead("k").over(w))
        .filter(F.col("dst").isNotNull())
        .select(F.col("k").alias("src"), "dst")
    )
    agg = nk.groupBy("rg").agg(F.max("k").alias("mx"), F.min("k").alias("mn"))
    closing = agg.filter(F.col("rg") > 0).select(
        F.col("mx").alias("src"), F.col("mn").alias("dst")
    )
    nxt = agg.select((F.col("rg") - 1).alias("rg"), F.col("mn"))
    cross = (
        agg.select("rg", "mx")
        .join(nxt, "rg")
        .select(F.col("mx").alias("src"), F.col("mn").alias("dst"))
    )
    return (
        chain.unionByName(closing)
        .unionByName(cross)
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
    )


@_register(
    "graph_scc",
    f"""
    WITH RECURSIVE e AS ({_NATION_SCC_EDGES_SQL}),
    v AS (SELECT DISTINCT src AS node FROM e UNION SELECT dst FROM e),
    r(a, b) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b
    ),
    mutual AS (
      SELECT r1.a AS node, r1.b AS other
      FROM r r1 JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a
    )
    SELECT CAST(v.node AS BIGINT) AS node,
           CAST(LEAST(v.node, COALESCE(MIN(m.other), v.node)) AS BIGINT) AS scc
    FROM v LEFT JOIN mutual m ON m.node = v.node
    GROUP BY v.node
    """,
)
def graph_scc(spark, sf_dir):
    """Strongly connected components (directed — gds.scc shape): label =
    min vertex id under MUTUAL reachability. Two-tier (driver Tarjan /
    distributed forward-backward coloring, ``graph/scc.py``); the oracle
    is the transitive closure joined against its own transpose."""
    from routing_algorithm_for_graph_dbs_spark.graph.scc import (
        strongly_connected_components,
    )

    e = _nation_scc_edges(spark, sf_dir)
    res = strongly_connected_components(e)
    return res.select(F.col("node").cast("long"), F.col("scc").cast("long"))


_LPA_STEP_SQL = """
    c{i} AS (
      SELECT e.src AS node, l.lab AS lab, COUNT(*) AS c
      FROM e JOIN l{p} l ON l.node = e.dst GROUP BY e.src, l.lab
    ),
    l{i} AS (
      SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn
        FROM c{i}
      ) WHERE rn = 1
    )"""


@_register(
    "graph_labelprop",
    f"""
    WITH e AS ({_NATION_EDGES_SQL}),
    v AS (SELECT DISTINCT src AS node FROM e),
    l0 AS (SELECT node, node AS lab FROM v),
    {_LPA_STEP_SQL.format(i=1, p=0)},
    {_LPA_STEP_SQL.format(i=2, p=1)},
    {_LPA_STEP_SQL.format(i=3, p=2)}
    SELECT CAST(node AS BIGINT) AS node, CAST(lab AS BIGINT) AS community
    FROM l3
    """,
)
def graph_labelprop(spark, sf_dir):
    """Synchronous label-propagation communities, 3 deterministic rounds
    (gds.labelPropagation shape; ``graph/labelprop.py``). The oracle
    unrolls the identical rounds — most-frequent-neighbor-label with
    min-label tie-break — as chained CTEs."""
    from routing_algorithm_for_graph_dbs_spark.graph.labelprop import (
        label_propagation,
    )

    e = _nation_edges(spark, sf_dir)
    res = label_propagation(e, iterations=3)
    return res.select(F.col("node").cast("long"), F.col("community").cast("long"))


@_register(
    "upd_merge_upsert",
    """
    WITH tgt AS (
      SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal, c_mktsegment AS seg
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    src AS (
      SELECT o_custkey AS k,
             (SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) % 1000000) / 100.0 AS bal,
             'UPDATED' AS seg
      FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(s.k, t.k) AS k,
           CASE WHEN s.k IS NOT NULL THEN s.bal ELSE t.bal END AS bal,
           CASE WHEN s.k IS NOT NULL THEN s.seg ELSE t.seg END AS seg
    FROM tgt t FULL OUTER JOIN src s ON s.k = t.k
    """,
)
def upd_merge_upsert(spark, sf_dir):
    """MERGE INTO / upsert sink (reference S4 ``ON MATCH SET`` shape,
    SURVEY.md §2.1) as one full-outer join (``operators/merge.py``):
    customers with orders get balance+segment overwritten, order keys
    outside the target insert, customers without orders pass through.
    Cent-exact integer arithmetic keeps both engines bit-identical."""
    from routing_algorithm_for_graph_dbs_spark.operators.merge import merge_into

    target = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 != 0)
        .select(
            F.col("c_custkey").alias("k"),
            F.round("c_acctbal", 2).alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    source = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("_cents")
        )
        .select(
            "k",
            ((F.col("_cents") % 1000000) / 100.0).alias("bal"),
            F.lit("UPDATED").alias("seg"),
        )
    )
    return merge_into(target, source, keys=["k"])


@_register(
    "hist_scd2",
    """
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
             ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, t_us, rn FROM o
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           t_us AS valid_from,
           LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, rn) AS valid_to,
           LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, rn) IS NULL
             AS is_current
    FROM runs
    """,
)
def hist_scd2(spark, sf_dir):
    """SCD2 history build (``operators/history.py``): collapse each
    user's event-type change stream into validity intervals — two window
    passes over one key-partitioning, no self-join. Timestamps compare as
    epoch micros (exact on both engines)."""
    from routing_algorithm_for_graph_dbs_spark.operators.history import scd2_history

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us"), "event_id"
    )
    return scd2_history(
        ev, key="user_id", attr="event_type", ts="t_us", order_cols=["event_id"]
    )


@_register(
    "apx_hll_rollup",
    """
    SELECT event_type AS etype,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_exact,
           TRUE AS hll_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS etype,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_exact,
           TRUE AS hll_ok
    FROM events
    """,
)
def apx_hll_rollup(spark, sf_dir):
    """Re-aggregatable HLL rollup (Spark 4 DataSketches built-ins): the
    100 TB pattern where per-partition/per-group sketches are stored and
    MERGED upward instead of re-scanning raw keys — per-type
    hll_sketch_agg, then hll_union_agg for the grand total (never a
    second pass over user_id). Sketch bytes differ across engines, so
    the oracle pins exact companions + booleans asserting the estimates
    honor the documented error (lgConfigK=12 -> ~1.6% rel. std error;
    flag allows 3 sigma + 1)."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy(F.col("event_type").alias("etype")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("nd_exact"),
    )
    per.persist()
    per_rows = per.select(
        "etype",
        F.col("nd_exact").cast("long").alias("nd_exact"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("nd_exact"))
            <= 0.048 * F.col("nd_exact") + F.lit(1.0)
        ).alias("hll_ok"),
    )
    total_exact = ev.agg(F.count_distinct("user_id").alias("nd")).select("nd")
    tot_rows = (
        per.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("nd_hll"))
        .crossJoin(F.broadcast(total_exact))
        .select(
            F.lit("ALL").alias("etype"),
            F.col("nd").cast("long").alias("nd_exact"),
            (
                F.abs(F.col("nd_hll") - F.col("nd"))
                <= 0.048 * F.col("nd") + F.lit(1.0)
            ).alias("hll_ok"),
        )
    )
    return per_rows.unionByName(tot_rows)


@_register(
    "apx_top_k_types",
    """
    SELECT event_type AS etype, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type
    """,
)
def apx_top_k_types(spark, sf_dir):
    """approx_top_k heavy hitters (Spark 4 built-in frequent-items
    sketch) — ONE pass, mergeable, no shuffle of raw values. With k far
    above the true cardinality the sketch admits no error, so the rows
    are hash-comparable against the exact GROUP BY; at real 100 TB
    cardinalities the same call returns the guaranteed-superset top-k."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.expr("approx_top_k(event_type, 100)").alias("tk"))
        .select(F.explode("tk").alias("t"))
        .select(
            F.col("t.item").alias("etype"), F.col("t.count").cast("long").alias("cnt")
        )
    )


@_register(
    "w7_rolling_distinct",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS users
    FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
)
def w7_rolling_distinct(spark, sf_dir):
    """Rolling 7-day distinct users per day — the sliding-window
    COUNT(DISTINCT) no window function computes. Scale shape: each
    (day, user) pair EXPLODES into the <=7 window-ends it feeds (bounded
    fan-out, map-side) and a single count_distinct aggregation shuffles
    once on the day key — instead of the oracle's range join, which is
    quadratic in days per user. Window ends are semi-joined back to
    observed days so both engines emit the same day set."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    du.persist()
    days = du.select("d").distinct().withColumnRenamed("d", "e")
    contrib = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("e"),
        "user_id",
    )
    return (
        contrib.join(days, "e", "left_semi")
        .groupBy("e")
        .agg(F.count_distinct("user_id").alias("users"))
        .select(
            F.date_format("e", "yyyy-MM-dd").alias("day"),
            F.col("users").cast("long").alias("users"),
        )
    )


@_register(
    "idx_postings",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, t.term AS term
      FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
      WHERE t.term <> '' AND LENGTH(t.term) >= 3
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings
    FROM tok GROUP BY term HAVING COUNT(*) >= 5
    """,
)
def idx_postings(spark, sf_dir):
    """Inverted-index build (IR primitive for corpus search/dedup
    tooling): tokenize -> distinct (term, doc) -> posting lists. All
    map-side explode + one aggregation shuffle on the term key; postings
    capped at 20 sorted ids so hot terms (stopwords) bound both memory
    and the comparison payload — df keeps the true frequency. Postings
    are serialized as a comma-joined string so the driver's pandas
    canonicalizer (which cannot sort array cells) can hash the row."""
    docs = _t(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
        )
        .filter((F.col("term") != "") & (F.length("term") >= 3))
        .select("term", "doc_id")
        .distinct()
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20).alias("postings"),
        )
        .filter(F.col("df") >= 5)
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.concat_ws(",", F.col("postings").cast("array<string>")).alias(
                "postings"
            ),
        )
    )


@_register(
    "ts_ewma",
    """
    SELECT user_id,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (a, b) -> 0.7 * a + 0.3 * b), 6) AS ewma
    FROM events GROUP BY user_id
    """,
)
def ts_ewma(spark, sf_dir):
    """Grouped EWMA (alpha=0.3) — a per-key linear recurrence folded in
    an Arrow-batched applyInPandas (``operators/timeseries.py``; the one
    deliberate Python kernel class, like local_sssp). Both engines fold
    the identically-ordered series left to right, so doubles agree
    bitwise; the oracle is DuckDB's list_reduce over the same order."""
    from routing_algorithm_for_graph_dbs_spark.operators.timeseries import ewma_last

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    res = ewma_last(
        ev, key="user_id", ts="ts", value_col="value", alpha=0.3,
        order_cols=["event_id"],
    )
    return res.select("user_id", F.round("ewma", 6).alias("ewma"))


@_register(
    "dq_snapshot_diff",
    """
    WITH o AS (
      SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal
      FROM customer WHERE c_custkey % 10 <> 0
    ),
    n AS (
      SELECT c_custkey AS k,
             ROUND(ROUND(c_acctbal, 2)
                   + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END, 2) AS bal
      FROM customer WHERE c_custkey % 9 <> 0
    )
    SELECT COALESCE(n.k, o.k) AS k,
           CASE WHEN n.k IS NULL THEN o.bal ELSE n.bal END AS bal,
           CASE WHEN o.k IS NULL THEN 'I'
                WHEN n.k IS NULL THEN 'D' ELSE 'U' END AS op
    FROM o FULL OUTER JOIN n ON n.k = o.k
    WHERE o.k IS NULL OR n.k IS NULL OR o.bal IS DISTINCT FROM n.bal
    """,
)
def dq_snapshot_diff(spark, sf_dir):
    """Snapshot diff / changelog generation (``operators/merge.py
    snapshot_diff``): two table versions -> I/U/D rows in one full-outer
    join — the audit half of incremental maintenance (merge_into is the
    apply half). Simulated v2: drop key%9==0, bump balance on key%7==0;
    v1 drops key%10==0 — exercising every op branch."""
    from routing_algorithm_for_graph_dbs_spark.operators.merge import snapshot_diff

    cust = _t(spark, sf_dir, "customer")
    old = cust.filter(F.col("c_custkey") % 10 != 0).select(
        F.col("c_custkey").alias("k"), F.round("c_acctbal", 2).alias("bal")
    )
    new = cust.filter(F.col("c_custkey") % 9 != 0).select(
        F.col("c_custkey").alias("k"),
        F.round(
            F.round("c_acctbal", 2)
            + F.when(F.col("c_custkey") % 7 == 0, 100.0).otherwise(0.0),
            2,
        ).alias("bal"),
    )
    return snapshot_diff(old, new, keys=["k"])


_WALK_STEP_SQL = """
    w{i} AS (
      SELECT w.walk_id, n.dst AS cur,
             CASE WHEN n.dst IS NULL THEN w.walk
                  ELSE list_append(w.walk, CAST(n.dst AS BIGINT)) END AS walk
      FROM w{p} w LEFT JOIN nbr n
        ON n.src = w.cur
       AND n.rn = 1 + CAST(('0x' || substr(
             md5('walk' || CAST(w.walk_id AS VARCHAR) || '|{p}'), 1, 8))
             AS BIGINT) % n.deg
    )"""


@_register(
    "graph_random_walks",
    f"""
    WITH e AS ({_NATION_EDGES_SQL}),
    nbr AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
             COUNT(*) OVER (PARTITION BY src) AS deg
      FROM e
    ),
    w0 AS (SELECT DISTINCT src AS walk_id, src AS cur,
                  [CAST(src AS BIGINT)] AS walk FROM e),
    {_WALK_STEP_SQL.format(i=1, p=0)},
    {_WALK_STEP_SQL.format(i=2, p=1)},
    {_WALK_STEP_SQL.format(i=3, p=2)},
    {_WALK_STEP_SQL.format(i=4, p=3)}
    SELECT CAST(walk_id AS BIGINT) AS walk_id,
           array_to_string(walk, ',') AS walk FROM w4
    """,
)
def graph_random_walks(spark, sf_dir):
    """Hash-deterministic random-walk corpus (DeepWalk input;
    ``graph/walks.py``): one 4-step walk per vertex, neighbor choice =
    md5(walk_id|step) mod out-degree over rank-ordered neighbors — the
    reproducible-sampling discipline of operators/sampling.py applied to
    graph traversal. The oracle unrolls the identical steps. The walk is
    serialized as a comma-joined string so the driver's pandas
    canonicalizer (which cannot sort array cells) can hash the row."""
    from routing_algorithm_for_graph_dbs_spark.graph.walks import random_walks

    e = _nation_edges(spark, sf_dir)
    res = random_walks(e, length=4)
    return res.select(
        F.col("walk_id").cast("long").alias("walk_id"),
        F.concat_ws(",", F.col("walk").cast("array<string>")).alias("walk"),
    )


@_register(
    "a13_unpivot",
    """
    SELECT p_partkey AS pkey, 'retailprice' AS metric,
           ROUND(p_retailprice, 2) AS val
    FROM part
    UNION ALL
    SELECT p_partkey AS pkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    """,
)
def a13_unpivot(spark, sf_dir):
    """UNPIVOT / melt (wide -> long reshape; Spark's native ``unpivot``
    plan node — one Expand, no join, no shuffle). The oracle is the
    UNION ALL the operator is sugar for."""
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pkey"),
        F.round("p_retailprice", 2).alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return part.unpivot(["pkey"], ["retailprice", "size"], "metric", "val")


@_register(
    "txt_url_domains",
    """
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' via https://d' || CAST(doc_id % 17 AS VARCHAR)
                       || '.example.org/p and http://cdn.example.net/x'
                  ELSE text END AS t
      FROM documents
    ),
    d AS (
      SELECT doc_id, lower(dom) AS domain
      FROM aug, UNNEST(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1))
           AS u(dom)
    )
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS mentions,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs
    FROM d GROUP BY domain
    """,
)
def txt_url_domains(spark, sf_dir):
    """URL-domain frequency mining (``operators/text.py url_domains``) —
    the signal behind domain-blocklist corpus filtering. The synthetic
    corpus has no URLs, so every 3rd doc gets two deterministic ones
    (one unique-ish host, one shared CDN host) — same injection
    discipline as txt_scrub."""
    from routing_algorithm_for_graph_dbs_spark.operators.text import url_domains

    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" via https://d"),
                (F.col("doc_id") % 17).cast("string"),
                F.lit(".example.org/p and http://cdn.example.net/x"),
            ),
        ).otherwise(F.col("text")),
    )
    doms = url_domains(aug, text_col="t")
    return doms.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("mentions"),
        F.count_distinct("doc_id").cast("long").alias("docs"),
    )


@_register(
    "dq_dataset_fingerprint",
    """
    SELECT l_returnflag AS rflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           bit_xor(CAST(('0x' || substr(md5(
             CAST(l_orderkey AS VARCHAR) || chr(31) ||
             CAST(l_linenumber AS VARCHAR) || chr(31) ||
             l_linestatus), 1, 15)) AS BIGINT)) AS xor_fp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def dq_dataset_fingerprint(spark, sf_dir):
    """Order-insensitive dataset fingerprint (``operators/audit.py``):
    per-group XOR-fold of 60-bit row hashes + row count — content
    identity for snapshot audit at any scale (one scan, map-side
    combinable, partition-order invariant). The oracle recomputes the
    identical fold in DuckDB."""
    from routing_algorithm_for_graph_dbs_spark.operators.audit import (
        dataset_fingerprint,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rflag"),
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_linestatus",
    )
    return dataset_fingerprint(
        li, cols=["l_orderkey", "l_linenumber", "l_linestatus"], group_by=["rflag"]
    )


@_register(
    "ft_winsorize",
    """
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           ROUND(LEAST(GREATEST(e.value, b.p05), b.p95), 6) AS v_w
    FROM events e JOIN b ON b.event_type = e.event_type
    """,
)
def ft_winsorize(spark, sf_dir):
    """Winsorization (robust-stats feature clipping): per-group exact
    p05/p95 bounds broadcast back onto the scan, values clipped into
    [p05, p95] — tames heavy tails before normalization, the robust
    sibling of ft_minmax_norm. Spark's exact interpolated percentile ==
    DuckDB quantile_cont (same convention as txt_corpus_stats)."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            F.round(
                F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")), 6
            ).alias("v_w"),
        )
    )


@_register(
    "txt_source_kl",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g')), ' ')) AS tok
      FROM documents
      WHERE len(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g'))) > 0
    ),
    cg AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    vocab AS (SELECT tok, c FROM cg ORDER BY c DESC, tok ASC LIMIT 200),
    vq AS (SELECT tok, c / (SELECT SUM(c) FROM vocab) AS q FROM vocab),
    cs AS (
      SELECT t.source, t.tok, COUNT(*) AS c
      FROM toks t JOIN vocab v ON v.tok = t.tok
      GROUP BY t.source, t.tok
    ),
    ts AS (SELECT source, SUM(c) AS t FROM cs GROUP BY source)
    SELECT cs.source,
           ROUND(SUM((cs.c / ts.t) * LN((cs.c / ts.t) / vq.q)), 6) AS kl
    FROM cs JOIN ts ON ts.source = cs.source JOIN vq ON vq.tok = cs.tok
    GROUP BY cs.source
    """,
)
def txt_source_kl(spark, sf_dir):
    """Per-source KL divergence vs the corpus unigram distribution —
    drift/contamination detection for mixture monitoring. Deterministic
    top-200 vocabulary (count desc, token asc); distributions restricted
    to the vocab and renormalized, so KL needs no smoothing (q > 0
    everywhere, p = 0 terms vanish). Scale shape: one token count, a
    broadcast vocab join, one (source, tok) aggregation."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "),
            r"[ ]+",
            " ",
        )
    )
    toks = (
        docs.select("source", norm.alias("nt"))
        .filter(F.length("nt") > 0)
        .select("source", F.explode(F.split(F.col("nt"), " ")).alias("tok"))
    )
    cg = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = cg.orderBy(F.desc("c"), F.asc("tok")).limit(200)
    vtot = vocab.agg(F.sum("c").alias("vt"))
    vq = vocab.crossJoin(F.broadcast(vtot)).select(
        "tok", (F.col("c") / F.col("vt")).alias("q")
    )
    cs = (
        toks.join(F.broadcast(vocab.select("tok")), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ts = cs.groupBy("source").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    return (
        cs.join(ts, "source")
        .join(F.broadcast(vq), "tok")
        .groupBy("source")
        .agg(F.round(F.sum(p * F.log(p / F.col("q"))), 6).alias("kl"))
    )


@_register(
    "skw_bloom_join",
    """
    SELECT c.c_nationkey, COUNT(*) AS n_events, ROUND(SUM(e.value), 2) AS sum_val
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_nationkey
    """,
)
def skw_bloom_join(spark, sf_dir):
    """Selective fact-dim join with the fact side Bloom-prefiltered
    before its shuffle (operators/skew.py bloom_prefilter_join). The
    BUILDING-segment customers are the key set; most event rows can never
    match and are dropped at the scan instead of riding the Exchange.
    False positives are removed by the trailing exact join, so the result
    is identical to the plain join the oracle runs. At 100 TB this is the
    explicit form of the runtime bloom AQE may inject: build 32 KiB of
    bitset once, cut the fact shuffle by the join's selectivity."""
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        bloom_prefilter_join,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"), "value"
    )
    dim = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("long").alias("user_id"), "c_nationkey")
    )
    return (
        bloom_prefilter_join(ev, dim, ["user_id"])
        .groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_val"),
        )
    )


@_register(
    "ev_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    p AS (
      SELECT event_type, next_type, COUNT(*) AS n_transitions
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (SELECT event_type, SUM(n_transitions) AS tot FROM p GROUP BY 1)
    SELECT p.event_type, p.next_type, p.n_transitions,
           ROUND(p.n_transitions / t.tot, 6) AS p_next
    FROM p JOIN t ON t.event_type = p.event_type
    """,
)
def ev_markov_transitions(spark, sf_dir):
    """Click-path mining: the first-order Markov transition matrix over
    each user's event stream (LEAD per user ordered by (ts, event_id) —
    the id tiebreak makes same-microsecond sessions deterministic), with
    per-source-state transition probabilities. One window partitioned by
    user, one (type, next) aggregation, totals joined back via broadcast
    — the matrix is |event_type|^2 rows regardless of input size."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = pairs.groupBy("event_type").agg(F.sum("n_transitions").alias("tot"))
    return pairs.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("tot"), 6).alias("p_next"),
    )


@_register(
    "ev_cohort_retention",
    """
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    f AS (SELECT user_id, MIN(d) AS d0 FROM act GROUP BY 1)
    SELECT CAST(f.d0 AS VARCHAR) AS cohort_day,
           CAST(a.d - f.d0 AS INT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM act a JOIN f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def ev_cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-active day, then
    distinct-user counts at each day offset — the standard engagement
    matrix for corpus/user drift monitoring. Scale shape: activity is
    deduped to (user, day) FIRST (the shuffle carries user-days, not raw
    events), the per-user first-day aggregate rides the same user-keyed
    partitioning, and the output is |days|^2/2 rows."""
    act = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        act.join(first, "user_id")
        .groupBy(
            F.col("d0").cast("string").alias("cohort_day"),
            F.datediff("d", "d0").cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@_register(
    "txt_pmi_pairs",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g')), ' ')) AS tok
      FROM documents
      WHERE len(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g'))) > 0
    ),
    df AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    vocab AS (SELECT tok, c FROM df ORDER BY c DESC, tok ASC LIMIT 100),
    vt AS (SELECT t.doc_id, t.tok FROM toks t JOIN vocab v ON v.tok = t.tok),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS c_ab
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5
    )
    SELECT p.tok_a, p.tok_b, p.c_ab,
           ROUND(LN((CAST(p.c_ab AS DOUBLE) * n.n_docs) / (va.c * vb.c)), 6)
             AS pmi
    FROM pairs p
    JOIN vocab va ON va.tok = p.tok_a
    JOIN vocab vb ON vb.tok = p.tok_b
    CROSS JOIN n
    """,
)
def txt_pmi_pairs(spark, sf_dir):
    """Pointwise mutual information of top-vocabulary token pairs
    co-occurring in a document — collocation mining for corpus analysis.
    Scale shape: tokens dedup to (doc, tok) and are SEMI-JOINED against a
    broadcast top-100 doc-frequency vocabulary BEFORE the self-join, so
    the per-doc pair blowup is bounded by 100 choose 2 regardless of
    document length, and the output aggregation has at most 4,950 keys.
    Doc frequencies and the doc count join back as broadcasts."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "),
            r"[ ]+",
            " ",
        )
    )
    toks = (
        docs.select("doc_id", norm.alias("nt"))
        .filter(F.length("nt") > 0)
        .select("doc_id", F.explode(F.split(F.col("nt"), " ")).alias("tok"))
        .distinct()
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = dfreq.orderBy(F.desc("c"), F.asc("tok")).limit(100)
    vt = toks.join(F.broadcast(vocab.select("tok")), "tok").select("doc_id", "tok")
    n = toks.select(F.count_distinct("doc_id").alias("n_docs"))
    a = vt.alias("a")
    b = vt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    va = vocab.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca"))
    vb = vocab.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("n_docs"))
                    / (F.col("ca") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@_register(
    "upd_apply_cdc",
    """
    WITH tgt AS (
      SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal, c_mktsegment AS seg
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    log AS (
      SELECT o_custkey AS k, o_orderkey AS seq,
             CASE WHEN ('0x' || substr(md5('cdc' || CAST(o_orderkey AS VARCHAR)),
                        1, 8))::BIGINT % 5 = 0
                  THEN 'D' ELSE 'U' END AS op,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 1000000) / 100.0 AS bal,
             'CDC' AS seg
      FROM orders
    ),
    latest AS (
      SELECT k, op, bal, seg FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY k ORDER BY seq DESC,
          CASE WHEN op = 'D' THEN 1 ELSE 0 END DESC) AS rn
        FROM log
      ) WHERE rn = 1
    ),
    ups AS (SELECT k, bal, seg FROM latest WHERE op <> 'D'),
    merged AS (
      SELECT COALESCE(s.k, t.k) AS k,
             CASE WHEN s.k IS NOT NULL THEN s.bal ELSE t.bal END AS bal,
             CASE WHEN s.k IS NOT NULL THEN s.seg ELSE t.seg END AS seg
      FROM tgt t FULL OUTER JOIN ups s ON s.k = t.k
    )
    SELECT m.k, m.bal, m.seg FROM merged m
    WHERE NOT EXISTS (SELECT 1 FROM latest d WHERE d.op = 'D' AND d.k = m.k)
    """,
)
def upd_apply_cdc(spark, sf_dir):
    """CDC stream application (``operators/merge.py apply_cdc``): orders
    replayed as a per-customer change log (order key = sequence number,
    ~20% hash-chosen deletes), latest op per key wins — upsert or delete
    against the customer snapshot. Cent-exact balances keep both engines
    bit-identical; the md5-derived op flag is reproducible everywhere."""
    from routing_algorithm_for_graph_dbs_spark.operators.merge import apply_cdc

    target = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 != 0)
        .select(
            F.col("c_custkey").alias("k"),
            F.round("c_acctbal", 2).alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    op = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cdc"), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 5
        == 0,
        F.lit("D"),
    ).otherwise(F.lit("U"))
    changes = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("seq"),
        op.alias("op"),
        (
            (F.round(F.col("o_totalprice") * 100).cast("long") % 1000000) / 100.0
        ).alias("bal"),
        F.lit("CDC").alias("seg"),
    )
    return apply_cdc(target, changes, keys=["k"], seq_col="seq")


@_register(
    "hist_snapshot_asof",
    """
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
             ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, t_us, rn FROM o
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    ),
    hist AS (
      SELECT user_id, event_type,
             t_us AS valid_from,
             LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, rn) AS valid_to
      FROM runs
    ),
    mid AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS at_us
      FROM events
    )
    SELECT h.user_id, h.event_type, h.valid_from
    FROM hist h CROSS JOIN mid
    WHERE h.valid_from <= mid.at_us
      AND (h.valid_to IS NULL OR mid.at_us < h.valid_to)
    """,
)
def hist_snapshot_asof(spark, sf_dir):
    """Time travel over the SCD2 history (``operators/history.py
    snapshot_asof``): reconstruct every user's state at the corpus
    midpoint instant — one row per user active by then. The as-of filter
    is shuffle-free; the instant is computed once (min/max scalar) and
    broadcast. Intervals compare as epoch micros, exact on both
    engines."""
    from routing_algorithm_for_graph_dbs_spark.operators.history import (
        scd2_history,
        snapshot_asof,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    hist = scd2_history(ev, "user_id", "event_type", "t_us", order_cols=["event_id"])
    mid = ev.agg(
        # integer FLOOR division on both engines: double /2 + cast truncates
        # in Spark but rounds half-to-even in DuckDB's CAST, skewing the
        # instant by 1 us when min+max is odd
        F.expr("(min(t_us) + max(t_us)) div 2").alias("at_us")
    )
    snap = snapshot_asof(
        hist.crossJoin(F.broadcast(mid)), F.col("at_us")
    )
    return snap.select("user_id", "event_type", "valid_from")


@_register(
    "st_hopping_window",
    """
    WITH x AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - (s.i * INTERVAL '30 minutes') AS w,
             event_type, value
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) s
    )
    SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type AS etype, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_val
    FROM x GROUP BY 1, 2
    """,
)
def st_hopping_window(spark, sf_dir):
    """Hopping (sliding) event-time windows — 1 h length, 30 min slide:
    each event lands in exactly length/slide = 2 windows. Spark's
    ``window()`` emits the per-event window rows natively (streaming
    shape; batch semantics identical); the oracle reproduces the
    epoch-aligned window starts with two offset time_buckets."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            F.col("event_type").alias("etype"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "etype",
            "n",
            "sum_val",
        )
    )


@_register(
    "ft_percent_rank",
    """
    SELECT doc_id, n_chars,
           ROUND(PERCENT_RANK() OVER (ORDER BY n_chars), 6) AS pr
    FROM documents
    """,
)
def ft_percent_rank(spark, sf_dir):
    """Percentile-rank feature transform (``operators/sampling.py
    percent_rank_scaled``): the oracle's PERCENT_RANK window funnels the
    corpus through ONE task; the engine compresses to distinct lengths +
    counts, windows over that bounded relation, and broadcasts the
    value->rank map back onto the scan — bit-identical results, no
    single-partition pass over raw rows."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        percent_rank_scaled,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return percent_rank_scaled(docs, "n_chars", out_col="pr", round_to=6).select(
        "doc_id", "n_chars", "pr"
    )


@_register(
    "graph_lcc",
    f"""
    WITH e0 AS ({_NATION_EDGES_SQL}),
    und AS (
      SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
    ),
    und2 AS (SELECT src, dst FROM und WHERE src <> dst),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM und2 GROUP BY 1),
    o AS (SELECT src AS a, dst AS b FROM und2 WHERE src < dst),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    per_node AS (
      SELECT node, COUNT(*) AS triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    verts AS (SELECT DISTINCT a AS node FROM o UNION SELECT b FROM o)
    SELECT CAST(v.node AS BIGINT) AS node,
           CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN d.deg >= 2
                THEN ROUND(2.0 * COALESCE(p.triangles, 0)
                           / (d.deg * (d.deg - 1)), 6)
                ELSE 0.0 END AS lcc
    FROM verts v
    LEFT JOIN per_node p ON p.node = v.node
    JOIN deg d ON d.node = v.node
    """,
)
def graph_lcc(spark, sf_dir):
    """Local clustering coefficient (graph/triangles.py
    clustering_coefficient): triangle participation normalized by the
    undirected degree pair count — 2T/(d(d-1)), degree<2 -> 0. Same
    two-equi-join triangle kernel plus one degree aggregation, all
    node-keyed."""
    from routing_algorithm_for_graph_dbs_spark.graph.triangles import (
        clustering_coefficient,
    )

    return clustering_coefficient(_nation_edges(spark, sf_dir)).select(
        F.col("node").cast("long"), "triangles", "lcc"
    )


@_register(
    "dd_keep_best",
    """
    WITH n AS (
      SELECT doc_id, source, n_chars,
             md5(substr(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g')),
               1, 64)) AS grp
      FROM documents
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY grp ORDER BY n_chars DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS dup_count
      FROM n
    )
    SELECT grp, doc_id, source, n_chars, CAST(dup_count AS BIGINT) AS dup_count
    FROM r WHERE rn = 1
    """,
)
def dd_keep_best(spark, sf_dir):
    """Keep-best dedup (operators/dedup.py keep_best_dedup): duplicate
    groups keyed by the first 64 normalized chars, the LONGEST copy
    (doc_id-asc tie-break) survives — the keep-highest-quality policy,
    vs exact_dedup's keep-min-key. One max_by aggregation; the oracle
    states the same choice as a window rank."""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        keep_best_dedup,
        normalize_text,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.substring(normalize_text(F.col("text")), 1, 64)).alias("grp"),
    )
    best = keep_best_dedup(
        docs,
        ["grp"],
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("tb")),
    )
    return best.select("grp", "doc_id", "source", "n_chars", "dup_count")


@_register(
    "idx_conjunctive_search",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, t.term AS term
      FROM documents,
           UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
      WHERE t.term <> ''
    ),
    hits AS (
      SELECT doc_id FROM tok
      WHERE term IN ('data', 'merge', 'window')
      GROUP BY doc_id HAVING COUNT(*) = 3
    )
    SELECT h.doc_id, d.source, d.n_chars
    FROM hits h JOIN documents d ON d.doc_id = h.doc_id
    """,
)
def idx_conjunctive_search(spark, sf_dir):
    """Conjunctive (AND) term search through the inverted-index shape:
    tokenize -> distinct (doc, term) -> IN-filter to the 3 query terms ->
    per-doc term count == 3 -> join back for display columns. The term
    filter lands BEFORE the shuffle (only query-term postings move), the
    final join is doc-keyed — the scan-free search pattern idx_postings
    feeds at scale."""
    docs = _t(spark, sf_dir, "documents")
    terms = ["data", "merge", "window"]
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .distinct()
    )
    hits = (
        tok.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == len(terms))
        .select("doc_id")
    )
    return hits.join(docs.select("doc_id", "source", "n_chars"), "doc_id")


@_register(
    "ev_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS ad
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY 1)
    SELECT d.event_id,
           CASE WHEN x.mad = 0 THEN 0.0
                ELSE FLOOR(0.6745 * (d.value - d.med) / x.mad * 1e4 + 0.5)
                     / 1e4 END AS rz,
           CASE WHEN x.mad = 0 THEN FALSE
                ELSE ABS(0.6745 * (d.value - d.med) / x.mad) > 3.5 END
             AS is_outlier
    FROM d JOIN mad x ON x.event_type = d.event_type
    """,
)
def ev_mad_outliers(spark, sf_dir):
    """Robust (median/MAD) outlier flagging — the median-based twin of
    ev_zscore_outliers that a heavy-tailed corpus needs (means and stds
    are themselves dragged by the outliers). Two exact-percentile
    aggregations on the type key (Spark `percentile` == DuckDB
    `quantile_cont`), each joined back broadcast; flag at |robust z| >
    3.5 (Iglewicz-Hoaglin). rz is floor-rounded (floor(x*1e4+0.5)/1e4)
    on both engines — engine round() tie handling flipped last digits
    at sf0.1."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    d = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = d.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    rz = 0.6745 * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        d.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            F.when(F.col("mad") == 0, F.lit(0.0))
            .otherwise(F.floor(rz * 1e4 + F.lit(0.5)) / 1e4)
            .alias("rz"),
            F.when(F.col("mad") == 0, F.lit(False))
            .otherwise(F.abs(rz) > 3.5)
            .alias("is_outlier"),
        )
    )


@_register(
    "ts_interpolate",
    """
    WITH b AS (
      SELECT user_id AS k, time_bucket(INTERVAL '1 day', ts) AS day,
             FLOOR(CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
                   / NULLIF(COUNT(value), 0) * 1e6 + 0.5) / 1e6 AS v
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT k, MIN(day) AS d0, MAX(day) AS d1 FROM b GROUP BY k),
    grid AS (
      SELECT s.k, g.day
      FROM span s, UNNEST(generate_series(s.d0, s.d1, INTERVAL '1 day'))
        AS g(day)
    ),
    j AS (
      SELECT g.k, g.day, b.v,
             LAST_VALUE(b.v IGNORE NULLS) OVER
               (PARTITION BY g.k ORDER BY g.day
                ROWS UNBOUNDED PRECEDING) AS pv,
             LAST_VALUE(CASE WHEN b.v IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER (PARTITION BY g.k ORDER BY g.day
                     ROWS UNBOUNDED PRECEDING) AS pd,
             FIRST_VALUE(b.v IGNORE NULLS) OVER
               (PARTITION BY g.k ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN b.v IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER (PARTITION BY g.k ORDER BY g.day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM grid g LEFT JOIN b ON b.k = g.k AND b.day = g.day
    )
    SELECT k AS user_id, strftime(day, '%Y-%m-%d') AS day,
           v IS NOT NULL AS observed,
           FLOOR(COALESCE(v, pv + (nv - pv) *
             (date_diff('day', pd, day) * 1.0 / date_diff('day', pd, nd)))
             * 1e6 + 0.5) / 1e6 AS v_interp
    FROM j
    """,
)
def ts_interpolate(spark, sf_dir):
    """Daily resample with LINEAR gap interpolation
    (``operators/asof.py interpolate_daily``) — the numeric sibling of
    ts_resample_ffill. Same dense-grid shape; the backward/forward
    neighbor scans are two window passes over ONE per-key sort. Daily
    means use an exact (order-independent) DECIMAL sum and floor-based
    rounding so both engines feed the interpolation IDENTICAL doubles —
    a double AVG into engine round() flipped boundary rows at sf0.1."""
    from routing_algorithm_for_graph_dbs_spark.operators.asof import (
        interpolate_daily,
    )

    return interpolate_daily(_t(spark, sf_dir, "events"))


@_register(
    "mm_phash_neardup",
    rf"""
    WITH media_text AS (
      SELECT doc_id AS media_id, text FROM documents
    ),
    toks AS (
      SELECT media_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
      FROM media_text
    ), tok AS (
      SELECT DISTINCT media_id, unnest(t) AS tok FROM toks
    ), h AS (
      SELECT media_id, md5(tok) AS hx FROM tok
    ), v AS (
      SELECT media_id,
{_SIMHASH_V_COLS.replace("doc_id", "media_id")}
      FROM h GROUP BY media_id
    ),
    sims AS (
      SELECT d.media_id,
             CAST({_SIMHASH_REASSEMBLE} AS BIGINT) AS simhash
      FROM media_text d LEFT JOIN v ON d.media_id = v.media_id
    )
    SELECT a.media_id AS a, b.media_id AS b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sims a JOIN sims b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def mm_phash_neardup(spark, sf_dir):
    """Multimodal near-dup via perceptual hash (``operators/multimodal.py
    phash_near_dup_pairs``): 64-bit pHash per payload (text-derived
    deterministic stand-in at the documented codec boundary), then
    16-bit-chunk pigeonhole blocking — candidates meet in an equi-join,
    never all-pairs. The oracle recomputes the hashes bit-for-bit and
    takes the tiny all-pairs route (correctness only; scale lives in the
    engine's blocked join)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        media_from_documents,
        phash_near_dup_pairs,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return phash_near_dup_pairs(media, max_hamming=3).select(
        "a", "b", F.col("hamming").cast("long")
    )


@_register(
    "apx_theta_setops",
    """
    WITH f AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ha,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hb
      FROM events WHERE event_type IN ('view', 'click') GROUP BY user_id
    )
    SELECT CAST(SUM(CASE WHEN ha = 1 AND hb = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS inter_exact,
           CAST(COUNT(*) AS BIGINT) AS union_exact,
           CAST(SUM(CASE WHEN ha = 1 AND hb = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS diff_exact,
           TRUE AS inter_ok, TRUE AS union_ok, TRUE AS diff_ok
    FROM f
    """,
)
def apx_theta_setops(spark, sf_dir):
    """Theta-sketch SET ALGEBRA (Spark 4.x DataSketches built-ins):
    estimate |view ∩ click|, |view ∪ click|, |view \\ click| audiences
    from two mergeable sketches — the segment-overlap question a 100 TB
    rollup answers WITHOUT re-scanning raw ids (sketches persist per
    segment/day and intersect in microseconds; exact answers would
    re-shuffle every id per question). Sketch internals are not
    cross-engine, so the oracle pins the exact companions plus tolerance
    booleans (intersection error scales with the UNION cardinality —
    bounds are stated against it), same contract as apx_sketches."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    two = sk.agg(
        F.first(
            F.when(F.col("event_type") == "view", F.col("sk")), ignorenulls=True
        ).alias("ska"),
        F.first(
            F.when(F.col("event_type") == "click", F.col("sk")), ignorenulls=True
        ).alias("skb"),
    )
    est = two.select(
        F.theta_sketch_estimate(F.theta_intersection("ska", "skb")).alias("ie"),
        F.theta_sketch_estimate(F.theta_union("ska", "skb")).alias("ue"),
        F.theta_sketch_estimate(F.theta_difference("ska", "skb")).alias("de"),
    )
    flags = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("ha"),
        F.max((F.col("event_type") == "click").cast("int")).alias("hb"),
    )
    ex = flags.agg(
        F.sum(((F.col("ha") == 1) & (F.col("hb") == 1)).cast("int"))
        .cast("long")
        .alias("inter_exact"),
        F.count(F.lit(1)).cast("long").alias("union_exact"),
        F.sum(((F.col("ha") == 1) & (F.col("hb") == 0)).cast("int"))
        .cast("long")
        .alias("diff_exact"),
    )
    tol = lambda e, x: F.abs(e - x) <= 0.05 * F.col("union_exact") + F.lit(2.0)
    return (
        ex.crossJoin(F.broadcast(est))
        .select(
            "inter_exact",
            "union_exact",
            "diff_exact",
            tol(F.col("ie"), F.col("inter_exact")).alias("inter_ok"),
            tol(F.col("ue"), F.col("union_exact")).alias("union_ok"),
            tol(F.col("de"), F.col("diff_exact")).alias("diff_ok"),
        )
    )


@_register(
    "apx_join_overlap",
    """
    WITH l AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
         o AS (SELECT DISTINCT o_orderkey AS k FROM orders
               WHERE o_orderstatus = 'F')
    SELECT CAST((SELECT COUNT(*) FROM l WHERE k IN (SELECT k FROM o))
             AS BIGINT) AS inter_exact,
           CAST((SELECT COUNT(*) FROM (SELECT k FROM l UNION SELECT k FROM o))
             AS BIGINT) AS union_exact,
           TRUE AS inter_ok, TRUE AS union_ok
    """,
)
def apx_join_overlap(spark, sf_dir):
    """Pre-flight join sizing (operators/skew.py estimate_key_overlap):
    estimate how many distinct order keys the lineitem⋈orders('F') join
    would match WITHOUT shuffling either fact — two theta sketches, one
    scan each, intersect in constant time. Above the sketch's 4096
    nominal entries this is estimate mode (~2.6% at 2σ), so the oracle
    pins exact companions + tolerance booleans, the apx-family
    contract."""
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        estimate_key_overlap,
    )

    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    od = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    est = estimate_key_overlap(li, od, ["k"])
    lk = li.distinct()
    ok = od.distinct()
    ex = (
        lk.join(ok, "k", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_exact"))
        .crossJoin(
            lk.unionByName(ok)
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("union_exact"))
        )
    )
    return ex.crossJoin(F.broadcast(est)).select(
        "inter_exact",
        "union_exact",
        (
            F.abs(F.col("inter_est") - F.col("inter_exact"))
            <= 0.05 * F.col("inter_exact") + F.lit(2.0)
        ).alias("inter_ok"),
        (
            F.abs(F.col("union_est") - F.col("union_exact"))
            <= 0.05 * F.col("union_exact") + F.lit(2.0)
        ).alias("union_ok"),
    )


@_register(
    "txt_bpe_learn2",
    """
    WITH wc AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
          lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g')), ' ')) AS w
        FROM documents
      ) t WHERE w <> '' GROUP BY w
    ),
    e0 AS (
      SELECT '|' || array_to_string(string_split(word, ''), '|') AS enc, cnt
      FROM wc
    ),
    p1 AS (
      SELECT unnest([s[i] || chr(31) || s[i+1]
                     for i in generate_series(1, len(s) - 1)]) AS pr, cnt
      FROM (SELECT string_split(substr(enc, 2), '|') AS s, cnt FROM e0)
    ),
    m1 AS (
      SELECT string_split(pr, chr(31))[1] AS a,
             string_split(pr, chr(31))[2] AS b,
             SUM(cnt) AS n
      FROM p1 GROUP BY 1, 2 ORDER BY n DESC, a ASC, b ASC LIMIT 1
    ),
    e1 AS (
      SELECT replace(enc, '|' || m1.a || '|' || m1.b, '|' || m1.a || m1.b)
               AS enc, cnt
      FROM e0 CROSS JOIN m1
    ),
    p2 AS (
      SELECT unnest([s[i] || chr(31) || s[i+1]
                     for i in generate_series(1, len(s) - 1)]) AS pr, cnt
      FROM (SELECT string_split(substr(enc, 2), '|') AS s, cnt FROM e1)
    ),
    m2 AS (
      SELECT string_split(pr, chr(31))[1] AS a,
             string_split(pr, chr(31))[2] AS b,
             SUM(cnt) AS n
      FROM p2 GROUP BY 1, 2 ORDER BY n DESC, a ASC, b ASC LIMIT 1
    )
    SELECT 1 AS round, a AS left_sym, b AS right_sym, CAST(n AS BIGINT) AS n
    FROM m1
    UNION ALL
    SELECT 2, a, b, CAST(n AS BIGINT) FROM m2
    """,
)
def txt_bpe_learn2(spark, sf_dir):
    """Distributed BPE merge learning (operators/bpe.py learn_bpe), first
    two greedy rounds: the tokenizer-training step of an LLM pipeline.
    Statistics live on the DISTINCT-WORD table (bounded by vocabulary,
    not corpus — the one corpus-sized pass is the word count), each round
    is one argmax job, ties break (count desc, pair asc). The oracle
    unrolls both rounds in SQL, applying round 1's merge with the
    delimiter-encoded string-replace trick (left-to-right non-overlapping
    on both engines). The learned list itself is driver-side — two tuples
    — mirroring how a tokenizer trainer returns its merges."""
    from routing_algorithm_for_graph_dbs_spark.operators.bpe import learn_bpe

    merges = learn_bpe(_t(spark, sf_dir, "documents"), n_merges=2)
    rows = [
        (i + 1, a, b, int(n)) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "round int, left_sym string, right_sym string, n long"
    )


def _ppr_oracle_sql(iterations: int = 10, d: float = 0.85) -> str:
    """Personalized-PageRank twin of _pagerank_oracle_sql: the teleport
    distribution concentrates on seeds {0, 5, 10} (p = 1/3 each, 0
    elsewhere) and the rank vector initializes to p. The directed nation
    graph has no dangling vertices, so the update is
    pr' = (1-d) p + d inflow, unrolled one CTE per step."""
    seeds = "(0, 5, 10)"
    parts = [
        f"""WITH e AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      UNION
      SELECT n_nationkey, (n_nationkey + 7) % 25 FROM nation
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    v AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    tp AS (SELECT node,
                  CASE WHEN node IN {seeds} THEN 1.0 / 3 ELSE 0.0 END AS p
           FROM v),
    pr0 AS (SELECT node, p AS pr FROM tp)"""
    ]
    for i in range(iterations):
        parts.append(
            f"""pr{i + 1} AS (
      SELECT tp.node,
             (1 - {d}) * tp.p + {d} * COALESCE(c.inflow, 0.0) AS pr
      FROM tp LEFT JOIN (
        SELECT e.dst AS node, SUM(p.pr / deg.deg) AS inflow
        FROM pr{i} p
        JOIN e ON e.src = p.node
        JOIN deg ON deg.src = p.node
        GROUP BY e.dst
      ) c ON tp.node = c.node)"""
        )
    return (
        ",\n".join(parts)
        + f"""
    SELECT CAST(node AS BIGINT) AS node, ROUND(pr, 6) AS pr
    FROM pr{iterations}"""
    )


@_register("graph_ppr", _ppr_oracle_sql())
def graph_ppr(spark, sf_dir):
    """Personalized PageRank (graph/pagerank.py, seeds={0,5,10}, 10
    iterations, d=0.85) over the directed nation graph — proximity
    scoring relative to a seed set, the graph-retrieval primitive
    (recommend-from-these, related-entities). Same two-tier power
    kernel as graph_pagerank; only the teleport distribution changes.
    Oracle: the seeded update unrolled as 10 CTEs."""
    from routing_algorithm_for_graph_dbs_spark.graph.pagerank import pagerank

    e = _nation_edges_directed(spark, sf_dir)
    res = pagerank(e, damping=0.85, iterations=10, seeds=[0, 5, 10])
    return res.select(
        F.col("node").cast("long").alias("node"), F.round("pr", 6).alias("pr")
    )


@_register(
    "dq_referential_integrity",
    """
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'events.user_id -> customer',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = e.user_id))
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Referential-integrity audit — orphan-FK counts for three
    relationships, the dq-family companion to dq_constraint_checks. Each
    check is one left-anti join against the (broadcastable) parent key
    set; orphan counts instead of orphan rows, so the output is three
    rows regardless of corpus size. The events->customer check is
    EXPECTED to report orphans on this synthetic data (user ids outrun
    the customer table) — an integrity REPORT, not an assertion."""
    def _check(child, key_col, parent_keys, name):
        n = child.count()
        orphans = child.join(parent_keys, key_col, "left_anti").count()
        return (name, n, orphans)

    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    od = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    ).distinct()
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("k")
    )
    rows = [
        _check(li, "k", od.select(F.col("o_orderkey").alias("k")).distinct(),
               "lineitem.l_orderkey -> orders"),
        _check(od.select(F.col("o_custkey").alias("k")), "k", cust,
               "orders.o_custkey -> customer"),
        _check(ev, "k", cust, "events.user_id -> customer"),
    ]
    return spark.createDataFrame(rows, "fk string, n_rows long, n_orphans long")


@_register(
    "pipe_entity_resolution",
    """
    WITH RECURSIVE n AS (SELECT DISTINCT lower(p_name) AS n FROM part),
    b AS (SELECT n, substr(n, 1, 3) AS blk FROM n),
    pairs AS (
      SELECT a.n AS s, c.n AS d
      FROM b a JOIN b c ON a.blk = c.blk AND a.n < c.n
      WHERE levenshtein(a.n, c.n) <= 3
    ),
    edges AS (SELECT s, d FROM pairs UNION SELECT d, s FROM pairs),
    reach AS (
      SELECT s AS node, d AS r FROM edges
      UNION
      SELECT reach.node, edges.d FROM reach JOIN edges ON reach.r = edges.s
    ),
    rep AS (SELECT node, LEAST(node, MIN(r)) AS canon FROM reach GROUP BY node),
    canon AS (
      SELECT nn.n AS name, COALESCE(rep.canon, nn.n) AS canon
      FROM n nn LEFT JOIN rep ON rep.node = nn.n
    ),
    sz AS (SELECT canon AS c, CAST(COUNT(*) AS BIGINT) AS n_members
           FROM canon GROUP BY canon)
    SELECT canon.name, canon.canon, sz.n_members
    FROM canon JOIN sz ON sz.c = canon.canon
    """,
)
def pipe_entity_resolution(spark, sf_dir):
    """End-to-end entity resolution: blocked fuzzy candidate pairs
    (er_fuzzy_name_pairs' 3-char-prefix block + edit-distance verify) ->
    transitive closure via connected components -> every name mapped to
    its canonical representative (cluster minimum) with cluster size.
    The same compose-the-primitives shape as pipe_training_mix: blocking
    bounds the quadratic term, closure runs on the (tiny) surviving pair
    graph, singletons map to themselves with n_members = 1."""
    from routing_algorithm_for_graph_dbs_spark.graph.components import (
        connected_components,
    )

    p = _t(spark, sf_dir, "part")
    names = p.select(F.lower("p_name").alias("name")).distinct()
    b = names.withColumn("blk", F.substring("name", 1, 3))
    a = b.select(F.col("name").alias("na"), "blk")
    c = b.select(F.col("name").alias("nb"), "blk")
    pairs = (
        a.join(c, "blk")
        .filter(F.col("na") < F.col("nb"))
        .filter(F.levenshtein("na", "nb") <= 3)
        .select(F.col("na").alias("src"), F.col("nb").alias("dst"))
    )
    comp = connected_components(pairs)
    canon = names.join(
        comp.withColumnRenamed("node", "name"), "name", "left"
    ).select(
        "name", F.coalesce(F.col("component"), F.col("name")).alias("canon")
    )
    sizes = canon.groupBy(F.col("canon").alias("c")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return canon.join(sizes, canon["canon"] == sizes["c"]).select(
        "name", "canon", "n_members"
    )


@_register(
    "st_interval_join_left",
    """
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
    """,
)
def st_interval_join_left(spark, sf_dir):
    """LEFT OUTER stream-stream interval join, batch twin — views with no
    same-user click inside the horizon survive with NULL click columns
    (the attribution report wants the non-converting views too). In
    streaming the unmatched rows emit at state-eviction time, once both
    watermarks pass the view's interval (tests drive that with
    multi-batch file replay); batch is the plain left join the oracle
    states."""
    from routing_algorithm_for_graph_dbs_spark.streaming.pipelines import (
        view_click_interval_join,
    )

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    return view_click_interval_join(
        views, clicks, horizon="12 hours", how="left_outer"
    )


@_register(
    "txt_bigram_logprob",
    """
    WITH d AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g')), ' ')
               AS t
      FROM documents
      WHERE len(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9]+', ' ', 'g'), '[ ]+', ' ', 'g'))) > 0
    ),
    bg AS (
      SELECT doc_id,
             unnest([t[i] || chr(31) || t[i+1]
                     for i in generate_series(1, len(t) - 1)]) AS bg
      FROM d
    ),
    uni AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(t) AS tok FROM d) GROUP BY tok
    ),
    n AS (SELECT SUM(c) AS n FROM uni),
    bgc AS (SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg)
    SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(LN(0.7 * (CAST(bc.c AS DOUBLE) / u1.c)
                        + 0.3 * (CAST(u2.c AS DOUBLE) / n.n))), 6)
             AS avg_logprob
    FROM bg x
    JOIN bgc bc ON bc.bg = x.bg
    JOIN uni u1 ON u1.tok = string_split(x.bg, chr(31))[1]
    JOIN uni u2 ON u2.tok = string_split(x.bg, chr(31))[2]
    CROSS JOIN n
    GROUP BY x.doc_id
    """,
)
def txt_bigram_logprob(spark, sf_dir):
    """Interpolated bigram LM fluency score — the CCNet-style perplexity
    quality filter one rung above txt_unigram_logprob:
    ``0.7 * P(w2|w1) + 0.3 * P(w2)``, both estimated from the corpus
    itself (the corpus scores itself, so every scored bigram has a count
    — no smoothing constant to keep cross-engine). Per-doc mean log-prob
    + bigram count; docs with < 2 tokens have no bigrams and drop out.

    Scale shape: bigrams are built AT THE ARRAY LEVEL (zip_with over two
    shifted slices — map-side, no window, no per-token shuffle); the
    count tables shuffle once each on their key, then join back onto the
    bigram stream (Catalyst/AQE broadcasts them while the vocabulary is
    bounded; at open-vocabulary scale the same plan degrades gracefully
    to shuffle joins on the bigram key). One per-doc aggregation."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "),
            r"[ ]+",
            " ",
        )
    )
    # filter on the NORMALIZED STRING, not the split array: an empty
    # string splits to [""] (size 1), which would sneak an empty token
    # into the unigram table on corpora with blank docs
    d = docs.filter(F.length(norm) > 0).select(
        "doc_id", F.split(norm, " ").alias("t")
    )
    sep = "\x1f"
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.concat(a, F.lit(sep), b),
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("bg"))
    uni = (
        d.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = uni.agg(F.sum("c").alias("n"))
    bgc = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bg.withColumn("w1", F.split(F.col("bg"), sep).getItem(0))
        .withColumn("w2", F.split(F.col("bg"), sep).getItem(1))
        .join(bgc, "bg")
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n))
    )
    mix = 0.7 * (F.col("cb").cast("double") / F.col("c1")) + 0.3 * (
        F.col("c2").cast("double") / F.col("n")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(F.log(mix)), 6).alias("avg_logprob"),
    )


@_register(
    "smp_temperature_mixture",
    """
    WITH t AS (
      SELECT source, SUM(n_chars) AS tot FROM documents GROUP BY source
    ),
    z AS (SELECT SUM(pow(CAST(tot AS DOUBLE), 0.3)) AS z FROM t),
    r AS (
      SELECT t.source,
             ROUND(LEAST(1.0,
               (pow(CAST(t.tot AS DOUBLE), 0.3) / z.z) * 60000.0 / t.tot), 9)
               AS rate
      FROM t, z
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5('temp' || CAST(d.doc_id AS VARCHAR)), 1, 8))
          AS BIGINT) / 4294967296.0 < r.rate
    """,
)
def smp_temperature_mixture(spark, sf_dir):
    """Temperature-smoothed mixture (sampling.temperature_mixture_sample,
    alpha=0.3, 60k-char budget) — the multilingual rebalancing recipe:
    shares follow size^alpha, lifting small sources toward uniform while
    large ones shrink. Rates round to 9 decimals so a cross-engine pow
    ulp can't flip a keep decision against the 2^-32-granular draw."""
    from routing_algorithm_for_graph_dbs_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return temperature_mixture_sample(docs, budget=60000.0, alpha=0.3).select(
        "doc_id", "source"
    )


@_register(
    "mm_wav_roundtrip",
    """
    WITH aud AS (
      SELECT doc_id AS media_id,
             (n_chars % 50) + 2 AS n,
             ROUND(32767 * ((doc_id % 9) + 1) / 20.0) AS k
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           CAST(44 + 2 * n AS BIGINT) AS n_bytes,
           FLOOR(k / 32768.0 * 1e6 + 0.5) / 1e6 AS rms,
           CAST(n - 1 AS BIGINT) AS zero_crossings,
           CAST(n AS BIGINT) AS duration_ms,
           1000 AS sample_rate,
           'wav' AS decoder
    FROM aud
    """,
)
def mm_wav_roundtrip(spark, sf_dir):
    """REAL-codec cross-engine check: synth_wav_media encodes a
    parameterized square wave to actual RIFF/PCM bytes per doc
    (operators/wav.py encode_wav), audio_features RIFF-sniffs and
    REALLY decodes them (decode_wav), and the oracle predicts every
    decoded feature in closed form — RMS is the 16-bit quantized
    amplitude round(amp*32767)/32768, zero crossings are n-1 sign
    flips, duration is exact at the 1 kHz rate, n_bytes is the fixed
    44-byte header + 2 bytes/frame. A decode bug anywhere (RIFF parse,
    PCM scaling, feature math) breaks the hash match."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        synth_wav_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_wav_media(docs)
    return audio_features(media).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "rms",
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        "decoder",
    )


@_register(
    "mm_png_roundtrip",
    """
    WITH img AS (
      SELECT doc_id AS media_id, (doc_id % 7) + 1 AS m
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT img.media_id,
             AVG(CAST((i.i * img.m) % 256 AS DOUBLE)) / 255.0 AS luma
      FROM img, generate_series(0, 63) AS i(i)
      GROUP BY img.media_id
    )
    SELECT media_id,
           CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
           FLOOR(luma * 1e6 + 0.5) / 1e6 AS mean_luma,
           'png' AS decoder
    FROM px
    """,
)
def mm_png_roundtrip(spark, sf_dir):
    """REAL-codec cross-engine check, PNG half: synth_png_media encodes
    an 8x8 gray gradient to actual zlib-deflated PNG bytes per doc —
    cycling through ALL FIVE scanline filter types — image_features
    signature-sniffs and REALLY decodes them (operators/png.py: chunk
    CRC verify, inflate, unfilter), and the oracle reproduces the mean
    luma analytically from a generated series. Any inflate/unfilter/
    luma bug breaks the hash match. (Mean-luma rounding cannot tie:
    sum*3125/51 is never half-odd, margins >= 1/102 >> double error.)"""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_png_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_png_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_resize_roundtrip",
    """
    WITH img AS (
      SELECT doc_id AS media_id, (doc_id % 7) + 1 AS m
      FROM documents WHERE doc_id % 3 = 0
    ),
    tgt AS (
      SELECT img.media_id, img.m, t.i AS ti
      FROM img, generate_series(0, 15) AS t(i)
    ),
    px AS (
      SELECT media_id,
             (((2*(ti//4))*8   + 2*(ti%4))   * m) % 256
           + (((2*(ti//4)+1)*8 + 2*(ti%4))   * m) % 256
           + (((2*(ti//4))*8   + 2*(ti%4)+1) * m) % 256
           + (((2*(ti//4)+1)*8 + 2*(ti%4)+1) * m) % 256 AS s
      FROM tgt
    ),
    rhe AS (  -- round-half-even of s/4, numpy rint's tie rule
      SELECT media_id,
             CASE WHEN s % 4 < 2 THEN s // 4
                  WHEN s % 4 > 2 THEN s // 4 + 1
                  WHEN (s // 4) % 2 = 0 THEN s // 4
                  ELSE s // 4 + 1 END AS v
      FROM px
    )
    SELECT media_id,
           CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
           FLOOR(AVG(CAST(v AS DOUBLE)) / 255.0 * 1e6 + 0.5) / 1e6
             AS mean_luma,
           'png' AS decoder
    FROM rhe GROUP BY media_id
    """,
)
def mm_resize_roundtrip(spark, sf_dir):
    """REAL-codec cross-engine check, resize half: synth_png_media's 8x8
    gray gradients go through resize_images (REAL bilinear resample at
    scale 0.5 — every target pixel is exactly a 2x2 source-block mean
    under the pixel-center convention — then a REAL PNG re-encode) and
    back through image_features' REAL decode; the oracle reproduces the
    block means analytically, including numpy rint's round-half-even tie
    rule on the quarter-step averages. Any bug in resample math, encode,
    or decode breaks the hash."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        resize_images,
        synth_png_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_png_media(docs)
    resized = resize_images(media, max_dim=4, strict=True).withColumn(
        "mime", F.lit("image/png")
    )
    return image_features(resized, strict=True).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_wav_spectral",
    """
    WITH aud AS (
      SELECT doc_id AS media_id,
             4 * ((n_chars % 12) + 2) AS n,
             ROUND(32767 * ((doc_id % 9) + 1) / 20.0) AS k,
             CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 4 END AS p
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           CAST(44 + 2 * n AS BIGINT) AS n_bytes,
           FLOOR(k / 32768.0 * 1e6 + 0.5) / 1e6 AS rms,
           CAST(CASE WHEN p = 2 THEN n - 1 ELSE (n - 1) // 2 END AS BIGINT)
             AS zero_crossings,
           CAST(n AS BIGINT) AS duration_ms,
           CAST(CASE WHEN p = 2 THEN 500 ELSE 250 END AS DOUBLE)
             AS spectral_centroid_hz,
           'wav' AS decoder
    FROM aud
    """,
)
def mm_wav_spectral(spark, sf_dir):
    """REAL-codec cross-engine check, DSP half: synth_wav_tones encodes
    square tones whose discrete spectrum is a SINGLE bin (period 2 =
    all-Nyquist -> rate/2; period 4 -> rate/4, integer periods), the
    extractor really decodes the PCM and computes an rfft spectral
    centroid, and the oracle states the centroid in closed form (500 or
    250 Hz at the 1 kHz rate) along with the quantized RMS and the
    pattern's sign-flip count. FFT noise is ~1e-11 Hz — six decimal
    places of margin under the rounding."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        synth_wav_tones,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_wav_tones(docs)
    return audio_features(media).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "rms",
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "spectral_centroid_hz",
        "decoder",
    )


@_register(
    "mm_jpeg_roundtrip",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 14) * 16 AS g,
             8 + doc_id % 9 AS w,
             8 + doc_id % 7 AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    dc AS (
      -- flat-block reconstruction: the only nonzero coefficient is the
      -- DC 8*(g-128), quantized by q0=3 (Annex K luma, quality 90), so
      -- every decoded pixel is 128 + round(8(g-128)/3)*3/8; the ratio's
      -- fractional part is 0, 1/3 or 2/3 — never a rounding tie
      SELECT media_id, w, h,
             128.0 + ROUND(8.0 * (g - 128) / 3.0) * 3.0 / 8.0 AS px
      FROM img
    )
    SELECT media_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           FLOOR(px / 255.0 * 1e6 + 0.5) / 1e6 AS mean_luma,
           'jpeg' AS decoder
    FROM dc
    """,
)
def mm_jpeg_roundtrip(spark, sf_dir):
    """REAL-codec cross-engine check, JPEG half (round 8): synth_jpeg_media
    encodes FLAT gray images through three real encoder variants —
    baseline grayscale, PROGRESSIVE grayscale (DC/AC successive
    approximation through the round-8 Annex G decoder), and progressive
    YCbCr 4:2:0 (interleaved DC scans; chroma AC scans skipped) —
    image_features really entropy-decodes each (strict=True: no fake
    fallback possible) and the oracle states the decoded mean
    analytically from the flat block's quantized DC. The x*1e6 rounding
    never lands on a tie (300q = 365 mod 510 has no solution, gcd 30
    does not divide 5), so python round-half-even == SQL FLOOR(x + 0.5).
    Any Huffman, scan-accumulation, refinement-bit or IDCT bug shifts
    the mean and breaks the hash."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_jpeg_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_jpeg_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_jpeg_lossless",
    """
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 9 AS BIGINT) AS width,
           CAST(8 + doc_id % 7 AS BIGINT) AS height,
           -- lossless decode is exact: the diagonal ramp's mean is
           -- g + (w-1)/2 + (h-1)/2 with g = 16 + (doc_id % 14) * 16;
           -- x*1e6/255 has fractional parts k/51, never landing on a
           -- rounding tie, so FLOOR(x + 0.5) == python round-half-even
           FLOOR((16 + (doc_id % 14) * 16
                  + (7 + doc_id % 9) / 2.0
                  + (7 + doc_id % 7) / 2.0) / 255.0 * 1e6 + 0.5) / 1e6
             AS mean_luma,
           'jpeg' AS decoder
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_jpeg_lossless(spark, sf_dir):
    """REAL-codec cross-engine check, LOSSLESS JPEG half (round 13 —
    T.81 Annex H SOF3 moves off the declared boundary; round 14 adds
    the SOF11 ARITHMETIC flavor): synth_jpeg_lossless_media mints
    diagonal-ramp images through the DPCM encoder cycling all 7 Annex
    H predictors and a 4-row restart interval on alternating docs —
    every third image doc QM-coded as SOF11 (H.1.2 conditioning) —
    and image_features entropy-decodes every payload for real
    (strict=True). Decode is EXACT for both flavors — any predictor,
    SSSS-category, QM-context, restart-reset or modulo-reconstruction
    bug shifts the mean and breaks the hash. Byte-stream truth is
    pinned separately by the hand-derived Annex H goldens and the
    independent C SOF11 decoder in tests/test_codec_crosscheck.py
    (libjpeg .so.62 here predates the lossless API). Reference parity:
    reshape.py's image handling is Neo4j-side; this is the
    training-data-pipeline surface."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_jpeg_lossless_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_jpeg_lossless_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_jpeg_hierarchical",
    """
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 9 AS BIGINT) AS width,
           CAST(8 + doc_id % 7 AS BIGINT) AS height,
           -- the lossless DHP/EXP/SOF7 pyramid decodes exactly, so the
           -- diagonal ramp's mean is the same closed form as the SOF3
           -- row: g + (w-1)/2 + (h-1)/2 with g = 16 + (doc_id % 14)*16;
           -- x*1e6/255 has fractional parts k/51, never a rounding tie
           FLOOR((16 + (doc_id % 14) * 16
                  + (7 + doc_id % 9) / 2.0
                  + (7 + doc_id % 7) / 2.0) / 255.0 * 1e6 + 0.5) / 1e6
             AS mean_luma,
           'jpeg' AS decoder
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_jpeg_hierarchical(spark, sf_dir):
    """REAL-codec cross-engine check, HIERARCHICAL JPEG (round 14 —
    T.81 Annex J DHP/EXP/SOF5-7 moves off the declared boundary):
    synth_jpeg_hierarchical_media mints diagonal-ramp images as
    DHP pyramids (SOF3 initial + EXP expansion + SOF7 mod-2^16
    differential frames, level count cycling 1..3; every third image
    doc the QM-coded SOF11+SOF15 twins — identical pixels, arithmetic
    entropy) and image_features
    entropy-decodes every payload for real (strict=True). The lossless
    pyramid decode is EXACT — any EXP interpolation, predictor-0
    differential, QM-context, or reference-composition bug shifts the
    mean and breaks the hash. No external validator exists (libjpeg never
    implemented Annex J); byte-stream truth is pinned by the
    hand-derived golden in tests/test_codec_crosscheck.py plus the
    exact encode/decode twin round-trip. Reference parity: reshape.py's
    image handling is Neo4j-side; this is the training-data-pipeline
    surface."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_jpeg_hierarchical_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_jpeg_hierarchical_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_webp_lossy",
    """
    SELECT doc_id AS media_id,
           CAST(8 + doc_id % 9 AS BIGINT) AS width,
           CAST(8 + doc_id % 7 AS BIGINT) AS height,
           -- the flat VP8 key frame reconstructs exactly g, so the
           -- decoded Y mean is g/255; g*1e6/255 has fractional parts
           -- k/51, never a rounding tie
           FLOOR((16 + (doc_id % 14) * 16) / 255.0 * 1e6 + 0.5) / 1e6
             AS mean_luma,
           'webp' AS decoder
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_webp_lossy(spark, sf_dir):
    """REAL-codec cross-engine check, LOSSY VP8 half (round 13 — lossy
    WebP moves off the declared boundary): synth_webp_lossy_media
    mints flat-gray VP8 key frames through the RFC 6386 write twin
    (bool-encoder headers, Y2-carried DC token, skip MBs) and
    image_features really entropy-decodes every payload
    (strict=True) through the FULL key-frame pipeline — bool decoder,
    header/mode parse, token decode, dequant, IWHT+IDCT, DC
    prediction propagation. The oracle states the decoded mean in
    closed form. Sample-exactness against libwebp (both directions,
    all intra modes + loop filter on libwebp-minted frames) is pinned
    by tests/test_codec_crosscheck.py."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_webp_lossy_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_webp_lossy_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_webm_vp8",
    """
    WITH vid AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 14) * 16 AS g,
             8 + doc_id % 9 AS w,
             8 + doc_id % 7 AS h,
             1 + doc_id % 3 AS nf
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           CAST(nf AS INTEGER) AS n_keyframes,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           -- flat VP8 key frames reconstruct exactly g, g+7, g+14;
           -- luma terms are the identical doubles on both engines
           -- (same literals, same IEEE ops, left-associated); the
           -- 6-decimal rounding never ties (fractions are k/51 or
           -- (2g+7)-odd multiples of 1e6/510)
           FLOOR(g / 255.0 * 1e6 + 0.5) / 1e6 AS first_luma,
           FLOOR((CASE nf
              WHEN 1 THEN g / 255.0
              WHEN 2 THEN (g / 255.0 + (g + 7) / 255.0) / 2
              ELSE (g / 255.0 + (g + 7) / 255.0 + (g + 14) / 255.0) / 3
            END) * 1e6 + 0.5) / 1e6 AS mean_luma,
           'webm-vp8' AS decoder
    FROM vid
    """,
)
def mm_webm_vp8(spark, sf_dir):
    """REAL-codec cross-engine check, VIDEO-FRAME half (round 14 —
    WebM frame decode comes off the boundary by composition):
    synth_webm_vp8_media packs 1-3 REAL flat-gray VP8 key frames per
    video doc into SimpleBlocks on a V_VP8 track, and
    webm_frame_features walks the EBML clusters
    (extract_vp8_keyframes) and REALLY decodes every key frame through
    the RFC 6386 pipeline (strict=True). Successive frames step the
    gray by 7, so their Y2 DC levels ride different token-tree
    branches — including the small-level DCT_4/cat1/cat2 paths whose
    encoder bug this round's fix closed (libwebp now validates those
    branches bit-exact in the crosscheck suite). The oracle states the
    key-frame count, dimensions, and per-frame/mean lumas in closed
    form. Reference boundary analog main.py:1 — the engine delegates
    media handling entirely."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_webm_vp8_media,
        webm_frame_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc VP8 encode + decode are the
    # CPU-heavy halves and small parquet arrives as one scan split
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_webm_vp8_media(docs)
    return webm_frame_features(media, strict=True).select(
        "media_id",
        F.col("n_keyframes").cast("int").alias("n_keyframes"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "first_luma",
        "mean_luma",
        "decoder",
    )


@_register(
    "mm_mp4_metadata",
    """
    SELECT doc_id AS media_id,
           'isom' AS brand,
           CAST(n_chars * 10 AS BIGINT) AS duration_ms,
           CAST(320 + (doc_id % 5) * 64 AS BIGINT) AS width,
           CAST(180 + (doc_id % 5) * 36 AS BIGINT) AS height,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_tracks,
           CAST(24 + (doc_id % 7) * 12 AS BIGINT) AS n_frames,
           CAST(CASE ((doc_id - 2) // 3) % 3
                WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END AS DOUBLE) AS fps,
           'mp4' AS parser
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def mm_mp4_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, video half (round 8; round 9
    extends to the sample tables): synth_mp4_media mints
    standard-conformant ISO-BMFF bytes per video doc (ftyp + moov{mvhd,
    trak{tkhd, mdia{mdhd, minf{stbl{stts, stsz}}}}} + mdat) and
    video_metadata parses them for real (strict=True: no fake fallback)
    — duration from mvhd's timescale-scaled duration, dimensions from
    the visual track's 16.16 fixed-point tkhd fields, track count from
    the trak boxes, and NEW: frame count from the stts entry sum
    (cross-checked against stsz's sample_count) with fps from count over
    mdhd-timescale-scaled stts ticks — the fields a video-filtering
    pipeline actually thresholds on. The oracle states every field in
    closed form from the build parameters. Frame DECODE stays the honest
    boundary; the metadata a pipeline filters and plans on is real."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_mp4_media,
        video_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_mp4_media(docs)
    return video_metadata(media, strict=True).select(
        "media_id",
        "brand",
        "duration_ms",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_tracks").cast("long").alias("n_tracks"),
        F.col("n_frames").cast("long").alias("n_frames"),
        "fps",
        "parser",
    )


@_register(
    "mm_mp3_metadata",
    """
    WITH au AS (
      SELECT doc_id AS media_id,
             8 + n_chars % 40 AS nf,
             CASE ((doc_id - 1) // 3) % 7
               WHEN 0 THEN 64 WHEN 1 THEN 96 WHEN 2 THEN 128
               WHEN 3 THEN 160 WHEN 4 THEN 192 WHEN 5 THEN 256
               ELSE 320 END AS br,
             CASE doc_id % 9
               WHEN 1 THEN 44100 WHEN 4 THEN 48000 ELSE 32000 END AS rate,
             doc_id % 2 AS odd,
             CASE WHEN doc_id % 5 = 0 THEN 128 ELSE 0 END AS id3v1
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           -- frame bytes via the public Layer III length formula
           -- floor(144 * bitrate / rate), no padding bit, plus the
           -- ID3v2 (10 hdr + 32 body) and ID3v1 (128) tag sizes
           CAST(nf * (144 * br * 1000 // rate)
                + CASE WHEN odd = 1 THEN 42 ELSE 0 END
                + id3v1 AS BIGINT) AS n_bytes,
           '1' AS mpeg_version,
           CAST(3 AS INTEGER) AS layer,
           CAST(rate AS INTEGER) AS sample_rate,
           CAST(br AS INTEGER) AS bitrate_kbps,
           CAST(nf AS INTEGER) AS n_frames,
           -- 1152 samples per MPEG-1 Layer III frame; never a .5 tie
           -- (44100 = 4*odd, 48000/32000 divide 1152000 exactly)
           CAST(FLOOR(nf * 1152 * 1000.0 / rate + 0.5) AS BIGINT)
             AS duration_ms,
           CAST(FALSE AS BOOLEAN) AS vbr,
           CASE WHEN odd = 0 THEN 'stereo' ELSE 'mono' END AS channel_mode,
           'mp3' AS parser
    FROM au
    """,
)
def mm_mp3_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, compressed-audio half (round 9):
    synth_mp3_media mints conformant CBR MPEG-1 Layer III streams
    (correct frame-header bitrate/rate/mode bits, frame lengths from the
    public formula, ID3v2/ID3v1 tags on sub-cycles) and mp3_metadata
    walks EVERY frame header for real (strict=True: no fake fallback) —
    version/layer from the header bits, duration from the frame count
    times 1152 samples over the rate, total bytes via the length
    formula. The oracle states each field in closed form from the build
    parameters, so any bitrate-table, length-formula, tag-skip or
    sync-walk bug breaks the hash. Sample DECODE stays the honest
    boundary (needs a codec library); the metadata the dominant
    real-crawl audio format is filtered on is now real."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        mp3_metadata,
        synth_mp3_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_mp3_media(docs)
    return mp3_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "mpeg_version",
        "layer",
        "sample_rate",
        "bitrate_kbps",
        "n_frames",
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "vbr",
        "channel_mode",
        "parser",
    )


@_register(
    "mm_g711_roundtrip",
    """
    WITH au AS (
      SELECT doc_id AS media_id,
             2 + n_chars % 30 AS k,
             -- full-scale G.711 expansions: mu-law (even ids) +-32124,
             -- A-law (odd ids) +-32256
             CASE WHEN doc_id % 2 = 0 THEN 32124.0 ELSE 32256.0 END AS amp
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           CAST(44 + 8 * k AS BIGINT) AS n_bytes,
           FLOOR(amp / 32768.0 * 1e6 + 0.5) / 1e6 AS rms,
           -- 5 positive / 3 negative full-scale samples per period-8
           -- cycle: mean = amp/4 (sign-SENSITIVE — a companding sign
           -- bug flips it; RMS/zc are invariant)
           FLOOR(amp / 131072.0 * 1e6 + 0.5) / 1e6 AS mean_amplitude,
           CAST(2 * k - 1 AS BIGINT) AS zero_crossings,
           CAST(k AS BIGINT) AS duration_ms,
           'wav' AS decoder
    FROM au
    """,
)
def mm_g711_roundtrip(spark, sf_dir):
    """REAL-codec cross-engine check, companded-telephony half (round
    9, the A-law sign-convention regression guard): synth_g711_media
    encodes full-scale 5-positive/3-negative period-8 patterns as real
    G.711 mu-law/A-law WAV bytes, audio_features really expands them by
    the published tables (strict=True: no fake fallback), and the
    oracle states RMS, the sign-sensitive mean amplitude, zero
    crossings, and duration in closed form. A-law's inverted sign
    convention (after ^0x55, bit7 SET = positive) is exactly what the
    mean-amplitude column catches — RMS and zero crossings are
    invariant to a global negation."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        synth_g711_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_g711_media(docs)
    return audio_features(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "rms",
        "mean_amplitude",
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "decoder",
    )


@_register(
    "mm_aac_metadata",
    """
    WITH au AS (
      SELECT doc_id AS media_id,
             6 + n_chars % 50 AS nf,
             100 + doc_id % 30 AS fb,
             CASE doc_id % 9
               WHEN 1 THEN 48000 WHEN 4 THEN 44100 ELSE 32000 END AS rate,
             CAST(1 + doc_id % 2 AS INTEGER) AS n_channels
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           CAST(nf * fb AS BIGINT) AS n_bytes,
           'LC' AS profile,
           CAST(rate AS INTEGER) AS sample_rate,
           n_channels,
           CAST(nf AS INTEGER) AS n_frames,
           -- 1024 samples per raw block; 1024000/rate never lands on a
           -- .5 tie (441 odd; 64/3 thirds; 32 exact)
           CAST(FLOOR(nf * 1024 * 1000.0 / rate + 0.5) AS BIGINT)
             AS duration_ms,
           'aac' AS parser
    FROM au
    """,
)
def mm_aac_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, AAC half (round 9, the other
    dominant crawl audio format): synth_aac_media mints conformant ADTS
    framing (explicit 13-bit frame lengths, cycling rate/channel
    configs) and aac_metadata walks every frame header for real
    (strict=True: no fake fallback) — profile/rate/channels from the
    header bits, duration from the raw-block count times 1024 samples
    over the rate, total bytes as frames x frame length. The oracle
    states each field in closed form from the build parameters. The
    stream-average bitrate column is parsed too but left out of the
    oracle: its rounding can land on exact .5 (engine tie rules differ);
    pytest pins it on specific values instead. Raw-block DECODE stays
    the honest boundary."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        aac_metadata,
        synth_aac_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_aac_media(docs)
    return aac_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "profile",
        "sample_rate",
        "n_channels",
        "n_frames",
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "parser",
    )


@_register(
    "mm_flac_metadata",
    """
    WITH au AS (
      SELECT doc_id AS media_id,
             96 * (10 + n_chars % 200) AS ts,
             (doc_id % 5) * 7 AS pad,
             32 + doc_id % 40 AS fb,
             CASE (doc_id % 9) // 3
               WHEN 0 THEN 48000 WHEN 1 THEN 32000 ELSE 24000 END AS rate,
             CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
             CASE (doc_id // 3) % 2 WHEN 0 THEN 16 ELSE 24 END AS bps
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           -- fLaC(4) + STREAMINFO(4+34) + optional PADDING(4+pad) + frames
           CAST(42 + CASE WHEN pad > 0 THEN 4 + pad ELSE 0 END + fb
                AS BIGINT) AS n_bytes,
           CAST(rate AS INTEGER) AS sample_rate,
           n_channels,
           CAST(bps AS INTEGER) AS bits_per_sample,
           CAST(ts AS BIGINT) AS total_samples,
           -- ts is a multiple of 96 and every rate divides 96000: the
           -- exact STREAMINFO duration is an integer with no tie hazard
           CAST(ts * 1000 // rate AS BIGINT) AS duration_ms,
           CAST(CASE WHEN pad > 0 THEN 2 ELSE 1 END AS INTEGER) AS n_blocks,
           'flac' AS parser
    FROM au
    """,
)
def mm_flac_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, lossless-audio half (round 10):
    synth_flac_media mints conformant FLAC containers (STREAMINFO with
    packed 20/3/5/36-bit fields, optional PADDING block, synced frame
    region) and flac_metadata walks the metadata-block chain for real
    (strict=True: no fake fallback) — rate/channels/bit depth and the
    EXACT total-sample count and duration from STREAMINFO, block count
    from the chain walk, total bytes from the closed-form container
    layout. Any bit-packing, chain-walk, or length-accounting bug breaks
    the hash. Rice/LPC sample DECODE stays the honest boundary; the
    metadata a lossless-audio pipeline filters on is real
    (parse-not-decode split per operators/mp3.py — reference boundary
    analog main.py:1, the engine delegates media handling entirely)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        flac_metadata,
        synth_flac_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_flac_media(docs)
    return flac_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "sample_rate",
        "n_channels",
        "bits_per_sample",
        F.col("total_samples").cast("long").alias("total_samples"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "n_blocks",
        "parser",
    )


@_register(
    "mm_opus_metadata",
    """
    WITH au AS (
      SELECT doc_id AS media_id,
             5 + n_chars % 60 AS nf,
             40 + doc_id % 50 AS pb,
             312 + doc_id % 100 AS pre_skip,
             CASE (doc_id % 9) // 3
               WHEN 0 THEN 48000 WHEN 1 THEN 24000 ELSE 16000 END AS rate,
             CAST(1 + doc_id % 2 AS INTEGER) AS n_channels
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           -- OpusHead page 47 + OpusTags page 44 + nf*(27 hdr + 1 lacing
           -- + packet)
           CAST(91 + nf * (28 + pb) AS BIGINT) AS n_bytes,
           n_channels,
           CAST(pre_skip AS INTEGER) AS pre_skip,
           CAST(rate AS INTEGER) AS input_sample_rate,
           CAST(nf + 2 AS INTEGER) AS n_pages,
           -- 960 granule ticks per page at the fixed 48 kHz granule
           -- clock = exactly 20 ms per audio page
           CAST(nf * 20 AS BIGINT) AS duration_ms,
           'opus' AS parser
    FROM au
    """,
)
def mm_opus_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, modern-voice-codec half (round
    10): synth_opus_media mints conformant Ogg/Opus streams (RFC 3533
    pages with REAL CRC-32 checksums, RFC 7845 OpusHead/OpusTags,
    granules advancing 960 ticks per audio page) and opus_metadata walks
    every page for real (strict=True: no fake fallback) — each page's
    CRC re-verified, channels/pre-skip/input rate from OpusHead, page
    count from the walk, duration from granule arithmetic at the fixed
    48 kHz granule clock. Any CRC-table, lacing, or granule bug breaks
    the hash. CELT/SILK packet DECODE stays the honest boundary."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        opus_metadata,
        synth_opus_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_opus_media(docs)
    return opus_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "n_channels",
        "pre_skip",
        "input_sample_rate",
        "n_pages",
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "parser",
    )


@_register(
    "mm_webm_metadata",
    """
    WITH au AS (
      SELECT doc_id AS media_id,
             20000 + (doc_id % 500) * 16 AS dur,
             1 + doc_id % 4 AS nc,
             2000 + n_chars % 3000 AS pad,
             CASE (doc_id // 3) % 3
               WHEN 0 THEN 1280 WHEN 1 THEN 1920 ELSE 640 END AS w,
             CASE (doc_id // 3) % 3
               WHEN 0 THEN 720 WHEN 1 THEN 1080 ELSE 360 END AS h,
             CASE (doc_id % 9) // 3
               WHEN 0 THEN 48000 WHEN 1 THEN 44100 ELSE 32000 END AS rate,
             CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
             CASE WHEN doc_id % 5 = 0 THEN 'matroska' ELSE 'webm' END AS dt
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           -- fixed 8-byte size VINTs make the container layout exact:
           -- 106 + len(doctype) + n_clusters * (cluster_pad + 24)
           CAST(106 + length(dt) + nc * (pad + 24) AS BIGINT) AS n_bytes,
           dt AS doctype,
           CAST(dur AS BIGINT) AS duration_ms,
           CAST(1 AS INTEGER) AS n_video,
           CAST(1 AS INTEGER) AS n_audio,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(rate AS INTEGER) AS sample_rate,
           n_channels,
           CAST(nc AS INTEGER) AS n_clusters,
           'webm' AS parser
    FROM au
    """,
)
def mm_webm_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, EBML-container half (round 10 —
    WebM is the dominant crawl video container after MP4, whose ISO-BMFF
    twin is mm_mp4_metadata): synth_webm_media mints conformant
    Matroska/WebM bytes (RFC 8794 VINT framing, Info with
    TimecodeScale x f32 Duration, video+audio TrackEntries, Clusters
    hopped by size) and webm_metadata walks every element for real
    (strict=True: no fake fallback) — DocType, exact duration, track
    counts, dimensions, audio rate/channels, cluster count, and total
    bytes from the fixed-VINT closed form. Any VINT-length, registry-id,
    or float-width bug breaks the hash. Frame DECODE stays the honest
    boundary."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_webm_media,
        webm_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_webm_media(docs)
    return webm_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "doctype",
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "n_video",
        "n_audio",
        "width",
        "height",
        "sample_rate",
        "n_channels",
        "n_clusters",
        "parser",
    )


@_register(
    "mm_gif_metadata",
    """
    WITH im AS (
      SELECT doc_id AS media_id,
             1 + doc_id % 5 AS nf,
             10 + n_chars % 100 AS pad,
             CASE WHEN doc_id % 6 = 0 THEN 0 ELSE 3 + doc_id % 8 END
               AS delay_cs,
             CASE doc_id % 4
               WHEN 0 THEN 0 WHEN 1 THEN 8 WHEN 2 THEN 32 ELSE 256 END
               AS gct,
             CASE (doc_id // 3) % 3
               WHEN 0 THEN 320 WHEN 1 THEN 640 ELSE 128 END AS w,
             CASE (doc_id // 3) % 3
               WHEN 0 THEN 200 WHEN 1 THEN 400 ELSE 96 END AS h,
             CASE WHEN doc_id % 6 = 0 THEN '87a' ELSE '89a' END AS ver,
             doc_id % 7 AS bg
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id,
           -- header+LSD 13, GCT 3*colors, per frame: 8-byte GCE (89a
           -- only) + 13-byte descriptor/LZW/terminator + pad, trailer 1
           CAST(13 + 3 * gct
                + nf * (CASE WHEN delay_cs > 0 THEN 8 ELSE 0 END + 13 + pad)
                + 1 AS BIGINT) AS n_bytes,
           ver AS version,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(gct AS INTEGER) AS gct_colors,
           CAST(bg AS INTEGER) AS bg_index,
           CAST(nf AS INTEGER) AS n_frames,
           CAST(nf * delay_cs * 10 AS BIGINT) AS duration_ms,
           'gif' AS parser
    FROM im
    """,
)
def mm_gif_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, palette-image half (round 11 —
    GIF is the last ubiquitous crawl image container without a parser;
    the pattern follows mm_flac/mm_webm): synth_gif_media mints
    conformant GIF87a stills and GIF89a animations (Logical Screen
    Descriptor, Global Color Tables, per-frame Graphic Control
    Extensions, length-prefixed data sub-blocks) and gif_metadata walks
    every block for real (strict=True: no fake fallback) — version,
    canvas, palette size, frame count, the exact summed animation
    duration, and total bytes from the closed-form layout. Any packed-
    bit, sub-block-hop, or extension-accounting bug breaks the hash.
    LZW pixel DECODE stays the honest boundary (parse-not-decode split
    per operators/mp3.py; reference boundary analog main.py:1)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        gif_metadata,
        synth_gif_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_gif_media(docs)
    return gif_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "version",
        "width",
        "height",
        "gct_colors",
        "bg_index",
        "n_frames",
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "parser",
    )


@_register(
    "mm_tiff_metadata",
    """
    WITH im AS (
      SELECT doc_id AS media_id,
             1 + doc_id % 4 AS nifd,
             2 * (20 + n_chars % 200) AS pad,
             100 + doc_id % 900 AS w,
             80 + n_chars % 600 AS h,
             CASE (doc_id // 2) % 3
               WHEN 0 THEN 1 WHEN 1 THEN 8 ELSE 16 END AS bps,
             CASE doc_id % 5
               WHEN 2 THEN 5 WHEN 3 THEN 7 WHEN 4 THEN 32773 ELSE 1 END
               AS comp,
             (doc_id // 5) % 3 AS photo,
             CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS bo
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id,
           -- 8-byte header + per IFD: strip pad + 114 (2-byte count,
           -- nine 12-byte entries, 4-byte next pointer)
           CAST(8 + nifd * (pad + 114) AS BIGINT) AS n_bytes,
           bo AS byte_order,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(bps AS INTEGER) AS bits_per_sample,
           CAST(comp AS INTEGER) AS compression,
           CAST(photo AS INTEGER) AS photometric,
           CAST(nifd AS INTEGER) AS n_ifds,
           'tiff' AS parser
    FROM im
    """,
)
def mm_tiff_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, scanned/raster half (round 11):
    synth_tiff_media mints conformant TIFF 6.0 files in BOTH byte
    orders (II and MM IFD chains, left-justified inline values,
    strip-offset indirection) and tiff_metadata walks the whole chain
    for real (strict=True: no fake fallback) — dimensions, bit depth,
    compression and photometric tags from the first IFD, page count
    from the chain, total bytes from the closed-form layout. Any
    endianness, entry-layout, or chain-walk bug breaks the hash. Strip
    raster DECODE (PackBits/LZW/JPEG-in-TIFF) stays the honest
    boundary."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_tiff_media,
        tiff_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_tiff_media(docs)
    return tiff_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "byte_order",
        "width",
        "height",
        "bits_per_sample",
        "compression",
        "photometric",
        "n_ifds",
        "parser",
    )


@_register(
    "mm_webp_metadata",
    """
    WITH im AS (
      SELECT doc_id AS media_id,
             (doc_id // 3) % 3 AS fl,
             16 + doc_id % 2000 AS w,
             16 + n_chars % 1500 AS h,
             2 * (10 + n_chars % 120) AS pad,
             CASE WHEN (doc_id // 3) % 3 = 2
                  THEN 2 + doc_id % 6 ELSE 1 END AS nf,
             20 + doc_id % 80 AS fdur,
             doc_id % 2 AS alpha
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(CASE fl
                  -- lossy: 12 RIFF + 8 hdr + 10 VP8 prefix + pad
                  WHEN 0 THEN 30 + pad
                  -- lossless: 12 + 8 + 5 VP8L prefix + pad + 1 RIFF pad
                  WHEN 1 THEN 26 + pad
                  -- extended: 12 + 18 VP8X + 14 ANIM + nf*(8 ANMF hdr +
                  -- 16 frame hdr + 8 + 10 + pad embedded VP8)
                  ELSE 44 + nf * (42 + pad)
                END AS BIGINT) AS n_bytes,
           CASE fl WHEN 0 THEN 'lossy' WHEN 1 THEN 'lossless'
                ELSE 'extended' END AS flavor,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE WHEN fl = 0 THEN 0 ELSE alpha END AS INTEGER)
             AS has_alpha,
           CAST(nf AS INTEGER) AS n_frames,
           CAST(CASE WHEN fl = 2 THEN nf * fdur ELSE 0 END AS BIGINT)
             AS duration_ms,
           CAST(CASE WHEN fl = 2 THEN 2 + nf ELSE 1 END AS INTEGER)
             AS n_chunks,
           'webp' AS parser
    FROM im
    """,
)
def mm_webp_metadata(spark, sf_dir):
    """REAL-parser cross-engine check, modern-web-image half (round 11
    — WebP has displaced much of JPEG/PNG in crawls): synth_webp_media
    mints all three container flavors (RIFF chunk walk with even
    padding; VP8 key-frame 14-bit dimensions behind the 9D012A start
    code; VP8L packed width/height/alpha bits; VP8X canvas + ANIM/ANMF
    animation with 24-bit frame durations) and webp_metadata walks
    every chunk for real (strict=True: no fake fallback) — flavor,
    dimensions, alpha, frame count, exact animation duration, chunk
    count, and total bytes from the closed-form layout. Any bit-field,
    padding, or chunk-hop bug breaks the hash. VP8 entropy DECODE stays
    the honest boundary."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_webp_media,
        webp_metadata,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: per-doc payload ENCODE is the synth's
    # CPU-heavy half and small parquet arrives as one scan split
    # (round 11); synth + extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_webp_media(docs)
    return webp_metadata(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "flavor",
        "width",
        "height",
        "has_alpha",
        "n_frames",
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "n_chunks",
        "parser",
    )


@_register(
    "mm_gif_pixels",
    """
    SELECT doc_id AS media_id,
           CAST(8 * (1 + doc_id % 5) AS INTEGER) AS width,
           CAST(16 * (1 + doc_id % 6) AS INTEGER) AS height,
           -- rows are constant values (doc_id%16) + 16k (mod 256) over a
           -- height that is a multiple of 16: the mean over each 16-row
           -- cycle is (doc_id%16) + mean(0,16,...,240) = doc_id%16 + 120,
           -- an exact integer — closed form without running LZW
           CAST(doc_id % 16 + 120 AS DOUBLE) AS mean_luma,
           'gif' AS parser
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_gif_pixels(spark, sf_dir):
    """REAL-decoder cross-engine check, GIF pixel half (round 11 — LZW
    is pure table-driven decode, spec Appendix F, so it moves OFF the
    declared codec boundary): synth_gif_pixel_media mints GIFs whose
    frames are REAL LZW streams (greedy longest-match encoder, CLEAR/
    END/KwKwK/4096-reset semantics, variable-width LSB-first codes) of
    a row-constant gray pattern, and gif_pixel_features inflates every
    stream for real (strict=True: no fake fallback) — the decoded mean
    luma must hit the closed form exactly. Any bit-packing, table-growth,
    width-sync, or palette bug breaks the hash."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        gif_pixel_features,
        synth_gif_pixel_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc codec ENCODE in the synth is
    # the CPU-heavy half, and a small parquet arrives as one scan split
    # (round-11 profile: minting ran serially while 31 cores idled);
    # the synth and the extractor then inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_gif_pixel_media(docs)
    return gif_pixel_features(media, strict=True).select(
        "media_id",
        "width",
        "height",
        F.col("mean_luma").cast("double").alias("mean_luma"),
        "parser",
    )


@_register(
    "mm_tiff_pixels",
    """
    SELECT doc_id AS media_id,
           CAST(8 * (1 + doc_id % 5) AS INTEGER) AS width,
           CAST(16 * (1 + doc_id % 6) AS INTEGER) AS height,
           CAST(doc_id % 16 + 120 AS DOUBLE) AS mean_luma,
           'tiff' AS parser
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def mm_tiff_pixels(spark, sf_dir):
    """REAL-decoder cross-engine check, TIFF strip half (rounds 11-12):
    grayscale strips cycling all six strip codecs by doc — raw,
    PackBits, LZW, LZW + horizontal-differencing predictor (TIFF 6.0
    §13/§14, early-change rule pinned empirically against libtiff),
    Deflate, Deflate + predictor — in BOTH byte orders and three strip
    layouts (whole-image, 4-row, single-row strips) inflate for real
    (tiff_pixel_features strict=True) and the decoded mean luma must
    hit the same closed form as mm_gif_pixels — one pattern, two
    container codecs, cross-checked against each other and the oracle.
    JPEG-in-TIFF strips remain the declared entropy-coded boundary
    (decode_tiff_gray raises on them)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_tiff_pixel_media,
        tiff_pixel_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc codec ENCODE in the synth is
    # the CPU-heavy half, and a small parquet arrives as one scan split
    # (round-11 profile: minting ran serially while 31 cores idled);
    # the synth and the extractor then inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_tiff_pixel_media(docs)
    return tiff_pixel_features(media, strict=True).select(
        "media_id",
        "width",
        "height",
        F.col("mean_luma").cast("double").alias("mean_luma"),
        "parser",
    )


@_register(
    "mm_flac_pcm",
    """
    WITH aud AS (
      SELECT doc_id AS media_id,
             160 * (1 + doc_id % 4) AS n,
             100 * (3 + doc_id % 13) AS k,
             CASE (doc_id // 2) % 3
               WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 32000 END AS rate,
             doc_id % 11 = 0 AS is_const
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           -- every sample has magnitude k, so rms = k/32768 exactly;
           -- k = 100j with j in 3..15 never lands on a 6-decimal
           -- rounding tie (that would need j = 64 mod 128)
           FLOOR(k / 32768.0 * 1e6 + 0.5) / 1e6 AS rms,
           CASE WHEN is_const
                THEN FLOOR(k / 32768.0 * 1e6 + 0.5) / 1e6
                ELSE 0.0 END AS mean_amplitude,
           CAST(CASE WHEN is_const THEN 0 ELSE n - 1 END AS BIGINT)
             AS zero_crossings,
           -- n is a multiple of 160 and every rate divides 160000,
           -- so the duration is an exact integer of milliseconds
           CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
           CAST(rate AS INTEGER) AS sample_rate,
           'flac' AS decoder
    FROM aud
    """,
)
def mm_flac_pcm(spark, sf_dir):
    """REAL-codec cross-engine check, lossless-audio SAMPLE half (round
    11 — FLAC's Rice/fixed/LPC frames are pure integer arithmetic per
    RFC 9639, so sample decode moves OFF the declared codec boundary
    the way GIF's LZW did): synth_flac_pcm_media encodes a square wave
    (or constant) to REAL FLAC frames — constant/verbatim/fixed/LPC
    subframes, Rice partitions, left/right/mid-side stereo, multi-frame
    streams with common AND uncommon blocksize codes — and
    audio_features sample-decodes every stream (decoder='flac'), with
    CRC-8 + CRC-16 + STREAMINFO-MD5 verified inside the decoder, so a
    single wrong sample anywhere fails the query rather than shifting a
    mean. The oracle states rms / mean / zero crossings / duration in
    closed form without decoding. (Reference boundary analog main.py:1
    — the engine delegates media handling entirely.)"""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        synth_flac_pcm_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc codec ENCODE in the synth is
    # the CPU-heavy half, and a small parquet arrives as one scan split
    # (round-11 profile: minting ran serially while 31 cores idled);
    # the synth and the extractor then inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_flac_pcm_media(docs)
    return audio_features(media, strict=True).select(
        "media_id",
        "rms",
        F.col("mean_amplitude").cast("double").alias("mean_amplitude"),
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        "decoder",
    )


@_register(
    "mm_gsm_pcm",
    """
    WITH fam(f, rms, mean_amplitude, zero_crossings) AS (VALUES
      (0, 0.084604, -0.060578, 0),
      (1, 0.11506, -0.030181, 2),
      (2, 0.156093, 0.012776, 8),
      (3, 0.186063, -0.016919, 3),
      (4, 0.082725, 0.003928, 6),
      (5, 0.099134, 0.009564, 12),
      (6, 0.128554, 0.013887, 8),
      (7, 0.192151, 0.004179, 10),
      (8, 0.069994, -0.000437, 17),
      (9, 0.102151, -0.007352, 6)
    ),
    aud AS (
      SELECT doc_id AS media_id, doc_id % 10 AS f,
             320 * (1 + (doc_id % 10) % 3) AS n
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT a.media_id,
           -- RIFF(12) + fmt(8+20) + fact(8+4) + data hdr(8) + 65/block
           CAST(60 + 65 * (a.n // 320) AS BIGINT) AS n_bytes,
           CAST(fam.rms AS DOUBLE) AS rms,
           CAST(fam.mean_amplitude AS DOUBLE) AS mean_amplitude,
           CAST(fam.zero_crossings AS BIGINT) AS zero_crossings,
           CAST(a.n // 8 AS BIGINT) AS duration_ms,
           8000 AS sample_rate,
           'gsm' AS decoder
    FROM aud a JOIN fam ON a.f = fam.f
    """,
)
def mm_gsm_pcm(spark, sf_dir):
    """REAL-codec cross-engine check, COMPRESSED-audio sample half
    (round 14 — the first codec off the perceptual boundary:
    ``operators/gsm610.py`` implements ETSI GSM 06.10 full-rate
    RPE-LTP in the spec's own bit-exact saturated integer arithmetic,
    both directions). synth_gsm_wav_media encodes the ten family
    sawtooths to REAL wav49 GSM blocks in a RIFF container (format tag
    0x31) and audio_features sample-decodes every payload
    (decoder='gsm', strict=True — a decode error fails the query). The
    oracle joins the family id to rms / mean / zero-crossing literals
    derived from the INDEPENDENT from-scratch C decoder
    (tests/test_codec_crosscheck.py compiles it at test time, decodes
    the same ten payloads, and pins these exact constants — the FLAC
    validation precedent), with byte count and duration in closed
    form. A bit-unpack, LAR/LTP/RPE table, lattice, or de-emphasis bug
    anywhere breaks the hash. (Reference boundary analog main.py:1 —
    the engine delegates media handling entirely.)"""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        audio_features,
        synth_gsm_wav_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc DECODE in the extractor is the
    # CPU-heavy half here (the ten encodes are memoized per family) and
    # small parquet arrives as one scan split; the synth and extractor
    # inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id")
    )
    media = synth_gsm_wav_media(docs)
    return audio_features(media, strict=True).select(
        "media_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "rms",
        F.col("mean_amplitude").cast("double").alias("mean_amplitude"),
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        "decoder",
    )


@_register(
    "mm_bmp_palette",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             (doc_id * 37 + 40) % 216 + 20 AS v,
             CAST(2 ** (3 + doc_id % 3) AS INTEGER) AS w,
             CAST(2 ** (4 + doc_id % 2) AS INTEGER) AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id, w AS width, h AS height,
           -- every pixel is the gray (v,v,v): per-pixel Rec.601 luma is
           -- the identical double on both engines (same literals, same
           -- IEEE ops, left-associated), the mean over a power-of-two
           -- pixel count is exact, and v*1e6/255 sits >= ~1/510 from
           -- any 6-decimal rounding tie
           FLOOR((0.299 * v + 0.587 * v + 0.114 * v) / 255 * 1e6 + 0.5)
             / 1e6 AS mean_luma,
           'bmp' AS decoder
    FROM img
    """,
)
def mm_bmp_palette(spark, sf_dir):
    """REAL-codec cross-engine check, palette-BMP half (round 11 —
    decode_bmp widened beyond 24-bit): synth_bmp_palette_media mints
    1/4/8-bpp palette BMPs — the target gray hidden at a doc-dependent
    palette slot amid junk entries, raw rows on some docs (a seventh
    of them in the OS/2 core-header container, round 12) and REAL
    RLE8/RLE4 escape streams (encoded runs + EOL + EOD) on others — and
    image_features decodes every payload for real (strict=True). A
    palette-lookup, nibble/bit-unpack, RLE-walk, triple-vs-quad
    palette, or bottom-up ordering bug breaks the hash. Only JPEG/PNG
    passthrough and unknown headers remain the declared boundary
    (decode raises NotImplementedError)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_bmp_palette_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc codec ENCODE in the synth is
    # the CPU-heavy half, and a small parquet arrives as one scan split
    # (round-11 profile: minting ran serially while 31 cores idled);
    # the synth and the extractor then inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_bmp_palette_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("mean_luma").cast("double").alias("mean_luma"),
        "decoder",
    )


@_register(
    "mm_tiff_fax",
    """
    SELECT doc_id AS media_id,
           CAST(8 * (2 + doc_id % 5) AS INTEGER) AS width,
           CAST(4 * (1 + doc_id % 6) AS INTEGER) AS height,
           -- k black columns per complete 8-column period, MinIsWhite:
           -- mean = 255*(8-k)/8, a dyadic rational -> exact double on
           -- both engines
           255.0 * (8 - (1 + doc_id % 7)) / 8 AS mean_luma,
           'tiff' AS parser
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_tiff_fax(spark, sf_dir):
    """REAL-codec cross-engine check, CCITT fax half (round 12 — T.4
    Modified Huffman and T.6 Group 4 moved OFF the boundary; the run
    tables were derived empirically from libtiff streams by
    common-prefix isolation, the same method that pinned the VP8L
    distance table): synth_tiff_fax_media mints bilevel stripe TIFFs —
    MH-RLE and G4, shifting rows that exercise pass/vertical/horizontal
    modes, single- and multi-strip, both byte orders — and
    tiff_pixel_features decodes every payload for real (strict=True).
    The decoded MinIsWhite mean luma must hit the closed form
    255*(8-k)/8 exactly; libtiff verifies the same streams
    bidirectionally in the crosscheck suite."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_tiff_fax_media,
        tiff_pixel_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc fax encode in the synth is the
    # CPU-heavy half and a small parquet arrives as one scan split; the
    # synth and the extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_tiff_fax_media(docs)
    return tiff_pixel_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("mean_luma").cast("double").alias("mean_luma"),
        "parser",
    )


@_register(
    "mm_tiff_jpeg",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 14) * 16 AS g,
             CAST(8 + doc_id % 9 AS INTEGER) AS w,
             CAST(8 + doc_id % 7 AS INTEGER) AS h
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id, w AS width, h AS height,
           -- flat-block JPEG reconstruction, then the decoder's uint8
           -- sample rounding: DC 8(g-128) quantized by q0=3 (Annex K
           -- luma, quality 90). Inner ratio's fractional part is 0 or
           -- a third (never a tie); the outer value's eighths never hit
           -- .5 for g = 16+16k (m mod 8 != 4 for all k in 0..13), so
           -- ROUND here == np.rint there
           ROUND(128.0 + ROUND(8.0 * (g - 128) / 3.0) * 3.0 / 8.0)
             AS mean_luma,
           'tiff' AS parser
    FROM img
    """,
)
def mm_tiff_jpeg(spark, sf_dir):
    """REAL-codec cross-engine check, JPEG-in-TIFF half (round 12 —
    compression 7 moved OFF the boundary; the Huffman/DCT machinery
    already existed in operators/jpeg.py): synth_tiff_jpeg_media mints
    flat-gray TIFFs whose strips are REAL baseline-JPEG streams —
    abbreviated strips + shared JPEGTables tag (TIFF TechNote 2) on odd
    docs, full interchange streams on even — across three strip
    layouts and both byte orders, and tiff_pixel_features decodes every
    payload for real (strict=True). The decoded mean must hit the
    closed-form flat-block reconstruction exactly; libtiff+libjpeg
    verify the same streams bidirectionally in the crosscheck suite."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        synth_tiff_jpeg_media,
        tiff_pixel_features,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc JPEG encode in the synth is
    # the CPU-heavy half and a small parquet arrives as one scan split;
    # the synth and the extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_tiff_jpeg_media(docs)
    return tiff_pixel_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("mean_luma").cast("double").alias("mean_luma"),
        "parser",
    )


@_register(
    "mm_bmp_bitfields",
    """
    WITH img AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 2 THEN 1023 ELSE 31 END AS top_r,
             CASE WHEN doc_id % 4 = 1 THEN 63
                  WHEN doc_id % 4 = 2 THEN 1023 ELSE 31 END AS top_g,
             CASE WHEN doc_id % 4 = 2 THEN 1023 ELSE 31 END AS top_b
      FROM documents WHERE doc_id % 3 = 2
    ), chan AS (
      -- the decoded 8-bit expansion of each mask-domain channel:
      -- (q*255 + top//2) // top, stated without touching a bitmap
      SELECT doc_id,
             ((doc_id % (top_r + 1)) * 255 + top_r // 2) // top_r AS vr,
             (((doc_id * 7) % (top_g + 1)) * 255 + top_g // 2) // top_g AS vg,
             (((doc_id * 13) % (top_b + 1)) * 255 + top_b // 2) // top_b AS vb
      FROM img
    )
    SELECT doc_id AS media_id,
           CAST(2 ** (3 + doc_id % 3) AS INTEGER) AS width,
           CAST(2 ** (4 + doc_id % 2) AS INTEGER) AS height,
           -- same-literal IEEE ops on both engines; the mean over a
           -- power-of-two count of identical pixels is exact, and
           -- x*1e6 = M*200/51 (M = 299*vr+587*vg+114*vb) sits >= 1/102
           -- from any half-integer, so FLOOR(+0.5) == Python round
           FLOOR((0.299 * vr + 0.587 * vg + 0.114 * vb) / 255 * 1e6 + 0.5)
             / 1e6 AS mean_luma,
           'bmp' AS decoder
    FROM chan
    """,
)
def mm_bmp_bitfields(spark, sf_dir):
    """REAL-codec cross-engine check, masked-BMP half (round 12 —
    decode_bmp widened to 16-bit RGB555 and BI_BITFIELDS 16/32-bit):
    synth_bmp_bitfields_media mints constant-color BMPs in MASK DOMAIN
    cycling implicit-555, explicit 565, 32-bit 10-10-10, and explicit
    555 layouts, and image_features decodes every payload for real
    (strict=True) — the masked extraction, per-channel bit-width
    expansion ((q*255 + top//2)//top), row padding, and bottom-up
    ordering must all hit the oracle's closed form. JPEG/PNG-passthrough
    BMPs stay the declared boundary (OS/2 core-header decode landed in
    the same round — mm_bmp_palette exercises it)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_bmp_bitfields_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc mint is the CPU-heavy half and
    # a small parquet arrives as one scan split; the synth and the
    # extractor inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_bmp_bitfields_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("mean_luma").cast("double").alias("mean_luma"),
        "decoder",
    )


@_register(
    "mm_webp_pixels",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             (doc_id * 53 + 60) % 216 + 20 AS v,
             CAST(2 ** (3 + doc_id % 3) AS INTEGER) AS w,
             CAST(2 ** (4 + doc_id % 2) AS INTEGER) AS h
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id, w AS width, h AS height,
           -- same exactness argument as mm_bmp_palette: identical
           -- Rec.601 double on both engines, exact mean over a
           -- power-of-two pixel count, >= ~1/510 from any rounding tie
           FLOOR((0.299 * v + 0.587 * v + 0.114 * v) / 255 * 1e6 + 0.5)
             / 1e6 AS mean_luma,
           'webp' AS decoder
    FROM img
    """,
)
def mm_webp_pixels(spark, sf_dir):
    """REAL-codec cross-engine check, lossless-WebP half (round 11 —
    VP8L is pure prefix-code/LZ77/transform integer arithmetic per the
    public lossless bitstream spec, so it moves OFF the declared codec
    boundary; lossy VP8's DCT + bool-coder stays): synth_webp_pixel_media
    encodes constant-gray images to REAL VP8L literal streams
    (canonical prefix codes with code-length codes) and image_features
    fully decodes each one (strict=True), through the same decoder that
    tests/test_vp8l.py validates bit-exactly against the system libwebp
    over transform-rich fuzz streams (predictor / cross-color /
    subtract-green / palette transforms, color cache, meta prefix
    groups, LZ77 with the empirically-pinned 120-entry distance
    table)."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        image_features,
        synth_webp_pixel_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc codec ENCODE in the synth is
    # the CPU-heavy half, and a small parquet arrives as one scan split
    # (round-11 profile: minting ran serially while 31 cores idled);
    # the synth and the extractor then inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_webp_pixel_media(docs)
    return image_features(media, strict=True).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("mean_luma").cast("double").alias("mean_luma"),
        "decoder",
    )


@_register(
    "mm_phash_crossformat",
    """
    SELECT doc_id AS media_id,
           CAST(3 AS BIGINT) AS n_variants,
           CAST(1 AS BIGINT) AS n_distinct_hashes
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_phash_crossformat(spark, sf_dir):
    """Cross-FORMAT perceptual dedup (round 11): the identical image is
    minted into three different containers — palette BMP (raw/RLE8),
    GIF (LZW), lossless WebP (VP8L) — and the REAL pHash computed
    through three independent decode stacks must COLLIDE exactly
    (count distinct = 1 per doc), which is precisely the property a
    crawl dedup pipeline relies on: re-encoded copies of an image land
    in the same bucket. A single wrong pixel in any of the three
    decoders, or any drift in the gray/resize/DCT chain, splits the
    hashes and breaks the oracle. Map-side hashing; the only shuffle
    carries (media_id, 64-bit hash) — payload bytes never move."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        payload_phashes,
        synth_crossformat_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc codec ENCODE in the synth is
    # the CPU-heavy half, and a small parquet arrives as one scan split
    # (round-11 profile: minting ran serially while 31 cores idled);
    # the synth and the extractor then inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_crossformat_media(docs)
    return (
        payload_phashes(media, strict=True)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.countDistinct("phash").alias("n_distinct_hashes"),
        )
    )


@_register(
    "mm_gif_frames",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
             doc_id % 16 + 120 AS m0,
             40 + doc_id % 180 AS v1,
             30 + doc_id % 200 AS v2,
             doc_id % 256 AS bg,
             doc_id % 2 = 1 AS disposed,
             100 * (1 + doc_id % 9) AS delay_ms
      FROM documents WHERE doc_id % 3 = 1
    ), fr AS (
      SELECT img.*, f.f AS frame_index,
             -- composited gray per frame: quarters of the 32x32 canvas,
             -- every covered 16-row band of the base pattern sums to a
             -- full gray cycle, so each mean is an exact k/4
             CASE f.f
               WHEN 0 THEN 4.0 * m0
               WHEN 1 THEN 3.0 * m0 + v1
               ELSE CASE WHEN disposed THEN 2.0 * m0 + bg + v2
                         ELSE 2.0 * m0 + v1 + v2 END
             END / 4 AS gray
      FROM img, (SELECT unnest(generate_series(0, 2)) AS f) AS f(f)
    )
    SELECT media_id,
           CAST(frame_index AS INTEGER) AS frame_index,
           CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height,
           -- identical Rec.601 double on both engines; k/1020-scale
           -- values sit >= ~1/102 of a 6th-decimal step from any tie
           FLOOR((0.299 * gray + 0.587 * gray + 0.114 * gray) / 255
                 * 1e6 + 0.5) / 1e6 AS mean_luma,
           CAST(delay_ms AS BIGINT) AS delay_ms,
           'gif' AS parser
    FROM fr
    """,
)
def mm_gif_frames(spark, sf_dir):
    """REAL animated-GIF frame extraction (round 11): synth_gif_anim_media
    mints three-frame animations — full-canvas row-gray base (interlaced
    on odd docs), two constant sub-rectangle overlays, KEEP vs
    RESTORE-TO-BACKGROUND disposal split by doc parity, per-frame GCE
    delays — and gif_frame_samples LZW-decodes AND composites every
    frame per the GIF89a spec (strict=True), the REAL execution half of
    the frame-sampling story that frame_sample_plan plans metadata-only
    for other containers. The oracle states each composited frame's
    mean, size, and delay in closed form; an LZW, interlace-reorder,
    sub-rectangle placement, disposal, or background-color bug shifts a
    quarter-canvas term and breaks the hash."""
    from routing_algorithm_for_graph_dbs_spark.operators.multimodal import (
        gif_frame_samples,
        synth_gif_anim_media,
    )
    from routing_algorithm_for_graph_dbs_spark.operators.skew import (
        spread_for_compute,
    )

    # spread the INPUT docs: the per-doc codec ENCODE in the synth is
    # the CPU-heavy half, and a small parquet arrives as one scan split
    # (round-11 profile: minting ran serially while 31 cores idled);
    # the synth and the extractor then inherit the spread partitioning
    docs = spread_for_compute(
        _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    )
    media = synth_gif_anim_media(docs)
    return gif_frame_samples(media, strict=True).select(
        "media_id",
        F.col("frame_index").cast("int").alias("frame_index"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("mean_luma").cast("double").alias("mean_luma"),
        F.col("delay_ms").cast("long").alias("delay_ms"),
        "parser",
    )

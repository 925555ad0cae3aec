"""Soundness of the admissible earliest-arrival prune (graph/stop_bound.py).

The certificate claims: ``provably_unreachable(...) == True`` implies NO
path exists in the time-expanded graph from the source stoptime to the
target stoptime. An unsound certificate would silently drop feasible
itineraries (the exact failure mode of the round-7-removed cost cap), so
these tests check it against a brute-force reachability oracle on the
collected expanded graph:

- randomized instances (seeded, adversarial edge shapes: long dwells,
  subsampled CHANGE sets, overlapping clusters) — every pruned pair must
  be oracle-unreachable, and the prune must fire somewhere (non-vacuous);
- the dwell-descent maneuver (board a long-dwelling vehicle late, change
  out at its earlier arrival) — reachable BACKWARD in time relative to
  the source departure; a bound missing the S(A) slack term would
  wrongly prune it;
- quotient-unreachable stops prune unconditionally.
"""

from __future__ import annotations

import random
from types import SimpleNamespace

import pytest

from routing_algorithm_for_graph_dbs_spark.graph.stop_bound import (
    earliest_arrival_bounds,
    provably_unreachable,
    stop_slack,
    timetable_bound_data,
)

ST_SCHEMA = "stoptime_id string, stop_id string, arrival_s long, departure_s long"
EDGE_SCHEMA = "src string, dst string, type string, waiting_time long, walking_time long"


def _graph(spark, stoptimes, edges):
    return SimpleNamespace(
        stoptimes=spark.createDataFrame(stoptimes, ST_SCHEMA),
        edges=spark.createDataFrame(edges, EDGE_SCHEMA),
    )


def _reachable_from(edges, src):
    adj: dict = {}
    for s, d, *_ in edges:
        adj.setdefault(s, []).append(d)
    seen = {src}
    stack = [src]
    while stack:
        for d in adj.get(stack.pop(), ()):
            if d not in seen:
                seen.add(d)
                stack.append(d)
    return seen


def _random_instance(rng):
    """A random day graph honoring the builder's edge PREDICATES
    (operators/derived.py PRECEDES, plans/projection.py CHANGE) with
    adversarial shapes: long dwells (overlapping clusters), CHANGE sets
    subsampled (the as-of builder keeps fewer edges than the predicate
    allows — fewer edges is a subset, so the oracle stays valid)."""
    n_stops = rng.randint(3, 6)
    stops = [f"S{i}" for i in range(n_stops)]
    walk = {}
    for a in stops:
        walk[(a, a)] = 0  # in-stop transfer
        for b in stops:
            if a != b and rng.random() < 0.5:
                walk[(a, b)] = rng.randint(0, 200)
    stoptimes = []
    trips = []
    for t in range(rng.randint(4, 9)):
        length = rng.randint(2, n_stops)
        seq = rng.sample(stops, length)
        clock = rng.randint(0, 2500)
        trip = []
        for i, stop in enumerate(seq):
            arr = clock
            dep = arr + rng.randint(0, 400)  # up to long dwells
            sid = f"T{t}#{i}"
            stoptimes.append((sid, stop, arr, dep))
            trip.append((sid, stop, arr, dep))
            clock = dep + rng.randint(30, 400)
        trips.append(trip)
    edges = []
    for trip in trips:
        for (s1, _a1, _ar1, d1), (s2, _a2, ar2, _d2) in zip(trip, trip[1:]):
            edges.append((s1, s2, "PRECEDES", ar2 - d1, 0))
    by_trip = {sid: ti for ti, trip in enumerate(trips) for sid, *_ in trip}
    for sid, a, ar, _dp in stoptimes:
        for tid, b, _ar2, dp2 in stoptimes:
            if by_trip[sid] == by_trip[tid]:
                continue
            w = walk.get((a, b))
            if w is None or dp2 <= ar + w:
                continue
            if rng.random() < 0.6:
                edges.append((sid, tid, ":CHANGE", (dp2 - ar) + w, w))
    return stoptimes, edges


@pytest.mark.parametrize("seed", range(8))
def test_random_instances_never_prune_reachable(spark, seed):
    rng = random.Random(seed)
    stoptimes, edges = _random_instance(rng)
    g = _graph(spark, stoptimes, edges)
    srcs = rng.sample(stoptimes, min(3, len(stoptimes)))
    bounds = earliest_arrival_bounds(
        g, [(stop, dep) for _sid, stop, _arr, dep in srcs]
    )
    assert bounds is not None
    n_pruned = 0
    for sid, s_stop, _s_arr, s_dep in srcs:
        reach = _reachable_from(edges, sid)
        for tid, t_stop, t_arr, _t_dep in stoptimes:
            if tid == sid:
                continue
            pruned = provably_unreachable(bounds, s_stop, s_dep, t_stop, t_arr)
            if pruned:
                n_pruned += 1
                assert tid not in reach, (
                    f"UNSOUND prune (seed {seed}): {sid} -> {tid} is "
                    f"reachable but certified unreachable"
                )
    # non-vacuity: trips already past the source departure are typically
    # unreachable-in-time, so at least some instances must fire
    if seed == 0:
        assert True  # per-seed firing is data-dependent; aggregate below


def test_prune_fires_on_typical_instances(spark):
    """Aggregate non-vacuity: across a handful of seeds the certificate
    must prune a meaningful number of oracle-unreachable pairs."""
    fired = 0
    for seed in range(8):
        rng = random.Random(seed)
        stoptimes, edges = _random_instance(rng)
        g = _graph(spark, stoptimes, edges)
        srcs = rng.sample(stoptimes, min(3, len(stoptimes)))
        bounds = earliest_arrival_bounds(
            g, [(stop, dep) for _sid, stop, _arr, dep in srcs]
        )
        for _sid, s_stop, _s_arr, s_dep in srcs:
            for tid, t_stop, t_arr, _t_dep in stoptimes:
                if provably_unreachable(bounds, s_stop, s_dep, t_stop, t_arr):
                    fired += 1
    assert fired > 20


def test_dwell_descent_maneuver_not_pruned(spark):
    """The clock can move BACKWARD relative to the source departure:
    board a long-dwelling vehicle at the source stop (in-stop CHANGE to
    its departure), change out of it at its much-earlier ARRIVAL, and
    ride away — reaching a target that arrives BEFORE the source departs.
    The S(A) slack term exists exactly for this; a bound without it would
    certify this reachable target as unreachable."""
    stoptimes = [
        ("u0", "A", 1400, 1500),   # source: departs 1500
        ("x1", "A", 1000, 2000),   # long dwell at A: cluster [1000, 2000]
        ("y", "B", 1080, 1100),    # reachable out of x1's ARRIVAL (1000)
        ("z", "C", 1150, 1150),    # target: arrives 1150 < source's 1500
        ("w", "C", 900, 910),      # decoy at C: genuinely unreachable
    ]
    edges = [
        # in-stop transfer: dep(x1)=2000 > arr(u0)=1400 + 0
        ("u0", "x1", ":CHANGE", 600, 0),
        # change OUT of x1 at its arrival: dep(y)=1100 > arr(x1)=1000 + 0
        ("x1", "y", ":CHANGE", 100, 0),
        ("y", "z", "PRECEDES", 50, 0),
    ]
    g = _graph(spark, stoptimes, edges)
    bounds = earliest_arrival_bounds(g, [("A", 1500)])
    assert bounds is not None
    reach = _reachable_from(edges, "u0")
    assert "z" in reach  # the maneuver is real
    assert not provably_unreachable(bounds, "A", 1500, "C", 1150)
    # the decoy arrives before anything the maneuver can produce at C
    assert "w" not in reach
    assert provably_unreachable(bounds, "A", 1500, "C", 900)


def test_quotient_unreachable_stop_pruned(spark):
    stoptimes = [
        ("u0", "A", 100, 200),
        ("v", "B", 300, 400),
        ("iso", "Z", 50, 60),  # no edges toward Z
    ]
    edges = [("u0", "v", "PRECEDES", 100, 0)]
    g = _graph(spark, stoptimes, edges)
    bounds = earliest_arrival_bounds(g, [("A", 200)])
    assert provably_unreachable(bounds, "A", 200, "Z", 10 ** 9)
    assert not provably_unreachable(bounds, "A", 200, "B", 300)


def test_stop_slack_merged_clusters(spark):
    """S(A) = max span over MERGED overlapping dwell intervals, not the
    max single dwell: [100,300] and [250,600] chain into span 500."""
    st = spark.createDataFrame(
        [
            ("a", "A", 100, 300),
            ("b", "A", 250, 600),   # overlaps a -> cluster [100, 600]
            ("c", "A", 700, 720),   # separate cluster, span 20
            ("d", "B", 10, 10),     # zero dwell
        ],
        ST_SCHEMA,
    )
    got = {r["stop_id"]: r["slack"] for r in stop_slack(st).collect()}
    assert got == {"A": 500, "B": 0}


def test_auto_bucket_derives_and_stays_admissible(spark, monkeypatch):
    """Round 9: with no ``bucket_s`` passed, a quotient past
    AUTO_BUCKET_TARGET_ROWS coarsens itself — the derived bucket is
    recorded, the staircase shrinks under the target, and the coarsened
    bound (a) never prunes an oracle-reachable pair and (b) still
    fires. The default path needs no caller knob for its 100x-feed
    memory story."""
    from routing_algorithm_for_graph_dbs_spark.graph import stop_bound as sb

    rng = random.Random(0)
    stoptimes, edges = _random_instance(rng)
    # exact run for the prune-decision comparison
    g_exact = _graph(spark, stoptimes, edges)
    exact_data = timetable_bound_data(g_exact, bucket_s=0)
    n_exact_rows = sum(
        len(keys) for runs in exact_data[0].values() for _b, keys, _v in runs
    )
    assert n_exact_rows > 8  # the cap below must actually bind

    # a mild cap: the derived bucket coarsens the staircase noticeably
    # but keeps enough resolution that typical unreachable-in-time
    # targets still sit provably below the bound
    monkeypatch.setattr(sb, "AUTO_BUCKET_TARGET_ROWS", n_exact_rows // 2)
    g_auto = _graph(spark, stoptimes, edges)
    auto_data = timetable_bound_data(g_auto)  # default: auto
    assert sb.LAST_AUTO_BUCKET_S > 0, "cap exceeded but no bucket derived"
    n_auto_rows = sum(
        len(keys) for runs in auto_data[0].values() for _b, keys, _v in runs
    )
    assert n_auto_rows < n_exact_rows

    srcs = rng.sample(stoptimes, min(3, len(stoptimes)))
    bounds = earliest_arrival_bounds(
        g_auto, [(stop, dep) for _sid, stop, _arr, dep in srcs]
    )
    assert bounds is not None
    fired = 0
    for sid, s_stop, _s_arr, s_dep in srcs:
        reach = _reachable_from(edges, sid)
        for tid, t_stop, t_arr, _t_dep in stoptimes:
            if tid == sid:
                continue
            if provably_unreachable(bounds, s_stop, s_dep, t_stop, t_arr):
                fired += 1
                assert tid not in reach, (
                    "UNSOUND prune under auto-derived bucket: "
                    f"{sid} -> {tid} is reachable"
                )
    assert fired > 0, "coarsened bound must still prune something"


def test_auto_bucket_apportions_budget_per_pair(spark, monkeypatch):
    """Round 10: past the cap the row budget is apportioned PER PAIR —
    cheap pairs keep bit-exact staircases, only the heavy pair coarsens,
    and prune efficacy stays within 10% of the exact bound (the uniform
    round-9 bucket lost certificate-critical resolution on cheap pairs;
    see the measured SCALE.md cliff)."""
    from routing_algorithm_for_graph_dbs_spark.graph import stop_bound as sb

    stoptimes, edges = [], []
    # one HEAVY pair A -> B: 60 connections at distinct departures
    for i in range(60):
        dep = 1000 + 37 * i
        stoptimes.append((f"h{i}a", "A", dep - 20, dep))
        stoptimes.append((f"h{i}b", "B", dep + 120, dep + 130))
        edges.append((f"h{i}a", f"h{i}b", "PRECEDES", 120, 0))
    # many CHEAP pairs C{j} -> D{j}: one connection each
    for j in range(12):
        dep = 500 + 400 * j
        stoptimes.append((f"c{j}a", f"C{j}", dep - 10, dep))
        stoptimes.append((f"c{j}b", f"D{j}", dep + 300, dep + 310))
        edges.append((f"c{j}a", f"c{j}b", "PRECEDES", 300, 0))

    g_exact = _graph(spark, stoptimes, edges)
    exact_data = timetable_bound_data(g_exact, bucket_s=0)
    n_exact_rows = sum(
        len(keys) for runs in exact_data[0].values() for _b, keys, _v in runs
    )
    assert n_exact_rows == 72  # 60 heavy + 12 cheap

    monkeypatch.setattr(sb, "AUTO_BUCKET_TARGET_ROWS", 40)
    g_auto = _graph(spark, stoptimes, edges)
    auto_data = timetable_bound_data(g_auto)
    n_auto_rows = sum(
        len(keys) for runs in auto_data[0].values() for _b, keys, _v in runs
    )
    assert n_auto_rows <= 40
    assert not sb.LAST_AUTO_BUCKET_CLAMPED
    assert sb.LAST_AUTO_EXACT_PAIRS == 12 and sb.LAST_AUTO_COARSE_PAIRS == 1
    assert sb.LAST_AUTO_BUCKET_S > 1

    # every cheap pair's staircase is BIT-IDENTICAL to the exact run
    for a in [f"C{j}" for j in range(12)]:
        (eb, ek, ev), = exact_data[0][a]
        (ab, ak, av), = auto_data[0][a]
        assert eb == ab
        assert (ek == ak).all() and (ev == av).all()
    # the heavy pair coarsened
    (_, hk_exact, _), = exact_data[0]["A"]
    (_, hk_auto, _), = auto_data[0]["A"]
    assert len(hk_auto) < len(hk_exact)

    # prune efficacy within 10% of exact, and sound against the oracle
    srcs = [s for s in stoptimes if s[0] in ("h50a", "h5a", "c0a", "c11a")]
    src_points = [(stop, dep) for _sid, stop, _arr, dep in srcs]
    b_exact = earliest_arrival_bounds(g_exact, src_points)
    b_auto = earliest_arrival_bounds(g_auto, src_points)
    fired_exact = fired_auto = 0
    for sid, s_stop, _s_arr, s_dep in srcs:
        reach = _reachable_from(edges, sid)
        for tid, t_stop, t_arr, _t_dep in stoptimes:
            if tid == sid:
                continue
            if provably_unreachable(b_exact, s_stop, s_dep, t_stop, t_arr):
                fired_exact += 1
            if provably_unreachable(b_auto, s_stop, s_dep, t_stop, t_arr):
                fired_auto += 1
                assert tid not in reach, (
                    f"UNSOUND apportioned prune: {sid} -> {tid} reachable"
                )
    assert fired_exact > 50  # non-vacuous comparison
    assert fired_auto >= 0.9 * fired_exact


def test_auto_bucket_maxmin_fair_many_heavy_pairs(spark, monkeypatch):
    """Round 11 regression (caught by tools/scale_stop_bound.py at 1x):
    with SEVERAL heavy pairs and a budget just under the exact quotient,
    round 10's greedy maximized the exact-pair count and starved every
    heavy pair to a 2-row staircase (buckets ~ the whole service day,
    efficacy 0). The max-min fair cap must instead give each heavy pair
    ~cap rows of resolution."""
    from routing_algorithm_for_graph_dbs_spark.graph import stop_bound as sb

    stoptimes, edges = [], []
    # 10 HEAVY pairs A{p} -> B{p}: 60 connections each
    for p in range(10):
        for i in range(60):
            dep = 1000 + 37 * i + 7 * p
            stoptimes.append((f"h{p}_{i}a", f"A{p}", dep - 20, dep))
            stoptimes.append((f"h{p}_{i}b", f"B{p}", dep + 120, dep + 130))
            edges.append((f"h{p}_{i}a", f"h{p}_{i}b", "PRECEDES", 120, 0))
    # 12 cheap pairs
    for j in range(12):
        dep = 500 + 400 * j
        stoptimes.append((f"c{j}a", f"C{j}", dep - 10, dep))
        stoptimes.append((f"c{j}b", f"D{j}", dep + 300, dep + 310))
        edges.append((f"c{j}a", f"c{j}b", "PRECEDES", 300, 0))

    total = 10 * 60 + 12
    target = int(total * 0.9)  # 550: the 90%-budget regime
    monkeypatch.setattr(sb, "AUTO_BUCKET_TARGET_ROWS", target)
    g = _graph(spark, stoptimes, edges)
    data = timetable_bound_data(g)
    assert not sb.LAST_AUTO_BUCKET_CLAMPED
    # max-min cap: c = (550 - 12) // 10 = 53 rows per heavy pair; the
    # greedy would have left 2. Every heavy staircase must carry most of
    # that resolution (round-up bucketing can merge a few keys).
    for p in range(10):
        (_, keys, _), = data[0][f"A{p}"]
        assert len(keys) >= 40, (p, len(keys))
    # cheap pairs stay bit-exact
    for j in range(12):
        (_, keys, _), = data[0][f"C{j}"]
        assert len(keys) == 1
    n_rows = sum(len(k) for runs in data[0].values() for _b, k, _v in runs)
    assert n_rows <= target


def test_auto_bucket_clamp_is_recorded(spark, monkeypatch):
    """n_pairs ~ target degenerate case (r10 ADVICE): even 2 rows per
    pair overshoots the budget — the collect proceeds at minimum
    resolution and the clamp is recorded, not silent."""
    from routing_algorithm_for_graph_dbs_spark.graph import stop_bound as sb

    stoptimes, edges = [], []
    for j in range(8):
        for r in range(3):  # 3 connections per pair so exact = 24 rows
            dep = 500 + 400 * j + 50 * r
            stoptimes.append((f"c{j}a{r}", f"C{j}", dep - 10, dep))
            stoptimes.append((f"c{j}b{r}", f"D{j}", dep + 300, dep + 310))
            edges.append((f"c{j}a{r}", f"c{j}b{r}", "PRECEDES", 300, 0))
    monkeypatch.setattr(sb, "AUTO_BUCKET_TARGET_ROWS", 9)  # < 2 * 8 pairs
    g = _graph(spark, stoptimes, edges)
    data = timetable_bound_data(g)
    assert sb.LAST_AUTO_BUCKET_CLAMPED
    n_rows = sum(len(keys) for runs in data[0].values() for _b, keys, _v in runs)
    assert n_rows <= 16  # minimum resolution: <= 2 rows per pair
    # still admissible: the single reachable pair is never pruned
    bounds = earliest_arrival_bounds(g, [("C0", 500)])
    assert not provably_unreachable(bounds, "C0", 500, "D0", 800)


def test_timetable_data_memoized(spark):
    stoptimes = [("u0", "A", 100, 200), ("v", "B", 300, 400)]
    edges = [("u0", "v", "PRECEDES", 100, 0)]
    g = _graph(spark, stoptimes, edges)
    d1 = timetable_bound_data(g)
    d2 = timetable_bound_data(g)
    assert d1 is d2

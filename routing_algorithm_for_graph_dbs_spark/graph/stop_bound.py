"""Admissible earliest-arrival lower bounds on the collapsed stop graph.

The exact-settlement routing kernel's worst case is a lane whose target
set contains an UNREACHABLE stoptime: proving unreachability by search
means exhausting the lane's component (SCALE.md: the earliest-arrival
target stoptimes of each destination stop are exactly such blockers —
they depart minutes after the source departs, rank first ahead of every
reachable target, and cannot be rank-pruned; the reference's per-pair
GDS Dijkstra pays the same). This module computes a cheap, provable
certificate instead: a per-(source stoptime, stop) lower bound ``L``
such that ANY path in the time-expanded graph from source stoptime
``u0`` to a node ``t`` satisfies

    arrival_s(t)  >=  L(stop(t))  -  S(stop(t))

so a target with ``arrival_s(t)`` strictly below that is PROVABLY
unreachable and is excluded from the settlement set up front. The bound
is admissible — it can only under-prune — unlike a cost horizon (the
round-7 removal): a pruned target yields no result row either way (no
path exists, so the kernel never costs it), and kept targets keep exact
settlement semantics.

Soundness construction (the subtlety is vehicle dwell). Model the
rider's clock along an arbitrary expanded path: entering a stoptime via
PRECEDES sets clock ``arrival_s``; via CHANGE sets ``departure_s`` (the
edge predicate guarantees ``departure_s(y) > arrival_s(x) + walk``,
reference ``main.py:17`` / ``new_dbSetup.py:66-74`` edge semantics).
In-stop change chains can DESCEND the clock — board a long-dwelling
vehicle at its departure, change out at its (earlier) arrival. The key
fact bounding the descent: each in-stop CHANGE step ``x -> x'`` requires
``departure_s(x') > arrival_s(x)``, so the step either stays within the
same merged cluster of overlapping ``[arrival_s, departure_s]`` dwell
intervals at the stop, or jumps to a strictly LATER cluster (a departure
reaching below the current cluster's minimum arrival would belong to an
earlier cluster whose max departure lies below that minimum,
contradicting ``departure_s(x') > arrival_s(x)``); in-stop PRECEDES hops
only ascend the clock. Hence during one visit at stop ``A`` the clock
never drops more than ``S(A)`` = the maximum merged-cluster span at
``A`` — a DATA quantity (seconds of contiguous dwell overlap), not a
path-length term — and every stoptime ``x`` the rider can occupy during
the visit satisfies ``departure_s(x) >= entry_clock - S(A)``.

Time-dependent relaxation over the stop quotient (one label per stop,
initialized ``L(stop(u0)) = departure_s(u0)``, all else +inf). Every
expanded inter-stop edge ``x -> y`` (either type) is usable only if the
rider occupies ``x``, i.e. ``departure_s(x) >= clock - S(A)``, and
yields entry clock ``arrival_s(y)`` (PRECEDES) or ``departure_s(y)``
(CHANGE). Quotienting to stop pairs gives ONE staircase per (A, B):
connection rows ``(key = departure_s(x), val = resulting clock)``,
reduced to min-val per key, and the relaxation is

    f_{A,B}(c) = min { val : key >= c - S(A) }

(a suffix-min over the key-sorted staircase — one binary search).
``f`` is monotone non-decreasing in ``c`` and returns members of a
finite integer set (day arrivals/departures), so SPFA-style label
correction reaches its fixpoint in finitely many relaxations — no
negative-cycle subtlety (a pop cap guards anyway; hitting it disables
the prune, never unsound). Validity at the fixpoint is by induction
over the true path's inter-stop hops: ``L(A_i) <= e_i`` (true entry
clock) implies the hop's connection is inside the relaxation's
candidate set (``departure_s(x) >= e_i - S(A_i) >= L(A_i) - S(A_i)``),
so ``L(A_{i+1}) <= f(L(A_i)) <= e_{i+1}``; in-stop movement needs no
edge because the label is per-stop and descent is absorbed by ``S(A)``.
Finally ``arrival_s(t) >= entry - S(stop(t)) >= L(stop(t)) -
S(stop(t))``.

Scale shape: one aggregation job per graph — the edge relation joined
to the three-column stoptime map and grouped to (stop-pair, departure)
rows, i.e. the STOP-level connection timetable, O(|grouped
connections|) not O(|expanded edges|) — Arrow-collected once and
memoized on the ProjectedGraph like ``edge_count``. The driver-side
size is capped BY DEFAULT: a pre-collect count sizes the quotient, and
past ``AUTO_BUCKET_TARGET_ROWS`` the row budget is apportioned PER
stop-pair (round 10): the pairs with the fewest connection rows keep
exact keys and only the heavy pairs are coarsened, each to its own
bucket (keys round UP — a connection only becomes available EARLIER
than truth; vals keep the bucket min — still admissible). Uniform
round-9 coarsening lost certificate-critical resolution on cheap pairs
(the measured 75-minute-bucket cliff, SCALE.md); apportioning keeps
their staircases bit-exact and degrades only where the rows actually
are. ``bucket_s`` remains available to pin one global bucket or
disable coarsening. Per lane, one SPFA over ~10^3 stops driver-side
(milliseconds against a kernel superstep).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

INF = float("inf")


def stop_slack(stoptimes: DataFrame) -> DataFrame:
    """Per-stop max merged-dwell-cluster span ``S(A)`` (seconds).

    Sort a stop's ``[arrival_s, departure_s]`` intervals by arrival; a new
    cluster starts when an interval's arrival exceeds the running max
    departure of all earlier intervals (the standard overlap merge —
    clusters are time-ordered, so the global running max equals the
    current cluster's reach). Span = cluster max departure - min arrival.
    """
    w = Window.partitionBy("stop_id").orderBy("arrival_s", "departure_s")
    prev_reach = F.max("departure_s").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        stoptimes.select("stop_id", "arrival_s", "departure_s")
        .withColumn(
            "new_cluster",
            (F.col("arrival_s") > F.coalesce(prev_reach, F.lit(-(1 << 60))))
            .cast("int"),
        )
        .withColumn("cluster", F.sum("new_cluster").over(w))
        .groupBy("stop_id", "cluster")
        .agg(
            (F.max("departure_s") - F.min("arrival_s")).alias("span")
        )
        .groupBy("stop_id")
        .agg(F.max("span").alias("slack"))
    )


# The auto-coarsening threshold is deliberately GENEROUS: prune efficacy
# degrades NONLINEARLY with bucket width — a target that stops being
# provably unreachable flips the kernel from settlement-radius supersteps
# to full component exhaustion (measured on the 4x feed: the quotient is
# ~4.4M rows; a 2M cap coarsened it to ~75-minute buckets, the
# certificates died, and the exact run went from 47 supersteps/77s toward
# thousands of supersteps before it was killed). 20M rows is ~1GB of
# Arrow transfer — cheap against that cliff; coarsen only to SURVIVE a
# feed whose quotient genuinely cannot sit on the driver, not to
# optimize. Round 10 softens the cliff itself: past the cap the budget
# is apportioned per pair (cheap pairs stay exact), so efficacy degrades
# where the rows are instead of uniformly.
AUTO_BUCKET_TARGET_ROWS = 20_000_000
# per-pair apportionment needs a (pair -> cnt/span) stats frame on the
# driver; past this many pairs that frame is itself a driver hazard, so
# the sizing falls back to one global bucket (round-9 scheme) computed
# from a single-row aggregate
PAIR_STATS_MAX_PAIRS = 4_000_000
# telemetry from the last auto-sizing run:
LAST_AUTO_BUCKET_S = 0  # max per-pair bucket chosen (0 = exact collect)
LAST_AUTO_EXACT_PAIRS = 0  # pairs that kept exact keys under the budget
LAST_AUTO_COARSE_PAIRS = 0  # pairs coarsened to per-pair buckets
# True when even 2 rows per pair exceeds the target (n_pairs ~ target):
# the collect is then up to ~2*n_pairs rows, OVER the target — recorded
# here so an oversized driver transfer is self-documenting (r10 ADVICE)
LAST_AUTO_BUCKET_CLAMPED = False


def timetable_bound_data(graph, bucket_s: int | None = None):
    """Stop-level connection staircases for the relaxation, memoized.

    ``bucket_s=None`` (the default) sizes the driver-side collect
    automatically: the quotient is collected exactly when its row count
    is at most ``AUTO_BUCKET_TARGET_ROWS``; above that the budget is
    apportioned PER PAIR (round 10, replacing round 9's single global
    bucket; allocation rule fixed round 11): the MAX-MIN FAIR row cap —
    the largest ``c`` with ``sum(min(cnt, c)) <= target`` — keeps every
    pair with at most ``c`` connection rows bit-exact and gives each
    heavier pair its own bucket sized to ~``c`` rows of resolution.
    (Round 10 instead maximized the COUNT of exact pairs, which starved
    every heavy pair to a 2-row staircase whenever several pairs were
    heavy — measured efficacy ZERO at a 90% budget; SCALE.md r11.) In the
    degenerate ``n_pairs ~ target`` case even 2 rows per pair
    overshoots; the collect then proceeds at minimum resolution (up to
    ~2x the target) and records ``LAST_AUTO_BUCKET_CLAMPED`` so the
    oversized transfer is self-documenting rather than silent.
    Explicit ``bucket_s=0`` forces the exact quotient; explicit
    ``bucket_s>0`` pins one global bucket. Coarsening stays admissible
    either way (keys round UP — see below).

    Returns ``(out, slack_by_stop)``:

    - ``out[a]`` = list of ``(b, keys, suffmin_val)`` — per destination
      stop the connection staircase: ``keys`` (source departures) as a
      sorted int64 numpy array, ``suffmin_val[i]`` = min resulting clock
      over connections with key at or after ``keys[i]``.
    - ``slack_by_stop[a]`` = ``S(A)``.

    ``val`` is ``arrival_s(y)`` for PRECEDES connections (recovered as
    ``departure_s(x) + waiting_time`` — operators/derived.py:56) and
    ``departure_s(y)`` for CHANGE (recovered as ``arrival_s(x) +
    waiting_time - walking_time`` — plans/projection.py:119, weight =
    (dst_departure - src_arrival) + walk). In-stop pairs (a == b) are
    excluded: in-stop movement is absorbed by the slack term (PRECEDES
    self-pairs only ascend the clock — see module docstring).
    """
    cached = getattr(graph, "_timetable_bound_data", None)
    if cached is not None and cached[0] == bucket_s:
        return cached[1]
    st = graph.stoptimes
    # stoptime_id is unique in the day relation (one row per stoptime), so
    # the maps need no distinct — and broadcasting them keeps the edge
    # relation un-shuffled through both joins (the groupBy below is the
    # only shuffle of the 10x-larger edge side)
    m_src = F.broadcast(
        st.select(
            F.col("stoptime_id").alias("src"),
            F.col("stop_id").alias("a"),
            F.col("departure_s").cast("long").alias("dep_x"),
            F.col("arrival_s").cast("long").alias("arr_x"),
        )
    )
    m_dst = F.broadcast(
        st.select(F.col("stoptime_id").alias("dst"), F.col("stop_id").alias("b"))
    )
    val_expr = F.when(
        F.col("type") == "PRECEDES",
        F.col("dep_x") + F.col("waiting_time"),
    ).otherwise(
        # CHANGE: dst departure = src arrival + waiting - walking
        F.col("arr_x") + F.col("waiting_time") - F.col("walking_time")
    ).cast("long")

    def _base():
        return (
            graph.edges.select(
                "src", "dst", "type", "waiting_time", "walking_time"
            )
            .join(m_src, "src")
            .join(m_dst, "dst")
            .filter(F.col("a") != F.col("b"))
            .select("a", "b", "dep_x", val_expr.alias("v0"))
        )

    def _grouped(b: int):
        key_expr = F.col("dep_x")
        if b > 0:
            # round keys UP: a connection only becomes available EARLIER
            # than truth under the bucketed availability test — admissible
            key_expr = (
                -F.floor(-F.col("dep_x") / F.lit(b)) * F.lit(b)
            ).cast("long")
        return (
            _base()
            .groupBy("a", "b", key_expr.alias("k"))
            .agg(F.min("v0").alias("v"))
        )

    def _grouped_per_pair(bmap):
        # bmap: small (a, b, bucket) frame, one row per COARSENED pair —
        # broadcast-joined so unmapped (exact) pairs keep raw keys
        j = _base().join(F.broadcast(bmap), ["a", "b"], "left")
        key_expr = (
            F.when(
                F.col("bucket").isNull() | (F.col("bucket") <= 1),
                F.col("dep_x"),
            )
            .otherwise(
                -F.floor(-F.col("dep_x") / F.col("bucket")) * F.col("bucket")
            )
            .cast("long")
        )
        return (
            j.groupBy("a", "b", key_expr.alias("k"))
            .agg(F.min("v0").alias("v"))
        )

    global LAST_AUTO_BUCKET_S, LAST_AUTO_EXACT_PAIRS
    global LAST_AUTO_COARSE_PAIRS, LAST_AUTO_BUCKET_CLAMPED
    eff_bucket = bucket_s
    if bucket_s is None:
        # collect the exact quotient behind a LIMIT guard: the common
        # (fits-in-driver) case stays ONE job and transfers at most
        # target+1 rows; only an oversized quotient pays the per-pair
        # sizing agg and the apportioned recompute
        target = AUTO_BUCKET_TARGET_ROWS
        pdf = _grouped(0).limit(target + 1).toPandas()
        if len(pdf) <= target:
            LAST_AUTO_BUCKET_S = 0
            LAST_AUTO_EXACT_PAIRS = 0
            LAST_AUTO_COARSE_PAIRS = 0
            LAST_AUTO_BUCKET_CLAMPED = False
        else:
            head = (
                _grouped(0)
                .agg(
                    F.count_distinct(F.struct("a", "b")).alias("n_pairs"),
                    F.min("k").alias("kmin"),
                    F.max("k").alias("kmax"),
                )
                .collect()[0]
            )
            n_pairs = int(head["n_pairs"])
            if n_pairs > PAIR_STATS_MAX_PAIRS:
                # degenerate regime: the per-pair stats frame would
                # itself strain the driver — fall back to ONE global
                # bucket sized from the single-row aggregate (round-9
                # scheme), recording the clamp when even 2 rows per
                # pair overshoots the target
                span = int(head["kmax"]) - int(head["kmin"])
                per_pair = target / n_pairs - 1
                eff = max(1, int(np.ceil(span / max(per_pair, 1))))
                pdf = _grouped(eff).toPandas()
                LAST_AUTO_BUCKET_S = eff
                LAST_AUTO_EXACT_PAIRS = 0
                LAST_AUTO_COARSE_PAIRS = n_pairs
                LAST_AUTO_BUCKET_CLAMPED = per_pair <= 1
            else:
                stats = (
                    _grouped(0)
                    .groupBy("a", "b")
                    .agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.min("k").alias("kmin"),
                        F.max("k").alias("kmax"),
                    )
                    .toPandas()
                )
                cnt = stats["cnt"].to_numpy(dtype=np.int64)
                span = (stats["kmax"] - stats["kmin"]).to_numpy(dtype=np.int64)
                n = len(cnt)
                order = np.argsort(cnt, kind="stable")
                # MAX-MIN FAIR row cap (round 11): the largest per-pair
                # cap ``c`` with sum(min(cnt, c)) <= target — pairs with
                # cnt <= c keep exact keys, every heavier pair gets ~c
                # rows of resolution. Round 10's greedy instead MAXIMIZED
                # the number of exact pairs, which starved every heavy
                # pair to the 2-row minimum the moment several pairs were
                # heavy: measured on the 1x feed at a 90%-of-exact budget,
                # the heavy buckets blew up to ~52,000 s (the whole
                # service day), labels collapsed to the 6 am timetable
                # floor, and prune efficacy vs the exact bound was ZERO —
                # the exact cliff the apportionment was built to avoid
                # (tools/scale_stop_bound.py caught it; SCALE.md r11).
                cnt_sorted = cnt[order]
                csum = np.concatenate(([0], np.cumsum(cnt_sorted)))
                # cost if the cap equals cnt_sorted[j] (pairs 0..j exact,
                # the n-j-1 heavier pairs capped at that value)
                idx = np.arange(n)
                cost_at = csum[1:] + cnt_sorted * (n - idx - 1)
                feasible = np.nonzero(cost_at <= target)[0]
                if len(feasible) == n:
                    # the LIMIT collect said > target rows but the stats
                    # say every pair fits exactly — the two jobs saw
                    # different data. A truncated staircase would make
                    # the prune UNSOUND (missing connections RAISE the
                    # bound), so fail loudly like every other path here.
                    raise RuntimeError(
                        "stop-bound sizing jobs disagree (quotient"
                        " changed between jobs?) — refusing to build a"
                        " potentially truncated bound"
                    )
                jmax = int(feasible.max()) if len(feasible) else -1
                cap = int(
                    (target - csum[jmax + 1]) // (n - jmax - 1)
                )
                LAST_AUTO_BUCKET_CLAMPED = cap < 2
                cap = max(cap, 2)
                n_exact = int(
                    np.searchsorted(cnt_sorted, cap, side="right")
                )
                coarse_idx = order[n_exact:]
                # cap >= 2 so the divisor is >= 1; a coarse pair whose
                # span is tiny can still land on bucket 1 (exact keys)
                b_arr = np.maximum(1, -(-span[coarse_idx] // (cap - 1)))
                bmap = graph.stoptimes.sparkSession.createDataFrame(
                    list(
                        zip(
                            stats["a"].to_numpy()[coarse_idx],
                            stats["b"].to_numpy()[coarse_idx],
                            [int(x) for x in b_arr],
                        )
                    ),
                    "a string, b string, bucket long",
                )
                pdf = _grouped_per_pair(bmap).toPandas()
                # b_arr can be empty only in the clamped all-tiny-pairs
                # case (cap raised to 2 covers every pair) — then the
                # recompute was effectively exact, just oversized
                LAST_AUTO_BUCKET_S = int(b_arr.max()) if len(b_arr) else 0
                LAST_AUTO_EXACT_PAIRS = n_exact + int((b_arr == 1).sum())
                LAST_AUTO_COARSE_PAIRS = int((b_arr > 1).sum())
    else:
        pdf = _grouped(eff_bucket).toPandas()
    slack_rows = stop_slack(st).collect()

    out: dict = {}
    if len(pdf):
        pdf = pdf.sort_values(["a", "b", "k"], ignore_index=True)
        a_arr = pdf["a"].to_numpy()
        b_arr = pdf["b"].to_numpy()
        k_arr = pdf["k"].to_numpy(dtype=np.int64)
        v_arr = pdf["v"].to_numpy(dtype=np.int64)
        # group boundaries of the (a, b) runs
        brk = np.nonzero((a_arr[1:] != a_arr[:-1]) | (b_arr[1:] != b_arr[:-1]))[0] + 1
        starts = np.concatenate(([0], brk))
        ends = np.concatenate((brk, [len(pdf)]))
        for s, e in zip(starts, ends):
            keys = k_arr[s:e]
            # suffix min of resulting clocks over the key-ascending run
            suff = np.minimum.accumulate(v_arr[s:e][::-1])[::-1]
            out.setdefault(a_arr[s], []).append((b_arr[s], keys, suff))
    slack_by_stop = {r["stop_id"]: int(r["slack"]) for r in slack_rows}
    data = (out, slack_by_stop)
    object.__setattr__(graph, "_timetable_bound_data", (bucket_s, data))
    return data


def _spfa(data, src_stop, src_dep: int, max_pops: int | None = None):
    """Label-correcting earliest-clock lower bounds from one source.

    Returns ``{stop: L}`` (stops absent are quotient-unreachable, hence
    expanded-unreachable), or None if the pop cap is hit (caller must
    disable the prune — a sound no-op; unreachable with integer labels,
    but guarded)."""
    from collections import deque

    out, slack = data
    if max_pops is None:
        max_pops = 200 * max(len(out), 16)
    L: dict = {src_stop: int(src_dep)}
    q = deque([src_stop])
    in_q = {src_stop}
    pops = 0
    while q:
        pops += 1
        if pops > max_pops:
            return None
        a = q.popleft()
        in_q.discard(a)
        base = L[a] - slack.get(a, 0)
        for b, keys, suff in out.get(a, ()):
            i = np.searchsorted(keys, base, side="left")
            if i >= len(keys):
                continue
            cand = int(suff[i])
            if cand < L.get(b, INF):
                L[b] = cand
                if b not in in_q:
                    in_q.add(b)
                    q.append(b)
    return L


def earliest_arrival_bounds(graph, src_points, bucket_s: int | None = None):
    """Per-(source stop, departure) earliest-clock lower bounds.

    ``src_points``: iterable of ``(stop_id, departure_s)`` — one per lane
    (the bound is time-dependent, so lanes boarding the same stop at
    different times get different label maps; duplicates share one run).
    Returns ``(labels_by_src, slack_by_stop)`` with ``labels_by_src``
    keyed by the (stop, int departure) pair, or None when any SPFA hits
    its cap (prune disabled, exactness preserved).
    """
    data = timetable_bound_data(graph, bucket_s=bucket_s)
    slack_by_stop = data[1]
    labels_by_src: dict = {}
    for stop, dep in set(src_points):
        lab = _spfa(data, stop, int(dep))
        if lab is None:
            return None
        labels_by_src[(stop, int(dep))] = lab
    return labels_by_src, slack_by_stop


def provably_unreachable(
    bounds,
    src_stop: str,
    src_departure_s: int,
    tgt_stop: str,
    tgt_arrival_s: float,
) -> bool:
    """The certificate: True iff NO expanded-graph path from a source
    stoptime departing ``src_departure_s`` at ``src_stop`` can reach a
    target stoptime with this arrival at ``tgt_stop``. False whenever the
    bound is disabled or inconclusive (keep the target — exact)."""
    if bounds is None:
        return False
    labels_by_src, slack_by_stop = bounds
    lab = labels_by_src.get((src_stop, int(src_departure_s)))
    if lab is None:
        return False
    lb = lab.get(tgt_stop)
    if lb is None:
        # quotient-unreachable stop: no expanded path exists at all
        return True
    return tgt_arrival_s < lb - slack_by_stop.get(tgt_stop, 0)

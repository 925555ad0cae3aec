"""Generic as-of and range (interval) joins — operators Spark lacks
natively, built as compositions of existing DataFrame ops (SURVEY.md §2.3
notes the reference exercises neither, but the engine's own CHANGE-edge
derivation in plans/projection.py is an as-of join in disguise; this module
is the reusable, schema-agnostic form).

Both are bucketed equi-joins, never cross products:

- **as-of**: for each left row, the single right row (per key) with the
  greatest right-time <= left-time (backward; or the least >= for forward).
  Implemented union-style: right rows bucketed by time join the matching
  left bucket raw, plus a densified per-(key, bucket) boundary row covering
  all earlier/later buckets — a handful of candidates per left row
  regardless of right-side density, then one rank.
- **range**: all (left, right) pairs with right-time in
  [left-time + lo, left-time + hi]. Left rows explode to the covered
  buckets (span/bucket_s + 1 of them), then a bucket equi-join + exact
  filter.

At 100 TB both shuffle once on (key, bucket) — AQE handles skew — and the
bucket width trades candidate fan-in against explode width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    bucket_s: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the nearest right row per key:
    ``backward`` = greatest right_time <= left_time; ``forward`` = least
    right_time >= left_time. Left rows with no match are dropped (inner
    as-of; left-outer = join this result back). Ties on right_time are
    broken by the full right row for determinism via one rank + min struct.
    """
    back = direction == "backward"
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_rt"),
        F.struct(*[F.col(c).alias(c + suffix) for c in right.columns]).alias("_row"),
    ).withColumn("_rb", F.floor(F.col("_rt") / bucket_s))

    # per-(key, bucket) boundary value: latest (backward) / earliest
    # (forward) right time in the bucket ...
    eb = r.groupBy("_k", "_rb").agg(
        (F.max("_rt") if back else F.min("_rt")).alias("_eb")
    )
    # ... densified over the key's full bucket range so every left bucket
    # finds its boundary row, then running-extreme toward the query side
    rng = eb.groupBy("_k").agg(F.min("_rb").alias("_mn"), F.max("_rb").alias("_mx"))
    dense = rng.select(
        "_k", F.explode(F.sequence("_mn", "_mx")).alias("_rb")
    ).join(eb, ["_k", "_rb"], "left")
    if back:
        w = (
            Window.partitionBy("_k")
            .orderBy("_rb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bnd = dense.withColumn("_bt", F.max("_eb").over(w))
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_rb").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bnd = dense.withColumn("_bt", F.min("_eb").over(w))
    bnd = bnd.filter(F.col("_bt").isNotNull()).select("_k", "_rb", "_bt")
    # boundary rows join back to the actual right row at that time
    bnd_rows = bnd.join(
        r.select("_k", "_rt", "_row"),
        ["_k"],
    ).filter(F.col("_rt") == F.col("_bt")).select("_k", "_rb", "_rt", "_row")

    # Duplicate left rows are collapsed to one representative with a count
    # and re-expanded after the rank. This keeps the final rank partition key
    # fully DETERMINISTIC (the left columns themselves) — a
    # monotonically_increasing_id would be recomputed independently by the
    # raw and boundary branches below and can disagree between them,
    # duplicating matches.
    lcols = list(left.columns)
    l = (
        left.groupBy(*lcols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_lb", F.floor(F.col(left_time) / bucket_s))
        .withColumn("_lt", F.col(left_time))
    )
    # raw branch: right rows in the left row's own bucket
    raw = l.join(
        r.withColumnRenamed("_rb", "_jb"),
        (F.col(on) == F.col("_k")) & (F.col("_jb") == F.col("_lb")),
    ).drop("_jb")
    # boundary branch: the adjacent bucket's running extreme covers all
    # earlier (backward) / later (forward) buckets. The probe bucket is
    # clamped into the key's densified range: a left row far past the last
    # right bucket (backward) must still see that key's final extreme.
    clamp = rng.select(
        F.col("_k").alias("_ck"), "_mn", "_mx"
    )
    if back:
        probe = F.least(F.col("_lb") - 1, F.col("_mx"))
    else:
        probe = F.greatest(F.col("_lb") + 1, F.col("_mn"))
    bb = (
        l.join(F.broadcast(clamp), F.col(on) == F.col("_ck"))
        .withColumn("_jb", probe)
        .join(
            bnd_rows.withColumnRenamed("_rb", "_bb"),
            (F.col(on) == F.col("_k")) & (F.col("_bb") == F.col("_jb")),
        )
        .drop("_jb", "_bb", "_ck", "_mn", "_mx")
    )
    cand = raw.unionByName(bb, allowMissingColumns=True).filter(
        F.col("_rt") <= F.col("_lt") if back else F.col("_rt") >= F.col("_lt")
    )

    w2 = Window.partitionBy(*lcols).orderBy(
        (F.col("_rt").desc() if back else F.col("_rt").asc()), F.col("_row")
    )
    out = (
        cand.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        # restore the multiplicity of duplicate left rows
        .withColumn("_dup", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .select(*lcols, F.col("_row.*"))
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lo: int,
    hi: int,
    bucket_s: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs per key with
    ``left_time + lo <= right_time <= left_time + hi`` — the interval join,
    as bucket-explode + equi-join + exact filter."""
    if hi < lo:
        raise ValueError("hi must be >= lo")
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_rt"),
        F.struct(*[F.col(c).alias(c + suffix) for c in right.columns]).alias("_row"),
    ).withColumn("_rb", F.floor(F.col("_rt") / bucket_s))
    l = left.withColumn(
        "_b0", F.floor((F.col(left_time) + lo) / bucket_s)
    ).withColumn("_b1", F.floor((F.col(left_time) + hi) / bucket_s))
    exploded = l.withColumn("_jb", F.explode(F.sequence("_b0", "_b1"))).drop(
        "_b0", "_b1"
    )
    out = (
        exploded.join(
            r, (F.col(on) == F.col("_k")) & (F.col("_rb") == F.col("_jb"))
        )
        .filter(
            (F.col("_rt") >= F.col(left_time) + lo)
            & (F.col("_rt") <= F.col(left_time) + hi)
        )
        .select(*left.columns, F.col("_row.*"))
    )
    return out

def resample_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Daily resample with gap-fill and forward fill — the timeseries
    densification step (metrics rollups, feature grids): bucket events to
    days, generate EVERY day in each key's [min, max] span, left-join the
    aggregates onto the dense grid, and forward-fill the last seen sum
    across empty days. Returns
    ``(key, day, n, ffill_sum)`` — ``n`` is 0 on gap days and ``ffill_sum``
    carries the last non-empty day's (rounded) sum.

    Scale shape: the aggregate is one combiner-friendly shuffle on
    (key, day); the grid is a map-side ``sequence`` + ``explode`` over the
    per-key span (no shuffle beyond the span agg); the forward fill is a
    per-key ordered window — partitioned by key, never global. Day spans
    are bounded (years, not billions), so explode width is safe.
    """
    day = F.date_trunc("day", F.col(ts_col))
    b = (
        events.groupBy(F.col(key_col).alias("k"), day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(val_col), 2).alias("sum_val"),
        )
    )
    span = b.groupBy("k").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        "k",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["k", "day"], "left")
        .select(
            F.col("k").alias(key_col),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.last("sum_val", ignorenulls=True).over(w).alias("ffill_sum"),
        )
    )


def interpolate_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Daily resample with LINEAR interpolation across gap days — the
    numeric sibling of :func:`resample_daily`'s forward fill (sensor /
    metric series where a step function misstates the gap).

    Observed days carry their (rounded) daily mean; a gap day between
    observations at (d_prev, v_prev) and (d_next, v_next) gets
    ``v_prev + (v_next - v_prev) * (day - d_prev) / (d_next - d_prev)``.
    The grid spans each key's [min, max] observed day, so every gap has
    both neighbors — no extrapolation case exists.

    Scale shape: identical to resample_daily — one (key, day) combiner
    aggregation, a map-side sequence/explode grid, then TWO per-key
    ordered window passes over the SAME partitioning (backward
    last-non-null, forward first-non-null); Catalyst plans one sort, no
    self-join, no global window.
    """
    day = F.date_trunc("day", F.col(ts_col))
    # cross-engine-exact daily mean: a double AVG is order-dependent (both
    # engines sum in their own partition/scan order), and feeding an
    # order-dependent last bit into a 6-decimal round flips boundary rows
    # between engines (observed at sf0.1). A DECIMAL sum is exact and
    # order-independent; cast to double and divide by the count gives the
    # IDENTICAL double on both engines, and floor(x*1e6 + 0.5)/1e6 is a
    # deterministic function of that double (no decimal-tie ambiguity the
    # way engine round() implementations have).
    # COUNT(value), not COUNT(*): SUM skips NULLs, so an all-rows divisor
    # would dilute the mean on nullable inputs (F.avg semantics kept).
    # DECIMAL(38,12) keeps 12 fractional digits of the inputs — a (28,6)
    # cast pre-rounded values to 6 decimals before averaging.
    n_obs = F.count(F.col(val_col))
    vm = F.when(
        n_obs > 0,
        F.sum(F.col(val_col).cast("decimal(38,12)")).cast("double") / n_obs,
    )
    b = events.groupBy(F.col(key_col).alias("k"), day.alias("day")).agg(
        (F.floor(vm * 1e6 + F.lit(0.5)) / 1e6).alias("v")
    )
    span = b.groupBy("k").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        "k",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    wb = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    g = (
        grid.join(b, ["k", "day"], "left")
        .withColumn("pv", F.last("v", ignorenulls=True).over(wb))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wf))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(wf))
    )
    frac = F.datediff("day", "pd") / F.datediff("nd", "pd")
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    out = F.coalesce(F.col("v"), interp)
    return g.select(
        F.col("k").alias(key_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v").isNotNull().alias("observed"),
        (F.floor(out * 1e6 + F.lit(0.5)) / 1e6).alias("v_interp"),
    )

"""Event-log analytics operators: funnel, cohort retention, gap-fill,
path mining, outlier detection.

The reference's event-shaped surface is its per-month climate rollups
(`pipelines/precipitation_pipeline.py:131-139` groups observations by
time buckets); these operators generalize that to the user-activity
analytics a warehouse engine is expected to ship. All are pure
DataFrame expressions — no Python execution nodes — and every
multi-step computation reuses ONE hash-partitioning per logical key
so Catalyst plans a single Exchange:

- funnel / paths / retention partition once on ``user_id``; the lag /
  running-max windows and the final per-user aggregate all reuse it
  (aggregating on the window-partition key needs no second shuffle);
- gap_fill partitions once on the series key; the date spine is built
  from the *aggregated* per-key min/max (tiny) and exploded with
  ``sequence`` — never a driver-side loop;
- outliers two-phase: per-key moment aggregate (small) broadcast back
  against the raw stream, so the 100 TB side is scanned exactly once
  with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000  # microseconds per second


def _epoch_us(col) -> "F.Column":
    """NTZ-safe integer-microsecond epoch: events.ts is TIMESTAMP_NTZ
    in the catalog (SURVEY §1.2); unix_micros needs an LTZ input, and
    the session TZ is UTC so the cast is value-preserving. Integer µs
    (not double seconds) so strict before/after comparisons can't flip
    on rounding noise (same rationale as sessions.py:57-60)."""
    return F.unix_micros(col.cast("timestamp_ltz"))


def funnel(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: per user, the earliest timestamp of each
    stage such that stage k happens STRICTLY AFTER the user's earliest
    qualified stage k-1 event.

    Single shuffle on ``user_col``: each stage's qualification flag is
    ``min(qualified stage k-1 epoch)`` over the whole user partition
    plus a strict ``>`` comparison — "exists a strictly earlier
    qualified previous-stage event" needs only the partition-wide min
    as the lower bound, no ordered frame and no tiebreak column, and
    no self-join per stage (the join-chain formulation — one join per
    stage — is the DuckDB oracle twin and shuffles ``len(stages)``
    times; this does it in one).

    Returns one row per user who reached stage 0, with one nullable
    ``t_<stage>`` timestamp column per stage.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    epoch = _epoch_us(F.col(ts_col))
    ev = df.select(
        user_col,
        type_col,
        F.col(ts_col),
        epoch.alias("_ep"),
    )

    part = Window.partitionBy(user_col)
    # Stage 0: qualified epoch is simply the event's own epoch.
    qual_ep = F.when(F.col(type_col) == stages[0], F.col("_ep"))
    cols = [F.min(F.when(F.col(type_col) == stages[0], F.col(ts_col))).alias(
        f"t_{stages[0]}"
    )]
    for k, stage in enumerate(stages[1:], start=1):
        # Earliest qualified previous-stage epoch across the WHOLE
        # partition; an event at stage k qualifies iff its epoch is
        # strictly greater (min is a lower bound for "exists strictly
        # earlier qualified event").
        prev_min = F.min(qual_ep).over(part)
        this_qual = F.when(
            (F.col(type_col) == stage) & (F.col("_ep") > prev_min), F.col("_ep")
        )
        ev = ev.withColumn(f"_q{k}", this_qual)
        qual_ep = F.col(f"_q{k}")
        cols.append(
            F.min(F.when(F.col(f"_q{k}").isNotNull(), F.col(ts_col))).alias(
                f"t_{stage}"
            )
        )
    out = ev.groupBy(user_col).agg(*cols)
    return out.filter(F.col(f"t_{stages[0]}").isNotNull())


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    **kw,
) -> DataFrame:
    """Funnel conversion table: one row per stage with the count of
    users who reached it (in strict order) — the report layer over
    :func:`funnel`. Adds ``stage_idx`` for stable ordering."""
    per_user = funnel(df, stages, user_col=user_col, **kw)
    aggs = [
        F.count(F.col(f"t_{s}")).alias(f"n_{s}") for s in stages
    ]
    wide = per_user.agg(*aggs)
    # unpivot to (stage_idx, stage, n_users)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"n_{s}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("r"))
        .select("r.stage_idx", "r.stage", "r.n_users")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: users grouped by the period of their first
    event; for each (cohort, offset) the number of distinct cohort
    users active ``offset`` periods later.

    Two aggregation levels, both keyed by ``user_col`` first — the
    per-user first-period aggregate and the per-(user, period) activity
    dedup share one Exchange; only the final (cohort, offset) rollup
    reshuffles, and it carries one row per user-period, not raw events.
    """
    pd_col = F.date_trunc(period, F.col(ts_col))
    activity = df.select(user_col, pd_col.alias("_period")).distinct()
    firsts = activity.groupBy(user_col).agg(F.min("_period").alias("cohort_period"))
    joined = activity.join(firsts, user_col)
    if period == "week":
        off = F.floor(
            (_epoch_us(F.col("_period")) - _epoch_us(F.col("cohort_period")))
            / (7 * 24 * 3600 * _US)
        )
    elif period == "day":
        off = F.floor(
            (_epoch_us(F.col("_period")) - _epoch_us(F.col("cohort_period")))
            / (24 * 3600 * _US)
        )
    else:  # month
        off = (F.year("_period") - F.year("cohort_period")) * 12 + (
            F.month("_period") - F.month("cohort_period")
        )
    return (
        joined.select(
            F.col("cohort_period"), off.cast("bigint").alias("period_offset"), F.col(user_col)
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def gap_fill_locf(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily resample with gap-fill: per key, the daily average of
    ``value_col`` on a COMPLETE per-key day spine (min..max observed
    day), missing days filled by last-observation-carried-forward.

    The spine comes from ``sequence()`` over the per-key min/max day —
    exploded on executors from a tiny aggregate, never a driver loop
    (the reference builds its month list driver-side,
    `utils/pipeline_manager.py`). The daily agg, the spine left-join
    and the LOCF window all hash-partition on the key: one Exchange
    for the big side.
    """
    day = F.date_trunc("day", F.col(ts_col))
    val = F.when(F.isnan(F.col(value_col)), None).otherwise(F.col(value_col))
    daily = (
        df.select(F.col(key_col).alias("key"), day.alias("day"), val.alias("v"))
        .groupBy("key", "day")
        .agg(F.avg("v").alias("day_avg"))
    )
    spine = (
        daily.groupBy("key")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "key",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["key", "day"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key"),
        F.col("day"),
        F.col("day_avg"),
        F.last("day_avg", ignorenulls=True).over(w).alias("filled"),
        F.col("day_avg").isNull().alias("is_gap"),
    )


def event_paths(
    df: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Path mining: the frequency of every length-``n`` consecutive
    event-type sequence within a user's timeline (ties broken by
    ``tie_col`` so the path assignment is shuffle-stable).

    One shuffle on ``user_col`` for the lead windows; the path count
    reshuffles grouped path strings (bounded by |event_type|^n distinct
    keys after partial aggregation, not by event volume).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(">", *steps)
    complete = F.lead(type_col, n - 1).over(w).isNotNull()
    return (
        df.select(F.col(user_col), path.alias("path"), complete.alias("_c"))
        .filter(F.col("_c"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def value_outliers(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score outlier detection: events whose value deviates
    from the key's mean by more than ``z_threshold`` population
    standard deviations.

    Two-phase: the per-key moment aggregate collapses 100 TB to
    |keys| rows, which broadcast-join back against the raw scan — the
    big side is read once and never shuffled. NaN values are SQL-null
    normalized out (SURVEY §1.2).
    """
    val = F.when(F.isnan(F.col(value_col)), None).otherwise(F.col(value_col))
    clean = df.withColumn("_v", val).filter(F.col("_v").isNotNull())
    stats = clean.groupBy(key_col).agg(
        F.avg("_v").alias("_mean"),
        F.stddev_pop("_v").alias("_sd"),
    )
    z = (F.col("_v") - F.col("_mean")) / F.col("_sd")
    return (
        clean.join(F.broadcast(stats), key_col)
        .filter(F.col("_sd") > 0)
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > z_threshold)
    )


def gap_fill_interpolate(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily resample with LINEAR interpolation: like
    :func:`gap_fill_locf` but holes are filled by interpolating
    between the nearest observed days on each side (the climate-cube
    regridding fill — the reference's cubes carry NaN holes its
    pandas `dropna` simply discards, `precipitation_pipeline.py:107`;
    interpolation is what a resampling engine does instead).

    Edge gaps (before first / after last observation — impossible on
    this spine, which spans min..max observed day) fall back to the
    one-sided neighbor. Same one-Exchange shape as LOCF: the four
    neighbor lookups are windows over the same key partitioning.
    """
    day = F.date_trunc("day", F.col(ts_col))
    val = F.when(F.isnan(F.col(value_col)), None).otherwise(F.col(value_col))
    daily = (
        df.select(F.col(key_col).alias("key"), day.alias("day"), val.alias("v"))
        .groupBy("key", "day")
        .agg(F.avg("v").alias("day_avg"))
    )
    spine = (
        daily.groupBy("key")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "key",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    joined = spine.join(daily, ["key", "day"], "left")
    back = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_num = _epoch_us(F.col("day")) / F.lit(86_400 * _US)
    obs_day = F.when(F.col("day_avg").isNotNull(), day_num)
    prev_v = F.last("day_avg", ignorenulls=True).over(back)
    prev_d = F.last(obs_day, ignorenulls=True).over(back)
    next_v = F.first("day_avg", ignorenulls=True).over(fwd)
    next_d = F.first(obs_day, ignorenulls=True).over(fwd)
    frac = (day_num - prev_d) / (next_d - prev_d)
    interp = (
        F.when(F.col("day_avg").isNotNull(), F.col("day_avg"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return joined.select(
        "key",
        "day",
        "day_avg",
        interp.alias("interpolated"),
        F.col("day_avg").isNull().alias("is_gap"),
    )


def robust_outliers(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust (median/MAD) outlier detection: events whose modified
    z-score 0.6745·(x − median)/MAD exceeds ``z_threshold`` — the
    Iglewicz–Hoaglin rule, resistant to the very outliers it hunts
    (the mean/stddev version, :func:`value_outliers`, is masked by
    extreme points inflating sigma).

    Same two-phase broadcast shape: exact per-key median + MAD need
    two aggregate passes (MAD is the median of deviations FROM the
    median), but both collapse to |keys| rows and only those tiny
    aggregates shuffle; the raw stream is scanned, never shuffled, in
    the final probe. At 100 TB swap `percentile` for
    `percentile_approx` and one pass of error, same plan shape.
    """
    val = F.when(F.isnan(F.col(value_col)), None).otherwise(F.col(value_col))
    clean = df.withColumn("_v", val).filter(F.col("_v").isNotNull())
    med = clean.groupBy(key_col).agg(
        F.expr("percentile(_v, 0.5)").alias("_med")
    )
    mad = (
        clean.join(F.broadcast(med), key_col)
        .groupBy(key_col)
        .agg(
            F.expr("percentile(abs(_v - _med), 0.5)").alias("_mad"),
            F.first("_med").alias("_med"),
        )
    )
    rz = F.lit(0.6745) * (F.col("_v") - F.col("_med")) / F.col("_mad")
    return (
        clean.join(F.broadcast(mad), key_col)
        .filter(F.col("_mad") > 0)
        .withColumn("robust_z", rz)
        .filter(F.abs(F.col("robust_z")) > z_threshold)
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: each key's
    change events become validity intervals [valid_from, valid_to)
    with an ``is_current`` flag on the open-ended last row — the
    dimension-history primitive for as-of enrichment (pairs with
    operators/asof.py, which probes such intervals).

    One shuffle on the key; valid_to is the lead timestamp over the
    same partitioning. ``tie_col`` orders equal timestamps so interval
    boundaries are shuffle-stable.
    """
    attr_cols = attr_cols or ["event_type", "value"]
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    nxt = F.lead(ts_col).over(w)
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        (F.row_number().over(w)).alias("version"),
    )

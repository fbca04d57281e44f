"""As-of and range joins — operators Spark lacks natively.

The reference has no temporal joins (single-fact-table domain,
SURVEY.md §2.3), but a complete engine ships them; both are
implemented as compositions of existing DataFrame ops (SURVEY.md
custom-operator rule (a): composition before UDF).

- as-of join: union + partitioned sort + last_value window — O(n log n)
  per key partition, no range-join explosion, no skew cliff. This is
  the standard distributed as-of (vs. the naive inequality join whose
  candidate set is quadratic).
- range join: inequality join against a *small* bounds table →
  broadcast nested-loop with interval predicates; at large dim
  cardinality switch to bucketized equi-join on overlapping buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch_seconds(col: Column) -> Column:
    """Epoch seconds (double, µs-fractional) from any timestamp type.

    TIMESTAMP_NTZ cannot be cast to DOUBLE directly (Spark 4 rejects
    it); go via TIMESTAMP_LTZ first — with the engine's UTC session
    timezone (catalog.ensure_session_confs) NTZ→LTZ is the identity,
    so this agrees bit-for-bit with the DuckDB oracle's epoch_us/1e6.
    For plain TIMESTAMP the inner cast is a no-op.
    """
    return F.unix_micros(col.cast("timestamp_ltz")) / F.lit(1_000_000.0)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` within the same ``on`` key.

    Union-trick: tag both sides, sort by (key, ts, side) and carry the
    last seen right values forward with a running window — a single
    shuffle on the key, linear scan per partition. ``tie_col`` breaks
    ordering ties deterministically (right rows at equal ts: the max
    tie_col wins, matching "latest wins").
    """
    lcols = left.columns
    rv = [F.col(c) for c in right_vals]
    tie = F.col(tie_col) if tie_col else F.lit(0)

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        F.lit(None).cast("long").alias("_tie"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_vals) + ">"
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tie.cast("long").alias("_tie"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*rv).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_last_r.{c}").alias(c) for c in right_vals],
    )


def range_join(
    fact: DataFrame, bounds: DataFrame, value_col: str, lo_col: str, hi_col: str
) -> DataFrame:
    """Join fact rows to the interval containing ``value_col``
    (lo <= v < hi). Bounds table is broadcast — a nested-loop probe
    per row against an in-memory interval list; with non-overlapping
    sorted intervals Catalyst's BroadcastNestedLoopJoin is effectively
    a linear scan of a tiny table. For a bounds table too large to
    broadcast use ``binned_range_join`` — BNLJ against a non-broadcast
    side is O(|fact|·|bounds|) and is exactly what dies at 100 TB."""
    return fact.join(
        F.broadcast(bounds),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "inner",
    )


def binned_range_join(
    fact: DataFrame,
    bounds: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Scale path for the interval-containment join (lo <= v < hi)
    when the BOUNDS side is too large to broadcast: quantize the value
    axis into ``bin_width``-wide bins, explode each interval across
    the bins it spans, and equi-join on the bin — a plain shuffle
    hash/sort-merge join — then filter exact containment. This is the
    standard range-join binning optimization; without it Spark plans a
    BroadcastNestedLoopJoin (or a cartesian) whose cost is
    |fact|·|bounds|.

    Row-identical to ``range_join``: a (fact, interval) match is
    produced in EXACTLY one bin — the fact value's bin, which the
    interval's bin sequence contains exactly once — so no distinct is
    needed and duplicate-free output holds even for overlapping
    intervals. Cost model: the bounds side explodes into
    ~(interval_width / bin_width + 1) rows per interval, the fact side
    gets one 8-byte bin key; pick ``bin_width`` near the TYPICAL
    interval width so that factor stays O(1). An interval much wider
    than the bin (> ~1000 bins) belongs on the broadcast path — split
    a mixed workload by width and union (the standard hybrid).
    """
    v_bin = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    spans = bounds.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                # hi's bin included even though hi itself is exclusive:
                # the containment filter drops the non-matches, and
                # over-covering by one bin is cheaper than an
                # epsilon-correct upper bound on doubles
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return (
        fact.withColumn("_bin", v_bin)
        .join(spans, "_bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average per key for irregularly-sampled series
    (the hypertable/monitoring classic): each sample is weighted by
    how long it was 'current' — the interval to the NEXT sample of
    the same key (last-observation-carried-forward); the final sample
    carries zero weight (nothing after it to cover). Keys with a
    single sample fall back to the plain value.

    Plan: one lead() window (shuffle on key, sort by ts within key) +
    one hash aggregate. No self-join, no explode.

    ``tie_cols``: extra ordering columns for rows sharing a timestamp.
    REQUIRED for determinism when duplicate timestamps are possible —
    a tied pair's weight lands on whichever row sorts first, so the
    tiebreak changes the weighted sum, not just the order.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *(tie_cols or []))
    nxt = F.lead(_epoch_seconds(F.col(ts_col))).over(w)
    weight = nxt - _epoch_seconds(F.col(ts_col))
    weighted = df.withColumn("_w", weight)
    return weighted.groupBy(key_col).agg(
        F.when(
            F.sum("_w").isNull() | (F.sum("_w") == 0),
            F.avg(value_col),
        )
        .otherwise(
            F.sum(F.col(value_col) * F.col("_w")) / F.sum("_w")
        )
        .alias("twa"),
        F.count("*").alias("n_samples"),
    )


def locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-fill by last observation carried forward: null values take
    the most recent non-null value of the same key (the sensor-feed
    fill; pairs with time_weighted_avg). One window pass —
    ``last(ignorenulls)`` over an unbounded-preceding frame; rows
    before the first observation stay null (no lookahead).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *(tie_cols or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "filled", F.last(value_col, ignorenulls=True).over(w)
    )

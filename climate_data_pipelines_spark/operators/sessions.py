"""Batch sessionization — gaps-and-islands over an event stream.

The reference has no event-stream surface at all (its only time axis
is the monthly climate cube, SURVEY.md §1.1); the engine's streaming
side already ships session *windows* (streaming/jobs.py:95,
F.session_window with a watermark). This module is the BATCH twin: the
classic gaps-and-islands assignment — a new session starts when the
gap to the previous event of the same key exceeds a threshold — which
is what you run over 100 TB of *historical* logs, where replaying a
stream would serialize the whole corpus through one watermark clock.

Scale shape: ONE shuffle on the session key. The lag-window, the
running-sum island id, and the per-session aggregate all declare the
same `user_id` clustering, and Catalyst satisfies the final
groupBy(user_id, session_seq) with the window's existing
HashPartitioning(user_id) (a subset of the grouping key co-locates
every group), so the plan is scan → exchange(user_id) → sort →
window → partial+final agg with NO second exchange. Per-partition
cost is the sort — O(n log n) in events-per-user-shard, no state
store, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tie_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Assign gaps-and-islands session ids and aggregate per session.

    A session is a maximal run of a key's events where consecutive
    gaps are < ``gap_seconds``; a gap of exactly ``gap_seconds``
    opens a NEW session — the boundary Spark's streaming
    ``F.session_window`` uses (per-event windows [ts, ts+gap) merge
    only when they strictly overlap), so batch and streaming
    sessionization agree event-for-event (parity-tested in
    tests/test_streaming.py). ``tie_col`` breaks equal-timestamp
    ordering deterministically so the assignment (and the oracle
    hash) is stable under shuffle order.

    Returns one row per (key, session_seq) with session_start,
    session_end, duration_s, n_events and (if ``value_col``)
    total_value — NaN treated as SQL NULL per the engine's ingest
    rule (SURVEY.md §1.2).
    """
    order = [F.col(ts_col), F.col(tie_col)]
    w = Window.partitionBy(key_col).orderBy(*order)
    # integer-µs arithmetic: a boundary gap of exactly gap_seconds must
    # not flip on double rounding noise (~2e-7 s at 2024 epochs)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    prev_us = F.unix_micros(F.lag(ts_col).over(w).cast("timestamp_ltz"))
    new_session = F.when(
        prev_us.isNull() | (ts_us - prev_us >= F.lit(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_id = events.withColumn(
        "session_seq", F.sum(new_session).over(run).cast("long")
    )

    # duration: difference in int64 MICROS first, divide after — the
    # double epoch values (~1.7e9 s) only carry ~2e-7 s resolution, so
    # subtracting them loses the µs fraction to rounding noise
    dur = (
        F.unix_micros(F.max(ts_col).cast("timestamp_ltz"))
        - F.unix_micros(F.min(ts_col).cast("timestamp_ltz"))
    ) / F.lit(1_000_000.0)
    aggs: list[Column] = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        dur.alias("duration_s"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        v = F.col(value_col)
        aggs.append(
            F.sum(F.when(F.isnan(v), F.lit(None)).otherwise(v)).alias("total_value")
        )
    return with_id.groupBy(key_col, "session_seq").agg(*aggs)

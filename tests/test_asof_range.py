from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.operators import asof


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),
            (2, 100, _ts("2024-01-01 12:00:00")),
            (3, 200, _ts("2024-01-01 11:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 09:00:00"), 90, _ts("2024-01-01 09:00:00")),
            (100, _ts("2024-01-01 11:30:00"), 91, _ts("2024-01-01 11:30:00")),
            (100, _ts("2024-01-01 13:00:00"), 92, _ts("2024-01-01 13:00:00")),
        ],
        "user_id long, rts timestamp, click_id long, click_ts timestamp",
    )
    out = {
        r.event_id: r.click_id
        for r in asof.asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            right_vals=["click_id", "click_ts"], tie_col="click_id",
        ).collect()
    }
    assert out[1] == 90      # 09:00 is latest ≤ 10:00
    assert out[2] == 91      # 11:30 is latest ≤ 12:00 (13:00 excluded)
    assert out[3] is None    # no right rows for key 200


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00"), 7, _ts("2024-01-01 10:00:00"))],
        "user_id long, rts timestamp, click_id long, click_ts timestamp",
    )
    out = asof.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="rts",
        right_vals=["click_id", "click_ts"], tie_col="click_id",
    ).first()
    assert out.click_id == 7  # at-or-before is inclusive


def test_range_join_boundaries(spark):
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 49.999), (3, 50.0), (4, 150.0), (5, None)],
        "event_id long, value double",
    )
    bounds = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1000.0, "high")],
        "lo double, hi double, bucket string",
    )
    out = {r.event_id: r.bucket for r in
           asof.range_join(fact, bounds, "value", "lo", "hi").collect()}
    assert out == {1: "low", 2: "low", 3: "mid", 4: "high"}  # lo incl, hi excl; null drops


def test_cogrouped_pandas_asof_matches_jvm_asof(spark, sf_dir):
    from climate_data_pipelines_spark.functions.udfs import (
        ASOF_COGROUP_SCHEMA,
        asof_merge_cogrouped,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    left = ev.filter(F.col("event_id") % 2 == 0)
    right = ev.filter(F.col("event_id") % 2 == 1).select(
        "user_id",
        F.col("event_id").alias("ref_event_id"),
        F.col("ts").alias("rts"),
    )

    cg = (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(asof_merge_cogrouped, ASOF_COGROUP_SCHEMA)
    )
    got = {(r.user_id, r.event_id): r.ref_event_id for r in cg.collect()}

    jvm = asof.asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="rts",
        right_vals=["ref_event_id"],
        tie_col="ref_event_id",
    )
    want = {(r.user_id, r.event_id): r.ref_event_id for r in jvm.collect()}
    assert len(got) == left.count()
    assert got == want


def test_time_weighted_avg_known_series(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            # key 1: value 10 holds for 10s, value 20 holds for 30s, 99 is last (0 weight)
            (1, base, 10.0),
            (1, base + dt.timedelta(seconds=10), 20.0),
            (1, base + dt.timedelta(seconds=40), 99.0),
            # key 2: single sample -> plain value
            (2, base, 7.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {r.k: (r.twa, r.n_samples) for r in
           asof.time_weighted_avg(df, "k", "ts", "v").collect()}
    assert abs(out[1][0] - (10 * 10 + 20 * 30) / 40) < 1e-9
    assert out[1][1] == 3
    assert out[2] == (7.0, 1)


def test_locf_fills_forward_only(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base, None),                                # before first obs -> stays null
            (1, base + dt.timedelta(seconds=1), 5.0),
            (1, base + dt.timedelta(seconds=2), None),      # -> 5.0
            (1, base + dt.timedelta(seconds=3), 8.0),
            (1, base + dt.timedelta(seconds=4), None),      # -> 8.0
            (2, base, None),                                # lone null key -> null
        ],
        "k long, ts timestamp, v double",
    )
    out = asof.locf(df, "k", "ts", "v").orderBy("k", "ts").collect()
    assert [r.filled for r in out] == [None, 5.0, 5.0, 8.0, 8.0, None]


def test_binned_range_join_matches_broadcast(spark):
    """binned_range_join must be row-identical to the broadcast
    nested-loop range_join — including overlapping intervals, exact
    boundary values (lo inclusive, hi exclusive), and intervals
    spanning multiple bins."""
    from climate_data_pipelines_spark.operators import asof

    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(
            [0.0, 9.99, 10.0, 15.0, 19.99, 20.0, 35.0, 50.0, 99.9, -5.0]
        )],
        "fid long, v double",
    )
    bounds = spark.createDataFrame(
        [  # overlapping + multi-bin + exact-boundary intervals
            ("a", 0.0, 10.0),
            ("b", 5.0, 25.0),
            ("c", 10.0, 20.0),
            ("d", -10.0, 100.0),
            ("e", 20.0, 20.0),  # empty interval: matches nothing
        ],
        "name string, lo double, hi double",
    )
    exact = sorted(
        (r["fid"], r["name"])
        for r in asof.range_join(fact, bounds, "v", "lo", "hi").collect()
    )
    for bw in (1.0, 7.0, 64.0):
        binned = sorted(
            (r["fid"], r["name"])
            for r in asof.binned_range_join(
                fact, bounds, "v", "lo", "hi", bin_width=bw
            ).collect()
        )
        assert binned == exact, f"bin_width={bw}"


def test_binned_range_join_plan_is_equi(spark, sf_dir):
    """The point of binning: q165's physical plan must contain a
    shuffle equi-join on the bin, never a BroadcastNestedLoopJoin or
    cartesian product."""
    from climate_data_pipelines_spark.queries import REGISTRY

    plan = (
        REGISTRY["q165_binned_range_join"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

"""Batch sessionization (operators/sessions.py): gaps-and-islands
boundary semantics, tie determinism, aggregate correctness."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from climate_data_pipelines_spark.operators import sessions

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + timedelta(seconds=s), u, "c", float(v)) for i, (s, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_gap_boundary_matches_session_window_rule(spark):
    # F.session_window semantics: [ts, ts+gap) windows merge only on
    # STRICT overlap, so a gap of exactly 1800s opens a new session;
    # 1799s stays. 0s..1799s same session; 3599s (gap 1800 from 1799).
    ev = _events(spark, [(0, 1, 1.0), (1799, 1, 2.0), (3599, 1, 4.0)])
    out = sessions.sessionize(ev, gap_seconds=1800).orderBy("session_seq").collect()
    assert [r["session_seq"] for r in out] == [1, 2]
    assert out[0]["n_events"] == 2 and out[1]["n_events"] == 1
    assert out[0]["duration_s"] == 1799.0
    assert out[0]["total_value"] == 3.0


def test_exact_gap_splits_one_microsecond_less_merges(spark):
    mk = lambda us: spark.createDataFrame(
        [
            (0, T0, 7, "c", 1.0),
            (1, T0 + timedelta(seconds=1800, microseconds=us), 7, "c", 1.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    assert len(sessions.sessionize(mk(0), gap_seconds=1800).collect()) == 2
    assert len(sessions.sessionize(mk(-1), gap_seconds=1800).collect()) == 1


def test_per_key_isolation_and_session_count(spark):
    rows = [(0, 1, 1.0), (60, 1, 1.0), (5000, 1, 1.0), (0, 2, 1.0)]
    ev = _events(spark, rows)
    out = sessions.sessionize(ev, gap_seconds=1800).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 1


def test_nan_value_excluded_from_total(spark):
    ev = spark.createDataFrame(
        [(0, T0, 3, "c", 5.0), (1, T0 + timedelta(seconds=10), 3, "c", float("nan"))],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = sessions.sessionize(ev, gap_seconds=1800).collect()
    assert len(out) == 1 and out[0]["total_value"] == 5.0


def test_single_shuffle_plan(spark, sf_dir):
    from climate_data_pipelines_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        sessions.sessionize(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # window partitioning must be reused by the session agg: exactly
    # one Exchange in the whole plan (the user_id hash partitioning)
    assert plan.count("Exchange hashpartitioning") == 1, plan

"""Unit tests for operators/analytics.py (funnel, retention, gap-fill,
paths, outliers) and the textops retrieval additions (BM25, inverted
index) — hand-computed expectations on tiny frames, independent of the
DuckDB differential."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row, functions as F

from climate_data_pipelines_spark.operators import analytics, textops


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, event_type=t, ts=_ts(ts), value=float(v))
         for i, (u, t, ts, v) in enumerate(rows)]
    )


class TestFunnel:
    def test_strict_order(self, spark):
        ev = _events(spark, [
            # user 1: full funnel in order
            (1, "view", "2024-01-01T10:00:00", 1),
            (1, "click", "2024-01-01T10:05:00", 1),
            (1, "purchase", "2024-01-01T10:10:00", 1),
            # user 2: click BEFORE any view — stage 2 must be null
            (2, "click", "2024-01-01T09:00:00", 1),
            (2, "view", "2024-01-01T09:30:00", 1),
            (2, "purchase", "2024-01-01T09:45:00", 1),
            # user 3: never viewed — excluded entirely
            (3, "click", "2024-01-01T08:00:00", 1),
        ])
        out = {r["user_id"]: r for r in
               analytics.funnel(ev, ["view", "click", "purchase"]).collect()}
        assert set(out) == {1, 2}
        assert out[1]["t_click"] == _ts("2024-01-01T10:05:00")
        assert out[1]["t_purchase"] == _ts("2024-01-01T10:10:00")
        # user 2's only click precedes the view: no qualified click, and
        # therefore no qualified purchase even though one exists later.
        assert out[2]["t_click"] is None
        assert out[2]["t_purchase"] is None

    def test_equal_timestamp_not_qualified(self, spark):
        # strict ">": a click at exactly the view instant does not count
        ev = _events(spark, [
            (1, "view", "2024-01-01T10:00:00", 1),
            (1, "click", "2024-01-01T10:00:00", 1),
        ])
        row = analytics.funnel(ev, ["view", "click"]).collect()[0]
        assert row["t_click"] is None

    def test_funnel_counts_shape(self, spark):
        ev = _events(spark, [
            (1, "view", "2024-01-01T10:00:00", 1),
            (1, "click", "2024-01-01T10:05:00", 1),
            (2, "view", "2024-01-01T11:00:00", 1),
        ])
        out = {r["stage"]: r["n_users"] for r in
               analytics.funnel_counts(ev, ["view", "click"]).collect()}
        assert out == {"view": 2, "click": 1}


class TestRetention:
    def test_week_offsets(self, spark):
        ev = _events(spark, [
            # user 1 first active Mon 2024-01-01 week, active again 2 weeks on
            (1, "view", "2024-01-02T10:00:00", 1),
            (1, "view", "2024-01-16T10:00:00", 1),
            # user 2 same cohort, only week 0
            (2, "view", "2024-01-03T10:00:00", 1),
        ])
        out = {(r["cohort_period"], r["period_offset"]): r["n_users"]
               for r in analytics.cohort_retention(ev).collect()}
        wk0 = _ts("2024-01-01T00:00:00")
        assert out[(wk0, 0)] == 2
        assert out[(wk0, 2)] == 1
        assert (wk0, 1) not in out


class TestGapFill:
    def test_locf_fills_missing_days(self, spark):
        ev = _events(spark, [
            ("a", "x", "2024-01-01T05:00:00", 10.0),
            ("a", "x", "2024-01-01T06:00:00", 20.0),
            # 2024-01-02 missing entirely
            ("a", "x", "2024-01-03T05:00:00", 30.0),
        ])
        # key on event_type: single key "x"
        out = {r["day"].day: r for r in
               analytics.gap_fill_locf(ev, key_col="event_type").collect()}
        assert len(out) == 3  # complete spine 1..3
        assert out[1]["day_avg"] == pytest.approx(15.0)
        assert out[2]["day_avg"] is None and out[2]["is_gap"]
        assert out[2]["filled"] == pytest.approx(15.0)  # carried forward
        assert out[3]["filled"] == pytest.approx(30.0)

    def test_leading_gap_stays_null(self, spark):
        # LOCF has nothing to carry before the first observation — but
        # the spine starts at the first observed day per key, so filled
        # is never null on the spine.
        ev = _events(spark, [("a", "x", "2024-01-05T00:30:00", 1.0)])
        rows = analytics.gap_fill_locf(ev, key_col="event_type").collect()
        assert len(rows) == 1 and rows[0]["filled"] == pytest.approx(1.0)


class TestEventPaths:
    def test_trigram_counts(self, spark):
        ev = _events(spark, [
            (1, "a", "2024-01-01T10:00:00", 1),
            (1, "b", "2024-01-01T10:01:00", 1),
            (1, "c", "2024-01-01T10:02:00", 1),
            (1, "d", "2024-01-01T10:03:00", 1),
            (2, "a", "2024-01-01T10:00:00", 1),
            (2, "b", "2024-01-01T10:01:00", 1),
        ])
        out = {r["path"]: r["n_occurrences"] for r in
               analytics.event_paths(ev, n=3).collect()}
        # user 1 contributes a>b>c and b>c>d; user 2 has only 2 events
        assert out == {"a>b>c": 1, "b>c>d": 1}


class TestOutliers:
    def test_flags_only_extremes(self, spark):
        base = [(1, "x", f"2024-01-01T10:{m:02d}:00", 10.0) for m in range(20)]
        base.append((1, "x", "2024-01-01T11:00:00", 1000.0))
        ev = _events(spark, base)
        out = analytics.value_outliers(ev, key_col="event_type").collect()
        assert len(out) == 1
        assert out[0]["value"] == pytest.approx(1000.0)
        assert out[0]["zscore"] > 3

    def test_zero_variance_key_excluded(self, spark):
        ev = _events(spark, [
            (1, "x", "2024-01-01T10:00:00", 5.0),
            (2, "x", "2024-01-01T10:01:00", 5.0),
        ])
        assert analytics.value_outliers(ev, key_col="event_type").count() == 0


class TestBM25:
    def test_matches_reference_formula(self, spark):
        docs = spark.createDataFrame([
            Row(doc_id=0, text="spark spark query"),
            Row(doc_id=1, text="query data data"),
            Row(doc_id=2, text="data data data"),
        ])
        out = {r["doc_id"]: r["bm25"] for r in
               textops.bm25_topk(docs, ["spark", "query"], k=10).collect()}
        # hand-computed Okapi BM25, k1=1.2, b=0.75, dl=3, avgdl=3
        def idf(df_):
            return math.log(1 + (3 - df_ + 0.5) / (df_ + 0.5))
        def w(tf, df_):
            return idf(df_) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 1.0))
        assert out[0] == pytest.approx(w(2, 1) + w(1, 2), rel=1e-9)
        assert out[1] == pytest.approx(w(1, 2), rel=1e-9)
        assert 2 not in out  # no query terms at all

    def test_topk_truncates_deterministically(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=i, text="spark") for i in range(30)]
        )
        out = textops.bm25_topk(docs, ["spark"], k=5).collect()
        # identical scores: tie-break must keep the 5 smallest doc_ids
        assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3, 4]


class TestInvertedIndex:
    def test_postings_sorted_and_capped(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=i, text="common rare" if i == 0 else "common")
             for i in range(5)]
        )
        out = {r["token"]: r for r in
               textops.inverted_index(docs, min_doc_freq=2,
                                      postings_cap=3).collect()}
        assert "rare" not in out  # df=1 < min_doc_freq
        assert out["common"]["doc_freq"] == 5
        assert out["common"]["postings"] == [0, 1, 2]  # capped, ascending
        assert out["common"]["term_freq"] == 5


class TestInterpolate:
    def test_linear_midpoint(self, spark):
        ev = _events(spark, [
            ("a", "x", "2024-01-01T05:00:00", 10.0),
            # Jan 2 missing: midpoint of 10 and 40 = 25
            ("a", "x", "2024-01-03T05:00:00", 40.0),
        ])
        out = {r["day"].day: r for r in
               analytics.gap_fill_interpolate(ev, key_col="event_type").collect()}
        assert out[2]["interpolated"] == pytest.approx(25.0)
        assert out[2]["is_gap"]
        assert out[1]["interpolated"] == pytest.approx(10.0)
        assert out[3]["interpolated"] == pytest.approx(40.0)

    def test_unequal_gap_weights(self, spark):
        ev = _events(spark, [
            ("a", "x", "2024-01-01T01:00:00", 0.0),
            ("a", "x", "2024-01-04T01:00:00", 30.0),
        ])
        out = {r["day"].day: r["interpolated"] for r in
               analytics.gap_fill_interpolate(ev, key_col="event_type").collect()}
        assert out[2] == pytest.approx(10.0)
        assert out[3] == pytest.approx(20.0)


class TestRobustOutliers:
    def test_resistant_to_extreme(self, spark):
        # 20 values at 10 ± small spread, one at 1000: classic z-score
        # masks mild outliers when sigma inflates; MAD still flags the
        # extreme and ONLY the extreme here.
        base = [(1, "x", f"2024-01-01T10:{m:02d}:00", 10.0 + (m % 3))
                for m in range(20)]
        base.append((1, "x", "2024-01-01T11:00:00", 1000.0))
        ev = _events(spark, base)
        out = analytics.robust_outliers(ev, key_col="event_type").collect()
        assert [r["value"] for r in out] == [1000.0]
        assert abs(out[0]["robust_z"]) > 3.5

    def test_zero_mad_key_excluded(self, spark):
        ev = _events(spark, [
            (1, "x", "2024-01-01T10:00:00", 5.0),
            (2, "x", "2024-01-01T10:01:00", 5.0),
            (3, "x", "2024-01-01T10:02:00", 99.0),
        ])
        # median 5, deviations (0,0,94) → MAD 0 → key excluded (the
        # documented degenerate case, not a div-by-zero)
        assert analytics.robust_outliers(ev, key_col="event_type").count() == 0


class TestScd2:
    def test_intervals_chain(self, spark):
        ev = _events(spark, [
            (1, "a", "2024-01-01T10:00:00", 1.0),
            (1, "b", "2024-01-01T11:00:00", 2.0),
            (2, "c", "2024-01-01T09:00:00", 3.0),
        ])
        rows = sorted(analytics.scd2_intervals(ev).collect(),
                      key=lambda r: (r["user_id"], r["version"]))
        u1 = [r for r in rows if r["user_id"] == 1]
        assert u1[0]["valid_to"] == u1[1]["valid_from"]
        assert not u1[0]["is_current"] and u1[1]["is_current"]
        assert u1[1]["valid_to"] is None
        assert [r["version"] for r in u1] == [1, 2]
        u2 = [r for r in rows if r["user_id"] == 2]
        assert u2[0]["is_current"] and u2[0]["version"] == 1

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from climate_data_pipelines_spark.functions.scalar import (
    inclusive_month_range,
    month_key,
    oracle_round,
    with_year_month,
)


def _ts_df(spark, *stamps):
    return spark.createDataFrame([(datetime.datetime.fromisoformat(s),) for s in stamps], "ts timestamp")


def test_month_range_inclusive_both_ends(spark):
    # reference semantics: both boundary months fully included
    # (precipitation_pipeline.py:66-70)
    df = _ts_df(
        spark,
        "2024-02-29 23:59:59",  # last instant before start month
        "2024-03-01 00:00:00",  # first instant of start month
        "2024-05-31 23:59:59",  # last instant of end month
        "2024-06-01 00:00:00",  # first instant after end month
    )
    kept = df.filter(inclusive_month_range("ts", 2024, 3, 2024, 5)).collect()
    got = sorted(r.ts.isoformat() for r in kept)
    assert got == ["2024-03-01T00:00:00", "2024-05-31T23:59:59"]


def test_month_range_spans_year_boundary(spark):
    df = _ts_df(spark, "2023-12-15 12:00:00", "2024-01-15 12:00:00", "2024-02-15 12:00:00")
    kept = df.filter(inclusive_month_range("ts", 2023, 12, 2024, 1)).count()
    assert kept == 2


def test_with_year_month_and_key(spark):
    df = with_year_month(_ts_df(spark, "2024-03-07 01:02:03"))
    row = df.select("year", "month", month_key().alias("k")).first()
    assert (row.year, row.month, row.k) == (2024, 3, "2024-03")


def test_oracle_round_matches_duckdb(spark):
    import duckdb

    vals = [0.1234565, 2.675, 101226.81205, 1.0000005, 0.5, -2.675]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r.r
        for r in df.select(oracle_round(F.col("x"), 4).alias("r"))
        .orderBy("x")
        .collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT round(x, 4) FROM (SELECT unnest($v) AS x) ORDER BY x",
            params={"v": vals},
        ).fetchall()
    ]
    assert got == want

from __future__ import annotations

import pytest

from climate_data_pipelines_spark.catalog import TABLES, load_table, load_tables, register_views


def test_all_tables_load(spark, sf_dir):
    dfs = load_tables(spark, sf_dir)
    assert set(dfs) == set(TABLES)
    for name, df in dfs.items():
        assert df.limit(1).count() == 1, name


def test_declared_schema_matches_parquet(spark, sf_dir):
    for name, declared in TABLES.items():
        df = load_table(spark, sf_dir, name)
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in declared.fields}
        assert got == want, f"{name}: {got} != {want}"


def test_events_ts_is_timestamp_microseconds(spark, sf_dir):
    # TIMESTAMP(NANOS, isAdjustedToUTC=false) parquet → Spark 4 scans
    # it as TIMESTAMP_NTZ, µs-truncated (catalog declares the same).
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    row = df.orderBy("event_id").first()
    assert row.ts.year == 2024


def test_unknown_table_raises(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")


def test_register_views_sql_reachable(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").first().n
    assert n > 0

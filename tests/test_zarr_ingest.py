"""S1 end-to-end: synthetic Zarr v2 store → distributed chunk decode →
month-partitioned Parquet → observation queries. Uses the
dependency-free ``minimal_zarr`` codec (public Zarr v2 directory
format) since xarray/zarr are not installed in this container; the
store written here is spec-compliant and readable by zarr-python."""

from __future__ import annotations

import datetime as dt
import math
import os

import numpy as np
import pytest

from climate_data_pipelines_spark.sources import minimal_zarr as mz
from climate_data_pipelines_spark.sources import zarr_ingest


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    """3 timesteps (spanning a month boundary) × 5 lats × 4 lons, chunked
    (2,3,3) so every dimension has a padded edge chunk; one NaN cell."""
    root = str(tmp_path_factory.mktemp("zarr") / "cube.zarr")
    nt, ny, nx = 3, 5, 4
    rng = np.random.default_rng(7)
    values = rng.normal(10.0, 2.0, size=(nt, ny, nx))
    values[1, 2, 3] = np.nan
    epoch = dt.datetime(2020, 1, 31)
    times = np.array(
        [int((epoch + dt.timedelta(days=i)).timestamp()) for i in range(nt)],
        dtype=np.int64,
    )
    mz.write_array(root, "time", times, chunks=(3,),
                   attrs={"units": "seconds since 1970-01-01"})
    mz.write_array(root, "lat", np.linspace(-60, 60, ny), chunks=(5,))
    mz.write_array(root, "lon", np.linspace(0, 270, nx), chunks=(4,))
    mz.write_array(root, "precipitation", values, chunks=(2, 3, 3),
                   fill_value=float("nan"))
    return root, values, times


def test_minimal_zarr_roundtrip_with_edge_chunks(store):
    root, values, _ = store
    back = mz.read_array(root, "precipitation")
    assert back.shape == values.shape
    np.testing.assert_allclose(back, values)


def test_missing_chunk_reads_as_fill(tmp_path):
    root = str(tmp_path / "s.zarr")
    mz.write_array(root, "x", np.ones((4,)), chunks=(2,), fill_value=-1.0)
    os.remove(os.path.join(root, "x", "1"))
    np.testing.assert_allclose(mz.read_array(root, "x"), [1.0, 1.0, -1.0, -1.0])


def test_zarr_scan_distributed_melt_matches_cube(spark, store):
    root, values, times = store
    long_rows = zarr_ingest.zarr_scan(spark, root, "precipitation").collect()
    nt, ny, nx = values.shape
    assert len(long_rows) == nt * ny * nx
    lats = np.linspace(-60, 60, ny)
    lons = np.linspace(0, 270, nx)
    got = {(r.time, r.lat, r.lon): r.value for r in long_rows}
    for i in range(nt):
        t = dt.datetime.utcfromtimestamp(int(times[i]))
        for j in range(ny):
            for k in range(nx):
                v = got[(t, lats[j], lons[k])]
                if math.isnan(values[i, j, k]):
                    # pandas->Arrow already surfaces NaN as NULL
                    assert v is None or math.isnan(v)
                else:
                    assert v == pytest.approx(values[i, j, k])


def test_zarr_to_parquet_e2e_partitions_and_null_normalization(spark, store, tmp_path):
    root, values, _ = store
    out = str(tmp_path / "obs")
    zarr_ingest.zarr_to_parquet(spark, root, "precipitation", out)
    obs = spark.read.parquet(out)
    assert {"time", "lat", "lon", "value", "year", "month"} <= set(obs.columns)
    # January 31 + Feb 1-2 → two month partitions on disk
    assert sorted(
        p for p in os.listdir(out) if p.startswith("year=")
    ) == ["year=2020"]
    months = sorted(os.listdir(os.path.join(out, "year=2020")))
    assert months == ["month=1", "month=2"]
    # NaN normalized to NULL (SURVEY.md §1.2)
    assert obs.filter("value IS NULL").count() == 1
    assert obs.count() == values.size
    total = obs.agg({"value": "sum"}).collect()[0][0]
    assert total == pytest.approx(float(np.nansum(values)))


def test_zarr_datasource_format_read_matches_scan(spark, store):
    root, values, times = store
    from climate_data_pipelines_spark.sources.zarr_datasource import ZarrDataSource

    spark.dataSource.register(ZarrDataSource)
    df = (
        spark.read.format("zarr")
        .option("path", root)
        .option("variable", "precipitation")
        .load()
    )
    assert df.count() == values.size
    # the raw source is faithful: NaN cells arrive as NaN (Arrow),
    # normalization to NULL is the ingest tail's job
    from pyspark.sql import functions as F

    assert df.filter(F.isnan("value")).count() == 1
    total = df.filter(~F.isnan("value")).agg({"value": "sum"}).collect()[0][0]
    assert total == pytest.approx(float(np.nansum(values)))


def test_zarr_datasource_time_filter_prunes_chunks(spark, store):
    root, values, times = store
    from climate_data_pipelines_spark.sources.zarr_datasource import (
        ZarrChunkReader,
        ZarrDataSource,
    )
    from pyspark.sql.datasource import GreaterThanOrEqual

    spark.dataSource.register(ZarrDataSource)
    cutoff = dt.datetime.utcfromtimestamp(int(times[2]))
    df = (
        spark.read.format("zarr")
        .option("path", root)
        .option("variable", "precipitation")
        .load()
        .filter(f"time >= timestamp'{cutoff.isoformat(sep=' ')}'")
    )
    # row-level results are exact regardless of pruning
    assert df.count() == values[2:].size

    # and the planner-side pruning drops the first time-chunk: chunks
    # are (2,3,3) over (3,5,4) -> grid (2,2,2); time chunk 0 covers
    # timesteps 0-1, both before the cutoff
    rdr = ZarrChunkReader({"path": root, "variable": "precipitation"})
    unhandled = list(rdr.pushFilters([GreaterThanOrEqual(("time",), cutoff)]))
    assert len(unhandled) == 1  # partial pushdown: Spark re-checks rows
    parts = rdr.partitions()
    assert {p.ci for p in parts} == {1}
    assert len(parts) == 4  # 1 time-chunk x 2 lat-chunks x 2 lon-chunks

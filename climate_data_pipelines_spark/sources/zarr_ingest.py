"""Zarr → Parquet ingest (SURVEY.md §2.1 S1).

The reference opens its cloud cubes lazily with
``xr.open_dataset(url, engine='zarr', consolidated=True)``
(precipitation_pipeline.py:79-86) and melts matching chunks to a
pandas frame. Spark has no native Zarr source, so the engine's ingest
path is a batch conversion job: open the store, iterate timestep
chunks, hand each chunk to Spark as one cube row, ``melt_cube`` it to
the long observation table, and write partitioned Parquet — after
which every query runs against Parquet with full predicate pushdown
and partition pruning.

xarray/zarr are not installed in this environment, so the xarray
open is gated behind an import-try and the ingest falls back to
``minimal_zarr`` — a dependency-free reader for the public Zarr v2
directory format — with the chunk decode DISTRIBUTED: ``zarr_scan``
ships only (store path, metadata, coordinate arrays) to executors and
``mapInPandas`` reads/melts each chunk where it lands, so ingest
throughput scales with the cluster instead of the driver (the
xarray path below keeps the reference's driver-side batch loop shape
for environments that have it).

A native DataSourceV2 Zarr reader (SupportsPushDownFilters over chunk
metadata) is the post-MVP upgrade path (SURVEY.md §4); conversion is
the pragmatic 100 TB answer because it is one sequential pass that
then amortizes over every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from climate_data_pipelines_spark.sources.readers import melt_cube

CUBE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("lats", T.ArrayType(T.DoubleType())),
        T.StructField("lons", T.ArrayType(T.DoubleType())),
        T.StructField("values", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)


def cube_rows_to_observations(cube: DataFrame) -> DataFrame:
    """One timestep-per-row cube → long observation table
    ``(time, lat, lon, value, year, month)`` with NaN normalized to
    NULL (SURVEY.md §1.2) — the shared tail of every ingest path."""
    long_df = melt_cube(cube)
    v = F.col("value")
    return (
        long_df.withColumn("value", F.when(F.isnan(v), F.lit(None)).otherwise(v))
        .withColumn("year", F.year("time"))
        .withColumn("month", F.month("time"))
    )


def _normalize_observations(long_df: DataFrame) -> DataFrame:
    """Shared ingest tail: NaN→NULL, derive partition columns."""
    v = F.col("value")
    return (
        long_df.withColumn("value", F.when(F.isnan(v), F.lit(None)).otherwise(v))
        .withColumn("year", F.year("time"))
        .withColumn("month", F.month("time"))
    )


def zarr_scan(
    spark: SparkSession,
    store: str,
    variable: str,
    time_dim: str = "time",
    lat_dim: str = "lat",
    lon_dim: str = "lon",
) -> DataFrame:
    """Distributed scan of a local/shared-filesystem Zarr v2 store to
    the long observation table ``(time, lat, lon, value)`` — no
    xarray. The driver reads only metadata and the (tiny) coordinate
    arrays; the (huge) variable chunks are decoded by executors: one
    input row per chunk index, ``mapInPandas`` reads the chunk file
    where the task runs and melts it to Arrow batches. Chunk files
    are independent, so parallelism = chunk count — at 100 TB the
    store sits on a shared object store/filesystem and every executor
    pulls only its own chunks (this mirrors how a DataSourceV2 Zarr
    reader would partition; SURVEY.md §4).

    Python decode is off the declared query path (ingest conversion
    runs once, then everything reads Parquet); it is Arrow-batched
    and I/O-bound, not a per-row UDF.
    """
    from climate_data_pipelines_spark.sources import minimal_zarr as mz

    if "://" in store:
        raise NotImplementedError(
            "the built-in minimal Zarr reader opens local/shared-filesystem "
            "stores only; for object-store URLs run the ingest in an "
            "environment with `pip install xarray zarr s3fs`"
        )
    meta = mz.open_array(store, variable)
    if len(meta.shape) != 3:
        raise ValueError(f"expected 3-D (time,lat,lon) cube, got {meta.shape}")
    times = mz.decode_time(
        mz.read_array(store, time_dim),
        mz.open_array(store, time_dim).attrs.get("units", "seconds since 1970-01-01"),
    )
    lats = mz.read_array(store, lat_dim).astype(float)
    lons = mz.read_array(store, lon_dim).astype(float)
    grid = meta.chunk_grid
    chunk_ids = [(int(i), int(j), int(k)) for i in range(grid[0])
                 for j in range(grid[1]) for k in range(grid[2])]
    ids = spark.createDataFrame(chunk_ids, "ci int, cj int, ck int").repartition(
        min(len(chunk_ids), spark.sparkContext.defaultParallelism)
    )
    bc = spark.sparkContext.broadcast(
        {"store": store, "variable": variable, "meta": meta,
         "times": times, "lats": lats, "lons": lons}
    )

    def decode(batches):
        import numpy as np
        import pandas as pd

        from climate_data_pipelines_spark.sources import minimal_zarr as mz

        b = bc.value
        m, ct, cy, cx = b["meta"], *b["meta"].chunks
        for pdf in batches:
            for ci, cj, ck in pdf.itertuples(index=False):
                block = mz.read_chunk(b["store"], b["variable"], m, (ci, cj, ck))
                nt, ny, nx = block.shape
                t = b["times"][ci * ct : ci * ct + nt]
                la = b["lats"][cj * cy : cj * cy + ny]
                lo = b["lons"][ck * cx : ck * cx + nx]
                yield pd.DataFrame(
                    {
                        "time": np.repeat(t, ny * nx),
                        "lat": np.tile(np.repeat(la, nx), nt),
                        "lon": np.tile(lo, nt * ny),
                        "value": block.astype(float).ravel(),
                    }
                )

    return ids.mapInPandas(decode, "time timestamp, lat double, lon double, value double")


def zarr_to_parquet(
    spark: SparkSession,
    zarr_url: str,
    variable: str,
    out_path: str,
    timesteps_per_batch: int = 12,
) -> None:
    """Convert a Zarr cube to month-partitioned long-format Parquet.

    With xarray installed: driver-side loop over timestep batches
    (each batch is one Spark job); executors do the melt + write.
    Without it: the ``minimal_zarr`` distributed path (``zarr_scan``)
    — executors decode chunks in parallel, one job total.
    """
    try:
        import xarray as xr  # noqa: F401
    except ImportError:  # pragma: no cover - env-dependent
        obs = _normalize_observations(zarr_scan(spark, zarr_url, variable))
        obs.write.mode("append").partitionBy("year", "month").parquet(out_path)
        return

    ds = xr.open_dataset(zarr_url, engine="zarr", consolidated=True)
    da = ds[variable]
    times = [t for t in da["time"].values]
    lats = [float(x) for x in da["lat"].values]
    lons = [float(x) for x in da["lon"].values]
    for start in range(0, len(times), timesteps_per_batch):
        batch = times[start : start + timesteps_per_batch]
        rows = [
            (
                _to_py_ts(t),
                lats,
                lons,
                [[float(v) for v in row] for row in da.sel(time=t).values],
            )
            for t in batch
        ]
        cube = spark.createDataFrame(rows, CUBE_ROW_SCHEMA)
        obs = cube_rows_to_observations(cube)
        obs.write.mode("append").partitionBy("year", "month").parquet(out_path)


def _to_py_ts(t):  # pragma: no cover - exercised only with xarray
    import pandas as pd

    return pd.Timestamp(t).to_pydatetime()

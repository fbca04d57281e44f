"""Native Zarr data source via Spark's Python DataSource API (4.x).

The SURVEY.md §4 upgrade path made real: instead of a one-shot
convert-to-Parquet job, the engine can scan a Zarr v2 store directly —

    spark.dataSource.register(ZarrDataSource)
    df = (spark.read.format("zarr")
          .option("path", store).option("variable", "precipitation")
          .load())

with the execution characteristics a native connector should have:

- **one InputPartition per storage chunk** — scan parallelism equals
  the store's chunk grid, each task decodes only its own chunk files
  (same distribution as ``zarr_ingest.zarr_scan``, but owned by
  Spark's scan planner, so it composes with every DataFrame op);
- **time-range filter pushdown at chunk granularity** —
  ``pushFilters`` keeps >=/<=/=/>/< predicates on ``time`` and
  ``partitions()`` prunes whole time-chunks whose coordinate range
  cannot match (the Zarr analog of parquet partition pruning).
  Pruned-but-kept filters are also returned to Spark for exact
  row-level re-evaluation (chunk pruning is necessarily partial);
- **Arrow batches out of ``read()``** — one RecordBatch per chunk,
  never per-row Python.

Reads the public Zarr v2 directory format through ``minimal_zarr``
(local/shared filesystems; the reference's cloud stores are opened
with the same layout over an object-store mount). Reference behavior
mirrored: xr.open_dataset(engine='zarr') + melt, reference
pipelines/precipitation_pipeline.py:79-102.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)


@dataclass
class ZarrChunkPartition(InputPartition):
    ci: int
    cj: int
    ck: int


class ZarrDataSource(DataSource):
    """``spark.read.format("zarr")`` — options: ``path`` (store dir),
    ``variable``, optional ``time_dim``/``lat_dim``/``lon_dim``."""

    @classmethod
    def name(cls) -> str:
        return "zarr"

    def schema(self) -> str:
        return "time timestamp, lat double, lon double, value double"

    def reader(self, schema) -> "ZarrChunkReader":
        return ZarrChunkReader(dict(self.options))


class ZarrChunkReader(DataSourceReader):
    def __init__(self, options: dict):
        from climate_data_pipelines_spark.sources import minimal_zarr as mz

        store = options.get("path")
        variable = options.get("variable")
        if not store or not variable:
            raise ValueError("zarr source needs options: path, variable")
        if "://" in store:
            raise NotImplementedError(
                "the built-in Zarr source reads local/shared-filesystem "
                "stores; mount object stores or convert via xarray"
            )
        self.store = store
        self.variable = variable
        self.meta = mz.open_array(store, variable)
        if len(self.meta.shape) != 3:
            raise ValueError(f"expected (time,lat,lon) cube, got {self.meta.shape}")
        tdim = options.get("time_dim", "time")
        self.times = mz.decode_time(
            mz.read_array(store, tdim),
            mz.open_array(store, tdim).attrs.get(
                "units", "seconds since 1970-01-01"
            ),
        )
        self.lats = mz.read_array(store, options.get("lat_dim", "lat")).astype(float)
        self.lons = mz.read_array(store, options.get("lon_dim", "lon")).astype(float)
        self.time_lo = None  # inclusive bounds from pushed filters
        self.time_hi = None

    # -- planning ---------------------------------------------------------

    def pushFilters(self, filters: list[Filter]):
        # Bounds are computed EAGERLY in a plain loop before returning:
        # a generator's side effects only fire as the planner consumes
        # it, and a deferred / partially-consumed iterator would leave
        # time_lo/time_hi unset — results stay correct (every filter is
        # re-evaluated by Spark), but partitions() would silently prune
        # nothing. A materialized list keeps pruning state independent
        # of consumption order.
        comparisons = (
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            EqualTo,
        )
        for f in filters:
            if isinstance(f, comparisons) and f.attribute == ("time",):
                v = f.value
                if isinstance(v, dt.datetime):
                    if isinstance(f, (GreaterThan, GreaterThanOrEqual, EqualTo)):
                        if self.time_lo is None or v > self.time_lo:
                            self.time_lo = v
                    if isinstance(f, (LessThan, LessThanOrEqual, EqualTo)):
                        if self.time_hi is None or v < self.time_hi:
                            self.time_hi = v
        # chunk pruning is partial — Spark re-evaluates every filter
        return list(filters)

    def partitions(self):
        import numpy as np

        ct = self.meta.chunks[0]
        grid = self.meta.chunk_grid
        keep_time = []
        for ci in range(grid[0]):
            span = self.times[ci * ct : ci * ct + ct]
            if self.time_lo is not None and span.max() < np.datetime64(
                self.time_lo, "us"
            ):
                continue
            if self.time_hi is not None and span.min() > np.datetime64(
                self.time_hi, "us"
            ):
                continue
            keep_time.append(ci)
        return [
            ZarrChunkPartition(ci, cj, ck)
            for ci in keep_time
            for cj in range(grid[1])
            for ck in range(grid[2])
        ]

    # -- execution --------------------------------------------------------

    def read(self, partition: ZarrChunkPartition):
        import numpy as np
        import pyarrow as pa

        from climate_data_pipelines_spark.sources import minimal_zarr as mz

        ct, cy, cx = self.meta.chunks
        block = mz.read_chunk(
            self.store, self.variable, self.meta, (partition.ci, partition.cj, partition.ck)
        )
        nt, ny, nx = block.shape
        t = self.times[partition.ci * ct : partition.ci * ct + nt]
        la = self.lats[partition.cj * cy : partition.cj * cy + ny]
        lo = self.lons[partition.ck * cx : partition.ck * cx + nx]
        yield pa.RecordBatch.from_pydict(
            {
                "time": pa.array(np.repeat(t, ny * nx)),
                "lat": pa.array(np.tile(np.repeat(la, nx), nt)),
                "lon": pa.array(np.tile(lo, nt * ny)),
                "value": pa.array(block.astype(float).ravel()),
            }
        )

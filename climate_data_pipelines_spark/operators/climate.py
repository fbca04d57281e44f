"""Climate-domain operators: the reference's actual pipeline, lazily.

Re-expresses sppidy/climate-data-pipelines' per-month eager stages
(SURVEY.md §3.1: download → melt → filter → polygonize → GeoJSON) as
one lazy DataFrame chain. The observation table is long-format
``(time, lat, lon, value)`` — cube axes are columns, never an index
(SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from climate_data_pipelines_spark.functions.scalar import inclusive_month_range

# MERRA-2 native grid fallbacks, used when an axis has <2 distinct
# coordinates (reference: precipitation_pipeline.py:177-184).
DEFAULT_LAT_RES = 0.5
DEFAULT_LON_RES = 0.625

# Repo-packaged land-mask artifact (built offline by
# tools/build_land_mask.py; see land_grid's resolution order).
import os as _os

PACKAGED_LAND_MASK = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "data", "land_mask", "land_mask.parquet",
)


def observations(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    start: tuple[int, int] | None = None,
    end: tuple[int, int] | None = None,
) -> DataFrame:
    """Scan→filter→derive core (SURVEY.md §7.1, steps P2+P3+F1).

    Inclusive year-month window + null/NaN drop + year/month derivation.
    NaN is normalized to NULL at this boundary (SURVEY.md §1.2: the
    reference uses pandas NaN-as-null; the engine uses SQL NULL).
    """
    out = df
    if start is not None and end is not None:
        out = out.filter(inclusive_month_range(ts_col, start[0], start[1], end[0], end[1]))
    v = F.col(value_col)
    out = out.withColumn(value_col, F.when(F.isnan(v), F.lit(None)).otherwise(v))
    out = out.filter(F.col(value_col).isNotNull())
    return out.withColumn("year", F.year(ts_col)).withColumn("month", F.month(ts_col))


def land_filter(obs: DataFrame, land_cells: DataFrame, keys: list[str]) -> DataFrame:
    """Land-only filter as a left-semi join (SURVEY.md §2.2 P4 / §2.3 J2).

    The reference calls ``globe.is_land(lat, lon)`` per row
    (precipitation_pipeline.py:160-161) — a lookup into a static
    land/ocean grid. Distributed form: broadcast left-semi join of the
    observation table against a precomputed land-cell dimension on the
    (rounded) grid keys. The mask table for the full 0.5°×0.625° globe
    is ~208k rows (BASELINE.md) — well under any broadcast threshold,
    so this never shuffles the fact table.
    """
    return obs.join(F.broadcast(land_cells), on=keys, how="left_semi")


def ocean_filter(obs: DataFrame, land_cells: DataFrame, keys: list[str]) -> DataFrame:
    """Anti-join variant: points NOT in the mask (SURVEY.md Q08)."""
    return obs.join(F.broadcast(land_cells), on=keys, how="left_anti")


def grid_resolution(
    df: DataFrame, coord_col: str, fallback: float
) -> DataFrame:
    """Grid-resolution inference (SURVEY.md §2.5 W2).

    The reference takes the *first* neighbor gap of the sorted distinct
    coordinates with a hardcoded fallback for singleton axes
    (precipitation_pipeline.py:169-184). The engine generalizes to the
    *minimum* neighbor gap (robust to irregular grids) — computed with
    a lag window over the distinct coordinate values. Returns a 1-row
    DataFrame ``(resolution DOUBLE)``.

    Scale note: the window runs over *distinct coordinates* (hundreds
    of rows for a global grid), not the fact table — the distinct() is
    a map-side-combined shuffle of the single column, then the sort is
    trivial.
    """
    w = Window.orderBy(coord_col)
    gaps = (
        df.select(coord_col).distinct()
        .withColumn("_prev", F.lag(coord_col).over(w))
        .withColumn("_gap", F.abs(F.col(coord_col) - F.col("_prev")))
    )
    return gaps.agg(
        F.coalesce(F.min("_gap"), F.lit(float(fallback))).alias("resolution")
    )


def polygonize(
    obs: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    lat_res: float = DEFAULT_LAT_RES,
    lon_res: float = DEFAULT_LON_RES,
) -> DataFrame:
    """Cell → closed 5-point rectangle ring, as pure column expressions.

    Replaces the reference's row-at-a-time ``iterrows`` feature loop
    (precipitation_pipeline.py:188-223, 36 LoC of Python per row —
    SURVEY.md §2.8 U1) with vectorized nested-array construction
    (§2.7 F3+F7): the headline "no UDF needed" win. Adds a
    ``coordinates array<array<array<double>>>`` column in GeoJSON ring
    order [SW, SE, NE, NW, SW].
    """
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    hlat = F.lit(lat_res / 2.0)
    hlon = F.lit(lon_res / 2.0)
    sw = F.array(lon - hlon, lat - hlat)
    se = F.array(lon + hlon, lat - hlat)
    ne = F.array(lon + hlon, lat + hlat)
    nw = F.array(lon - hlon, lat + hlat)
    ring = F.array(sw, se, ne, nw, sw)
    return obs.withColumn("coordinates", F.array(ring))


def tile_assign(
    df: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Assign each observation to its Web-Mercator slippy tile at
    ``zoom`` — the relational half of the reference's tile pyramid
    (SURVEY.md §1.1: tippecanoe's z/x/y addressing,
    precipitation_pipeline.py:241-268), as pure column expressions:

        x = floor((lon + 180) / 360 · 2^z)
        y = floor((1 − ln(tan φ + sec φ)/π) / 2 · 2^z)

    Adds ``z, x, y`` INT columns. Downstream: per-tile rollups (the
    in-engine analog of --drop-densest density budgeting) and the
    partitioned tile sink. Latitudes must be within Mercator bounds
    (|lat| < 85.05); callers clamp beforehand.
    """
    n = F.lit(float(2**zoom))
    lon = F.col(lon_col).cast("double")
    lat_rad = F.radians(F.col(lat_col).cast("double"))
    x = F.floor((lon + 180.0) / 360.0 * n)
    y = F.floor(
        (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / F.lit(3.141592653589793))
        / 2.0
        * n
    )
    return (
        df.withColumn("z", F.lit(zoom).cast("int"))
        .withColumn("x", x.cast("int"))
        .withColumn("y", y.cast("int"))
    )


def tile_rollup(
    tiled: DataFrame, value_col: str = "value"
) -> DataFrame:
    """Per-tile aggregate rollup: count + mean value per (z, x, y).
    The in-engine replacement for density-based tile thinning — a
    tile's payload becomes its aggregate, not its raw points, so tile
    size is bounded by construction at any data scale."""
    return tiled.groupBy("z", "x", "y").agg(
        F.count("*").alias("n_points"),
        F.avg(value_col).alias("mean_value"),
    )


def geojson_features(
    polys: DataFrame, value_col: str = "value", props: list[str] | None = None
) -> DataFrame:
    """Assemble GeoJSON Feature structs + JSON text (SURVEY.md F7/F8).

    Mirrors the reference's feature dicts
    (precipitation_pipeline.py:210-228) as a nested StructType column,
    serialized with ``to_json`` (compact, like the reference's
    ``separators=(',',':')`` at humidity_pipeline.py:172).
    """
    prop_cols = [F.col(p).alias(p) for p in (props or [])]
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Polygon").alias("type"),
            F.col("coordinates").alias("coordinates"),
        ).alias("geometry"),
        F.struct(F.col(value_col).alias(value_col), *prop_cols).alias("properties"),
    )
    return polys.withColumn("feature", feature).withColumn(
        "feature_json", F.to_json(F.col("feature"))
    )


def feature_collection(features: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group FeatureCollection JSON (one row per (year,month) —
    the reference's one-GeoJSON-file-per-month, SURVEY.md K2).

    ``collect_list`` is bounded by cells-per-month (~208k for the
    global grid — MBs of JSON, safe); the heavy lifting (feature
    assembly) stayed distributed.
    """
    return (
        features.groupBy(*group_cols)
        .agg(F.collect_list("feature_json").alias("_feats"))
        .withColumn(
            "feature_collection",
            F.concat(
                F.lit('{"type":"FeatureCollection","features":['),
                F.concat_ws(",", F.col("_feats")),
                F.lit("]}"),
            ),
        )
        .drop("_feats")
    )


def land_grid(
    spark,
    lat_res: float = DEFAULT_LAT_RES,
    lon_res: float = DEFAULT_LON_RES,
    mask_parquet: str | None = None,
) -> DataFrame:
    """The land-cell dimension table (SURVEY.md §7.2 M2: 'precompute
    the mask grid once as a Parquet dim table').

    Resolution order:
    1. explicit ``mask_parquet`` / ``SPARK_GRAFT_LAND_MASK`` env — a
       parquet land grid with ``lat``/``lon`` columns (and optionally
       a boolean ``is_land``), e.g. one built by
       ``tools/build_land_mask.py`` from Natural Earth coastlines
       (the same public coastline product the ``global-land-mask``
       package the reference consults per-point is derived from,
       reference pipelines/precipitation_pipeline.py:160);
    2. the PACKAGED mask artifact (``data/land_mask/land_mask.parquet``
       — the tool's embedded-outline rasterization: genuine
       point-in-polygon coastline at 0.5°×0.625°, checked into the
       repo so the default path is real geography, not boxes);
    3. last resort only: coarse continent lat/lon boxes.
    ~208k rows at MERRA-2 resolution (BASELINE.md), always
    broadcastable; the fallback grid is built with sequence+explode —
    no driver-side loop, no collect.
    """
    import os

    mask_parquet = (
        mask_parquet
        or os.environ.get("SPARK_GRAFT_LAND_MASK")
        or (PACKAGED_LAND_MASK if os.path.exists(PACKAGED_LAND_MASK) else None)
    )
    if mask_parquet:
        dim = spark.read.parquet(mask_parquet)
        if "is_land" in dim.columns:
            dim = dim.filter(F.col("is_land"))
        return dim.select(
            F.col("lat").cast("double"), F.col("lon").cast("double")
        )
    lat_steps = int(round(180.0 / lat_res))
    lon_steps = int(round(360.0 / lon_res))
    cells = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(lat_steps - 1))).alias("_i")
        )
        .select(
            (F.lit(-90.0) + (F.col("_i") + 0.5) * lat_res).alias("lat"),
            F.explode(F.sequence(F.lit(0), F.lit(lon_steps - 1))).alias("_j"),
        )
        .select(
            "lat", (F.lit(-180.0) + (F.col("_j") + 0.5) * lon_res).alias("lon")
        )
    )
    # coarse continent boxes (Americas, Africa/Eurasia, Australia) — a
    # stand-in flag with realistic ~30% land fraction (BASELINE.md)
    lat, lon = F.col("lat"), F.col("lon")
    is_land = (
        ((lat > -55) & (lat < 70) & (lon > -115) & (lon < -40))   # Americas
        | ((lat > -35) & (lat < 70) & (lon > -10) & (lon < 50))   # Africa/Europe
        | ((lat > 10) & (lat < 65) & (lon > 60) & (lon < 135))    # Asia
        | ((lat > -45) & (lat < -10) & (lon > 110) & (lon < 155)) # Australia
    )
    return cells.filter(is_land).select("lat", "lon")


def haversine_km(lat_a, lon_a, lat_b, lon_b) -> Column:
    """Great-circle distance in km between two (lat, lon) column
    pairs — pure trig expressions (codegen, no UDF). The
    climate-domain primitive for nearest-station joins and
    radius queries."""
    rlat_a, rlat_b = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b - lat_a) / 2.0
    dlon = F.radians(lon_b - lon_a) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat_a) * F.cos(rlat_b) * F.sin(dlon) * F.sin(dlon)
    )
    return 2.0 * 6371.0088 * F.asin(F.sqrt(a))


def nearest_station(
    obs: DataFrame,
    stations: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Attach the nearest station to every observation: broadcast the
    (small) station table, score all pairs with haversine, keep the
    arg-min via one aggregation — no window sort. ``stations`` needs
    (station_id, s_lat, s_lon). At 100 TB the station table is KBs and
    the probe is a single narrow pass over the fact table."""
    scored = obs.join(F.broadcast(stations)).withColumn(
        "_d",
        haversine_km(
            F.col(lat_col), F.col(lon_col), F.col("s_lat"), F.col("s_lon")
        ),
    )
    others = [c for c in obs.columns]
    return (
        scored.groupBy(*others)
        .agg(
            F.min_by("station_id", "_d").alias("station_id"),
            F.round(F.min("_d"), 4).alias("station_km"),
        )
    )


def anomaly(
    obs: DataFrame,
    value_col: str = "value",
    month_col: str = "month",
    cell_cols: list[str] | None = None,
) -> DataFrame:
    """Climatological anomaly: value minus the long-term mean for the
    same calendar month (and optionally the same grid cell) — THE
    standard climate-analytics transform (departure from normals).
    Expressed as an average over an unbounded window partitioned by
    (month [, cell]); Catalyst plans one shuffle on the partition key
    and a single pass — no self-join against a precomputed normals
    table needed (though at 100 TB you'd materialize the normals once
    and broadcast them; same result).
    """
    keys = [month_col] + (cell_cols or [])
    w = Window.partitionBy(*keys)
    clim = F.avg(value_col).over(w)
    return obs.withColumn("climatology", clim).withColumn(
        "anomaly", F.col(value_col) - F.col("climatology")
    )


def regrid(
    obs: DataFrame,
    factor_lat: float,
    factor_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str = "value",
) -> DataFrame:
    """Spatial downsampling (xarray ``coarsen``/regrid analog): snap
    each point to a coarser cell (floor to the target resolution, cell
    center addressing) and average within the cell — one hash
    aggregate, map-side combined. Coarse cells are the partition-
    friendly unit for pyramid levels and reduced-resolution serving.
    """
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    clat = (F.floor(lat / factor_lat) * factor_lat + factor_lat / 2.0).alias("c_lat")
    clon = (F.floor(lon / factor_lon) * factor_lon + factor_lon / 2.0).alias("c_lon")
    return (
        obs.groupBy(clat, clon)
        .agg(
            F.count("*").alias("n_points"),
            F.avg(value_col).alias("mean_value"),
        )
    )


def per_key_trend(
    obs: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    epoch_offset: int = 1_600_000_000,
) -> DataFrame:
    """Per-cell linear trend (warming-rate / drift estimation): OLS
    slope of value against time within each key group — the per-pixel
    trend map every climatology product publishes.

    One hash aggregate (`regr_slope` has a partial/final split, so the
    map side combines before the single keyed shuffle). Time is
    shifted to a small epoch offset before squaring: raw epoch seconds
    (~1.7e9) squared burn ~19 digits and lose the slope signal to
    cancellation even in stable covariance forms.
    Returns slope per day (per-second slopes of slow climate signals
    are denormal-small and unreadable).
    """
    x = (F.unix_timestamp(ts_col) - F.lit(epoch_offset)).cast("double")
    return obs.groupBy(*key_cols).agg(
        (F.regr_slope(F.col(value_col), x) * 86400.0).alias("slope_per_day"),
        F.count("*").alias("n_obs"),
    )


def degree_days(
    obs: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    base: float = 18.0,
) -> DataFrame:
    """Heating/cooling degree-days per key and month — the standard
    energy-demand climate product: sum of max(base - T, 0) (heating)
    and max(T - base, 0) (cooling) over the period.

    One partial+final hash aggregate on (key, year, month); the
    greatest() clamp is a codegen'd expression, no UDF.
    """
    t = F.col(value_col)
    return obs.groupBy(
        *key_cols,
        F.year(ts_col).alias("year"),
        F.month(ts_col).alias("month"),
    ).agg(
        F.sum(F.greatest(F.lit(base) - t, F.lit(0.0))).alias("hdd"),
        F.sum(F.greatest(t - F.lit(base), F.lit(0.0))).alias("cdd"),
        F.count("*").alias("n_obs"),
    )

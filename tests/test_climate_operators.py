from __future__ import annotations

import datetime
import json
import math

from pyspark.sql import functions as F

from climate_data_pipelines_spark.operators import climate


def _obs_df(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, lat double, lon double, value double")


TS = datetime.datetime(2024, 1, 15, 12, 0, 0)


def test_observations_normalizes_nan_and_drops_nulls(spark):
    df = _obs_df(
        spark,
        [
            (TS, 10.0, 20.0, 1.5),
            (TS, 10.5, 20.0, float("nan")),  # NaN → NULL → dropped
            (TS, 11.0, 20.0, None),
        ],
    )
    out = climate.observations(df, ts_col="ts", value_col="value").collect()
    assert len(out) == 1
    assert out[0].value == 1.5
    assert out[0].year == 2024 and out[0].month == 1


def test_observations_empty_input(spark):
    df = _obs_df(spark, [])
    assert climate.observations(df).count() == 0


def test_grid_resolution_min_gap(spark):
    df = _obs_df(
        spark,
        [(TS, lat, 0.0, 1.0) for lat in (10.0, 10.5, 11.0, 12.0)],
    )
    res = climate.grid_resolution(df, "lat", fallback=99.0).first().resolution
    assert math.isclose(res, 0.5)


def test_grid_resolution_singleton_fallback(spark):
    # reference fallback: single distinct coordinate → hardcoded res
    # (precipitation_pipeline.py:174-184)
    df = _obs_df(spark, [(TS, 10.0, 0.0, 1.0), (TS, 10.0, 1.0, 2.0)])
    res = climate.grid_resolution(df, "lat", fallback=0.625).first().resolution
    assert res == 0.625


def test_land_filter_semi_and_anti_partition(spark, sf_dir):
    from climate_data_pipelines_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    mask = ev.select("user_id").distinct().filter(F.col("user_id") % 2 == 0)
    land = climate.land_filter(ev, mask, ["user_id"])
    ocean = climate.ocean_filter(ev, mask, ["user_id"])
    assert land.count() + ocean.count() == ev.count()
    assert land.join(ocean, "event_id", "inner").count() == 0


def test_polygonize_ring_is_closed_rectangle(spark):
    df = _obs_df(spark, [(TS, 10.0, 20.0, 1.0)])
    ring = climate.polygonize(df, lat_res=0.5, lon_res=0.625).first().coordinates[0]
    assert len(ring) == 5
    assert ring[0] == ring[4]  # closed
    lons = sorted({p[0] for p in ring})
    lats = sorted({p[1] for p in ring})
    assert math.isclose(lons[1] - lons[0], 0.625)
    assert math.isclose(lats[1] - lats[0], 0.5)
    # GeoJSON ring order [SW, SE, NE, NW, SW]
    assert ring[0] == [20.0 - 0.3125, 10.0 - 0.25]
    assert ring[2] == [20.0 + 0.3125, 10.0 + 0.25]


def test_geojson_feature_collection_parses(spark):
    df = _obs_df(spark, [(TS, 10.0, 20.0, 1.0), (TS, 10.5, 20.0, 2.0)])
    obs = climate.observations(df)
    feats = climate.geojson_features(climate.polygonize(obs), props=["year", "month"])
    fc = climate.feature_collection(feats, ["year", "month"]).first()
    doc = json.loads(fc.feature_collection)
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 2
    f = doc["features"][0]
    assert f["type"] == "Feature"
    assert f["geometry"]["type"] == "Polygon"
    assert f["properties"]["year"] == 2024


def test_tile_assign_known_points(spark):
    # (lat, lon) -> (x, y) at z=1: four quadrants of the world
    df = spark.createDataFrame(
        [
            (1, 40.0, -100.0),   # NW quadrant -> x=0, y=0
            (2, 40.0, 100.0),    # NE -> x=1, y=0
            (3, -40.0, -100.0),  # SW -> x=0, y=1
            (4, -40.0, 100.0),   # SE -> x=1, y=1
            (5, 0.0, 0.0),       # origin -> x=1, y=1 (on the boundary)
        ],
        "id long, lat double, lon double",
    )
    got = {r.id: (r.z, r.x, r.y) for r in climate.tile_assign(df, 1).collect()}
    assert got[1] == (1, 0, 0)
    assert got[2] == (1, 1, 0)
    assert got[3] == (1, 0, 1)
    assert got[4] == (1, 1, 1)
    assert got[5] == (1, 1, 1)


def test_tile_rollup_bounds_payload(spark):
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [(i, 10.0 + (i % 3) * 0.1, 20.0, float(i)) for i in range(30)],
        "id long, lat double, lon double, value double",
    )
    tiled = climate.tile_assign(df, 4)
    roll = climate.tile_rollup(tiled)
    rows = roll.collect()
    # all 30 points share one z=4 tile; payload is one aggregate row
    assert len(rows) == 1
    assert rows[0].n_points == 30
    assert abs(rows[0].mean_value - sum(range(30)) / 30) < 1e-9


def test_land_grid_shape_and_fraction(spark):
    grid = climate.land_grid(spark)
    n_land = grid.count()
    total = int(round(180 / climate.DEFAULT_LAT_RES)) * int(
        round(360 / climate.DEFAULT_LON_RES)
    )
    # ~208k cells globally (BASELINE.md), land fraction in a plausible band
    assert total == 360 * 576
    assert 0.15 < n_land / total < 0.45
    # usable as the broadcast semi-join dimension
    import pyspark.sql.functions as SF

    obs = spark.createDataFrame(
        [(10.25, 20.3125), (0.25, -140.3125)], "lat double, lon double"
    )
    kept = climate.land_filter(obs, grid, ["lat", "lon"]).collect()
    # (10.25, 20.3125) is inside the Africa box; mid-Pacific point is not
    assert [(r.lat, r.lon) for r in kept] == [(10.25, 20.3125)]


def test_land_grid_default_is_packaged_coastline(spark):
    # no env var, no explicit path -> the repo-packaged rasterized
    # coastline artifact, not the continent-box fallback
    grid = climate.land_grid(spark)
    cells = {
        (r.lat, r.lon)
        for r in grid.filter(
            ((F.col("lat") == 48.25) & (F.col("lon") == 2.1875))      # Paris
            | ((F.col("lat") == 35.25) & (F.col("lon") == -150.3125)) # N Pacific
            | ((F.col("lat") == -25.25) & (F.col("lon") == 133.4375)) # Australia
            | ((F.col("lat") == -35.25) & (F.col("lon") == -30.3125)) # S Atlantic
        ).collect()
    }
    assert (48.25, 2.1875) in cells          # Paris: land
    assert (-25.25, 133.4375) in cells       # central Australia: land
    assert (35.25, -150.3125) not in cells   # north Pacific: ocean
    assert (-35.25, -30.3125) not in cells   # south Atlantic: ocean


def test_haversine_known_distances(spark):
    import pyspark.sql.functions as SF

    df = spark.createDataFrame(
        [
            # Paris -> London ~343.5 km
            (1, 48.8566, 2.3522, 51.5074, -0.1278),
            # same point -> 0
            (2, 10.0, 20.0, 10.0, 20.0),
            # equator quarter turn -> ~10007.5 km
            (3, 0.0, 0.0, 0.0, 90.0),
        ],
        "id long, a_lat double, a_lon double, b_lat double, b_lon double",
    )
    got = {
        r.id: r.km
        for r in df.select(
            "id",
            climate.haversine_km(
                SF.col("a_lat"), SF.col("a_lon"), SF.col("b_lat"), SF.col("b_lon")
            ).alias("km"),
        ).collect()
    }
    assert abs(got[1] - 343.5) < 2.0
    assert got[2] == 0.0
    assert abs(got[3] - 10007.5) < 5.0


def test_nearest_station_picks_argmin(spark):
    obs = spark.createDataFrame([(1, 0.0, 0.0), (2, 50.0, 10.0)], "id long, lat double, lon double")
    stations = spark.createDataFrame(
        [(100, 1.0, 1.0), (200, 49.0, 9.0), (300, -60.0, 120.0)],
        "station_id long, s_lat double, s_lon double",
    )
    out = {r.id: (r.station_id, r.station_km) for r in climate.nearest_station(obs, stations).collect()}
    assert out[1][0] == 100
    assert out[2][0] == 200
    assert out[1][1] < 200 and out[2][1] < 200


def test_anomaly_zero_mean_per_group(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 20.0), (3, 2, 5.0)], "event_id long, month int, value double"
    )
    out = {r.event_id: (r.climatology, r.anomaly) for r in climate.anomaly(df).collect()}
    assert out[1] == (15.0, -5.0)
    assert out[2] == (15.0, 5.0)
    assert out[3] == (5.0, 0.0)


def test_regrid_snaps_to_cell_centers(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 10.0), (4.9, 9.9, 20.0), (5.1, 10.1, 99.0)],
        "lat double, lon double, value double",
    )
    out = {(r.c_lat, r.c_lon): (r.n_points, r.mean_value)
           for r in climate.regrid(df, 5.0, 10.0).collect()}
    # first two points share the (2.5, 5.0) cell; third starts a new cell
    assert out[(2.5, 5.0)] == (2, 15.0)
    assert out[(7.5, 15.0)] == (1, 99.0)


def test_degree_days_clamped_sums(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base, 10.0),                      # hdd 8
            (1, base + dt.timedelta(days=1), 25.0),  # cdd 7
            (1, base + dt.timedelta(days=2), 18.0),  # neither
        ],
        "user_id long, ts timestamp, value double",
    )
    out = climate.degree_days(df, ["user_id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.year, r.month, r.hdd, r.cdd, r.n_obs) == (2024, 1, 8.0, 7.0, 3)


def test_land_grid_prefers_supplied_mask_parquet(spark, tmp_path):
    # production path: a real land-mask dim parquet (e.g. exported from
    # the public global-land-mask grid) overrides the heuristic
    path = str(tmp_path / "mask")
    spark.createDataFrame(
        [(10.0, 20.0, True), (11.0, 21.0, False), (12.0, 22.0, True)],
        "lat double, lon double, is_land boolean",
    ).write.parquet(path)
    out = climate.land_grid(spark, mask_parquet=path).collect()
    assert sorted((r.lat, r.lon) for r in out) == [(10.0, 20.0), (12.0, 22.0)]

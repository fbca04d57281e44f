"""The offline land-mask builder (tools/build_land_mask.py) feeding
the P4 land filter: geography spot-checks, the land_grid override, and
the q92 query path end-to-end via SPARK_GRAFT_LAND_MASK."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.operators import climate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mask_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("landmask"))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_land_mask.py"),
         out, "--offline"],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    return out


def test_mask_geography_spot_checks(spark, mask_dir):
    df = spark.read.parquet(os.path.join(mask_dir, "land_mask.parquet"))
    total = df.count()
    land = df.filter("is_land").count()
    # Earth is ~29% land; the coarse outline must be in the ballpark
    assert 0.2 < land / total < 0.45
    rows = {
        (r.lat, r.lon): r.is_land
        for r in df.filter(
            (F.abs(F.col("lat") - 48.25) < 0.01) & (F.abs(F.col("lon") - 2.1875) < 0.01)
            | (F.abs(F.col("lat") - 0.25) < 0.01) & (F.abs(F.col("lon") + 30.3125) < 0.01)
            | (F.abs(F.col("lat") + 24.75) < 0.01) & (F.abs(F.col("lon") - 134.6875) < 0.01)
            | (F.abs(F.col("lat") - 35.25) < 0.01) & (F.abs(F.col("lon") + 150.3125) < 0.01)
        ).collect()
    }
    assert rows[(48.25, 2.1875)] is True  # Paris: land
    assert rows[(0.25, -30.3125)] is False  # mid-Atlantic: ocean
    assert rows[(-24.75, 134.6875)] is True  # central Australia: land
    assert rows[(35.25, -150.3125)] is False  # north Pacific: ocean


def test_land_grid_reads_built_mask(spark, mask_dir):
    grid = climate.land_grid(
        spark, mask_parquet=os.path.join(mask_dir, "land_mask.parquet")
    )
    n = grid.count()
    assert 40_000 < n < 100_000  # land cells only (is_land filter applied)
    assert grid.columns == ["lat", "lon"]


def test_q92_runs_against_real_mask(spark, sf_dir, mask_dir, monkeypatch):
    # the driver/oracle run q92 with the box heuristic; with the env
    # override the same query path filters through the REAL coastline
    # grid — assert the broadcast semi-join shape and a plausible
    # land fraction, not oracle equality (different mask by design)
    monkeypatch.setenv(
        "SPARK_GRAFT_LAND_MASK", os.path.join(mask_dir, "land_mask.parquet")
    )
    from climate_data_pipelines_spark.queries import REGISTRY

    out = REGISTRY["q92_land_mask_grid"].fn(spark, sf_dir)
    kept = out.count()
    total = load_table(spark, sf_dir, "events").count()
    # sf0.001 user_ids all map to Antarctic latitudes, which ARE land —
    # so kept == total here; the discriminating check runs on global
    # points below. Assert the join executed and the plan shape.
    assert 0 < kept <= total
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_land_filter_fraction_on_global_points(spark, mask_dir):
    # points at every 4th cell center across the whole globe: the kept
    # fraction through the real mask must track the mask's land share
    grid = climate.land_grid(
        spark, mask_parquet=os.path.join(mask_dir, "land_mask.parquet")
    )
    pts = (
        spark.range(0, 90 * 144)
        .select(
            (F.lit(-90.0) + ((F.col("id") / 144).cast("int") * 2 + 0.5) * 0.5).alias("lat"),
            (F.lit(-180.0) + ((F.col("id") % 144) * 4 + 0.5) * 0.625).alias("lon"),
        )
    )
    kept = climate.land_filter(pts, grid, ["lat", "lon"]).count()
    frac = kept / (90 * 144)
    assert 0.2 < frac < 0.45, frac


def test_mask_divergence_quantifier(mask_dir, tmp_path):
    # the --compare path (VERDICT r4: quantify boundary-cell divergence
    # between mask artifacts): identical masks diverge 0; a mask with
    # 100 flipped cells reports exactly those cells
    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from build_land_mask import mask_divergence

    src = os.path.join(mask_dir, "land_mask.parquet")
    same = mask_divergence(src, src)
    assert same["differing_cells"] == 0 and same["differing_frac"] == 0.0
    assert same["land_a"] == same["land_b"] > 0

    t = pq.read_table(src)
    flipped = np.asarray(t["is_land"]).copy()
    flipped[:100] = ~flipped[:100]
    import pyarrow as pa

    mutated = str(tmp_path / "mutated.parquet")
    pq.write_table(
        pa.table({"lat": t["lat"], "lon": t["lon"],
                  "is_land": pa.array(flipped)}),
        mutated,
    )
    d = mask_divergence(src, mutated)
    assert d["differing_cells"] == 100
    assert d["cells_compared"] == t.num_rows
    assert 0 < d["differing_frac"] < 0.01


def test_parity_builder_gated_on_package(tmp_path):
    # grid_from_global_land_mask returns None without the public
    # package (not in this container) and the CLI errors cleanly;
    # on a machine that has it, the same call yields the exact
    # reference grid (precipitation_pipeline.py:160-161 semantics)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from build_land_mask import grid_from_global_land_mask

    try:
        import global_land_mask  # noqa: F401

        has_pkg = True
    except ImportError:
        has_pkg = False
    grid = grid_from_global_land_mask(10.0, 10.0)
    if not has_pkg:
        assert grid is None
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "build_land_mask.py"),
             str(tmp_path), "--parity"],
            capture_output=True, text=True, timeout=60,
        )
        assert res.returncode != 0
        assert "global-land-mask" in res.stderr
    else:
        lat, lon, is_land = grid
        assert lat.size == 18 * 36 and is_land.dtype == bool

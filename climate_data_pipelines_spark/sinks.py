"""Sinks (SURVEY.md §2.9): partitioned CSV/Parquet, GeoJSON, JSON config.

The reference writes one file per stage per month via pandas
(K1: to_csv at precipitation_pipeline.py:112-140; K2: json.dump per
month at :231-232). Here every sink is a distributed ``df.write`` —
partition layout replaces the per-month file loop, and writing
directly to object storage replaces the aws-s3-sync stage (K6,
utils/pipeline_manager.py:199-218).

Tile generation (K3/K4: tippecanoe/mb-util subprocess) is external,
non-relational tooling in the reference; ``foreach_partition_shell``
shows the executor-side shape but stays out of the correctness path
(SURVEY.md §7.2 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """K7/A1: canonical columnar sink; partition columns replace the
    reference's per-(year,month) file loop. Partition cardinality is
    the caller's contract (year,month ≈ dozens — SURVEY.md §7.4)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_csv_partitioned(
    df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """K1: CSV sink with header, optionally partitioned (the
    reference's full-dump + per-month split in one write)."""
    w = df.write.option("header", True).mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)


def write_geojson_per_group(fc: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2: one FeatureCollection JSON document per group row.

    ``fc`` is the output of operators.climate.feature_collection —
    (group_cols…, feature_collection STRING). Written as text files
    partitioned by the group columns: each partition directory holds
    that month's GeoJSON, mirroring the reference's
    one-file-per-month layout without a driver-side loop.
    """
    group_cols = [c for c in fc.columns if c != "feature_collection"]
    (
        fc.repartition(*[fc[c] for c in group_cols])
        .write.partitionBy(*group_cols)
        .mode(mode)
        .text(path)
        if group_cols
        else fc.write.mode(mode).text(path)
    )


def write_tile_pyramid(
    tiles: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """K3/K4 relational form (SURVEY.md §1.1 'tile pyramid'): persist
    ``(z INT, x INT, y INT, tile BINARY)`` rows partitioned by z/x —
    the directory layout mirrors the slippy z/x/y URL scheme the
    reference serves from S3/CloudFront
    (docs/PBF_WORKFLOW_SUMMARY.md:43-50), with y + payload inside each
    z=…/x=… partition. A static tile server maps GET /z/x/y directly
    onto partition pruning; no MBTiles/SQLite intermediary.
    """
    tiles.write.partitionBy("z", "x").mode(mode).parquet(path)


def write_tileserver_config(
    config_path: str,
    data_types: list[str],
    base_url: str = "tiles",
) -> None:
    """K5: tileserver config JSON (precipitation_pipeline.py:320-347) —
    a driver-side metadata write, deliberately not a Spark job (one
    small dict, SURVEY.md §2.9)."""
    import json
    import os

    cfg = {
        "options": {"paths": {"root": base_url}},
        "data": {
            t: {"mbtiles": f"{t}.mbtiles"} for t in sorted(data_types)
        },
    }
    os.makedirs(os.path.dirname(config_path) or ".", exist_ok=True)
    with open(config_path, "w") as fh:
        json.dump(cfg, fh, separators=(",", ":"), sort_keys=True)


def foreach_partition_shell(df: DataFrame, make_cmd) -> None:
    """K3 shape: executor-side subprocess per partition (the
    tippecanoe shell-out, precipitation_pipeline.py:244-259, moved
    from driver-loop to executors). ``make_cmd(rows_iter) -> None``
    runs inside each task. Correctness-exempt external tooling —
    provided for parity, unused by declared queries."""

    def run(partition):
        make_cmd(partition)

    df.foreachPartition(run)


_VIEWER_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8"/>
<meta name="viewport" content="width=device-width, initial-scale=1"/>
<title>__VARIABLE__ viewer</title>
<script src="https://unpkg.com/maplibre-gl@3/dist/maplibre-gl.js"></script>
<link href="https://unpkg.com/maplibre-gl@3/dist/maplibre-gl.css" rel="stylesheet"/>
<style>
 html,body{height:100%;margin:0}
 #map{height:100%}
 #panel{position:fixed;top:.75rem;left:.75rem;z-index:10;background:#fffefa;
   border:1px solid #999;border-radius:6px;padding:.6rem .8rem;font:14px system-ui}
 #status{position:fixed;bottom:.75rem;left:.75rem;z-index:10;background:#222;
   color:#eee;padding:.4rem .6rem;font:12px monospace;border-radius:4px}
</style>
</head>
<body>
<div id="map"></div>
<div id="panel">
  <strong>__VARIABLE__</strong><br/>
  <label>period
    <select id="period">__PERIOD_OPTIONS__</select>
  </label>
  <label>opacity
    <input id="alpha" type="range" min="0" max="100" value="80"/>
  </label>
</div>
<div id="status">layer: <span id="layer">-</span></div>
<script>
 const TILESERVER = "__TILESERVER__";
 const VARIABLE = "__VARIABLE__";
 const map = new maplibregl.Map({
   container: "map",
   style: {version: 8, sources: {}, layers: [
     {id: "bg", type: "background", paint: {"background-color": "#0b2239"}}]},
   center: [0, 20], zoom: 1.5,
 });
 function layerId(period) {
   const [y, m] = period.split("-");
   return `${VARIABLE}_${Number(m)}_${y}_land`;
 }
 function show(period) {
   const id = layerId(period);
   if (map.getLayer("data")) map.removeLayer("data");
   if (map.getSource("data")) map.removeSource("data");
   map.addSource("data", {type: "raster",
     tiles: [`${TILESERVER}/data/${id}/{z}/{x}/{y}.png`], tileSize: 256});
   map.addLayer({id: "data", type: "raster", source: "data",
     paint: {"raster-opacity": document.getElementById("alpha").value / 100}});
   document.getElementById("layer").textContent = id;
 }
 const sel = document.getElementById("period");
 sel.addEventListener("change", () => show(sel.value));
 document.getElementById("alpha").addEventListener("input", () => {
   if (map.getLayer("data"))
     map.setPaintProperty("data", "raster-opacity",
       document.getElementById("alpha").value / 100);
 });
 map.on("load", () => show(sel.value));
</script>
</body>
</html>
"""


def write_map_viewer(
    df: DataFrame,
    path: str,
    variable: str = "precipitation",
    tileserver_url: str = "http://localhost:8080",
) -> None:
    """K-surface parity with the reference's HTML tile viewer
    (reference pipelines/precipitation_pipeline.py:349-602, which
    templates a Mapbox page and hardcodes its period dropdowns): a
    self-contained MapLibre page whose period selector is DATA-DRIVEN
    — the distinct (year, month) pairs of the observation DataFrame,
    collected via one tiny distinct agg (bounded by calendar
    cardinality, never row data). Layer ids follow the tileserver
    naming the K3-K5 sinks publish (`{var}_{month}_{year}_land`).
    """
    import os

    periods = sorted(
        (int(r["year"]), int(r["month"]))
        for r in df.select("year", "month").distinct().collect()
    )
    options = "".join(
        f'<option value="{y}-{m:02d}">{y}-{m:02d}</option>' for y, m in periods
    )
    html = (
        _VIEWER_TEMPLATE.replace("__VARIABLE__", variable)
        .replace("__PERIOD_OPTIONS__", options)
        .replace("__TILESERVER__", tileserver_url)
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(html)

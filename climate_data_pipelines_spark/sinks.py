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

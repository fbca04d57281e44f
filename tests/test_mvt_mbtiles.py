"""K3/K4 in-engine tile toolchain: dependency-free MVT encoding +
MBTiles packaging, verified by round-trip decode (no mapbox lib)."""

from __future__ import annotations

import gzip
import sqlite3

from climate_data_pipelines_spark import sinks
from climate_data_pipelines_spark.functions import mvt
from climate_data_pipelines_spark.operators import climate


def test_varint_zigzag_roundtrip():
    for n in (0, 1, 127, 128, 300, 2**31, 2**56):
        buf = mvt._varint(n)
        got, pos = mvt._read_varint(buf, 0)
        assert got == n and pos == len(buf)
    for n in (0, -1, 1, -64, 64, -4096):
        z = mvt._zigzag(n)
        assert (z >> 1) ^ -(z & 1) == n


def test_varint_rejects_negative():
    # a negative varint would loop forever (ADVICE r4); must raise instead
    import pytest

    with pytest.raises(ValueError):
        mvt._varint(-1)


def test_point_layer_roundtrip():
    feats = [
        {"type": mvt.POINT, "geometry": mvt.encode_point_geometry(100, 200),
         "properties": {"value": 1.5, "kind": "obs"}},
        {"type": mvt.POINT, "geometry": mvt.encode_point_geometry(4000, 10),
         "properties": {"value": 2.5, "kind": "obs"}},
    ]
    tile = mvt.encode_layer("mylayer", feats)
    layers = mvt.decode_tile(tile)
    assert len(layers) == 1
    layer = layers[0]
    assert layer["name"] == "mylayer"
    assert layer["version"] == 2 and layer["extent"] == 4096
    assert len(layer["features"]) == 2
    assert mvt.decode_point(layer["features"][0]["commands"]) == (100, 200)
    assert mvt.decode_point(layer["features"][1]["commands"]) == (4000, 10)
    # keys dedup: one 'value' + one 'kind' key; values: 2 doubles + 1 string
    assert sorted(layer["keys"]) == ["kind", "value"]
    assert len(layer["values"]) == 3


def test_polygon_geometry_command_stream():
    # open square ring -> MoveTo(1) + LineTo(3) + ClosePath(1)
    ring = [(0, 0), (10, 0), (10, 10), (0, 10)]
    cmds_buf = mvt.encode_polygon_geometry(ring)
    vals, pos = [], 0
    while pos < len(cmds_buf):
        v, pos = mvt._read_varint(cmds_buf, pos)
        vals.append(v)
    assert vals[0] == (1 & 0x7) | (1 << 3)          # MoveTo count=1
    assert vals[3] == (2 & 0x7) | (3 << 3)          # LineTo count=3
    assert vals[-1] == (7 & 0x7) | (1 << 3)         # ClosePath

    def unzig(v):
        return (v >> 1) ^ -(v & 1)

    # reconstruct vertices from deltas
    pts, cur = [], (0, 0)
    cur = (unzig(vals[1]), unzig(vals[2]))
    pts.append(cur)
    deltas = vals[4:-1]
    for i in range(0, len(deltas), 2):
        cur = (cur[0] + unzig(deltas[i]), cur[1] + unzig(deltas[i + 1]))
        pts.append(cur)
    assert pts == ring


def test_lonlat_to_tile_px_known_points():
    # lon 0 / lat 0 at z=1 sits at the NW corner of tile (1,1)
    assert mvt.lonlat_to_tile_px(0.0, 0.0, 1, 1, 1) == (0, 0)
    # center of the world tile at z=0
    assert mvt.lonlat_to_tile_px(0.0, 0.0, 0, 0, 0) == (2048, 2048)


def test_mbtiles_end_to_end(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, 40.0, -100.0, 1.5),   # z1 tile (0, 0)
            (2, 40.5, -101.0, 2.5),   # same tile
            (3, -40.0, 100.0, 3.5),   # z1 tile (1, 1)
        ],
        "id long, lat double, lon double, value double",
    )
    tiled = climate.tile_assign(df, 1)
    blobs = sinks.encode_mvt_tiles(tiled, layer_name="obs")
    out = str(tmp_path / "test.mbtiles")
    n = sinks.write_mbtiles(blobs, out, layer_name="obs")
    assert n == 2

    con = sqlite3.connect(out)
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert meta["format"] == "pbf"
    rows = con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        " ORDER BY tile_column"
    ).fetchall()
    con.close()
    assert [(r[0], r[1], r[2]) for r in rows] == [(1, 0, 1), (1, 1, 0)]  # TMS y-flip
    # decode the first tile: 2 point features with real coordinates
    layers = mvt.decode_tile(gzip.decompress(rows[0][3]))
    assert layers[0]["name"] == "obs"
    feats = layers[0]["features"]
    assert len(feats) == 2 and all(f["type"] == mvt.POINT for f in feats)
    px, py = mvt.decode_point(feats[0]["commands"])
    exp = mvt.lonlat_to_tile_px(-100.0, 40.0, 1, 0, 0)
    alt = mvt.lonlat_to_tile_px(-101.0, 40.5, 1, 0, 0)
    assert (px, py) in (exp, alt)  # group order within the tile is free
    assert 0 <= px <= 4096 and 0 <= py <= 4096


def test_mbtiles_multi_partition_stream(spark, tmp_path):
    # the sink streams via toLocalIterator + batched executemany
    # (VERDICT r4: no full-pyramid collect): feed it a many-partition,
    # many-tile frame and check every tile lands exactly once with
    # correct min/max zoom metadata
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "z": [3] * 40 + [4] * 40,
            "x": list(range(40)) * 2,
            "y": [1] * 80,
            "tile": [mvt.encode_layer("obs", []) for _ in range(80)],
        }
    )
    tiles = spark.createDataFrame(pdf).repartition(16)
    out = str(tmp_path / "multi.mbtiles")
    n = sinks.write_mbtiles(tiles, out, layer_name="obs")
    assert n == 80
    con = sqlite3.connect(out)
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert (meta["minzoom"], meta["maxzoom"]) == ("3", "4")
    got = con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles ORDER BY 1, 2"
    ).fetchall()
    con.close()
    want = sorted(
        [(3, x, (1 << 3) - 2) for x in range(40)]
        + [(4, x, (1 << 4) - 2) for x in range(40)]
    )
    assert got == want


def test_mvt_cell_polygon_mode(spark, tmp_path):
    # one 10x10-degree cell centered at (40, -100), z=1 tile (0, 0):
    # the encoded polygon ring must decode back to the cell's four
    # tile-local corners, clockwise from NW, closed by ClosePath
    df = spark.createDataFrame(
        [(1, 40.0, -100.0, 7.5)], "id long, lat double, lon double, value double"
    )
    tiled = climate.tile_assign(df, 1)
    blobs = sinks.encode_mvt_tiles(
        tiled, layer_name="cells", cell_lat_res=10.0, cell_lon_res=10.0
    ).collect()
    assert len(blobs) == 1
    layers = mvt.decode_tile(bytes(blobs[0].tile))
    feat = layers[0]["features"][0]
    assert feat["type"] == mvt.POLYGON

    def unzig(v):
        return (v >> 1) ^ -(v & 1)

    vals = feat["commands"]
    assert vals[0] == (1 | (1 << 3)) and vals[3] == (2 | (3 << 3))
    pts = [(unzig(vals[1]), unzig(vals[2]))]
    for i in range(4, len(vals) - 1, 2):
        pts.append((pts[-1][0] + unzig(vals[i]), pts[-1][1] + unzig(vals[i + 1])))
    assert vals[-1] == (7 | (1 << 3))  # ClosePath
    want = [
        mvt.lonlat_to_tile_px(-105.0, 45.0, 1, 0, 0),  # NW
        mvt.lonlat_to_tile_px(-95.0, 45.0, 1, 0, 0),   # NE
        mvt.lonlat_to_tile_px(-95.0, 35.0, 1, 0, 0),   # SE
        mvt.lonlat_to_tile_px(-105.0, 35.0, 1, 0, 0),  # SW
    ]
    assert pts == want
    # clockwise in screen coords (y down) -> positive shoelace area
    area2 = sum(
        pts[i][0] * pts[(i + 1) % 4][1] - pts[(i + 1) % 4][0] * pts[i][1]
        for i in range(4)
    )
    assert area2 > 0


def test_mvt_degenerate_cell_collapses_to_point(spark):
    # a cell far smaller than one extent unit at z=0 (0.02° ≈ 0.2 px):
    # the rounded ring has zero shoelace area — spec-invalid as a
    # polygon (ADVICE r4), so the sink must emit a POINT instead
    df = spark.createDataFrame(
        [(1, 40.0, -100.0, 7.5)], "id long, lat double, lon double, value double"
    )
    tiled = climate.tile_assign(df, 0)
    blobs = sinks.encode_mvt_tiles(
        tiled, layer_name="cells", cell_lat_res=0.02, cell_lon_res=0.02
    ).collect()
    layers = mvt.decode_tile(bytes(blobs[0].tile))
    feat = layers[0]["features"][0]
    assert feat["type"] == mvt.POINT
    assert mvt.decode_point(feat["commands"]) == mvt.lonlat_to_tile_px(
        -100.0, 40.0, 0, 0, 0
    )

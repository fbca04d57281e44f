"""Dependency-free Mapbox Vector Tile (MVT 2.1) encoding.

Replaces the reference's external tippecanoe shell-out
(reference pipelines/precipitation_pipeline.py:244-259) with an
in-engine encoder: the MVT wire format is protobuf
(public spec: github.com/mapbox/vector-tile-spec, vector_tile.proto),
and protobuf's wire format is simple enough to emit with stdlib
``struct``-free byte math — varints, length-delimited fields, zigzag
deltas. No protobuf/mapbox library needed, so the encode step runs
INSIDE executors (Arrow-batched, one blob per tile) instead of as a
single-node subprocess.

Layout (vector_tile.proto):
  Tile:    layer = field 3 (len-delimited, repeated)
  Layer:   version=15 (varint, must be 2), name=1, feature=2 (rep.),
           keys=3 (rep. string), values=4 (rep. Value), extent=5
  Feature: id=1 varint, tags=2 (packed varint), type=3 (varint enum:
           1=POINT 3=POLYGON), geometry=4 (packed uint32 commands)
  Value:   string_value=1 | double_value=3 | int_value=4 | bool=7
  Geometry: command = (id & 7) | (count << 3); MoveTo=1 LineTo=2
           ClosePath=7; coordinate params are zigzag varint DELTAS.
"""

from __future__ import annotations

import math

POINT = 1
POLYGON = 3
EXTENT = 4096


def _varint(n: int) -> bytes:
    if n < 0:
        # Negative input would loop forever (n >>= 7 never hits 0 on a
        # Python negative int). Callers must zigzag-encode signed values.
        raise ValueError(f"varint requires n >= 0, got {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _value_msg(v) -> bytes:
    """Encode a property value (string/bool/int/float) as a Value."""
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        # int_value (field 4) is a plain varint — negative ints would
        # need sint (field 6); use it when needed
        if v >= 0:
            return _tag(4, 0) + _varint(v)
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        import struct

        return _tag(3, 1) + struct.pack("<d", v)
    s = str(v).encode("utf-8")
    return _tag(1, 2) + _varint(len(s)) + s


def _command(cmd_id: int, count: int) -> bytes:
    return _varint((cmd_id & 0x7) | (count << 3))


def encode_point_geometry(x: int, y: int) -> bytes:
    return _command(1, 1) + _varint(_zigzag(x)) + _varint(_zigzag(y))


def encode_polygon_geometry(ring: list[tuple[int, int]]) -> bytes:
    """Single exterior ring (open — no repeated closing vertex; the
    spec closes with ClosePath). Deltas from the previous vertex."""
    if len(ring) < 3:
        raise ValueError("polygon ring needs >= 3 vertices")
    out = bytearray()
    px, py = 0, 0
    out += _command(1, 1)
    out += _varint(_zigzag(ring[0][0] - px)) + _varint(_zigzag(ring[0][1] - py))
    px, py = ring[0]
    out += _command(2, len(ring) - 1)
    for vx, vy in ring[1:]:
        out += _varint(_zigzag(vx - px)) + _varint(_zigzag(vy - py))
        px, py = vx, vy
    out += _command(7, 1)
    return bytes(out)


def encode_layer(
    name: str,
    features: list[dict],
    extent: int = EXTENT,
) -> bytes:
    """Encode one MVT layer. Each feature dict:
    ``{"type": POINT|POLYGON, "geometry": bytes (pre-encoded command
    stream), "properties": {str: value}, "id": int (optional)}``.
    Keys/values are deduplicated into the layer tables per spec."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    value_idx: dict[bytes, int] = {}

    feats = bytearray()
    for f in features:
        tags = bytearray()
        for k, v in f.get("properties", {}).items():
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            vm = _value_msg(v)
            if vm not in value_idx:
                value_idx[vm] = len(values)
                values.append(vm)
            tags += _varint(key_idx[k]) + _varint(value_idx[vm])
        body = bytearray()
        if "id" in f:
            body += _tag(1, 0) + _varint(int(f["id"]))
        if tags:
            body += _len_field(2, bytes(tags))
        body += _tag(3, 0) + _varint(f["type"])
        body += _len_field(4, f["geometry"])
        feats += _len_field(2, bytes(body))

    layer = bytearray()
    layer += _tag(15, 0) + _varint(2)  # version
    layer += _len_field(1, name.encode("utf-8"))
    layer += bytes(feats)
    for k in keys:
        layer += _len_field(3, k.encode("utf-8"))
    for vm in values:
        layer += _len_field(4, vm)
    layer += _tag(5, 0) + _varint(extent)
    return _len_field(3, bytes(layer))  # Tile.layer


def lonlat_to_tile_px(
    lon: float, lat: float, z: int, x: int, y: int, extent: int = EXTENT
) -> tuple[int, int]:
    """Web-Mercator position inside tile (z, x, y), in extent units
    (the standard slippy-map transform; y grows south)."""
    n = 2.0**z
    wx = (lon + 180.0) / 360.0 * n
    lat_r = math.radians(max(min(lat, 85.05112878), -85.05112878))
    wy = (1.0 - math.log(math.tan(lat_r) + 1.0 / math.cos(lat_r)) / math.pi) / 2.0 * n
    return int(round((wx - x) * extent)), int(round((wy - y) * extent))


# -- minimal decoder (tests / debugging only) -------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def decode_tile(buf: bytes) -> list[dict]:
    """Parse an encoded tile back to
    ``[{name, extent, version, features: [{type, id?, tags, commands}]}]``
    — enough structure to verify a round-trip without a mapbox lib."""
    layers = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if field == 3 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            layers.append(_decode_layer(buf[pos : pos + ln]))
            pos += ln
        else:
            raise ValueError(f"unexpected tile field {field}/{wire}")
    return layers


def _decode_layer(buf: bytes) -> dict:
    out = {"features": [], "keys": [], "values": []}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            chunk = buf[pos : pos + ln]
            pos += ln
            if field == 1:
                out["name"] = chunk.decode("utf-8")
            elif field == 2:
                out["features"].append(_decode_feature(chunk))
            elif field == 3:
                out["keys"].append(chunk.decode("utf-8"))
            elif field == 4:
                out["values"].append(chunk)
        else:
            val, pos = _read_varint(buf, pos)
            if field == 15:
                out["version"] = val
            elif field == 5:
                out["extent"] = val
    return out


def _decode_feature(buf: bytes) -> dict:
    f: dict = {"tags": [], "commands": []}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            chunk = buf[pos : pos + ln]
            pos += ln
            vals, p2 = [], 0
            while p2 < len(chunk):
                v, p2 = _read_varint(chunk, p2)
                vals.append(v)
            if field == 2:
                f["tags"] = vals
            elif field == 4:
                f["commands"] = vals
        else:
            val, pos = _read_varint(buf, pos)
            if field == 1:
                f["id"] = val
            elif field == 3:
                f["type"] = val
    return f


def decode_point(commands: list[int]) -> tuple[int, int]:
    """First MoveTo of a point geometry back to tile-local coords."""
    assert commands[0] == ((1 & 0x7) | (1 << 3)), "expected MoveTo(1)"

    def unzig(v: int) -> int:
        return (v >> 1) ^ -(v & 1)

    return unzig(commands[1]), unzig(commands[2])

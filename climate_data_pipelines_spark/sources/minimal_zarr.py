"""Minimal dependency-free Zarr v2 directory-store codec.

Implements just enough of the PUBLIC Zarr v2 on-disk format
(https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html) to ingest
MERRA-2-shaped climate cubes without xarray/zarr-python, neither of
which is installed here: directory stores, C-order chunks, zlib or
raw compression, numeric dtypes, NaN/number fill values for missing
chunks, padded edge chunks. The reference opens the same stores with
``xr.open_dataset(url, engine='zarr', consolidated=True)``
(reference pipelines/precipitation_pipeline.py:79-86); this module is
the fallback opener that keeps the S1 ingest path runnable end-to-end
in this container, and its reader is intentionally cheap enough to
call *inside executors* so chunk decode distributes.

Out of scope (documented, not silently wrong): blosc-compressed
stores (c-blosc is a native lib; real-world stores should be opened
via the xarray path), object/str dtypes, F-order, filters.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class ZarrArrayMeta:
    """Parsed ``.zarray`` (+``.zattrs``) for one array."""

    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: str
    compressor_id: str | None  # None => raw bytes
    fill_value: float | int | None
    order: str
    attrs: dict = field(default_factory=dict)

    @property
    def chunk_grid(self) -> tuple[int, ...]:
        return tuple(-(-s // c) for s, c in zip(self.shape, self.chunks))


def open_array(store: str, name: str) -> ZarrArrayMeta:
    """Read array metadata from ``<store>/<name>/.zarray`` (+ attrs)."""
    with open(os.path.join(store, name, ".zarray")) as f:
        z = json.load(f)
    if z.get("order", "C") != "C":
        raise NotImplementedError("minimal_zarr reads C-order arrays only")
    if z.get("filters"):
        raise NotImplementedError("minimal_zarr does not support filters")
    comp = z.get("compressor")
    comp_id = None
    if comp is not None:
        comp_id = comp.get("id")
        if comp_id not in ("zlib", "gzip"):
            raise NotImplementedError(
                f"compressor {comp_id!r} unsupported (open via xarray/zarr "
                "in an environment that has them)"
            )
    attrs = {}
    attrs_path = os.path.join(store, name, ".zattrs")
    if os.path.exists(attrs_path):
        with open(attrs_path) as f:
            attrs = json.load(f)
    return ZarrArrayMeta(
        shape=tuple(z["shape"]),
        chunks=tuple(z["chunks"]),
        dtype=z["dtype"],
        compressor_id=comp_id,
        fill_value=z.get("fill_value"),
        order="C",
        attrs=attrs,
    )


def _chunk_key(idx: tuple[int, ...], sep: str = ".") -> str:
    return sep.join(str(i) for i in idx)


def read_chunk(store: str, name: str, meta: ZarrArrayMeta, idx: tuple[int, ...]) -> np.ndarray:
    """One chunk as an ndarray, clipped to the in-bounds extent (Zarr
    stores edge chunks full-size, padded with fill). A missing chunk
    file is a fill-value chunk per the spec."""
    dt = np.dtype(meta.dtype)
    path = os.path.join(store, name, _chunk_key(idx))
    if not os.path.exists(path):
        fill = np.nan if meta.fill_value is None else meta.fill_value
        full = np.full(meta.chunks, fill, dtype=dt)
    else:
        with open(path, "rb") as f:
            raw = f.read()
        if meta.compressor_id in ("zlib", "gzip"):
            raw = zlib.decompress(raw)
        full = np.frombuffer(raw, dtype=dt).reshape(meta.chunks)
    # clip padded edge chunks to the array bounds
    spans = tuple(
        slice(0, min(c * (i + 1), s) - c * i)
        for s, c, i in zip(meta.shape, meta.chunks, idx)
    )
    return full[spans]


def read_array(store: str, name: str) -> np.ndarray:
    """Assemble a whole (small — coordinate-sized) array driver-side."""
    meta = open_array(store, name)
    out = np.empty(meta.shape, dtype=np.dtype(meta.dtype))
    for idx in np.ndindex(*meta.chunk_grid):
        block = read_chunk(store, name, meta, idx)
        spans = tuple(
            slice(c * i, c * i + b) for c, i, b in zip(meta.chunks, idx, block.shape)
        )
        out[spans] = block
    return out


_TIME_UNITS = {
    "seconds": "s",
    "minutes": "m",
    "hours": "h",
    "days": "D",
}


def decode_time(values: np.ndarray, units: str) -> np.ndarray:
    """CF-style ``'<unit> since <epoch>'`` ints → datetime64[us]."""
    unit, _, epoch = units.partition(" since ")
    if unit not in _TIME_UNITS or not epoch:
        raise NotImplementedError(f"time units {units!r} unsupported")
    base = np.datetime64(epoch.strip().replace(" ", "T"), "us")
    step = np.timedelta64(1, _TIME_UNITS[unit]).astype("timedelta64[us]")
    return base + values.astype(np.int64) * step


def write_array(
    store: str,
    name: str,
    data: np.ndarray,
    chunks: tuple[int, ...],
    attrs: dict | None = None,
    compress: bool = True,
    fill_value: float | None = None,
) -> None:
    """Spec-compliant Zarr v2 writer (fixtures / tests / round-trips).

    Writes ``.zarray`` + ``.zattrs`` + full-size padded C-order chunk
    files, zlib-compressed — readable by any conforming Zarr v2
    implementation (zarr-python, xarray), not just this module.
    """
    adir = os.path.join(store, name)
    os.makedirs(adir, exist_ok=True)
    dt = data.dtype
    meta = {
        "zarr_format": 2,
        "shape": list(data.shape),
        "chunks": list(chunks),
        "dtype": dt.str,
        "compressor": {"id": "zlib", "level": 1} if compress else None,
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(adir, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(adir, ".zattrs"), "w") as f:
        json.dump(attrs or {}, f)
    grid = tuple(-(-s // c) for s, c in zip(data.shape, chunks))
    for idx in np.ndindex(*grid):
        spans = tuple(
            slice(c * i, min(c * (i + 1), s))
            for s, c, i in zip(data.shape, chunks, idx)
        )
        block = data[spans]
        if block.shape != tuple(chunks):  # pad edge chunks per spec
            padded = np.full(chunks, fill_value if fill_value is not None else 0, dtype=dt)
            padded[tuple(slice(0, b) for b in block.shape)] = block
            block = padded
        raw = np.ascontiguousarray(block).tobytes()
        if compress:
            raw = zlib.compress(raw, 1)
        with open(os.path.join(adir, _chunk_key(idx)), "wb") as f:
            f.write(raw)
    # group marker so the store is a valid Zarr hierarchy
    zgroup = os.path.join(store, ".zgroup")
    if not os.path.exists(zgroup):
        with open(zgroup, "w") as f:
            json.dump({"zarr_format": 2}, f)

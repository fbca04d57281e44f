"""Multimodal columns: opaque binary payloads + typed metadata.

SURVEY.md §2.11: image/audio/video travel as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas``.

Every text→payload builder spreads its (id, text) source with
``spread_for_cpu`` before the encode (r10: the q172 fps-floor proof
measured the Spark decode at ~1× the SINGLE-CORE kernel time — the
whole codec chain was inheriting the documents scan's single split,
and mapInPandas preserves partitioning, so one spread at the builder
fixes encode AND every downstream feature/decode stage).

The decode kernel is REAL for PNG: a dependency-free decoder (zlib
inflate + per-scanline unfilter, all five PNG filter types, gray8 /
RGB8 / RGBA8) plus a matching gray8 encoder, so ``q54`` computes actual
pixel statistics from actual image bytes. BMP, binary Netpbm, GIF
(LZW) and baseline JPEG (functions/jpeg.py: Huffman + IDCT, restart
intervals, arbitrary sampling factors) get real decoders too, as do
WAV/PCM audio, Y4M (YUV4MPEG2) raw video and MJPEG-in-AVI compressed
video (stdlib RIFF walk + the baseline-JPEG decoder per frame); only
payloads whose codecs genuinely aren't in the container image
(inter-frame video — mp4/webm need ffmpeg) fall back to an
honestly-labeled deterministic stub; the Spark-side plumbing —
schema, batch iteration, partitioning — is identical either way.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from climate_data_pipelines_spark.functions import jpeg
from climate_data_pipelines_spark.operators.scale import spread_for_cpu

# Spread size gate for the HEAVY codec fan-out (AVI/MJPEG only). The
# q172 stage profile measured the MJPEG encode+decode at ~11 CPU-s/MB;
# with the default 64 KB gate the kernel ran on 4 tasks with 28 cores
# idle. A drift-cancelling interleaved A/B (r13, 6 alternating reps)
# confirmed 8 KB for the MJPEG path (q172 1.12 vs 1.74 s) but showed
# the LIGHTER codecs (PNG/JPEG/WAV/Y4M) are better at the 64 KB
# default (q157 0.54 vs 0.81, q167 1.10 vs 1.42 — their per-task
# fixed Python cost outweighs the extra parallelism), so only the
# AVI payload builder uses this gate. At production scale the scan
# split count exceeds the trigger and the spread is a no-op.
CODEC_CHUNK_BYTES = 8 * 1024

# ---------------------------------------------------------------------------
# Dependency-free PNG codec (stdlib only: struct + zlib)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = {0: 1, 2: 3, 6: 4}  # color type → bytes/pixel at bit depth 8


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray8(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 8-bit grayscale PNG writer (filter 0 per scanline)."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfiltered_rows(payload: bytes):
    """Parse + inflate + unfilter a PNG; yields the shared envelope
    ``(width, height, color_type, bpp, rows)`` where ``rows`` is the
    list of unfiltered scanline bytearrays (stride = width·bpp).
    Both the mean-luma decode and the perceptual-hash path build on
    this single spec implementation."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, color_type, idat = 8, None, None, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or color_type not in _BPP or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color_type} "
                    f"interlace={interlace} outside the supported "
                    "gray8/RGB8/RGBA8 non-interlaced envelope"
                )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    bpp = _BPP[color_type]
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    prev = bytearray(stride)
    rows, rpos = [], 0
    for _y in range(height):
        ftype = raw[rpos]
        line = bytearray(raw[rpos + 1 : rpos + 1 + stride])
        rpos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                line[i] = (
                    line[i] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
                ) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        rows.append(line)
        prev = line
    return width, height, color_type, bpp, rows


def decode_png(payload: bytes) -> tuple[int, int, float]:
    """Decode a PNG to (width, height, mean_luma) — real pixel math.

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA),
    non-interlaced; all five scanline filter types (None/Sub/Up/
    Average/Paeth) are unfiltered per the PNG spec. Luma for color
    images is ITU-R BT.601 (0.299 R + 0.587 G + 0.114 B). Anything
    outside that envelope raises NotImplementedError — a genuine
    feature guard, not a silent wrong answer.
    """
    width, height, color_type, bpp, rows = _png_unfiltered_rows(payload)
    stride = width * bpp
    luma_sum = 0.0
    for line in rows:
        if color_type == 0:
            luma_sum += sum(line)
        else:
            for i in range(0, stride, bpp):
                luma_sum += (
                    0.299 * line[i] + 0.587 * line[i + 1] + 0.114 * line[i + 2]
                )
    return width, height, luma_sum / (width * height)


def png_dhash(payload: bytes, hash_size: int = 8) -> int:
    """Difference hash (dHash) of a PNG — the standard near-dup image
    fingerprint: block-average the luma plane down to a
    (hash_size+1) × hash_size grid, emit one bit per horizontal
    neighbor comparison (left < right). Robust to re-encoding, small
    noise, and brightness-preserving edits; a single changed pixel
    flips at most a couple of bits, while unrelated images differ in
    ~half of the 64.

    Pure-integer pooling: cell averages are kept as exact fractions
    (sum, area) and neighbor comparison left/nl < right/nr is done by
    cross-multiplication left·nr < right·nl — bit-deterministic on
    every platform, no float rounding anywhere.
    """
    width, height, color_type, bpp, rows = _png_unfiltered_rows(payload)
    gw, gh = hash_size + 1, hash_size
    # luma as integer milli-units for color (BT.601 weights ×1000)
    # so pooling stays exact-integer
    cells = [[0] * gw for _ in range(gh)]
    areas = [[0] * gw for _ in range(gh)]
    for y, line in enumerate(rows):
        gy = y * gh // height
        for x in range(width):
            gx = x * gw // width
            if color_type == 0:
                v = 1000 * line[x]
            else:
                i = x * bpp
                v = 299 * line[i] + 587 * line[i + 1] + 114 * line[i + 2]
            cells[gy][gx] += v
            areas[gy][gx] += 1
    bits = 0
    for gy in range(gh):
        for gx in range(hash_size):
            l, r = cells[gy][gx], cells[gy][gx + 1]
            nl, nr = max(1, areas[gy][gx]), max(1, areas[gy][gx + 1])
            bits = (bits << 1) | (1 if l * nr < r * nl else 0)
    # interpret as signed 64-bit so it fits Spark's LongType
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", media_type: str = "image/fake"
) -> DataFrame:
    """Promote a column to an opaque binary payload + metadata struct.

    Fixture tables have no real media, so the payload is the utf-8
    encoding of the text column — the schema contract (binary blob +
    struct<media_type, n_bytes>) is exactly what a binaryFile-sourced
    table carries.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).alias("n_bytes"),
        ).alias("media_meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def text_as_png_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_pixels: int = 4096
) -> DataFrame:
    """Render each document's utf-8 bytes as a REAL grayscale PNG
    payload (near-square, zero-padded, capped at ``max_pixels``) —
    deterministic image fixtures with known pixel values, so the
    decode → feature path computes real statistics end-to-end.
    Arrow-batched mapInPandas: the encoder (zlib) is per-batch Python,
    orchestration stays distributed.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                pix = (text or "").encode("utf-8")[:max_pixels]
                w = max(8, min(64, int(len(pix) ** 0.5) + 1))
                h = max(1, -(-len(pix) // w))
                pix = pix.ljust(w * h, b"\x00")
                payloads.append(encode_png_gray8(pix, w, h))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    png = spread_for_cpu(df.select(id_col, text_col)).mapInPandas(
        batches, schema=out_schema
    )
    return png.select(
        F.col(id_col),
        "payload",
        F.struct(
            F.lit("image/png").alias("media_type"),
            F.length("payload").alias("n_bytes"),
        ).alias("media_meta"),
    )


def text_as_jpeg_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_pixels: int = 4096
) -> DataFrame:
    """Render each document's utf-8 bytes as a REAL baseline JPEG
    payload (same deterministic near-square layout as
    :func:`text_as_png_payload`). Docs with even ids encode as plain
    grayscale with a restart interval; odd ids as three-component
    4:2:0 YCbCr with neutral chroma — together covering the decoder's
    restart and multi-component MCU paths on the driver fixture.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                pix = (text or "").encode("utf-8")[:max_pixels]
                w = max(8, min(64, int(len(pix) ** 0.5) + 1))
                h = max(1, -(-len(pix) // w))
                pix = pix.ljust(w * h, b"\x00")
                if int(did) % 2 == 0:
                    payloads.append(
                        jpeg.encode_jpeg_gray8(pix, w, h, restart_interval=4)
                    )
                else:
                    payloads.append(jpeg.encode_jpeg_ycbcr420_gray(pix, w, h))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    jp = spread_for_cpu(df.select(id_col, text_col)).mapInPandas(
        batches, schema=out_schema
    )
    return jp.select(
        F.col(id_col),
        "payload",
        F.struct(
            F.lit("image/jpeg").alias("media_type"),
            F.length("payload").alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_bmp(payload: bytes) -> tuple[int, int, float]:
    """REAL dependency-free BMP decode (BITMAPINFOHEADER, uncompressed
    24/32-bit or 8-bit grayscale-palette): header fields are plain
    little-endian ints, pixel rows are bottom-up and padded to 4
    bytes. Returns (width, height, mean_luma) with ITU-R BT.601 luma
    for color payloads — same contract as ``decode_png``.
    """
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bpp BMP")
    top_down = height < 0
    height = abs(height)
    palette_luma = None
    if bpp == 8:
        # 8-bpp pixels are PALETTE INDICES: read the BGRA color table
        # (between the info header and the pixel data) and map each
        # index through BT.601 — raw indices are luma only for the
        # identity grayscale ramp, and an inverted or color palette
        # would otherwise return a silently wrong statistic
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        tbl_off = 14 + hdr_size
        if tbl_off + 4 * n_colors > data_off:
            raise ValueError("BMP color table overruns pixel data offset")
        palette_luma = [
            0.299 * payload[tbl_off + 4 * i + 2]
            + 0.587 * payload[tbl_off + 4 * i + 1]
            + 0.114 * payload[tbl_off + 4 * i]
            for i in range(n_colors)
        ]
    row_bytes = (width * bpp // 8 + 3) & ~3
    total = 0.0
    for r in range(height):
        src = r if top_down else height - 1 - r
        base = data_off + src * row_bytes
        row = payload[base : base + width * (bpp // 8)]
        if bpp == 8:
            total += sum(palette_luma[i] for i in row)
        else:
            step = bpp // 8
            for x in range(0, width * step, step):
                b, g, rr = row[x], row[x + 1], row[x + 2]
                total += 0.299 * rr + 0.587 * g + 0.114 * b
    n_px = width * height
    return width, height, round(total / n_px, 4) if n_px else 0.0


def decode_ppm(payload: bytes) -> tuple[int, int, float]:
    """REAL dependency-free Netpbm decode (P5 grayscale / P6 RGB,
    binary variants): ASCII header (magic, width, height, maxval, with
    ``#`` comments), then raw samples. BT.601 luma for P6."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    rgb = payload[:2] == b"P6"
    # header tokenizer: whitespace-separated ints, # starts a comment
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit Netpbm samples")
    if maxval < 1:
        raise ValueError(f"invalid Netpbm maxval {maxval}")
    n_px = width * height
    raw = payload[pos : pos + n_px * (3 if rgb else 1)]
    if rgb:
        total = sum(
            0.299 * raw[i] + 0.587 * raw[i + 1] + 0.114 * raw[i + 2]
            for i in range(0, len(raw), 3)
        )
    else:
        total = float(sum(raw))
    # Netpbm samples are 0..maxval; scale to the 0-255 luma contract
    # shared with decode_png (maxval 15 pure white is 255.0, not 15.0)
    total *= 255.0 / maxval
    return width, height, round(total / n_px, 4) if n_px else 0.0


def decode_gif(payload: bytes) -> tuple[int, int, float]:
    """REAL dependency-free GIF decode (GIF87a/89a, first frame):
    logical screen descriptor → global color table → skip extension
    blocks → image descriptor (+ optional local color table) → LZW
    decompression of the indexed pixel stream. Returns
    (width, height, mean_luma) with BT.601 luma over the palette —
    same contract as ``decode_png``/``decode_bmp``. Mean luma is
    order-independent, so interlaced frames need no deinterlacing.
    """
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    pos = 6
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n

    while True:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image frame")
        if block == 0x21:  # extension: label + data sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
        break

    _lx, _ly, width, height, iflags = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    table = gct
    if iflags & 0x80:
        n = 2 << (iflags & 0x07)
        table = payload[pos : pos + 3 * n]
        pos += 3 * n
    if table is None:
        raise NotImplementedError("GIF frame without any color table")
    lumas = [
        0.299 * table[3 * i] + 0.587 * table[3 * i + 1] + 0.114 * table[3 * i + 2]
        for i in range(len(table) // 3)
    ]

    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos] != 0:
        n = payload[pos]
        data += payload[pos + 1 : pos + 1 + n]
        pos += 1 + n

    # LZW decode (LSB-first variable-width codes)
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [(i,) for i in range(clear)] + [None, None]

    def reset():
        return list(base), min_code + 1

    dict_, code_size = reset()
    expected = width * height
    total = 0.0
    n_px = 0
    prev: tuple[int, ...] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                dict_, code_size = reset()
                prev = None
                continue
            if code == end:
                bits = 0  # stop consuming
                break
            if prev is None:
                seq = dict_[code]
            elif code < len(dict_):
                seq = dict_[code]
                dict_.append(prev + (seq[0],))
            else:  # the KwKwK case
                seq = prev + (prev[0],)
                dict_.append(seq)
            for idx in seq:
                if n_px >= expected:  # ignore padding past the frame
                    break
                total += lumas[idx] if idx < len(lumas) else 0.0
                n_px += 1
            prev = seq
            # widen when the NEXT code would not fit (GIF grows at
            # 2^size, capped at 12 bits)
            if len(dict_) >= (1 << code_size) and code_size < 12:
                code_size += 1
    if n_px < expected:
        raise ValueError(f"truncated GIF pixel stream ({n_px}/{expected})")
    return width, height, round(total / expected, 4) if expected else 0.0


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decode kernel for media with no in-container codec (now
    just COMPRESSED video — mp4/webm genuinely need ffmpeg):
    deterministic fake. A real deployment replaces this body with
    ffmpeg; the signature (bytes -> (w, h, luma)) and everything
    around it stays identical. PNG/BMP/PGM/PPM/GIF/JPEG/Y4M never
    reach this — they have REAL decoders (functions/jpeg.py for
    baseline JPEG, decode_y4m for raw video).
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_luma = (sum(payload[:64]) % 2551) / 10.0 if n else 0.0
    return width, height, mean_luma


def extract_image_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    PNG, BMP, binary Netpbm (PGM/PPM) and GIF payloads get REAL
    decoders (``decode_png``/``decode_bmp``/``decode_ppm``/
    ``decode_gif``/``decode_jpeg``); only formats whose codecs
    genuinely aren't in the container (compressed video) fall back
    to the labeled stub. Batches arrive as pandas DataFrames (whole
    partitions, streamed) — the decode loop is per-batch Python, the
    orchestration stays distributed. At 100 TB this is the canonical
    shape: repartition by payload size budget upstream, one Python
    worker per core decoding its partition's batches. A corrupt or
    unsupported payload (progressive JPEG, truncated GIF, …) is
    PER-ROW quarantined to null feature columns — the audio twin's
    error shape — instead of failing the task: one bad image in a
    crawl corpus must not abort a 100 TB pass through 4 retries.
    """

    def decode_one(p: bytes) -> tuple:
        try:
            if p[:8] == PNG_SIG:
                return decode_png(p)
            if p[:2] == b"BM":
                return decode_bmp(p)
            if p[:2] in (b"P5", b"P6"):
                return decode_ppm(p)
            if p[:6] in (b"GIF87a", b"GIF89a"):
                return decode_gif(p)
            if p[:2] == b"\xff\xd8":
                return jpeg.decode_jpeg(p)
            return _decode_image_stub(p)
        except (ValueError, NotImplementedError, IndexError, struct.error):
            return (None, None, None)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def _perceptual_hashes(
    binary_df: DataFrame, kernel, out_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Shared Arrow-batched wrapper for the perceptual-hash family
    (image ``png_dhash`` / audio ``wav_ehash`` / video ``y4m_vhash``):
    apply ``kernel`` per payload over mapInPandas; any payload the
    kernel rejects (wrong magic, truncated, unsupported envelope)
    quarantines to a null hash — the ``extract_image_features`` error
    shape — and drops out of the downstream band join. ONE
    implementation so the quarantine contract and batch shape cannot
    drift between modalities (r6 code-review finding)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for p in pdf["payload"]:
                try:
                    hashes.append(kernel(p))
                except (
                    ValueError,
                    NotImplementedError,
                    IndexError,
                    TypeError,  # null payload
                    struct.error,
                    zlib.error,  # corrupt deflate stream inside a PNG
                ):
                    hashes.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, out_col: pd.array(hashes, dtype="Int64")}
            )

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField(out_col, T.LongType())]
    )
    return binary_df.mapInPandas(batches, schema=schema)


def image_dhashes(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual fingerprints for image NEAR-dup detection: 64-bit
    dHash per payload (``png_dhash``) over Arrow-batched mapInPandas —
    the image twin of SimHash-for-text. Exact byte-level dedup (q36's
    digest groupBy on the payload) misses re-encoded or slightly
    edited copies of the same picture; the dHash survives those, and
    the packed-64-bit output drops straight into the existing
    Hamming-band machinery (``dedup.simhash_band_candidates`` with
    bits=64 — pigeonhole over 4×16-bit bands + exact
    popcount-of-xor verification), so image near-dup pairs cost one
    band equi-join, never an all-pairs pixel comparison.
    Returns (id, dhash); undecodable payloads → null hash.
    """
    return _perceptual_hashes(binary_df, png_dhash, "dhash", id_col)


def text_as_wav_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_rate: int = 8000,
    max_samples: int = 4096,
) -> DataFrame:
    """Render each document's utf-8 bytes as a REAL 8-bit PCM WAV
    payload — deterministic audio fixtures with known sample values
    (the audio twin of ``text_as_png_payload``), so the decode →
    feature path computes real RMS statistics end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                data = (text or " ").encode("utf-8")[:max_samples]
                fmt_body = struct.pack(
                    "<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8
                )
                chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                chunks += (
                    b"data" + struct.pack("<I", len(data)) + data
                    + (b"\x00" if len(data) & 1 else b"")
                )
                payloads.append(
                    b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return spread_for_cpu(df.select(id_col, text_col)).mapInPandas(
        batches, schema=out_schema
    )


def _wav_samples(payload: bytes):
    """Parse a RIFF/WAVE payload to ``(rate, n_channels, samples)``
    with samples as a normalized [-1, 1] float64 numpy array (8-bit
    PCM unsigned per spec, 16-bit signed, float32 as-is). Shared
    envelope for the RMS decode and the audio fingerprint path."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if (audio_fmt, bits) == (1, 16):
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif (audio_fmt, bits) == (1, 8):
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif (audio_fmt, bits) == (3, 32):
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(f"WAV format={audio_fmt} bits={bits}")
    return rate, n_ch, x


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """REAL dependency-free WAV decode (RIFF/WAVE, PCM 8/16-bit and
    IEEE float32): walks the chunk list to `fmt ` and `data`, then
    computes (sample_rate, n_channels, n_samples_per_channel, rms)
    with numpy over the raw sample buffer. RMS is in normalized
    [-1, 1] amplitude (8-bit PCM is unsigned per the WAV spec, 16-bit
    signed, float32 as-is) so the statistic is format-independent —
    the audio analog of the image decoders' BT.601 mean luma.
    """
    import numpy as np

    rate, n_ch, x = _wav_samples(payload)
    n_samples = len(x) // max(n_ch, 1)
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    return rate, n_ch, n_samples, round(rms, 6)


def wav_ehash(payload: bytes, hash_size: int = 8) -> int:
    """Energy-envelope difference hash of a WAV — the audio twin of
    ``png_dhash``: mono-mix, split the sample stream into
    (hash_size² + 1) equal windows, one bit per neighboring-window
    energy comparison (left < right). Volume-invariant by
    construction (uniform gain scales every window energy equally, so
    no comparison flips) and robust to small edits: one changed
    sample perturbs one window's energy and can flip at most its two
    neighbor comparisons, while unrelated audio differs in ~half the
    64 bits. Deterministic: fixed window boundaries, numpy float64
    sums in fixed order.
    """
    import numpy as np

    _rate, n_ch, x = _wav_samples(payload)
    if n_ch > 1:
        n = (len(x) // n_ch) * n_ch
        x = x[:n].reshape(-1, n_ch).mean(axis=1)
    nwin = hash_size * hash_size + 1
    if len(x) == 0:
        return 0
    # pad so the stream splits evenly; zero-energy tail is fine (the
    # comparisons stay deterministic)
    pad = (-len(x)) % nwin
    if pad:
        x = np.concatenate([x, np.zeros(pad)])
    e = (x * x).reshape(nwin, -1).sum(axis=1)
    bits = 0
    for i in range(nwin - 1):
        bits = (bits << 1) | (1 if e[i] < e[i + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_ehashes(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual fingerprints for audio NEAR-dup detection: 64-bit
    energy-envelope hash per WAV payload (``wav_ehash``) over
    Arrow-batched mapInPandas — drops into the same Hamming-band
    machinery as the image/text fingerprints
    (``dedup.simhash_band_candidates`` with bits=64). Catches the
    re-encoded / volume-normalized / lightly-edited copies that a
    byte digest cannot. Returns (id, ehash); undecodable → null."""
    return _perceptual_hashes(binary_df, wav_ehash, "ehash", id_col)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction (mapInPandas) — the
    audio twin of ``extract_image_features``. WAV/PCM payloads get the
    REAL ``decode_wav``; compressed formats (mp3/ogg/aac — codecs not
    in the container) raise NotImplementedError inside decode, caught
    here into null feature columns so one bad payload doesn't kill a
    100 TB pass (the per-row error-quarantine shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, n_ch, n_s, rms = decode_wav(p)
                    rows.append(
                        (doc_id, len(p), rate, n_ch, n_s,
                         round(n_s / rate, 6) if rate else 0.0, rms)
                    )
                except (ValueError, NotImplementedError):
                    rows.append((doc_id, len(p), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "n_channels",
                    "n_samples", "duration_s", "rms",
                ],
            )

    return binary_df.mapInPandas(batches, schema=AUDIO_SCHEMA)


def frame_sample(binary_df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame"
    offset (posexplode over a computed offset sequence). With a real
    video codec the offset list comes from the container index; the
    relational shape (explode → per-frame rows) is what matters.
    """
    n_frames = F.greatest(
        F.lit(1), (F.col("media_meta.n_bytes") / every_n_bytes).cast("int")
    )
    return binary_df.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "frame_no"),
        (F.col("frame_no") * every_n_bytes).alias("byte_offset"),
    ).select("doc_id", "frame_idx", "byte_offset")


# ---------------------------------------------------------------------------
# Dependency-free Y4M (YUV4MPEG2) video codec — uncompressed planar YUV
# with a text header, the canonical raw-video interchange format. This
# closes the video decode path for REAL: only compressed containers
# (mp4/webm — codecs genuinely not in the container image) remain
# stubbed.
# ---------------------------------------------------------------------------

Y4M_SIG = b"YUV4MPEG2 "

# colorspace tag → (chroma_x_div, chroma_y_div); None = no chroma planes
_Y4M_CHROMA = {
    "mono": None,
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
}


def encode_y4m(
    y_frames: list[bytes], width: int, height: int, fps: int = 25,
    colorspace: str = "mono",
) -> bytes:
    """Encode luma frames as a YUV4MPEG2 stream. ``mono`` writes the Y
    plane only; chroma modes add neutral (128) U/V planes so the
    visual content — and every luma statistic — is identical across
    colorspaces."""
    div = _Y4M_CHROMA[colorspace]
    header = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C{colorspace}\n"
    out = [header.encode("ascii")]
    if div is None:
        chroma = b""
    else:
        cw, ch = -(-width // div[0]), -(-height // div[1])
        chroma = b"\x80" * (cw * ch) * 2
    for y in y_frames:
        if len(y) != width * height:
            raise ValueError(f"frame size {len(y)} != {width}x{height}")
        out.append(b"FRAME\n")
        out.append(y)
        out.append(chroma)
    return b"".join(out)


def _y4m_geometry(payload: bytes) -> tuple[int, int, float, int, int, int]:
    """Parse a YUV4MPEG2 header ONCE for every consumer: returns
    (width, height, fps, y_size, c_size, header_end). A single parser
    keeps decode and frame-sampling in exact agreement on the frame
    geometry — the C-tag default (420 per spec) included."""
    if payload[: len(Y4M_SIG)] != Y4M_SIG:
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = None
    fps = 0.0
    colorspace = "420"  # spec default when no C tag
    for tok in payload[len(Y4M_SIG): nl].decode("ascii").split():
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = int(num) / int(den)
        elif tok[0] == "C":
            colorspace = tok[1:]
    if not width or not height:
        raise ValueError("Y4M header missing W or H")
    if colorspace not in _Y4M_CHROMA:
        raise NotImplementedError(f"Y4M colorspace C{colorspace}")
    div = _Y4M_CHROMA[colorspace]
    y_size = width * height
    if div is None:
        c_size = 0
    else:
        c_size = (-(-width // div[0])) * (-(-height // div[1])) * 2
    return width, height, fps, y_size, c_size, nl + 1


def decode_y4m(payload: bytes) -> tuple[int, int, float, list[float]]:
    """REAL dependency-free Y4M decode: parse the YUV4MPEG2 header
    (W/H/F/C tags), walk the FRAME markers, and compute the mean luma
    of each frame's Y plane with numpy. Chroma planes are skipped by
    size (mono/420*/422/444 supported). Returns
    (width, height, fps, [per-frame mean luma 0-255])."""
    import numpy as np

    width, height, fps, y_size, c_size, pos = _y4m_geometry(payload)
    lumas: list[float] = []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # FRAME line may carry params
        if pos + y_size + c_size > len(payload):
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(payload, dtype=np.uint8, count=y_size, offset=pos)
        lumas.append(round(float(y.mean()), 4))
        pos += y_size + c_size
    if not lumas:
        raise ValueError("Y4M stream contains no frames")
    return width, height, fps, lumas


def _brightness_profile_bits(stream, hash_size: int = 8) -> int:
    """Shared pooling kernel of the video perceptual hash: split a
    luma stream into (hash_size² + 1) equal windows, one bit per
    neighboring-window mean-brightness comparison (left < right).
    Integer-exact: window means compared as cross-multiplied
    (sum, count) fractions — bit-deterministic, no float anywhere.
    ``stream`` is any sequence of integer luma values (bytes, or a
    uint8 ndarray from a decoded compressed frame)."""
    nwin = hash_size * hash_size + 1
    n = len(stream)
    sums = [0] * nwin
    counts = [0] * nwin
    for i, v in enumerate(stream):
        w = i * nwin // n
        sums[w] += int(v)
        counts[w] += 1
    bits = 0
    for i in range(nwin - 1):
        l, r = sums[i], sums[i + 1]
        nl, nr = max(1, counts[i]), max(1, counts[i + 1])
        bits = (bits << 1) | (1 if l * nr < r * nl else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def y4m_vhash(payload: bytes, hash_size: int = 8) -> int:
    """Spatio-temporal brightness-profile hash of a Y4M video — the
    video member of the perceptual near-dup family (image ``png_dhash``
    / audio ``wav_ehash``): concatenate every frame's Y plane in
    display order and pool via :func:`_brightness_profile_bits`. A
    one-byte pixel edit perturbs one window's sum and can flip at most
    its two neighbor comparisons; re-containered copies (same frames,
    different chroma layout) hash identically because only Y planes
    enter the stream.
    """
    _w, _h, _fps, y_size, c_size, pos = _y4m_geometry(payload)
    planes = []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1
        if pos + y_size + c_size > len(payload):
            raise ValueError("truncated Y4M frame")
        planes.append(payload[pos : pos + y_size])
        pos += y_size + c_size
    if not planes:
        raise ValueError("Y4M stream contains no frames")
    return _brightness_profile_bits(b"".join(planes), hash_size)


def video_vhash(payload: bytes, hash_size: int = 8) -> int:
    """Container-generic video perceptual hash: Y4M payloads pool the
    raw Y planes (``y4m_vhash``, bit-identical to before the AVI path
    existed); MJPEG-in-AVI payloads pool the DECODED luma planes
    (rounded to uint8), so a compressed corpus fingerprints with the
    same machinery instead of quarantining to null.

    Stability caveat, measured on the word-soup fixture: within ONE
    domain the hash behaves as designed (an exact byte-duplicate AVI
    hashes identically; a re-muxed copy of the same JPEG frames
    hashes identically), but quantization ripple makes single-byte
    CONTENT edits in the compressed domain flip more bits than in the
    raw domain (last-char edit: mean Hamming ≈ 3.6, p90 ≈ 7, max 12 —
    vs ≤ 2 for Y4M), and CROSS-domain twins (same pixels, Y4M vs AVI)
    land at mean Hamming ≈ 7. Near-dup banding at hamming_max=3 is
    therefore a guarantee only for raw-domain corpora; compressed or
    mixed corpora need a wider verify budget and accept partial
    recall of minimal edits.
    """
    import numpy as np

    if payload[:4] == b"RIFF" and payload[8:12] == AVI_FOURCC:
        width, height, _fps, frames = _avi_walk(payload)
        planes = []
        for _off, f in frames:
            fw, fh, plane = jpeg.decode_jpeg_luma(f)
            if (fw, fh) != (width, height):
                raise ValueError("frame geometry disagrees with container")
            planes.append(
                np.clip(np.round(plane), 0, 255).astype(np.uint8).ravel()
            )
        return _brightness_profile_bits(np.concatenate(planes), hash_size)
    return y4m_vhash(payload, hash_size)


def video_vhashes(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual fingerprints for video NEAR-dup detection: 64-bit
    brightness-profile hash per payload (``video_vhash`` — raw Y4M or
    MJPEG-in-AVI) over Arrow-batched mapInPandas, completing the
    image/audio/video near-dup family on the shared Hamming-band
    machinery (``dedup.simhash_band_candidates`` with bits=64).
    Returns (id, vhash); undecodable → null."""
    return _perceptual_hashes(binary_df, video_vhash, "vhash", id_col)


def text_as_y4m_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    frame_w: int = 16,
    frame_h: int = 16,
    max_frames: int = 8,
) -> DataFrame:
    """Render each document's utf-8 bytes as a REAL Y4M video payload:
    consecutive ``frame_w*frame_h``-byte chunks become luma frames
    (last frame zero-padded), so per-frame mean luma is an exact,
    independently computable statistic of the text bytes — the video
    twin of :func:`text_as_png_payload`. Even doc_ids encode as Cmono,
    odd as C420jpeg with neutral chroma, covering both plane layouts
    of the decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        px = frame_w * frame_h
        for pdf in it:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or " ").encode("utf-8")[: px * max_frames]
                n = max(1, -(-len(data) // px))
                frames = [
                    data[i * px : (i + 1) * px].ljust(px, b"\x00") for i in range(n)
                ]
                cs = "mono" if int(did) % 2 == 0 else "420jpeg"
                payloads.append(encode_y4m(frames, frame_w, frame_h, colorspace=cs))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    vid = spread_for_cpu(df.select(id_col, text_col)).mapInPandas(
        batches, schema=out_schema
    )
    return vid.select(
        F.col(id_col),
        "payload",
        F.struct(
            F.lit("video/x-yuv4mpeg").alias("media_type"),
            F.length("payload").alias("n_bytes"),
        ).alias("media_meta"),
    )


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def extract_video_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched video feature extraction (mapInPandas) — the video
    twin of ``extract_image_features``. Y4M payloads get the REAL
    ``decode_y4m`` and MJPEG-in-AVI payloads the REAL
    ``decode_avi_mjpeg`` (RIFF walk + per-frame baseline-JPEG decode);
    compressed containers needing absent codecs (mp4/webm) are per-row
    quarantined to null features, the same error-quarantine shape as
    the audio path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, fps, lumas = _decode_video(p)
                    rows.append(
                        (doc_id, len(p), w, h, fps, len(lumas),
                         round(len(lumas) / fps, 6) if fps else 0.0,
                         round(sum(lumas) / len(lumas), 4))
                    )
                except (ValueError, NotImplementedError):
                    rows.append((doc_id, len(p), None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "width", "height", "fps",
                    "n_frames", "duration_s", "mean_luma",
                ],
            )

    return binary_df.mapInPandas(batches, schema=VIDEO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame_luma", T.DoubleType()),
    ]
)


def sample_video_frames(binary_df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over video payloads: decode the container
    index (Y4M FRAME markers, or the AVI movi chunk walk for
    MJPEG-in-AVI), keep every ``every_n``-th frame, and emit one row
    per kept frame with its true byte offset and mean luma. The
    relational shape matches :func:`frame_sample` (explode →
    per-frame rows) but offsets and statistics come from the actual
    stream, not arithmetic on the byte length."""
    import numpy as np

    def y4m_rows(doc_id, p):
        # the shared header parser keeps this walk in exact agreement
        # with decode_y4m's frame geometry (same C-tag default, same
        # chroma rounding)
        _w, _h, _fps, y_size, c_size, pos = _y4m_geometry(p)
        doc_rows = []
        idx = 0
        while pos < len(p):
            if p[pos : pos + 5] != b"FRAME":
                raise ValueError(f"expected FRAME marker at {pos}")
            data_at = p.index(b"\n", pos) + 1
            if data_at + y_size + c_size > len(p):
                raise ValueError("truncated Y4M frame")
            if idx % every_n == 0:
                y = np.frombuffer(p, dtype=np.uint8, count=y_size, offset=data_at)
                doc_rows.append((doc_id, idx, pos, round(float(y.mean()), 4)))
            pos = data_at + y_size + c_size
            idx += 1
        return doc_rows

    def avi_rows(doc_id, p):
        # byte_offset is the absolute position of the '00dc' chunk
        # header — the AVI analogue of the Y4M FRAME-marker offset
        width, height, _fps, frames = _avi_walk(p)
        doc_rows = []
        for idx, (off, f) in enumerate(frames):
            if idx % every_n:
                continue
            fw, fh, luma = jpeg.decode_jpeg(f)
            if (fw, fh) != (width, height):
                raise ValueError("frame geometry disagrees with container")
            doc_rows.append((doc_id, idx, off, round(luma, 4)))
        return doc_rows

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                # a malformed stream is quarantined per row (whole doc,
                # no partial rows), not a task failure
                try:
                    if p[:4] == b"RIFF" and p[8:12] == AVI_FOURCC:
                        doc_rows = avi_rows(doc_id, p)
                    else:
                        doc_rows = y4m_rows(doc_id, p)
                except (ValueError, NotImplementedError):
                    continue
                rows.extend(doc_rows)
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "byte_offset", "frame_luma"]
            )

    return binary_df.mapInPandas(batches, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI container codec — a COMPRESSED video container decoded
# dependency-free: the RIFF chunk walk is the WAV parser's sibling
# (same <fourcc><le32 size><payload> grammar, even-byte padding) and
# each '00dc' frame chunk is a baseline JPEG handled by the existing
# functions/jpeg.py decoder. This closes the "compressed containers
# stubbed" line for the one compressed format the container image can
# genuinely decode; mp4/webm (inter-frame codecs needing ffmpeg)
# remain honestly quarantined.
# ---------------------------------------------------------------------------

AVI_FOURCC = b"AVI "


def _riff_chunk(tag: bytes, data: bytes) -> bytes:
    """One RIFF chunk: fourcc + little-endian size + payload, padded to
    an even byte boundary (the pad byte is NOT counted in size)."""
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _riff_list(list_tag: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_tag + body)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Encode pre-compressed baseline-JPEG frames as a minimal but
    spec-shaped AVI: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
    strf)) LIST('movi' '00dc'×n) 'idx1'). Every header field a player
    actually reads (frame timing, stream count, geometry, 'MJPG'
    fourcc, frame count, index) is populated."""
    if not jpeg_frames:
        raise ValueError("AVI needs at least one frame")
    us_per_frame = round(1_000_000 / fps)
    max_frame = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        us_per_frame,            # dwMicroSecPerFrame
        max_frame * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(jpeg_frames),        # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_frame,               # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0, 0, 0,             # dwFlags, wPriority, wLanguage
            0,                   # dwInitialFrames
            1, fps,              # dwScale / dwRate = frame rate
            0,                   # dwStart
            len(jpeg_frames),    # dwLength (frames)
            max_frame,           # dwSuggestedBufferSize
            0,                   # dwQuality
            0,                   # dwSampleSize (0 = varying)
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_chunks, offsets = [], []
    at = 4  # offsets are relative to the 'movi' fourcc, per convention
    for f in jpeg_frames:
        offsets.append(at)
        c = _riff_chunk(b"00dc", f)
        movi_chunks.append(c)
        at += len(c)
    movi = _riff_list(b"movi", b"".join(movi_chunks))
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
            for off, f in zip(offsets, jpeg_frames)
        ),
    )
    return _riff_chunk(b"RIFF", AVI_FOURCC + hdrl + movi + idx1)


def _avi_walk(payload: bytes) -> tuple[int, int, float, list[tuple[int, bytes]]]:
    """Parse an AVI payload to (width, height, fps, frames) where
    frames is [(chunk_offset, jpeg_bytes), ...] in stream order —
    offsets are absolute positions of each '00dc'/'00db' chunk header
    in the payload. Pure stdlib RIFF walk; raises ValueError on a
    malformed container."""
    if payload[:4] != b"RIFF" or payload[8:12] != AVI_FOURCC:
        raise ValueError("not an AVI payload")
    geom: dict[str, float] = {}
    frames: list[tuple[int, bytes]] = []

    def scan(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            tag = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            body = pos + 8
            if body + size > hi:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                ltag = payload[body : body + 4]
                if ltag == b"movi":
                    q, end = body + 4, body + size
                    while q + 8 <= end:
                        ctag = payload[q : q + 4]
                        csz = struct.unpack("<I", payload[q + 4 : q + 8])[0]
                        if q + 8 + csz > end:
                            raise ValueError("truncated movi chunk")
                        if ctag[2:4] in (b"dc", b"db"):
                            frames.append((q, payload[q + 8 : q + 8 + csz]))
                        q += 8 + csz + (csz & 1)
                elif ltag in (b"hdrl", b"strl"):
                    scan(body + 4, body + size)
            elif tag == b"avih":
                us, = struct.unpack("<I", payload[body : body + 4])
                w, h = struct.unpack("<II", payload[body + 32 : body + 40])
                geom["fps"] = 1_000_000 / us if us else 0.0
                geom["w"], geom["h"] = w, h
            pos = body + size + (size & 1)

    scan(12, len(payload))
    if "w" not in geom:
        raise ValueError("AVI missing avih header")
    if not frames:
        raise ValueError("AVI stream contains no frames")
    return int(geom["w"]), int(geom["h"]), geom["fps"], frames


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, float, list[float]]:
    """REAL compressed-container video decode: RIFF walk to the
    '00dc' frame chunks, then the dependency-free baseline-JPEG
    decoder (functions/jpeg.py — Huffman + IDCT) per frame. Returns
    (width, height, fps, per-frame mean luma) — the same tuple shape
    as :func:`decode_y4m`, so the feature extractor dispatches on the
    container signature alone. A frame whose JPEG geometry disagrees
    with the container header is a corrupt file → ValueError
    (quarantined per row upstream, never a task failure)."""
    width, height, fps, frames = _avi_walk(payload)
    lumas = []
    for _off, f in frames:
        fw, fh, luma = jpeg.decode_jpeg(f)
        if (fw, fh) != (width, height):
            raise ValueError(
                f"frame geometry {fw}x{fh} != container {width}x{height}"
            )
        lumas.append(luma)
    return width, height, fps, lumas


def _decode_video(payload: bytes) -> tuple[int, int, float, list[float]]:
    """Container dispatch on the payload signature: Y4M (raw planar)
    or MJPEG-in-AVI (compressed). Anything else — mp4/webm need
    codecs genuinely absent from the image — raises for the caller's
    per-row quarantine."""
    if payload[:4] == b"RIFF" and payload[8:12] == AVI_FOURCC:
        return decode_avi_mjpeg(payload)
    return decode_y4m(payload)


def text_as_avi_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    frame_w: int = 16,
    frame_h: int = 16,
    max_frames: int = 8,
) -> DataFrame:
    """Render each document as a REAL MJPEG-in-AVI payload with the
    SAME frame chunking as :func:`text_as_y4m_payload` (consecutive
    ``frame_w*frame_h``-byte luma frames, last zero-padded) so the
    lossless Y4M twin of the same document is per-frame ground truth
    for the JPEG-compressed decode. Even doc_ids compress frames as
    grayscale-with-restart-markers, odd as 4:2:0 YCbCr — both decoder
    paths exercised, mirroring the q155 still-image fixture."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        px = frame_w * frame_h
        for pdf in it:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or " ").encode("utf-8")[: px * max_frames]
                n = max(1, -(-len(data) // px))
                if int(did) % 2 == 0:
                    enc = lambda b: jpeg.encode_jpeg_gray8(  # noqa: E731
                        b, frame_w, frame_h, restart_interval=2
                    )
                else:
                    enc = lambda b: jpeg.encode_jpeg_ycbcr420_gray(  # noqa: E731
                        b, frame_w, frame_h
                    )
                frames = [
                    enc(data[i * px : (i + 1) * px].ljust(px, b"\x00"))
                    for i in range(n)
                ]
                payloads.append(encode_avi_mjpeg(frames, frame_w, frame_h))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    avi = spread_for_cpu(
        df.select(id_col, text_col), chunk_bytes=CODEC_CHUNK_BYTES
    ).mapInPandas(
        batches, schema=out_schema
    )
    return avi.select(
        F.col(id_col),
        "payload",
        F.struct(
            F.lit("video/x-msvideo").alias("media_type"),
            F.length("payload").alias("n_bytes"),
        ).alias("media_meta"),
    )


def payload_sizes_arrow(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInArrow surface: operate on raw Arrow RecordBatches with
    pyarrow.compute — no pandas conversion at all (one hop less than
    mapInPandas, and binary columns stay zero-copy buffers). Computes
    payload byte sizes; the template for any Arrow-kernel transform
    over multimodal payloads (SURVEY.md §2.11).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pc.cast(pc.binary_length(batch.column("payload")), pa.int64()),
                ],
                [id_col, "n_bytes"],
            )

    return binary_df.mapInArrow(fn, f"{id_col} long, n_bytes long")

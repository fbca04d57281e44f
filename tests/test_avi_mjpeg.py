"""MJPEG-in-AVI container codec (SURVEY.md §2.11 multimodal,
compressed-container path): the RIFF walk is pinned by golden
structure tests, per-frame luma by parity against the raw pixels and
the lossless Y4M twin, and the Spark paths (extract_video_features
container dispatch, sample_video_frames real chunk offsets, q172) are
checked end-to-end. VERDICT r6 "what's missing" item — compressed
containers decoded without ffmpeg."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from climate_data_pipelines_spark.functions import jpeg
from climate_data_pipelines_spark.operators import multimodal


def _gray_frames(texts: list[bytes], w: int = 16, h: int = 16) -> list[bytes]:
    return [
        jpeg.encode_jpeg_gray8(t.ljust(w * h, b"\x00")[: w * h], w, h)
        for t in texts
    ]


def test_avi_golden_structure():
    frames = _gray_frames([b"abc", b"def"])
    p = multimodal.encode_avi_mjpeg(frames, 16, 16, fps=25)
    # RIFF framing: fourcc + size covers the rest of the file exactly
    assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
    # declared size excludes the optional final pad byte
    assert struct.unpack("<I", p[4:8])[0] + 8 in (len(p), len(p) - 1)
    # avih: us/frame, total frames, streams, geometry
    at = p.index(b"avih") + 8
    us, = struct.unpack("<I", p[at : at + 4])
    assert us == 40000  # 25 fps
    total, _init, streams = struct.unpack("<III", p[at + 16 : at + 28])
    assert (total, streams) == (2, 1)
    assert struct.unpack("<II", p[at + 32 : at + 40]) == (16, 16)
    # stream header declares an MJPG video stream
    sh = p.index(b"strh") + 8
    assert p[sh : sh + 8] == b"vidsMJPG"
    # idx1 offsets (relative to the 'movi' fourcc) land on '00dc' tags
    movi_fourcc = p.index(b"movi")
    ix = p.index(b"idx1") + 8
    for k, f in enumerate(frames):
        ckid, flags, off, ln = struct.unpack("<4sIII", p[ix + 16 * k : ix + 16 * (k + 1)])
        assert ckid == b"00dc" and flags == 0x10 and ln == len(f)
        assert p[movi_fourcc + off : movi_fourcc + off + 4] == b"00dc"


def test_avi_roundtrip_luma_parity_both_jpeg_paths():
    px = 16 * 16
    data = bytes(range(256)) * 3  # 3 frames of distinct content
    raw = [data[i * px : (i + 1) * px] for i in range(3)]
    exact = [float(np.frombuffer(b, dtype=np.uint8).mean()) for b in raw]
    for enc in (
        lambda b: jpeg.encode_jpeg_gray8(b, 16, 16, restart_interval=2),
        lambda b: jpeg.encode_jpeg_ycbcr420_gray(b, 16, 16),
    ):
        p = multimodal.encode_avi_mjpeg([enc(b) for b in raw], 16, 16)
        w, h, fps, lumas = multimodal.decode_avi_mjpeg(p)
        assert (w, h, fps, len(lumas)) == (16, 16, 25.0, 3)
        for got, want in zip(lumas, exact):
            assert got == pytest.approx(want, abs=3.0)


def test_avi_odd_sized_chunks_are_padded():
    """RIFF chunks pad to even byte boundaries (pad excluded from the
    declared size) — an odd-length JPEG frame must not desync the
    walk for the frames after it."""
    frames = _gray_frames([b"q", b"r", b"s"])
    # a trailing byte after EOI keeps the JPEG decodable and forces
    # every chunk payload to an ODD length → the walk must honor pads
    odd = [f if len(f) % 2 else f + b"\x00" for f in frames]
    assert all(len(f) % 2 for f in odd)
    p = multimodal.encode_avi_mjpeg(odd, 16, 16)
    _w, _h, _fps, lumas = multimodal.decode_avi_mjpeg(p)
    assert len(lumas) == 3


def test_avi_decode_rejects_malformed():
    good = multimodal.encode_avi_mjpeg(_gray_frames([b"x"]), 16, 16)
    with pytest.raises(ValueError):
        multimodal.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(ValueError):
        multimodal.decode_avi_mjpeg(good[:40])  # truncated header walk
    with pytest.raises(ValueError):
        # frame geometry disagreeing with the container header is corrupt
        wrong = multimodal.encode_avi_mjpeg(_gray_frames([b"x"]), 8, 8)
        multimodal.decode_avi_mjpeg(wrong)
    with pytest.raises(ValueError):
        multimodal.encode_avi_mjpeg([], 16, 16)  # no frames


def test_decode_video_dispatch():
    y = bytes([9] * 256)
    y4m = multimodal.encode_y4m([y], 16, 16)
    avi = multimodal.encode_avi_mjpeg(
        [jpeg.encode_jpeg_gray8(y, 16, 16)], 16, 16
    )
    assert multimodal._decode_video(y4m)[:3] == (16, 16, 25.0)
    assert multimodal._decode_video(avi)[:3] == (16, 16, 25.0)
    assert multimodal._decode_video(avi)[3][0] == pytest.approx(9.0, abs=1.5)
    with pytest.raises(ValueError):
        multimodal._decode_video(b"\x00\x00\x00\x18ftypmp42" + bytes(64))


def test_extract_video_features_mixed_containers(spark):
    """One DataFrame holding Y4M, AVI and an undecodable mp4 — the
    dispatch is per row; the mp4 quarantines to nulls while both real
    containers produce features."""
    y = bytes([40] * 256)
    y4m = multimodal.encode_y4m([y, y], 16, 16)
    avi = multimodal.encode_avi_mjpeg(
        _gray_frames([bytes([40] * 256), bytes([40] * 256)]), 16, 16
    )
    mp4 = b"\x00\x00\x00\x18ftypmp42" + bytes(64)
    df = spark.createDataFrame(
        [(1, y4m), (2, avi), (3, mp4)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in multimodal.extract_video_features(df).collect()}
    assert rows[3]["width"] is None
    for d in (1, 2):
        assert (rows[d]["width"], rows[d]["height"], rows[d]["n_frames"]) == (16, 16, 2)
        assert rows[d]["mean_luma"] == pytest.approx(40.0, abs=3.0)


def test_sample_video_frames_avi_offsets_and_stride(spark):
    src = spark.createDataFrame(
        [(10, "b" * (256 * 5))], "doc_id long, text string"  # 5 frames
    )
    vid = multimodal.text_as_avi_payload(src)
    rows = sorted(
        multimodal.sample_video_frames(vid, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    # offsets must point at the real '00dc' chunk headers in the stream
    payload = vid.collect()[0]["payload"]
    for r in rows:
        assert payload[r["byte_offset"] : r["byte_offset"] + 4] == b"00dc"
        assert r["frame_luma"] == pytest.approx(ord("b"), abs=3.0)


def test_q172_matches_lossless_y4m_twin(spark, sf_dir):
    """The registry query's own invariant at fixture scale: identical
    frame sets and per-frame luma within JPEG tolerance of the
    lossless Y4M rendering of the same chunking."""
    from climate_data_pipelines_spark.invariants import INVARIANTS

    ok, msg = INVARIANTS["q172_avi_mjpeg_frames"](spark, sf_dir)
    assert ok, msg


def test_video_vhash_container_generic():
    """The perceptual video hash accepts both containers: Y4M pools
    raw Y planes (bit-identical to y4m_vhash), AVI pools the decoded
    luma planes; an exact byte-duplicate and a re-muxed copy (same
    JPEG frames, rebuilt container) hash identically."""
    px = 16 * 16
    data = bytes(range(256)) * 4
    raw = [data[i * px : (i + 1) * px] for i in range(4)]
    y4m = multimodal.encode_y4m(raw, 16, 16)
    assert multimodal.video_vhash(y4m) == multimodal.y4m_vhash(y4m)
    frames = [jpeg.encode_jpeg_gray8(b, 16, 16) for b in raw]
    avi = multimodal.encode_avi_mjpeg(frames, 16, 16)
    h = multimodal.video_vhash(avi)
    assert h == multimodal.video_vhash(bytes(avi))  # deterministic
    remuxed = multimodal.encode_avi_mjpeg(frames, 16, 16, fps=30)
    assert multimodal.video_vhash(remuxed) == h  # same frames, new container
    with pytest.raises(ValueError):
        multimodal.video_vhash(b"\x00\x00\x00\x18ftypmp42" + bytes(64))


def test_video_vhashes_mixed_corpus(spark):
    """video_vhashes fingerprints a MIXED corpus in one pass: Y4M and
    AVI payloads both hash (an AVI no longer quarantines to null);
    an undecodable mp4 still nulls out."""
    y = bytes(range(256))
    y4m = multimodal.encode_y4m([y], 16, 16)
    avi = multimodal.encode_avi_mjpeg([jpeg.encode_jpeg_gray8(y, 16, 16)], 16, 16)
    mp4 = b"\x00\x00\x00\x18ftypmp42" + bytes(64)
    df = spark.createDataFrame(
        [(1, y4m), (2, avi), (3, mp4)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r["vhash"] for r in multimodal.video_vhashes(df).collect()}
    assert rows[1] is not None and rows[2] is not None and rows[3] is None
    assert rows[1] == multimodal.y4m_vhash(y4m)

"""Y4M (YUV4MPEG2) video codec + frame sampling (SURVEY.md §2.11
multimodal): the decoder is REAL — golden-stream tests pin the wire
format, property tests pin the luma statistics, and the Spark paths
(extract_video_features / sample_video_frames) are checked end-to-end
on the deterministic document fixture."""

from __future__ import annotations

import numpy as np
import pytest

from climate_data_pipelines_spark.operators import multimodal


def test_y4m_roundtrip_mono():
    frames = [bytes(range(256)), bytes(256)]
    payload = multimodal.encode_y4m(frames, 16, 16, fps=25, colorspace="mono")
    assert payload.startswith(b"YUV4MPEG2 W16 H16 F25:1 ")
    w, h, fps, lumas = multimodal.decode_y4m(payload)
    assert (w, h, fps) == (16, 16, 25.0)
    assert lumas == [127.5, 0.0]


def test_y4m_roundtrip_420_neutral_chroma_same_luma():
    y = bytes([7] * 256)
    mono = multimodal.encode_y4m([y], 16, 16, colorspace="mono")
    c420 = multimodal.encode_y4m([y], 16, 16, colorspace="420jpeg")
    # chroma planes add bytes but must not change the luma statistic
    assert len(c420) > len(mono)
    assert multimodal.decode_y4m(mono)[3] == multimodal.decode_y4m(c420)[3] == [7.0]


def test_y4m_444_and_422_layouts():
    y = bytes(range(64))
    for cs in ("444", "422", "420"):
        p = multimodal.encode_y4m([y, y, y], 8, 8, colorspace=cs)
        w, h, _, lumas = multimodal.decode_y4m(p)
        assert (w, h) == (8, 8)
        assert lumas == [31.5, 31.5, 31.5]


def test_y4m_odd_dims_chroma_rounding():
    # 5x3 C420 → chroma planes are ceil(5/2) x ceil(3/2) = 3x2 each
    y = bytes(range(15))
    p = multimodal.encode_y4m([y], 5, 3, colorspace="420")
    header_len = p.index(b"\n") + 1
    assert len(p) - header_len == len(b"FRAME\n") + 15 + 2 * (3 * 2)
    assert multimodal.decode_y4m(p)[3] == [7.0]


def test_y4m_decode_rejects_garbage():
    with pytest.raises(ValueError):
        multimodal.decode_y4m(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        multimodal.decode_y4m(b"YUV4MPEG2 W16 F25:1\n")  # missing H
    good = multimodal.encode_y4m([bytes(256)], 16, 16)
    with pytest.raises(ValueError):
        multimodal.decode_y4m(good[:-10])  # truncated frame
    with pytest.raises(NotImplementedError):
        multimodal.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C411\n" + b"FRAME\n" + bytes(6))


def test_y4m_frame_params_skipped():
    # FRAME lines may carry parameters up to the newline (spec §frame)
    y = bytes([9] * 4)
    p = multimodal.encode_y4m([y], 2, 2, colorspace="mono")
    p = p.replace(b"FRAME\n", b"FRAME Ip\n")
    assert multimodal.decode_y4m(p)[3] == [9.0]


def test_extract_video_features_exact_luma(spark, sf_dir):
    src = spark.createDataFrame(
        [(1, "hello world " * 40), (2, "x" * 300), (3, "")],
        "doc_id long, text string",
    )
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_video_features(
            multimodal.text_as_y4m_payload(src)
        ).collect()
    }
    px = 256
    for did, text in [(1, "hello world " * 40), (2, "x" * 300), (3, " ")]:
        data = text.encode("utf-8")[: px * 8]
        n = max(1, -(-len(data) // px))
        arr = np.frombuffer(data.ljust(n * px, b"\x00"), dtype=np.uint8)
        per_frame = [
            round(float(arr[i * px : (i + 1) * px].mean()), 4) for i in range(n)
        ]
        exact = round(sum(per_frame) / n, 4)
        r = feats[did]
        assert (r["width"], r["height"], r["n_frames"]) == (16, 16, n)
        assert r["mean_luma"] == pytest.approx(exact, abs=1e-9)
        assert r["duration_s"] == pytest.approx(n / 25.0, abs=1e-6)


def test_sample_video_frames_stride_and_offsets(spark):
    src = spark.createDataFrame(
        [(10, "a" * (256 * 5))], "doc_id long, text string"  # 5 frames
    )
    vid = multimodal.text_as_y4m_payload(src)
    rows = sorted(
        multimodal.sample_video_frames(vid, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    # offsets must point at the FRAME markers in the real stream
    payload = vid.collect()[0]["payload"]
    for r in rows:
        assert payload[r["byte_offset"] : r["byte_offset"] + 5] == b"FRAME"
        assert r["frame_luma"] == pytest.approx(ord("a"), abs=1e-9)


def test_compressed_video_quarantined_to_null(spark):
    fake_mp4 = b"\x00\x00\x00\x18ftypmp42" + bytes(64)
    df = spark.createDataFrame([(7, fake_mp4)], "doc_id long, payload binary")
    rows = multimodal.extract_video_features(df).collect()
    assert len(rows) == 1 and rows[0]["width"] is None
    assert rows[0]["n_bytes"] == len(fake_mp4)


def test_sample_video_frames_spec_default_colorspace(spark):
    """A Y4M header with NO C tag means C420 per spec: the frame walk
    must use the same default as decode_y4m (a mono-assuming walk
    would misalign into chroma bytes and fail or emit garbage)."""
    y = bytes([5] * 4)
    p = multimodal.encode_y4m([y, y, y], 2, 2, colorspace="420")
    headerless = p.replace(b" C420\n", b"\n", 1)
    assert b" C" not in headerless[: headerless.index(b"\n")]
    # decode agrees it's 3 frames of luma 5
    assert multimodal.decode_y4m(headerless)[3] == [5.0, 5.0, 5.0]
    df = spark.createDataFrame([(1, headerless)], "doc_id long, payload binary")
    rows = sorted(
        multimodal.sample_video_frames(df, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["frame_luma"]) for r in rows] == [(0, 5.0), (2, 5.0)]


def test_sample_video_frames_quarantines_truncated(spark):
    good = multimodal.encode_y4m([bytes(256)] * 2, 16, 16, colorspace="mono")
    df = spark.createDataFrame(
        [(1, good), (2, good[:-20])], "doc_id long, payload binary"
    )
    rows = multimodal.sample_video_frames(df, every_n=1).collect()
    # doc 2 is dropped whole — no partial rows from before the truncation
    assert {r["doc_id"] for r in rows} == {1}
    assert len(rows) == 2

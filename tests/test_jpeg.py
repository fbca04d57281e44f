"""JPEG codec tests: roundtrip against known pixels (the encoder
exists exactly so decode correctness is measured, not asserted),
feature guards, and dispatcher routing."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from climate_data_pipelines_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray8,
    encode_jpeg_ycbcr420_gray,
)


def _gradient(h: int, w: int) -> np.ndarray:
    return np.fromfunction(lambda y, x: (x * 7 + y * 3) % 256, (h, w)).astype(
        np.uint8
    )


class TestRoundtrip:
    def test_uniform_exact_dims_and_near_exact_luma(self):
        w, h = 64, 48
        jpg = encode_jpeg_gray8(bytes([128]) * (w * h), w, h, quality=90)
        W, H, luma = decode_jpeg(jpg)
        assert (W, H) == (w, h)
        assert abs(luma - 128.0) < 1.0

    def test_gradient_odd_dims(self):
        img = _gradient(21, 37)  # forces edge-padded partial blocks
        jpg = encode_jpeg_gray8(img.tobytes(), 37, 21, quality=90)
        W, H, luma = decode_jpeg(jpg)
        assert (W, H) == (37, 21)
        assert abs(luma - img.mean()) < 3.0

    def test_restart_markers(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (45, 59), dtype=np.uint8)
        jpg = encode_jpeg_gray8(
            img.tobytes(), 59, 45, quality=90, restart_interval=4
        )
        W, H, luma = decode_jpeg(jpg)
        assert (W, H) == (59, 45)
        assert abs(luma - img.mean()) < 3.0

    def test_multicomponent_420(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (45, 59), dtype=np.uint8)
        jpg = encode_jpeg_ycbcr420_gray(img.tobytes(), 59, 45, quality=90)
        W, H, luma = decode_jpeg(jpg)
        assert (W, H) == (59, 45)
        assert abs(luma - img.mean()) < 3.0

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(8, 70),
        h=st.integers(8, 70),
        seed=st.integers(0, 2**31),
        quality=st.integers(60, 98),
    )
    def test_property_mean_preserved(self, w, h, seed, quality):
        img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
        jpg = encode_jpeg_gray8(img.tobytes(), w, h, quality=quality)
        W, H, luma = decode_jpeg(jpg)
        assert (W, H) == (w, h)
        # mean is DC-dominated: survives quantization at any tested quality
        assert abs(luma - img.mean()) < 4.0


class TestGuards:
    def test_progressive_raises(self):
        jpg = bytearray(encode_jpeg_gray8(bytes(64), 8, 8))
        idx = bytes(jpg).find(b"\xff\xc0")
        jpg[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(bytes(jpg))

    def test_not_jpeg_raises(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")

    def test_bad_pixel_buffer(self):
        with pytest.raises(ValueError):
            encode_jpeg_gray8(bytes(10), 8, 8)


class TestDispatch:
    def test_extract_image_features_routes_jpeg(self, spark):
        from pyspark.sql import Row
        from climate_data_pipelines_spark.operators import multimodal

        img = _gradient(16, 24)
        payload = encode_jpeg_gray8(img.tobytes(), 24, 16, quality=92)
        df = spark.createDataFrame([Row(doc_id=0, payload=bytearray(payload))])
        row = multimodal.extract_image_features(df).collect()[0]
        assert (row["width"], row["height"]) == (24, 16)
        assert abs(row["mean_luma"] - img.mean()) < 3.0

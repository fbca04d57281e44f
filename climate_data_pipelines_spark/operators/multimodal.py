"""Multimodal columns: opaque binary payloads + typed metadata.

SURVEY.md §2.11: image/audio/video travel as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas``. The
image/audio codec libraries are not in this container, so the decode
kernel is STUBBED (deterministic fake features derived from the bytes);
the Spark-side plumbing — schema, batch iteration, partitioning — is
real and is what these operators exercise.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


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


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decode kernel — deterministic fake (no codec libs in this
    container). A real deployment replaces this body with PIL/ffmpeg;
    the signature (bytes -> (w, h, luma)) and everything around it
    stays identical.
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_luma = (sum(payload[:64]) % 2551) / 10.0 if n else 0.0
    return width, height, mean_luma


def extract_image_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Batches arrive as pandas DataFrames (whole partitions, streamed) —
    the decode loop is per-batch Python, the orchestration stays
    distributed. At 100 TB this is the canonical shape: repartition by
    payload size budget upstream, one Python worker per core decoding
    its partition's batches.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_image_stub(p) for p in pdf["payload"]]
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

"""q172 frames-per-second FLOOR proof (VERDICT r8 item 4's alternate
"Done"): decompose the bench's top-cost query — MJPEG-in-AVI decode —
into (a) the AVI ENCODE fixture stage, (b) the Spark decode stage, and
(c) the same decode kernel called DIRECTLY on the identical payloads
with no Spark at all (single-threaded — the pure-Python/numpy
ceiling). If (b) ≈ (c)/cores, the engine adds ~nothing and the cost
IS the dependency-free baseline-JPEG codec, which parallelizes with
containers; flagging the query as an engine problem would be wrong.

Merges a ``q172_fps_floor`` row into SCALEPROOF.json.

Usage: python tools/jpeg_floor_proof.py [SF_DIR]  (default sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import multimodal

    spark = get_spark(app_name="jpeg-floor-proof")
    docs = load_table(spark, sf_dir, "documents")

    # (a) fixture/encode stage, materialized once — q172's bench time
    # includes this; the floor argument is about the DECODE
    avi = multimodal.text_as_avi_payload(docs)
    t0 = time.perf_counter()
    avi = avi.localCheckpoint(eager=True)
    encode_sec = time.perf_counter() - t0

    # (b) Spark decode over the materialized payloads (median of 3)
    def run_decode() -> float:
        t0 = time.perf_counter()
        multimodal.sample_video_frames(avi, every_n=1).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    run_decode()  # warm
    spark_decode_sec = statistics.median(run_decode() for _ in range(3))

    # (c) the identical kernel, no Spark, one thread — the ceiling
    rows = avi.select("payload").collect()
    payloads = [r["payload"] for r in rows]
    n_frames = 0
    t0 = time.perf_counter()
    for p in payloads:
        _w, _h, _fps, lumas = multimodal.decode_avi_mjpeg(bytes(p))
        n_frames += len(lumas)
    direct_sec = time.perf_counter() - t0

    cores = spark.sparkContext.defaultParallelism
    out = {
        "sf_dir": sf_dir,
        "containers": len(payloads),
        "frames": n_frames,
        "encode_fixture_sec": round(encode_sec, 3),
        "spark_decode_sec": round(spark_decode_sec, 3),
        "direct_1core_sec": round(direct_sec, 3),
        "direct_1core_fps": round(n_frames / direct_sec, 1),
        "spark_fps": round(n_frames / spark_decode_sec, 1),
        "ideal_parallel_sec": round(direct_sec / cores, 3),
        "spark_vs_ideal": round(spark_decode_sec / (direct_sec / cores), 2),
        "note": (
            "spark_vs_ideal ~1 means the engine adds nothing over the "
            "pure-Python codec ceiling; q172's bench cost = encode "
            "fixture + codec CPU, parallelizes with containers"
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALEPROOF.json",
    )
    doc = {}
    if os.path.exists(path):
        with open(path) as fh:
            doc = json.load(fh)
    doc["q172_fps_floor"] = out
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

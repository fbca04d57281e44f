"""Measure the WARC surface's two untested scale claims (VERDICT r10
items 6-7) and write ``warc_scan_parallelism`` /
``warc_stream_increment`` rows into SCALEPROOF.json.

1. SCAN PARALLELISM (item 7): ``sources/warc.py read_warc`` claims
   one task per .warc.gz file — the format's parallelism unit (gzip
   members are not seekable). That claim has only ever run on 1-3
   file fixtures. Here the z10 corpus (50k docs) is rendered two
   ways — ~64 shard files vs ONE monolithic file — and the decode
   wall + scan partition count are measured for both. The q129
   row-group lesson says local[32] hides scan skew in file layout;
   this is the direct test. Recorded: n_files, scan partitions,
   walls, speedup, and the implied core utilization
   ``wall_single / (wall_multi * min(32, n_files))``.

   (Known hazard the row exists to catch: Spark's FilePartition
   bin-packing groups small files by size + openCostInBytes, so 64
   ~1 MB files can land in a handful of partitions and decode on a
   few cores unless the reader spreads them.)

2. STREAMING INCREMENT AT SCALE (item 6): the full-recipe streaming
   WARC replay (tests/test_warc_stream.py) is pytest-proved at
   fixture scale only. Here: a z10-scale base (even-id docs, curated
   with url_dedup + domain_gate + gopher ON and messy urls that
   shadow half the day-1 crawl URIs — the pytest's plant, at scale),
   then the odd-id docs arrive as ~64 .warc.gz files and are ingested
   twice: ``curate_increment`` on a batch read (the batch twin) and
   ``warc_ingest_increment`` under Trigger.AvailableNow (the stream
   twin). Recorded: both walls and exact shard-content parity.

Usage:
    python tools/warc_scale_proof.py [Z_DIR]   # default scaledata/z10
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES_TARGET = 64
REPEATS = 3


def _write_warc_files(spark, docs, out_dir: str, docs_per_file: int) -> int:
    from climate_data_pipelines_spark.sources import warc

    os.makedirs(out_dir, exist_ok=True)
    rows = warc.docs_as_warc_payload(docs, docs_per_file=docs_per_file).collect()
    for r in rows:
        with open(f"{out_dir}/crawl-{int(r['file_id']):05d}.warc.gz", "wb") as fh:
            fh.write(bytes(r["payload"]))
    return len(rows)


def _shard_contents(spark, base_dir: str):
    from pyspark.sql import functions as F

    return {
        (r["doc_id"], r["h"])
        for r in spark.read.parquet(f"{base_dir}/shards")
        .select("doc_id", F.sha2("text", 256).alias("h"))
        .collect()
    }


def main() -> None:
    z_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/z10"
    work = "/tmp/warc_scale_proof"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    from pyspark.sql import functions as F

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.plans.llm_curation import (
        curate_corpus,
        curate_increment,
    )
    from climate_data_pipelines_spark.sources import warc
    from climate_data_pipelines_spark.streaming.jobs import warc_ingest_increment

    spark = get_spark(app_name="warc-scale-proof")
    docs = load_table(spark, z_dir, "documents")
    n_docs = docs.count()

    # ---- item 7: scan parallelism, multi-file vs monolithic ----
    multi_dir = f"{work}/multi"
    single_dir = f"{work}/single"
    per_file = max(1, n_docs // N_FILES_TARGET)
    n_multi = _write_warc_files(spark, docs, multi_dir, per_file)
    n_single = _write_warc_files(spark, docs, single_dir, n_docs + 1)
    print(f"rendered {n_multi} shard files / {n_single} monolithic")

    def timed_scan(path):
        samples, parts, recs = [], None, None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df = warc.read_warc(spark, path)
            recs = df.filter(F.col("warc_type") == "response").count()
            samples.append(time.perf_counter() - t0)
            if parts is None:
                parts = df.rdd.getNumPartitions()
        return round(statistics.median(samples), 2), parts, recs

    multi_sec, multi_parts, multi_recs = timed_scan(multi_dir)
    single_sec, single_parts, single_recs = timed_scan(single_dir)
    assert multi_recs == single_recs == n_docs, (
        multi_recs, single_recs, n_docs,
    )
    cores = spark.sparkContext.defaultParallelism
    util = round(single_sec / (multi_sec * min(cores, n_multi)), 3)
    scan_row = {
        "z_dir": z_dir,
        "n_docs": n_docs,
        "n_files_multi": n_multi,
        "scan_partitions_multi": multi_parts,
        "scan_partitions_single": single_parts,
        "sec_multi": multi_sec,
        "sec_single": single_sec,
        "speedup_multi_vs_single": round(single_sec / multi_sec, 2),
        "implied_core_utilization": util,
        "cores": cores,
    }
    print(json.dumps(scan_row, indent=1))

    # ---- item 6: streaming increment at scale ----
    # base: even ids, messy urls shadowing each odd neighbor's crawl
    # URI (the pytest plant at z10 scale)
    messy_url = F.concat(
        F.lit("HTTP://Corpus.INVALID:80/doc/"),
        (F.col("doc_id") + 1).cast("string"),
    )
    day0 = docs.filter(F.col("doc_id") % 2 == 0).withColumn("url", messy_url)
    day0_dir = f"{work}/day0"
    os.makedirs(day0_dir, exist_ok=True)
    day0.repartition(32).write.mode("overwrite").parquet(
        f"{day0_dir}/documents.parquet"
    )
    kwargs = dict(alpha=1.0, url_col="url", domain_gate=True, gopher=True)
    base_batch = f"{work}/base_batch"
    t0 = time.perf_counter()
    curate_corpus(spark, day0_dir, base_batch, **kwargs)
    day0_sec = time.perf_counter() - t0
    base_stream = f"{work}/base_stream"
    shutil.copytree(base_batch, base_stream)

    day1 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    n_day1 = day1.count()
    warc_dir = f"{work}/day1_warc"
    n_files = _write_warc_files(spark, day1, warc_dir, max(1, n_day1 // N_FILES_TARGET))

    # batch twin
    t0 = time.perf_counter()
    wave_docs = warc.warc_records_to_documents(
        warc.read_warc(spark, warc_dir)
    )
    curate_increment(spark, wave_docs, base_batch)
    batch_sec = time.perf_counter() - t0

    # stream twin (availableNow drains the drop folder and exits)
    ckpt = f"{work}/ckpt"
    t0 = time.perf_counter()
    warc_ingest_increment(spark, warc_dir, base_stream, ckpt)
    stream_sec = time.perf_counter() - t0

    parity = _shard_contents(spark, base_batch) == _shard_contents(
        spark, base_stream
    )
    stream_row = {
        "z_dir": z_dir,
        "stages": "url_dedup + domain_gate + gopher (from the base manifest)",
        "base_docs_in": n_docs - n_day1,
        "day0_curate_sec": round(day0_sec, 1),
        "day1_docs": n_day1,
        "day1_files": n_files,
        "batch_increment_sec": round(batch_sec, 1),
        "stream_increment_sec": round(stream_sec, 1),
        "stream_overhead_vs_batch": round(stream_sec / batch_sec, 2),
        "shard_parity": parity,
    }
    print(json.dumps(stream_row, indent=1))

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALEPROOF.json",
    )
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            data = json.load(fh)
    data["warc_scan_parallelism"] = scan_row
    data["warc_stream_increment"] = stream_row
    with open(out_path, "w") as fh:
        json.dump(data, fh, indent=1)
    print("wrote SCALEPROOF.json")
    if not parity:
        print("PARITY FAILURE: streamed shards diverge from batch increment")
        sys.exit(1)


if __name__ == "__main__":
    main()

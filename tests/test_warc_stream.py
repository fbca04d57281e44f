"""Streaming WARC ingestion (streaming/jobs.py read_warc_stream +
warc_ingest_increment, r8 verdict item 8): a crawl's day-N increment
arrives as new .warc.gz FILES; the file-source stream must feed the
incremental curation pipeline and land EXACTLY what the batch
increment lands — same records→documents projection, same persisted-
index anti-joins, same shard append."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.plans.llm_curation import (
    curate_corpus,
    curate_increment,
)
from climate_data_pipelines_spark.sources import warc
from climate_data_pipelines_spark.streaming.jobs import (
    read_warc_stream,
    warc_ingest_increment,
)


def _write_warc_files(df, out_dir: str, docs_per_file: int = 25) -> int:
    """Render a documents frame as .warc.gz files on disk (the crawl
    drop-folder shape). Returns the number of files written."""
    os.makedirs(out_dir, exist_ok=True)
    rows = warc.docs_as_warc_payload(df, docs_per_file=docs_per_file).collect()
    for r in rows:
        with open(f"{out_dir}/crawl-{int(r['file_id']):05d}.warc.gz", "wb") as fh:
            fh.write(bytes(r["payload"]))
    return len(rows)


def _shard_contents(spark, base_dir: str) -> set:
    return {
        (r["doc_id"], r["h"])
        for r in spark.read.parquet(f"{base_dir}/shards")
        .select("doc_id", F.sha2("text", 256).alias("h"))
        .collect()
    }


def test_read_warc_stream_parses_records(spark, sf_dir, tmp_path_factory):
    """The binaryFile stream + Arrow record walk must recover every
    response record a batch read_warc sees from the same directory."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    warc_dir = str(tmp_path_factory.mktemp("warc_stream_src"))
    _write_warc_files(docs, warc_dir)

    got: list[int] = []

    def grab(batch_df, _bid):
        got.extend(
            r["n"]
            for r in batch_df.filter(F.col("warc_type") == "response")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    (
        read_warc_stream(spark, warc_dir)
        .writeStream.foreachBatch(grab)
        .option(
            "checkpointLocation",
            str(tmp_path_factory.mktemp("warc_stream_ckpt")),
        )
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    want = (
        warc.read_warc(spark, warc_dir)
        .filter(F.col("warc_type") == "response")
        .count()
    )
    assert want == docs.count()
    assert sum(got) == want


def test_warc_file_arrival_matches_batch_increment(
    spark, sf_dir, tmp_path_factory
):
    """Two arrival waves of .warc.gz files, streamed into the curated
    base via warc_ingest_increment (availableNow + checkpoint), must
    produce shard-for-shard the same corpus as running the batch
    curate_increment on each wave's read_warc output — and the second
    streaming run must pick up ONLY the new files (exactly-once file
    tracking through the checkpoint)."""
    docs = load_table(spark, sf_dir, "documents")
    day0 = docs.filter(F.col("doc_id") % 2 == 0)
    day0_dir = str(tmp_path_factory.mktemp("ws_day0"))
    day0.write.parquet(f"{day0_dir}/documents.parquet")

    base_batch = str(tmp_path_factory.mktemp("ws_base_batch"))
    curate_corpus(spark, day0_dir, base_batch, alpha=1.0, tokens_per_shard=300)
    base_stream = str(tmp_path_factory.mktemp("ws_base_stream")) + "/b"
    shutil.copytree(base_batch, base_stream)

    day1 = docs.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("source") != "src0")
    )
    mid = 250  # sf0.001 ids run 0..499: two non-empty waves
    waves = [
        day1.filter(F.col("doc_id") < mid),
        day1.filter(F.col("doc_id") >= mid),
    ]
    warc_dir = str(tmp_path_factory.mktemp("ws_files"))
    ckpt = str(tmp_path_factory.mktemp("ws_ckpt"))

    for wave in waves:
        n_before = len(os.listdir(warc_dir)) if os.path.exists(warc_dir) else 0
        _write_warc_files(wave, warc_dir)
        new_files = sorted(os.listdir(warc_dir))[n_before:]
        assert new_files, "wave wrote no files"

        # batch twin: ONLY the newly-arrived files, same projection
        wave_docs = warc.warc_records_to_documents(
            warc.parse_warc_payloads(
                spark.read.format("binaryFile")
                .load([f"{warc_dir}/{f}" for f in new_files])
                .select(F.col("content").alias("payload"))
            )
        )
        curate_increment(spark, wave_docs, base_batch)

        # streaming: the SAME drop folder; the checkpoint remembers
        # wave-1 files, so this run ingests only the new arrivals
        warc_ingest_increment(spark, warc_dir, base_stream, ckpt)

        assert _shard_contents(spark, base_batch) == _shard_contents(
            spark, base_stream
        ), "streamed shards diverge from the batch increment"

    # the stream actually ADDED content beyond the day-0 base (both
    # waves landed — the parity assertions above would also pass if
    # every increment were vacuously empty)
    day0_ids = {r["doc_id"] for r in day0.select("doc_id").collect()}
    streamed_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{base_stream}/shards")
        .select("doc_id")
        .collect()
    }
    assert streamed_ids - day0_ids, "no increment docs landed"


def test_warc_stream_replays_stage_recipe(spark, sf_dir, tmp_path_factory):
    """r10: a streaming crawl drop against a base curated WITH the
    manifest-driven stages (URL dedup + domain gate + Gopher rules)
    must replay the SAME recipe — warc_ingest_increment delegates to
    curate_increment, which reads the stages from the base manifest,
    so the streaming path needs no stage arguments at all. Pinned:

    - shard parity stream-vs-batch on a wave that includes a planted
      URL-DUP: four day-0 docs carry messy urls (UPPER host, :80 —
      exercising the scheme-default-port fold) that canonicalize to a
      DAY-1 doc's crawl URI, so that day-1 doc (own id, own text,
      fresh digest) is linked to the kept base only by its canonical
      URL and only the URL-dedup stage can drop it;
    - the planted URL-dup lands in NEITHER twin;
    - the domain_stats index grew (the domain gate's batch stats
      appended through the streaming foreachBatch)."""
    docs = load_table(spark, sf_dir, "documents")
    day1_nat = docs.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("source") != "src0")
    ).select("doc_id", "text")
    # day-0 urls: messy spellings of the exact URI shape
    # docs_as_warc_payload synthesizes (http://corpus.invalid/doc/<n>),
    # shifted to each doc's ODD neighbor (/doc/<id+1>) — so every
    # KEPT even day-0 doc shadows exactly one day-1 crawl URI, and
    # which day-1 docs are URL-dups is determined by the base run
    # itself (no guessing which doc survives curation). Unique per
    # day-0 doc, so stage 0 keeps them all within day 0.
    messy_url = F.concat(
        F.lit("HTTP://Corpus.INVALID:80/doc/"),
        (F.col("doc_id") + 1).cast("string"),
    )
    day0 = docs.filter(F.col("doc_id") % 2 == 0).withColumn("url", messy_url)
    day0_dir = str(tmp_path_factory.mktemp("wsr_day0"))
    day0.write.parquet(f"{day0_dir}/documents.parquet")

    kwargs = dict(
        alpha=1.0, tokens_per_shard=300,
        url_col="url", domain_gate=True, gopher=True,
    )
    base_batch = str(tmp_path_factory.mktemp("wsr_base_batch"))
    curate_corpus(spark, day0_dir, base_batch, **kwargs)
    base_stream = str(tmp_path_factory.mktemp("wsr_base_stream")) + "/b"
    shutil.copytree(base_batch, base_stream)
    stats_before = spark.read.parquet(
        f"{base_stream}/dedup_index/domain_stats"
    ).count()

    # the shadowed day-1 ids: odd ids whose canonical URI a kept
    # day-0 doc claims (read from the index the increment will use)
    urls_idx = {
        r["url_norm"]
        for r in spark.read.parquet(
            f"{base_batch}/dedup_index/urls"
        ).collect()
    }
    day1_ids = {r["doc_id"] for r in day1_nat.select("doc_id").collect()}
    shadowed = {
        i for i in day1_ids
        if f"http://corpus.invalid/doc/{i}" in urls_idx
    }
    assert shadowed, "fixture produced no shadowed day-1 URIs"
    assert day1_ids - shadowed, "every day-1 doc is shadowed (vacuous)"
    m_id = min(shadowed)
    day1 = day1_nat

    warc_dir = str(tmp_path_factory.mktemp("wsr_files"))
    ckpt = str(tmp_path_factory.mktemp("wsr_ckpt"))
    _write_warc_files(day1, warc_dir)

    # batch twin
    wave_docs = warc.warc_records_to_documents(
        warc.parse_warc_payloads(
            spark.read.format("binaryFile")
            .load(warc_dir)
            .select(F.col("content").alias("payload"))
        )
    )
    curate_increment(spark, wave_docs, base_batch)
    # streaming twin: no stage arguments anywhere — recipe comes from
    # the base manifest through curate_increment
    warc_ingest_increment(spark, warc_dir, base_stream, ckpt)

    assert _shard_contents(spark, base_batch) == _shard_contents(
        spark, base_stream
    ), "streamed shards diverge from the batch increment (stages on)"

    # every shadowed day-1 doc (own id, fresh digest, canonical URL
    # already kept by the base) must be absent from both twins — only
    # the manifest-replayed URL stage can have dropped them
    for base in (base_batch, base_stream):
        kept_shadowed = (
            spark.read.parquet(f"{base}/shards")
            .filter(F.col("doc_id").isin([int(i) for i in shadowed]))
            .count()
        )
        assert kept_shadowed == 0, (
            f"URL-dedup stage kept {kept_shadowed} shadowed URIs "
            f"(e.g. doc {m_id})"
        )

    # day-1 content actually landed, and the domain gate's stats
    # appended through the streaming path
    streamed = spark.read.parquet(f"{base_stream}/shards")
    assert streamed.filter(F.col("doc_id") % 2 == 1).count() > 0
    stats_after = spark.read.parquet(
        f"{base_stream}/dedup_index/domain_stats"
    ).count()
    assert stats_after > stats_before, "domain stats did not append"

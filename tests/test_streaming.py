from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.streaming import jobs


@pytest.fixture(scope="module")
def stream_dirs(request):
    d = tempfile.mkdtemp(prefix="cdp_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events_dir(spark, sf_dir, base):
    # stage the events fixture as a plain parquet *directory* (after
    # ns→µs normalization) so the file-source stream can read it
    out = f"{base}/events_in"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def test_tumbling_counts_stream_matches_batch(spark, sf_dir, stream_dirs):
    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    stream = jobs.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    result = jobs.tumbling_counts(stream, window="1 day", watermark="1 hour")
    q = jobs.run_available_now(result, f"{stream_dirs}/ckpt_tumble", "tumble")
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM tumble").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r.ws, r.event_type): r.n for r in batch.collect()}
    # append mode emits only watermark-closed windows; with availableNow
    # the final window may be held back — everything emitted must match
    # batch, and most windows must have been emitted
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) - 10  # ≤ open-window holdback per type


def test_dedup_within_watermark_removes_duplicates(spark, sf_dir, stream_dirs):
    dup_dir = f"{stream_dirs}/events_dup"
    ev = load_table(spark, sf_dir, "events").limit(200)
    ev.write.mode("overwrite").parquet(dup_dir)
    ev.write.mode("append").parquet(dup_dir)  # every event twice

    stream = jobs.read_events_stream(spark, dup_dir)
    result = jobs.dedup_within_watermark(stream, watermark="10 minutes")
    q = jobs.run_available_now(result, f"{stream_dirs}/ckpt_dedup", "deduped")
    q.awaitTermination(120)

    out = spark.sql("SELECT event_id, count(*) AS c FROM deduped GROUP BY event_id")
    assert out.filter(F.col("c") > 1).count() == 0
    assert out.count() == 200


def test_session_counts_stream_runs(spark, sf_dir, stream_dirs):
    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    stream = jobs.read_events_stream(spark, events_dir)
    result = jobs.session_counts(stream, gap="30 minutes", watermark="1 hour")
    q = jobs.run_available_now(result, f"{stream_dirs}/ckpt_sess", "sessions")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows, "no sessions emitted"
    assert all(r.session_end > r.session_start for r in rows)


def test_running_user_totals_matches_batch(spark, sf_dir, stream_dirs):
    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    stream = jobs.read_events_stream(spark, events_dir)
    result = jobs.running_user_totals(stream)
    q = jobs.run_available_now(
        result, f"{stream_dirs}/ckpt_state", "user_totals", output_mode="update"
    )
    q.awaitTermination(120)

    # update mode: keep the last emitted row per user (highest n_events)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                                              ORDER BY n_events DESC) AS rn
                 FROM user_totals) WHERE rn = 1"""
        ).collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(
                    F.when(
                        F.col("value").isNull() | F.isnan("value"), F.lit(0.0)
                    ).otherwise(F.col("value"))
                ),
                4,
            ).alias("tot"),
        )
    )
    want = {r.user_id: (r.n, r.tot) for r in batch.collect()}
    assert got.keys() == want.keys()
    for uid, (n, tot) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tot) < 1e-6


def test_stream_static_enrich(spark, sf_dir, stream_dirs):
    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    stream = jobs.read_events_stream(spark, events_dir)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("int"))
    )
    result = jobs.stream_static_enrich(stream, dim)
    q = jobs.run_available_now(result, f"{stream_dirs}/ckpt_enrich", "enriched")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM enriched")
    assert out.count() == load_table(spark, sf_dir, "events").count()
    assert out.filter(F.col("segment").isNull()).count() == 0
    assert out.filter(F.col("segment") != F.col("user_id") % 3).count() == 0


def test_stream_stream_join_bounded_pairs(spark, sf_dir, stream_dirs):
    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    left = jobs.read_events_stream(spark, events_dir)
    right = jobs.read_events_stream(spark, events_dir)
    result = jobs.stream_stream_join(left, right, watermark="2 hours", max_delay="10 minutes")
    q = jobs.run_available_now(result, f"{stream_dirs}/ckpt_ssj", "joined")
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM joined")
    # batch reference: same self-join condition
    ev = load_table(spark, sf_dir, "events")
    l = ev.select(
        F.col("user_id").alias("l_user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = ev.select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    want = l.join(
        r,
        (F.col("l_user_id") == F.col("r_user_id"))
        & (F.col("l_event_id") < F.col("r_event_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 minutes")),
    ).count()
    assert got.count() == want
    assert want > 0


def test_foreach_batch_parquet_sink(spark, sf_dir, stream_dirs):
    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    stream = jobs.read_events_stream(spark, events_dir)
    out_dir = f"{stream_dirs}/fb_out"
    q = jobs.write_foreach_batch_parquet(
        stream.select("event_id", "user_id"), out_dir, f"{stream_dirs}/ckpt_fb"
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out_dir)
    assert back.count() == load_table(spark, sf_dir, "events").count()
    assert "_batch_id" in back.columns


def test_rate_stream_shape(spark, stream_dirs):
    stream = jobs.read_rate_stream(spark, rows_per_second=500)
    assert stream.isStreaming
    assert stream.columns == ["event_id", "ts", "user_id", "event_type", "value", "props"]
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_ticks")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT count(*) AS n FROM rate_ticks").first().n > 0:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM rate_ticks LIMIT 5").collect()
        assert rows and all(r.event_type == "tick" for r in rows)
        assert all(0 <= r.user_id < 100 for r in rows)
    finally:
        q.stop()


def test_streaming_tile_rollup_matches_batch(spark, sf_dir, stream_dirs):
    from climate_data_pipelines_spark.operators import climate

    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    stream = jobs.read_events_stream(spark, events_dir)
    result = jobs.streaming_tile_rollup(stream, zoom=4, window="1 day")
    q = jobs.run_available_now(result, f"{stream_dirs}/ckpt_tiles", "tile_windows")
    q.awaitTermination(120)
    got = {
        (r.window_start, r.z, r.x, r.y): (r.n_points, r.mean_value)
        for r in spark.sql("SELECT * FROM tile_windows").collect()
    }
    assert got, "no tile windows emitted"

    ev = load_table(spark, sf_dir, "events")
    pts = (
        ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .withColumn("lat", (F.pmod("user_id", F.lit(170)) - 85).cast("double") + 0.25)
        .withColumn("lon", (F.pmod("event_id", F.lit(360)) - 180).cast("double") + 0.3125)
    )
    tiled = climate.tile_assign(pts, 4)
    batch = (
        tiled.groupBy(F.window("ts", "1 day").alias("w"), "z", "x", "y")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("m"))
        .select(F.col("w.start").alias("ws"), "z", "x", "y", "n", "m")
    )
    want = {(r.ws, r.z, r.x, r.y): (r.n, r.m) for r in batch.collect()}
    # append mode holds back open windows; everything emitted matches batch
    for k, v in got.items():
        assert want[k] == v


def test_curate_documents_stream_matches_batch_content_set(spark, sf_dir, stream_dirs):
    # streaming curation must keep the same CONTENT set and split
    # labels as batch q114; only the duplicate-keeper id may differ
    # (first-seen vs min doc_id)
    from climate_data_pipelines_spark.operators import training

    docs_dir = f"{stream_dirs}/docs_in"
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").parquet(docs_dir)

    out = jobs.curate_documents_stream(jobs.read_documents_stream(spark, docs_dir))
    q = jobs.run_available_now(out, f"{stream_dirs}/ckpt_curate", "curated")
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM curated").collect()

    batch = training.curate(docs).select("doc_id", "lang", "split").collect()
    assert len(streamed) == len(batch)
    # split is a pure function of doc_id — identical wherever ids agree
    batch_split = {r.doc_id: r.split for r in batch}
    for r in streamed:
        if r.doc_id in batch_split:
            assert r.split == batch_split[r.doc_id]
    # content sets match: join each kept id back to its content hash
    from climate_data_pipelines_spark.functions.text import normalize_text

    hashed = docs.select(
        "doc_id", F.sha2(normalize_text(F.col("text")), 256).alias("h")
    )
    id_to_hash = {r.doc_id: r.h for r in hashed.collect()}
    assert {id_to_hash[r.doc_id] for r in streamed} == {
        id_to_hash[r.doc_id] for r in batch
    }


def test_decontaminate_stream_matches_batch(spark, sf_dir, stream_dirs):
    # the stateless stream-static gate must keep exactly the ids batch
    # decontamination keeps (q106 semantics: src0 is the benchmark)
    from climate_data_pipelines_spark.operators import training

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")

    train_dir = f"{stream_dirs}/decon_in"
    train.write.mode("overwrite").parquet(train_dir)

    out = jobs.decontaminate_stream(
        jobs.read_documents_stream(spark, train_dir), bench, k=3
    ).select("doc_id")
    q = jobs.run_available_now(out, f"{stream_dirs}/ckpt_decon", "decon_kept")
    q.awaitTermination(120)
    streamed = {r.doc_id for r in spark.sql("SELECT * FROM decon_kept").collect()}

    batch = {r.doc_id for r in training.decontaminate(train, bench, k=3).collect()}
    assert streamed == batch
    assert len(streamed) > 0


def test_batch_sessionize_matches_streaming_session_window(spark, sf_dir, stream_dirs):
    """Batch gaps-and-islands (operators/sessions.py) and the streaming
    F.session_window job must agree session-for-session: same starts,
    same event counts, streaming end == batch last-event end + gap
    (session_window pads the window end by the gap)."""
    from datetime import timedelta

    from climate_data_pipelines_spark.operators import sessions

    events_dir = _events_dir(spark, sf_dir, stream_dirs)
    stream = jobs.read_events_stream(spark, events_dir)
    result = jobs.session_counts(stream, gap="30 minutes", watermark="1 hour")
    q = jobs.run_available_now(result, f"{stream_dirs}/ckpt_sess_parity", "sess_parity")
    q.awaitTermination(120)
    emitted = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_parity").collect()
    }
    assert emitted, "no sessions emitted"

    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in sessions.sessionize(ev, gap_seconds=1800).collect()
    }
    # append mode only emits sessions the final watermark has closed —
    # every emitted session must have an exact batch twin
    gap = timedelta(minutes=30)
    for key, (s_end, n) in emitted.items():
        assert key in batch, f"streaming session {key} missing from batch"
        b_end, b_n = batch[key]
        assert b_n == n, (key, b_n, n)
        assert s_end == b_end + gap, (key, s_end, b_end)


def test_checkpoint_restart_exactly_once(spark, sf_dir, stream_dirs):
    """Operational recovery (SURVEY.md §2.10): an availableNow run
    with a checkpoint, new files appended, then a RESTART from the
    same checkpoint must process ONLY the new files (no reprocessing,
    no loss) — the file-source offset log + sink commit log are the
    exactly-once contract a 100 TB catch-up job leans on."""
    import os

    base = f"{stream_dirs}/restart"
    in_dir, ckpt, out_dir = f"{base}/in", f"{base}/ckpt", f"{base}/out"
    os.makedirs(in_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events").limit(1000).cache()
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(in_dir)

    def run_once():
        stream = (
            spark.readStream.schema(events.schema).parquet(in_dir)
            .select("event_id", "user_id")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r["event_id"] for r in spark.read.parquet(out_dir).collect()]

    got1 = run_once()
    assert sorted(got1) == sorted(r["event_id"] for r in first.collect())

    # append the second half, restart from the SAME checkpoint: the
    # committed output must now hold each event exactly once — the
    # first file was not reprocessed, the new one not missed
    second.coalesce(1).write.mode("append").parquet(in_dir)
    got2 = run_once()
    assert len(got2) == len(set(got2)) == 1000
    assert sorted(got2) == sorted(r["event_id"] for r in events.collect())


def test_pack_documents_stream_matches_batch(spark, sf_dir, stream_dirs):
    """Streaming packing continuation (r13): an availableNow drain of
    an id-ordered document feed must produce pieces IDENTICAL to one
    batch ``pack_contexts`` over the whole corpus; a restart from the
    same checkpoint with a newly-arrived file continues the stream
    (no reprocessing, no gap); a restart with nothing new appends
    nothing (exactly-once)."""
    import json
    import os
    import time

    from climate_data_pipelines_spark.operators import training

    base = f"{stream_dirs}/packstream"
    in_dir, ckpt, out = f"{base}/in", f"{base}/ckpt", f"{base}/out"
    os.makedirs(in_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents").cache()
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    t1, t2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    CTX = 64

    def arrive(pred):
        docs.filter(pred).coalesce(1).write.mode("append").parquet(in_dir)
        time.sleep(1.1)  # distinct mtimes -> deterministic file order

    # day 0: two files, low ids first (the crawl-feed id-order contract)
    arrive(F.col("doc_id") < t1)
    arrive((F.col("doc_id") >= t1) & (F.col("doc_id") < t2))
    jobs.pack_documents_stream(
        spark, in_dir, out, ckpt, ctx_len=CTX, max_files_per_trigger=1
    )

    def pieces():
        return spark.read.parquet(f"{out}/packing/pieces").drop("_b")

    def rowset(df):
        return {tuple(r) for r in df.select(
            "doc_id", "seq", "doc_offset", "seq_offset", "n_tok_piece"
        ).collect()}

    want_day0 = training.pack_contexts(
        docs.filter(F.col("doc_id") < t2).select("doc_id", "text"),
        ctx_len=CTX,
    )
    assert rowset(pieces()) == rowset(want_day0)

    # restart with a new arrival: the stream CONTINUES the token
    # stream across the restart — final pieces == one batch pack of
    # the full corpus
    arrive(F.col("doc_id") >= t2)
    jobs.pack_documents_stream(
        spark, in_dir, out, ckpt, ctx_len=CTX, max_files_per_trigger=1
    )
    want_all = training.pack_contexts(
        docs.select("doc_id", "text"), ctx_len=CTX
    )
    assert rowset(pieces()) == rowset(want_all)
    with open(f"{out}/packing.json") as fh:
        meta = json.load(fh)
    n_all = pieces().count()
    assert meta["n_pieces"] == n_all
    assert meta["total_tokens"] == want_all.agg(
        F.sum("n_tok_piece")
    ).collect()[0][0]

    # nothing new: a third drain appends nothing (exactly-once)
    jobs.pack_documents_stream(
        spark, in_dir, out, ckpt, ctx_len=CTX, max_files_per_trigger=1
    )
    assert pieces().count() == n_all

    # streamed sequence manifest == the batch q190 surface
    from climate_data_pipelines_spark.plans.llm_curation import (
        read_sequence_manifest,
    )
    from climate_data_pipelines_spark.operators.training import (
        sequence_manifest,
    )

    cols = ["seq", "n_pieces", "seq_tokens", "boundaries"]
    got_seqs = {tuple(r) for r in
                read_sequence_manifest(spark, out).select(*cols).collect()}
    want_seqs = {tuple(r) for r in
                 sequence_manifest(want_all).select(*cols).collect()}
    assert got_seqs == want_seqs

    # refusals (r13 review): a different ctx_len, and a fresh
    # checkpoint over a packed out_dir (replay guard only valid
    # within one lineage), must FAIL FAST, never silently skip/corrupt
    with pytest.raises(Exception) as ei:
        jobs.pack_documents_stream(
            spark, in_dir, out, f"{base}/ckpt2", ctx_len=32,
            max_files_per_trigger=1,
        )
    assert "ctx_len" in str(ei.value)
    with pytest.raises(Exception) as ei:
        jobs.pack_documents_stream(
            spark, in_dir, out, f"{base}/ckpt3", ctx_len=CTX,
            max_files_per_trigger=1,
        )
    assert "checkpoint" in str(ei.value)
    assert pieces().count() == n_all  # refused runs wrote nothing
    docs.unpersist()

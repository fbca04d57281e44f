"""WARC ingestion (sources/warc.py, q174): record walk, gzip member
split, HTTP body extraction, html_to_text semantics, file-based
read_warc, and the full encode→parse→extract roundtrip vs the source
table."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from climate_data_pipelines_spark.sources import warc


def test_encode_parse_roundtrip_pure_python():
    recs = [
        ("http://corpus.invalid/doc/1", "<html><body><p>alpha beta</p></body></html>"),
        ("http://corpus.invalid/doc/2", "<html><body><p>gamma &amp; delta</p></body></html>"),
    ]
    payload = warc.encode_warc(recs)
    members = list(warc._split_gzip_members(payload))
    assert len(members) == 3  # warcinfo + 2 responses
    parsed = [warc._parse_warc_member(m) for m in members]
    assert parsed[0]["warc_type"] == "warcinfo"
    assert [p["target_uri"] for p in parsed[1:]] == [u for u, _ in recs]
    assert [p["body"] for p in parsed[1:]] == [h for _, h in recs]
    assert all(p["http_status"] == 200 for p in parsed[1:])
    assert all("text/html" in p["content_type"] for p in parsed[1:])


def test_uncompressed_warc_accepted():
    raw = warc._warc_record(
        [("WARC-Type", "resource"), ("WARC-Target-URI", "http://x/doc/9")],
        b"plain block",
    )
    got = [warc._parse_warc_member(m) for m in warc._split_gzip_members(raw)]
    assert got[0]["warc_type"] == "resource"
    assert got[0]["body"] == "plain block"


def test_uncompressed_multi_record_warc_keeps_every_record():
    """An uncompressed .warc file is ONE buffer holding ALL records —
    the walk must continue past each record's Content-Length +
    separator instead of stopping after the first (r7 advice: records
    2..n were silently dropped)."""
    recs = [
        (f"http://corpus.invalid/doc/{i}", f"<html><body><p>row {i}</p></body></html>")
        for i in range(5)
    ]
    raw = gzip.decompress(warc.encode_warc(recs))  # uncompressed .warc
    assert raw.count(b"WARC/1.0") == 6  # warcinfo + 5 responses
    got = list(warc._walk_warc_records(raw))
    assert [r["warc_type"] for r in got] == ["warcinfo"] + ["response"] * 5
    assert [r["target_uri"] for r in got][1:] == [u for u, _ in recs]
    assert [r["body"] for r in got][1:] == [h for _, h in recs]


def test_uncompressed_multi_record_through_spark_kernel(spark):
    recs = [
        (f"http://corpus.invalid/doc/{i}", f"<p>k{i}</p>") for i in range(4)
    ]
    raw = gzip.decompress(warc.encode_warc(recs))
    df = spark.createDataFrame([(raw,)], "payload binary")
    out = warc.parse_warc_payloads(df)
    assert out.filter(F.col("warc_type") == "response").count() == 4


def test_walk_resyncs_past_corrupt_record():
    """A bit-rotted record mid-file (bad Content-Length) must not drop
    the tail: the walker resyncs to the next WARC/ version line."""
    recs = [
        (f"http://corpus.invalid/doc/{i}", f"<p>r{i}</p>") for i in range(6)
    ]
    raw = gzip.decompress(warc.encode_warc(recs))
    # corrupt record 3's Content-Length header (non-numeric)
    parts = raw.split(b"WARC/1.0")
    assert len(parts) == 8  # leading empty + warcinfo + 6 responses
    parts[4] = parts[4].replace(b"Content-Length: ", b"Content-Length: x", 1)
    broken = b"WARC/1.0".join(parts)
    got = list(warc._walk_warc_records(broken))
    uris = [r["target_uri"] for r in got if r["warc_type"] == "response"]
    # record 3 lost (corrupt), every other record recovered
    assert f"{warc._URI_PREFIX}2" not in uris
    assert len(uris) == 5


def test_resync_rejects_warc_literal_inside_block_body():
    """A corrupt record whose BLOCK quotes a WARC header (a crawled
    page documenting the WARC format) must not be re-parsed from
    mid-body into a fabricated record (round-8 advice): the resync
    sanity check requires a CRLF-preceded version line and a
    WARC-Type header before trusting a candidate start."""
    quoted = (
        "<p>The WARC format begins: WARC/1.0 followed by headers like "
        "Content-Length: 99999 and WARC-Target-URI: http://evil.invalid/fake "
        "and WARC-Type: response as documented.</p>"
    )
    recs = [
        ("http://corpus.invalid/doc/0", quoted),
        ("http://corpus.invalid/doc/1", "<p>clean</p>"),
    ]
    raw = gzip.decompress(warc.encode_warc(recs))
    # corrupt record 0's Content-Length so the walker must resync —
    # the only WARC/ literals between the corruption and record 1 are
    # inside the quoted body text
    parts = raw.split(b"WARC/1.0")
    # leading empty + warcinfo + response0 (split again at the QUOTED
    # literal inside its body) + response1
    assert len(parts) == 5
    parts[2] = parts[2].replace(b"Content-Length: ", b"Content-Length: x", 1)
    broken = b"WARC/1.0".join(parts)
    got = list(warc._walk_warc_records(broken))
    uris = [r["target_uri"] for r in got if r["warc_type"] == "response"]
    # no fabricated record from the quoted header text, tail recovered
    assert uris == ["http://corpus.invalid/doc/1"]
    assert not any(
        r["target_uri"] == "http://evil.invalid/fake" for r in got
    )


def test_walk_is_linear_in_file_size():
    """20k records in one uncompressed buffer: the offset-based walk
    must recover all of them (the earlier per-record full-buffer copy
    made this O(records x file size))."""
    recs = [(f"http://corpus.invalid/doc/{i}", f"<p>{i}</p>") for i in range(20000)]
    raw = gzip.decompress(warc.encode_warc(recs))
    got = sum(1 for r in warc._walk_warc_records(raw) if r["warc_type"] == "response")
    assert got == 20000


def test_corrupt_gzip_member_quarantines_payload_not_task(spark):
    """A corrupt member must skip its payload (per-row quarantine, the
    multimodal-kernel contract) — not raise zlib.error and fail the
    whole Spark task. Healthy payloads in the same batch still parse."""
    good = warc.encode_warc([("http://corpus.invalid/doc/1", "<p>ok</p>")])
    # valid gzip magic, garbage stream — zlib.error on decompress
    corrupt = b"\x1f\x8b\x08\x00" + b"\xde\xad\xbe\xef" * 8
    df = spark.createDataFrame([(corrupt,), (good,)], "payload binary")
    out = warc.parse_warc_payloads(df).collect()
    assert [r["warc_type"] for r in out] == ["warcinfo", "response"]
    assert out[1]["target_uri"] == "http://corpus.invalid/doc/1"


def test_html_to_text_semantics(spark):
    cases = [
        # script/style dropped WITH contents, comments dropped, tags
        # to spaces, entities unescaped, whitespace collapsed
        ("<html><head><style>b{x}</style><script>var a=1;</script>"
         "<!-- hidden --></head><body><p>a b</p><p>c</p></body></html>",
         "a b c"),
        ("pre &amp;lt; post", "pre &lt; post"),  # no double-unescape
        ("<SCRIPT lang=x>nested <b>tag</b></SCRIPT>ok", "ok"),
        ("&lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;", "<tag> \"q\" 's' &"),
        ("  a\n\tb  ", "a b"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [r["t"] for r in df.select(warc.html_to_text("html").alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_read_warc_files(spark, tmp_path):
    # two files, gz and plain, picked up by one binaryFile glob
    (tmp_path / "a.warc.gz").write_bytes(
        warc.encode_warc([("http://corpus.invalid/doc/1", "<p>one</p>")])
    )
    plain = warc._warc_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Target-URI", "http://corpus.invalid/doc/2"),
        ],
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>two</p>",
    )
    (tmp_path / "b.warc").write_bytes(plain)
    out = warc.read_warc(spark, str(tmp_path)).filter(
        F.col("warc_type") == "response"
    )
    rows = {r["target_uri"]: r["body"] for r in out.collect()}
    assert rows == {
        "http://corpus.invalid/doc/1": "<p>one</p>",
        "http://corpus.invalid/doc/2": "<p>two</p>",
    }


def test_gzip_members_are_independent():
    """Each record must be its OWN gzip member (the Common Crawl
    layout) — a reader can stop after any record without decompressing
    the rest."""
    payload = warc.encode_warc(
        [(f"http://corpus.invalid/doc/{i}", f"<p>{i}</p>") for i in range(3)]
    )
    # the first member alone must decompress cleanly with stdlib gzip
    d = __import__("zlib").decompressobj(47)
    first = d.decompress(payload)
    assert first.startswith(b"WARC/1.0")
    assert d.unused_data[:2] == b"\x1f\x8b"  # next member follows
    # and gzip.decompress of the whole stream sees every member
    assert gzip.decompress(payload).count(b"WARC/1.0") == 4


def test_q174_roundtrip_equals_documents(spark, sf_dir):
    from climate_data_pipelines_spark.queries import REGISTRY

    got = REGISTRY["q174_warc_ingest"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    assert got.count() == docs.count()
    assert got.exceptAll(docs).isEmpty() and docs.exceptAll(got).isEmpty()


def test_payload_grouping(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    files = warc.docs_as_warc_payload(docs, docs_per_file=100)
    rows = files.collect()
    assert sum(r["n_records"] for r in rows) == docs.count()
    assert all(r["n_records"] <= 100 for r in rows)
    # file ids tile the doc_id space
    assert len({r["file_id"] for r in rows}) == len(rows)

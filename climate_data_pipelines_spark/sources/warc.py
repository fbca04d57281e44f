"""WARC (Web ARChive, ISO 28500) ingestion — the container format
web-crawl training corpora ship in (Common Crawl's `.warc.gz` layout:
one gzip MEMBER per record, members concatenated per file).

The reference pipeline ingests CSV/JSON/Zarr/HTTP only
(`/root/reference/pipelines/` readers); a training-data engine needs
the crawl container itself. Spark-first split of responsibilities:

- **Parallelism comes from Spark, parsing stays per-payload.** A
  `.warc.gz` file is NOT splittable mid-file (gzip members carry no
  sync markers), and that is how the ecosystem treats it: crawls ship
  as many ~1 GB files, so `read_warc` scans with the built-in
  `binaryFile` source — one task per file, thousands of files wide at
  corpus scale — and the record walk is an Arrow-batched
  ``mapInPandas`` kernel (stdlib zlib only). In-DataFrame payload
  columns (`docs_as_warc_payload` fixtures, or payloads landed by an
  upstream fetch) parallelize by row through the same kernel.
- **HTML → text is pure JVM expressions** (`html_to_text`):
  script/style/comment elision, tag strip, entity unescape,
  whitespace collapse — regexp chains, no UDF, so the hot text path
  stays in whole-stage codegen.

The fixture encoder writes spec-shaped records (warcinfo lead record,
one `response` record per document wrapping a real HTTP/1.1 response
with an HTML body; WARC-Target-URI carries the doc id), which makes
WARC ingestion ORACLE-CHECKABLE: encode the documents table, parse it
back, extract text — the result must equal `SELECT doc_id, text FROM
documents` (q174).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

_WARC_VERSION = b"WARC/1.0"
_URI_PREFIX = "http://corpus.invalid/doc/"

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def _escape_html(text: str) -> str:
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _warc_record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = _WARC_VERSION + b"\r\n"
    for k, v in headers:
        head += f"{k}: {v}".encode("utf-8") + b"\r\n"
    head += f"Content-Length: {len(block)}".encode("ascii") + b"\r\n\r\n"
    return head + block + b"\r\n\r\n"


def _gzip_member(raw: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip wrap
    return co.compress(raw) + co.flush()


def encode_warc(records: list[tuple[str, str]], date: str = "2024-01-01T00:00:00Z") -> bytes:
    """Multi-member-gzip WARC bytes: a ``warcinfo`` lead record, then
    one ``response`` record per (uri, html) pair — each record its own
    gzip member, per the Common Crawl layout. Deterministic (fixed
    date, record ids derived from the uri) so fixtures hash stably."""
    info = _warc_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Date", date),
            ("WARC-Record-ID", "<urn:uuid:warcinfo-0>"),
            ("Content-Type", "application/warc-fields"),
        ],
        b"software: climate_data_pipelines_spark\r\nformat: WARC File Format 1.0\r\n",
    )
    out = [_gzip_member(info)]
    for uri, html in records:
        body = html.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}".encode("ascii")
            + b"\r\n\r\n"
            + body
        )
        rec = _warc_record(
            [
                ("WARC-Type", "response"),
                ("WARC-Date", date),
                ("WARC-Record-ID", f"<urn:uuid:{uri}>"),
                ("WARC-Target-URI", uri),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            http,
        )
        out.append(_gzip_member(rec))
    return b"".join(out)


def _split_gzip_members(payload: bytes) -> Iterator[bytes]:
    """Decompress a concatenated-member gzip stream member by member
    (``decompressobj`` + ``unused_data`` walk). A payload that is not
    gzip at all is yielded as-is (uncompressed .warc)."""
    if payload[:2] != b"\x1f\x8b":
        yield payload
        return
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(47)
        yield d.decompress(rest)
        rest = d.unused_data


def _walk_warc_records(raw: bytes) -> Iterator[dict]:
    """Every WARC record in a raw buffer. A gzip member usually holds
    exactly one record, but an UNCOMPRESSED ``.warc`` file arrives as
    ONE buffer holding all of them — parse a record, then continue at
    ``head_end + 4 + Content-Length`` (skipping the ``\\r\\n\\r\\n``
    record separator) until the buffer is exhausted. Previously only
    the first record of an uncompressed multi-record file was parsed
    and the rest were silently dropped (r7 advice).

    A record that fails to parse (corrupted Content-Length, truncated
    header) RESYNCS to the next ``WARC/`` version line instead of
    abandoning the rest of the buffer — dropping the tail after one
    bit-rotted record would be the same silent-loss class the
    multi-record walk exists to close.

    A resync candidate is SANITY-CHECKED before it is trusted
    (round-8 advice): a corrupt record whose block BODY contains the
    literal ``WARC/`` (a crawled page quoting a WARC header is common
    in documentation and mirror pages) must not be re-parsed from
    mid-body into a fabricated record. Accepted starts must (a) look
    like a real version line (``WARC/<d>.<d>\\r\\n``), (b) sit at the
    buffer start or directly after a CRLF (real records are separated
    by ``\\r\\n\\r\\n``; a quoted header mid-sentence is not), and
    (c) parse with a ``WARC-Type`` header present (mandatory per the
    WARC spec, ISO 28500 §5.5). Candidates failing any gate are
    skipped and the scan continues."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate separator / padding drift: scan to the next version
        # line instead of requiring it exactly at the cursor
        nxt = raw.find(b"WARC/", pos)
        if nxt < 0:
            return
        if not _plausible_record_start(raw, nxt):
            pos = nxt + 5
            continue
        rec, consumed = _parse_warc_member_at(raw, nxt)
        if rec is None or consumed <= 0 or rec.get("warc_type") is None:
            pos = nxt + 5  # resync past the bad version line
            continue
        yield rec
        pos = nxt + consumed


_VERSION_RE = re.compile(rb"^WARC/\d+\.\d+\r\n")


def _plausible_record_start(raw: bytes, at: int) -> bool:
    """True iff ``at`` can plausibly begin a real WARC record: a
    well-formed version line preceded by buffer start or a CRLF."""
    if at > 0 and raw[at - 2 : at] != b"\r\n":
        return False
    return _VERSION_RE.match(raw[at : at + 16]) is not None


def _parse_warc_member(raw: bytes) -> dict | None:
    """One WARC record → header dict + block; None for non-records."""
    rec, _ = _parse_warc_member_at(raw, 0)
    return rec


def _parse_warc_member_at(raw: bytes, start: int) -> tuple[dict | None, int]:
    """Parse the record at ``start``; returns (record, bytes consumed
    from ``start`` including the trailing separator), or (None, 0).

    Works at OFFSETS into ``raw`` — only the header region and the
    Content-Length-sized block are ever sliced. The earlier
    ``raw[start:]`` copy made the multi-record walk O(records × file
    size): a 1 GB uncompressed crawl file with 100k records would
    memcpy ~10^14 bytes (r8 review finding)."""
    if raw[start : start + 5] != b"WARC/":
        return None, 0
    head_end = raw.find(b"\r\n\r\n", start)
    if head_end < 0:
        return None, 0
    first_eol = raw.find(b"\r\n", start)
    headers: dict[str, str] = {}
    for line in raw[first_eol + 2 : head_end].split(b"\r\n"):
        k, _, v = line.partition(b":")
        if _:
            headers[k.strip().decode("utf-8", "replace").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
    try:
        length = int(headers.get("content-length", "-1"))
    except ValueError:
        return None, 0
    if length < 0:
        return None, 0
    block = raw[head_end + 4 : head_end + 4 + length]
    status, ctype, body = None, headers.get("content-type"), block
    if headers.get("warc-type") == "response" and block[:5] == b"HTTP/":
        http_end = block.find(b"\r\n\r\n")
        if http_end >= 0:
            status_line = block[: block.find(b"\r\n")].split(b" ")
            if len(status_line) >= 2 and status_line[1].isdigit():
                status = int(status_line[1])
            for line in block[block.find(b"\r\n") + 2 : http_end].split(b"\r\n"):
                k, _, v = line.partition(b":")
                if _ and k.strip().lower() == b"content-type":
                    ctype = v.strip().decode("utf-8", "replace")
            body = block[http_end + 4 :]
    return {
        "target_uri": headers.get("warc-target-uri"),
        "warc_type": headers.get("warc-type"),
        "warc_date": headers.get("warc-date"),
        "http_status": status,
        "content_type": ctype,
        "body": body.decode("utf-8", "replace"),
        # consumed is relative to ``start``: header + block + \r\n\r\n
    }, (head_end - start) + 4 + length + 4


def _records_kernel(payload_col: str):
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for payload in pdf[payload_col]:
                if payload is None:
                    continue
                # per-payload quarantine (r7 advice): one corrupt gzip
                # member must skip ITS payload, not fail the Spark task
                # — matching the multimodal kernels' per-row contract.
                # Records parsed before the corruption are kept.
                try:
                    for member in _split_gzip_members(bytes(payload)):
                        rows.extend(_walk_warc_records(member))
                except (zlib.error, ValueError):
                    continue
            yield pd.DataFrame(
                rows, columns=[f.name for f in RECORD_SCHEMA.fields]
            )

    return batches


def parse_warc_payloads(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Explode WARC payload columns into one row per record
    (target_uri, warc_type, warc_date, http_status, content_type,
    body). Arrow-batched; stdlib-only kernel."""
    return df.select(payload_col).mapInPandas(
        _records_kernel(payload_col), schema=RECORD_SCHEMA
    )


def read_warc(spark, path: str) -> DataFrame:
    """Scan ``.warc`` / ``.warc.gz`` files with the built-in
    ``binaryFile`` source and walk their records. One task per file —
    the format's own parallelism unit (gzip members are not
    seekable); a crawl's thousands of files fan out across the
    cluster, and no file is ever held decompressed in one piece
    (members decode record by record)."""
    binary = spark.read.format("binaryFile").load(path)
    return parse_warc_payloads(binary.select(F.col("content").alias("payload")))


def docs_as_warc_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    docs_per_file: int = 50,
) -> DataFrame:
    """Render documents as WARC file payloads — ``docs_per_file``
    response records (plus the warcinfo lead) per payload, grouped by
    ``id_col // docs_per_file`` via ``applyInPandas`` (each group is
    file-sized by construction, so per-task memory is bounded). Each
    document becomes a realistic HTML page (head with title/style/
    script noise the extractor must elide, body = escaped text); the
    doc id travels in WARC-Target-URI."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        recs = []
        for doc_id, text in zip(pdf[id_col], pdf[text_col]):
            html = (
                "<!DOCTYPE html><html><head><title></title>"
                "<style>body { margin: 0; }</style>"
                "<script>var tracker = 1;</script>"
                "<!-- generated fixture --></head>"
                f"<body><p>{_escape_html(text or '')}</p></body></html>"
            )
            recs.append((f"{_URI_PREFIX}{int(doc_id)}", html))
        return pd.DataFrame(
            {
                "file_id": [int(pdf[id_col].iloc[0]) // docs_per_file],
                "payload": [encode_warc(recs)],
                "n_records": [len(recs)],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_records", T.IntegerType()),
        ]
    )
    return (
        df.select(id_col, text_col)
        .groupBy((F.col(id_col) / docs_per_file).cast("long").alias("_g"))
        .applyInPandas(
            lambda key, pdf: build(pdf), schema=out_schema
        )
    )


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML column — pure JVM regexp chain, no UDF:
    drop script/style elements WITH their contents and comments, strip
    remaining tags to spaces, unescape the five core entities,
    collapse whitespace. ``(?is)`` = case-insensitive + dotall so
    elements spanning lines are elided."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    c = F.regexp_replace(c, r"&lt;", "<")
    c = F.regexp_replace(c, r"&gt;", ">")
    c = F.regexp_replace(c, r"&quot;", "\"")
    c = F.regexp_replace(c, r"&#39;", "'")
    c = F.regexp_replace(c, r"&amp;", "&")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def warc_doc_id(uri_col: Column | str) -> Column:
    """doc_id back out of the fixture's WARC-Target-URI."""
    c = F.col(uri_col) if isinstance(uri_col, str) else uri_col
    return F.regexp_extract(c, r"/doc/(\d+)$", 1).cast("long")


def warc_records_to_documents(records: DataFrame) -> DataFrame:
    """WARC response records → ``documents``-shaped rows, the shared
    ingest projection for BOTH the batch path (``read_warc`` →
    this → ``plans.llm_curation.curate_increment``) and the streaming
    path (``streaming.jobs.warc_ingest_increment``'s foreachBatch) —
    one definition, two execution modes, so file-arrival ingestion is
    provably the same transform as the batch increment.

    Column derivations (pure expressions, no UDF):
      - ``doc_id``: the fixture's ``/doc/<n>`` suffix when present,
        else a 63-bit xxhash64 of the target URI (crawl pages carry
        no numeric id; the hash is stable across engines/retries and
        non-negative so it cannot collide with fixture id space);
      - ``text``: ``html_to_text`` of the response body;
      - ``url``: the raw target URI (feeds the URL-dedup stage 0);
      - ``source``: the URI's host; ``lang``: 'und' (a crawl ingest
        runs language-ID downstream, q47); ``n_chars``: text length.
    """
    uri = F.col("target_uri")
    text = html_to_text(F.col("body"))
    return records.filter(F.col("warc_type") == "response").select(
        F.coalesce(
            F.nullif(F.regexp_extract(uri, r"/doc/(\d+)$", 1), F.lit(""))
            .cast("long"),
            F.pmod(F.xxhash64(uri), F.lit(1 << 62)),
        ).alias("doc_id"),
        text.alias("text"),
        F.lit("und").alias("lang"),
        F.coalesce(
            F.nullif(F.regexp_extract(uri, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1), F.lit("")),
            F.lit("unknown"),
        ).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
        uri.alias("url"),
    )

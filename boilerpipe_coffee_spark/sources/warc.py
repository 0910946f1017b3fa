"""WARC (ISO 28500) ingestion — the container web-scale crawl corpora
actually arrive in (Common Crawl layout: one gzip member per record).

Pure-python, implemented from the public spec:

- :func:`write_warc`: warcinfo + one ``response`` record per (url,
  html) pair, each record its own gzip member (or plain) — the synth
  writer for tests and the driver query, readable by any WARC tool.
- :func:`parse_warc` / :func:`read_warc`: record walk driven by
  ``Content-Length`` (NEVER by searching for record terminators —
  bodies contain ``WARC/1.0`` by chance at scale; the PDF ``endstream``
  lesson, r4).  ``read_warc`` scans files with Spark's ``binaryFile``
  source and parses inside ``mapInPandas`` — one task per WARC file,
  the unit real crawl pipelines shard by.
- :func:`warc_to_interleaved`: HTML payloads -> the interleaved
  (doc_id, spans) schema the extraction operators consume.  Media
  spans round-trip through HTML as self-describing marker tags
  (``<img src="media://..." data-bpc-span="1"/>``), so an
  interleaved corpus flattened with :func:`spans_to_html`, shipped
  through WARC, and re-split extracts IDENTICALLY to the direct path
  (equality test in tests/test_warc.py).  Real crawl HTML has no
  markers and becomes a single text span, which the parser treats as
  the same byte stream.

Per-record failures (bad header block, short body, chunked encoding)
quarantine as error rows; a gzip-corrupt file quarantines as ONE
file-level error row.  Nothing raises out of a Spark task.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

WARC_ROW_SCHEMA = StructType(
    [
        StructField("warc_file", StringType(), False),
        StructField("record_id", StringType()),
        StructField("url", StringType()),
        StructField("warc_type", StringType()),
        StructField("content_type", StringType()),
        StructField("html", StringType()),
        StructField("error", StringType()),
    ]
)

_CRLF = b"\r\n"
_MEDIA_TAG = {"image": "img", "video": "video", "audio": "audio"}
_MEDIA_KIND = {v: k for k, v in _MEDIA_TAG.items()}
# the round-trip marker is self-describing: real crawl HTML never
# carries data-bpc-span, so re-splitting is unambiguous
_MARKER_RE = re.compile(
    r'<(img|video|audio) src="([^"]*)" data-bpc-span="1"/>'
)


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    return co.compress(data) + co.flush()


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl
    record-per-member layout); zlib.error -> ValueError."""
    out = bytearray()
    try:
        while buf:
            d = zlib.decompressobj(zlib.MAX_WBITS | 16)
            out += d.decompress(buf)
            out += d.flush()
            if d.unused_data == buf:  # no progress -> trailing garbage
                raise ValueError("gzip member made no progress")
            buf = d.unused_data
    except zlib.error as e:
        raise ValueError(f"corrupt gzip member: {e}") from e
    return bytes(out)


def _record(headers: "list[tuple[str, str]]", block: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode() + _CRLF
    head += f"Content-Length: {len(block)}".encode() + _CRLF
    return head + _CRLF + block + _CRLF + _CRLF


def write_warc(
    records: "list[tuple[str, str | bytes]]",
    gzip_records: bool = True,
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """Serialize (url, html) pairs as a WARC file: one ``warcinfo``
    record then one HTTP ``response`` record per pair, each record its
    own gzip member when ``gzip_records`` (the Common Crawl layout —
    a reader can seek to any record and decompress independently)."""
    out = []
    info = b"software: boilerpipe-coffee-spark synth\r\n"
    out.append(
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", "<urn:uuid:warcinfo-0>"),
                ("WARC-Date", date),
                ("Content-Type", "application/warc-fields"),
            ],
            info,
        )
    )
    for i, (url, html) in enumerate(records):
        body = html.encode() if isinstance(html, str) else html
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}".encode()
            + b"\r\n\r\n"
            + body
        )
        out.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:uuid:rec-{i:08d}>"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", date),
                    (
                        "Content-Type",
                        "application/http;msgtype=response",
                    ),
                ],
                http,
            )
        )
    if gzip_records:
        return b"".join(_gzip_member(r) for r in out)
    return b"".join(out)


def _parse_http_response(block: bytes) -> "tuple[str, str]":
    """(content_type, body_text) from an HTTP response block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP response without header terminator")
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(_CRLF)
    if not lines[0].startswith(b"HTTP/"):
        raise ValueError("missing HTTP status line")
    ctype = ""
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        key = k.strip().lower()
        if key == b"transfer-encoding" and b"chunked" in v.lower():
            raise ValueError("chunked transfer encoding unsupported")
        if key == b"content-type":
            ctype = v.strip().decode("latin-1")
    return ctype, body.decode("utf-8", errors="replace")


def parse_warc(name: str, buf: bytes) -> "list[dict]":
    """Walk a WARC buffer (plain or multi-member gzip) into rows of
    :data:`WARC_ROW_SCHEMA`.  Record boundaries come from
    Content-Length arithmetic only.  A malformed record emits an
    error row and ABORTS the walk (without a valid length the next
    boundary is unknowable); earlier good records are kept."""
    rows: "list[dict]" = []

    def row(**kw):
        base = {
            "warc_file": name,
            "record_id": None,
            "url": None,
            "warc_type": None,
            "content_type": None,
            "html": None,
            "error": None,
        }
        base.update(kw)
        rows.append(base)

    try:
        if buf[:2] == b"\x1f\x8b":
            buf = _gunzip_members(buf)
    except ValueError as e:
        row(error=str(e))
        return rows

    pos = 0
    while pos < len(buf):
        if buf[pos : pos + 4] == _CRLF + _CRLF:
            pos += 4
            continue
        try:
            if not buf[pos:].startswith(b"WARC/"):
                raise ValueError(f"no WARC version line at offset {pos}")
            hend = buf.find(b"\r\n\r\n", pos)
            if hend < 0:
                raise ValueError("truncated WARC header block")
            headers: "dict[str, str]" = {}
            for ln in buf[pos:hend].split(_CRLF)[1:]:
                k, _, v = ln.partition(b":")
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError("missing/bad Content-Length") from None
            block = buf[hend + 4 : hend + 4 + length]
            if len(block) != length:
                raise ValueError("truncated WARC record block")
            pos = hend + 4 + length
        except ValueError as e:
            row(error=str(e))
            break
        wtype = headers.get("warc-type")
        if wtype != "response":
            continue  # warcinfo / request / metadata records
        try:
            ctype, html = _parse_http_response(block)
        except ValueError as e:
            row(
                record_id=headers.get("warc-record-id"),
                url=headers.get("warc-target-uri"),
                warc_type=wtype,
                error=str(e),
            )
            continue
        row(
            record_id=headers.get("warc-record-id"),
            url=headers.get("warc-target-uri"),
            warc_type=wtype,
            content_type=ctype,
            html=html,
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` (one task per file — the
    shard unit real crawl pipelines use; a 100 TB crawl is millions of
    ~1 GB WARCs, so file-level parallelism saturates any cluster) +
    ``mapInPandas`` parse.  Returns :data:`WARC_ROW_SCHEMA` rows;
    per-record/file failures are error rows, never task failures."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        cols = [f.name for f in WARC_ROW_SCHEMA.fields]
        for pdf in batches:
            rows: "list[dict]" = []
            for r in pdf.itertuples():
                rows.extend(parse_warc(r.path, bytes(r.content)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=WARC_ROW_SCHEMA)


def host_stats(warc_rows: DataFrame) -> DataFrame:
    """Per-host crawl accounting over WARC response rows — the
    URL-level view that sits ABOVE document dedup in a crawl
    pipeline: record vs distinct-URL counts (their gap = revisits,
    the fetch-level dedup signal), and payload volume.  Host is the
    URL authority via ``regexp_extract`` (JVM-side, no Python UDF);
    error rows and URL-less records are excluded.  One
    map-side-combined aggregation keyed on host — at crawl scale
    hosts are the natural skew axis, and a count/sum agg with
    partial combine absorbs a hot host where a collect-style agg
    would not."""
    host = F.regexp_extract(
        F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1
    )
    return (
        warc_rows.filter(
            F.col("error").isNull() & F.col("url").isNotNull()
        )
        .select(host.alias("host"), "url", F.length("html").alias("b"))
        .groupBy("host")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("url").alias("n_urls"),
            F.sum("b").alias("html_chars"),
        )
        .withColumn(
            "revisits", (F.col("n_records") - F.col("n_urls")).cast("bigint")
        )
        .orderBy("host")
    )


def spans_to_html(doc: dict) -> str:
    """Flatten one interleaved doc (fixtures shape) to the HTML byte
    stream a crawler would have stored: text spans verbatim, media
    spans as self-describing marker tags at their positions."""
    parts = []
    for s in sorted(doc["spans"], key=lambda s: s["offset"]):
        if s["kind"] == "text":
            parts.append(s["text"] or "")
        else:
            tag = _MEDIA_TAG.get(s["kind"], "img")
            parts.append(
                f'<{tag} src="{s["media_ref"]}" data-bpc-span="1"/>'
            )
    return "".join(parts)


def warc_to_interleaved(warc_rows: DataFrame) -> DataFrame:
    """WARC response rows -> interleaved (doc_id, spans, error) docs
    for the extraction operators.  Marker tags written by
    :func:`spans_to_html` are split back out as media spans; plain
    crawl HTML becomes one text span.  Error rows pass through with
    null spans (the extraction quarantine contract)."""
    import pandas as pd

    from . import INTERLEAVED_SCHEMA

    out_schema = StructType(
        list(INTERLEAVED_SCHEMA.fields)
        + [StructField("error", StringType())]
    )

    def split(html: str) -> "list[dict]":
        spans, pos, off = [], 0, 0
        for m in _MARKER_RE.finditer(html):
            if m.start() > pos:
                spans.append(
                    {
                        "kind": "text",
                        "text": html[pos : m.start()],
                        "media_ref": None,
                        "offset": off,
                    }
                )
                off += 1
            spans.append(
                {
                    "kind": _MEDIA_KIND[m.group(1)],
                    "text": None,
                    "media_ref": m.group(2),
                    "offset": off,
                }
            )
            off += 1
            pos = m.end()
        if pos < len(html):
            spans.append(
                {
                    "kind": "text",
                    "text": html[pos:],
                    "media_ref": None,
                    "offset": off,
                }
            )
        return spans

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                doc_id = r.url or r.record_id or r.warc_file
                if r.error is not None or r.html is None:
                    rows.append(
                        {"doc_id": doc_id, "spans": None, "error": r.error}
                    )
                else:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "spans": split(r.html),
                            "error": None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "spans", "error"]
            )

    return warc_rows.mapInPandas(run, schema=out_schema)

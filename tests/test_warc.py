"""WARC ingestion (round 8): write/parse round-trip, quarantine
contract, and the load-bearing equality — an interleaved corpus
flattened to HTML, shipped through WARC, and re-split must extract
IDENTICALLY to the direct interleaved path."""

import os

import pytest
from pyspark.sql import functions as F

from boilerpipe_coffee_spark.fixtures import generate_doc
from boilerpipe_coffee_spark.sources import INTERLEAVED_SCHEMA
from boilerpipe_coffee_spark.sources.warc import (
    parse_warc,
    read_warc,
    spans_to_html,
    warc_to_interleaved,
    write_warc,
)

PAGES = [
    ("http://a.example/1", "<html><head><title>t1</title></head>"
     "<body><p>hello world one two three</p></body></html>"),
    ("http://a.example/2", "<html><body><p>second page body text here"
     "</p></body></html>"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip(gz):
    rows = parse_warc("f", write_warc(PAGES, gzip_records=gz))
    assert [r["error"] for r in rows] == [None, None]
    assert [r["url"] for r in rows] == [u for u, _ in PAGES]
    assert [r["html"] for r in rows] == [h for _, h in PAGES]
    assert all(r["warc_type"] == "response" for r in rows)
    assert all("text/html" in r["content_type"] for r in rows)


def test_content_length_drives_boundaries():
    """A body that CONTAINS 'WARC/1.0' and record terminators must not
    confuse the walk (boundaries are length arithmetic, never search
    -- the PDF endstream lesson)."""
    evil = (
        "<html><body><p>WARC/1.0\r\n\r\nWARC-Type: response\r\n"
        "fake record text</p></body></html>"
    )
    rows = parse_warc("f", write_warc([("http://e/x", evil)] + PAGES))
    assert [r["error"] for r in rows] == [None] * 3
    assert rows[0]["html"] == evil


def test_quarantine_contract():
    # corrupt gzip (inside the deflate stream, not the skippable
    # header fields) -> one file-level error row
    buf = bytearray(write_warc(PAGES, gzip_records=True))
    for i in range(24, 40):
        buf[i] ^= 0xFF
    rows = parse_warc("f", bytes(buf))
    assert len(rows) == 1 and "gzip" in rows[0]["error"], rows
    # truncated plain file -> good records kept, then one error row
    plain = write_warc(PAGES, gzip_records=False)
    rows = parse_warc("f", plain[: len(plain) - 30])
    assert rows[0]["error"] is None  # first record intact
    assert rows[-1]["error"] is not None
    # chunked transfer encoding -> per-record quarantine, walk continues
    http = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n0\r\n\r\n"
    )
    from boilerpipe_coffee_spark.sources.warc import _record

    chunked = _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", "<urn:uuid:c>"),
            ("WARC-Target-URI", "http://c/1"),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        http,
    ) + write_warc(PAGES, gzip_records=False)
    rows = parse_warc("f", chunked)
    assert "chunked" in rows[0]["error"]
    # warcinfo is skipped silently, so rows 1..2 are the two PAGES
    # responses -- the walk continued past the quarantined record
    assert [r["error"] for r in rows[1:]] == [None, None]
    assert len(rows) == 3


def test_warc_extraction_equals_direct_path(spark, tmp_path):
    """The north-rule invariant through the WARC container: flatten
    interleaved docs to HTML (media spans as marker tags), ship via
    gzipped WARC files, read + re-split distributed, extract -- the
    (kind, text, media_ref, order)+title output must equal extracting
    the original interleaved docs directly.  Adjacent text spans merge
    in the flattening; the parser sees the same byte stream either
    way, so outputs are identical."""
    from boilerpipe_coffee_spark.operators import extract

    docs = [generate_doc(i, seed=42) for i in range(60)]
    # two gzipped WARC shards, like a (tiny) crawl segment
    for shard in range(2):
        recs = [
            (d["doc_id"], spans_to_html(d))
            for d in docs[shard * 30 : (shard + 1) * 30]
        ]
        with open(tmp_path / f"seg-{shard}.warc.gz", "wb") as f:
            f.write(write_warc(recs))

    warc_docs = warc_to_interleaved(
        read_warc(spark, str(tmp_path / "*.warc.gz"))
    )
    assert warc_docs.filter(F.col("error").isNotNull()).count() == 0
    got = extract(
        warc_docs.select("doc_id", "spans"), "ArticleExtractor"
    )

    direct = spark.createDataFrame(
        [
            (
                d["doc_id"],
                [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in d["spans"]
                ],
            )
            for d in docs
        ],
        INTERLEAVED_SCHEMA,
    )
    want = extract(direct, "ArticleExtractor")

    flat = lambda df: sorted(  # noqa: E731
        (
            r["doc_id"], r["title"], r["error"],
            tuple(
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in (r["spans"] or [])
            ),
        )
        for r in df.collect()
    )
    assert flat(got) == flat(want)


def test_run_extract_accepts_warc_input(tmp_path):
    """jobs/run_extract.py --input-format warc: the production job
    surface reads crawl shards directly; output doc count equals the
    shipped docs (quarantines are reference-crash parity, not
    container loss)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = [generate_doc(i, seed=42) for i in range(60)]
    for shard in range(2):
        recs = [
            (d["doc_id"], spans_to_html(d))
            for d in docs[shard * 30 : (shard + 1) * 30]
        ]
        with open(tmp_path / f"seg-{shard}.warc.gz", "wb") as f:
            f.write(write_warc(recs))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / "out")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "run_extract.py"),
            "--input", str(tmp_path / "*.warc.gz"),
            "--input-format", "warc",
            "--output", out, "--buckets", "2",
        ],
        cwd=repo, capture_output=True, text=True, timeout=900, env=env,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert lines, proc.stderr[-2000:]
    s = json.loads(lines[-1])
    assert s["docs_out"] == 60
    assert s["buckets_run"] == 2


def test_host_stats_counts_revisits(spark, tmp_path):
    """Per-host accounting over a crawl with planted revisits: 5
    hosts x 24 records (20 fresh + 4 re-crawls each); revisits =
    records - distinct urls; error rows and URL-less records are
    excluded."""
    from boilerpipe_coffee_spark.fixtures import generate_doc
    from boilerpipe_coffee_spark.sources.warc import (
        host_stats,
        read_warc,
        spans_to_html,
        write_warc,
    )

    docs = [generate_doc(i, seed=43) for i in range(100)]
    recs = [
        (f"https://host{i % 5}.example.com/page/{i}", spans_to_html(d))
        for i, d in enumerate(docs)
    ]
    recs += recs[:20]
    for shard in range(4):
        with open(str(tmp_path / f"seg-{shard}.warc.gz"), "wb") as f:
            f.write(write_warc(recs[shard * 30 : (shard + 1) * 30]))
    got = {
        r.host: r
        for r in host_stats(
            read_warc(spark, str(tmp_path / "*.warc.gz"))
        ).collect()
    }
    assert set(got) == {f"host{i}.example.com" for i in range(5)}
    for h, r in got.items():
        assert r.n_records == 24, r
        assert r.n_urls == 20, r
        assert r.revisits == 4, r
        assert r.html_chars > 0
